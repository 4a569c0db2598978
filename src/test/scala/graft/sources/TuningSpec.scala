package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class TuningSpec extends AnyFunSuite {

  test("shufflePartitions: floors at min parallelism, scales with bytes") {
    assert(Tuning.shufflePartitions(0) === 64)
    assert(Tuning.shufflePartitions(1L << 30) === 64) // 1 GiB -> 8 < floor
    // 100 TiB at 128 MiB target = 800k partitions
    assert(Tuning.shufflePartitions(100L << 40) === 819200)
  }

  test("maxPartitionBytes: bounded to [1 MiB, 128 MiB]") {
    assert(Tuning.maxPartitionBytes(10L << 20, 100) === (1L << 20))
    assert(Tuning.maxPartitionBytes(100L << 40, 10) === (128L << 20))
    assert(Tuning.maxPartitionBytes(6400L << 20, 100) === (64L << 20))
  }

  test("bucketCount: power of two, one bucket per ~256 MiB") {
    assert(Tuning.bucketCount(0) === 1)
    assert(Tuning.bucketCount(256L << 20) === 1)
    assert(Tuning.bucketCount((256L << 20) + 1) === 2)
    // 100 TiB / 256 MiB = 409600 -> next pow2 = 524288
    assert(Tuning.bucketCount(100L << 40) === 524288)
    val n = Tuning.bucketCount(3L << 40)
    assert((n & (n - 1)) === 0, s"$n not a power of two")
  }
}
