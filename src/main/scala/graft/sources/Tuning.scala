package graft.sources

/** Spill-aware sizing arithmetic for cluster runs — the two knobs the
  * prompt-level guidance ("size shuffle partitions and input splits so
  * partitions fit executor memory") turns into code. Pure functions so
  * jobs can log WHY they chose a number.
  */
object Tuning {

  /** Shuffle partition count for a stage that shuffles ~`shuffleBytes`:
    * ceil(bytes / targetPartitionBytes), floored at `minParallelism`
    * (≈ 2–3× total cores so every core gets work even after AQE
    * coalescing) — AQE can merge small partitions at runtime but can
    * never split a too-coarse static choice (except skew joins).
    * Default target 128 MiB: comfortably inside a 4 GiB-heap executor
    * core's working memory with room for sort/agg state.
    */
  def shufflePartitions(shuffleBytes: Long,
      minParallelism: Int = 64,
      targetPartitionBytes: Long = 128L << 20): Int = {
    require(shuffleBytes >= 0 && minParallelism > 0 && targetPartitionBytes > 0,
      s"bad inputs: $shuffleBytes / $minParallelism / $targetPartitionBytes")
    // min with MaxValue BEFORE the Int cast: exa-scale byte counts
    // would otherwise wrap negative and return minParallelism
    math.max(minParallelism.toLong,
      math.min(Int.MaxValue.toLong,
        (shuffleBytes + targetPartitionBytes - 1) / targetPartitionBytes)).toInt
  }

  /** maxPartitionBytes so a scan of `inputBytes` yields at least
    * `minSplits` splits (keep every executor busy on small-ish tables)
    * without exceeding the default 128 MiB split size.
    */
  def maxPartitionBytes(inputBytes: Long, minSplits: Int): Long = {
    require(inputBytes >= 0 && minSplits > 0, s"bad inputs")
    math.max(1L << 20, math.min(128L << 20, inputBytes / minSplits))
  }

  /** Bucket count for a bucketed table of ~`tableBytes`: one bucket ≈
    * one task's comfortable input (`targetBucketBytes`, default
    * 256 MiB pre-compression), rounded UP to a power of two so bucket
    * counts of co-bucketed tables divide evenly (Spark can join
    * n-bucket × 2n-bucket tables shuffle-free only when one count
    * divides the other).
    */
  def bucketCount(tableBytes: Long, targetBucketBytes: Long = 256L << 20): Int = {
    require(tableBytes >= 0 && targetBucketBytes > 0, "bad inputs")
    val raw = math.max(1L, (tableBytes + targetBucketBytes - 1) / targetBucketBytes)
    // Long accumulator, capped at 2^30: an Int shift past 2^30
    // overflows to MinValue then 0 and the loop would spin forever on
    // exa-scale inputs; 2^30 buckets is already beyond any practical
    // layout (callers should raise targetBucketBytes instead)
    var p = 1L
    while (p < raw && p < (1L << 30)) p <<= 1
    p.toInt
  }
}
