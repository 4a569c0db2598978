package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  private def z(x: Long, y: Long): Long =
    Seq((x, y)).toDF("x", "y")
      .select(ZOrder.zvalue(col("x"), col("y")).as("z"))
      .as[Long].head()

  test("spread16 places bits at even positions") {
    val got = Seq(0xFFFFL).toDF("v")
      .select(ZOrder.spread16(col("v"))).as[Long].head()
    assert(got === 0x55555555L)
    val one = Seq(0x1L).toDF("v")
      .select(ZOrder.spread16(col("v"))).as[Long].head()
    assert(one === 1L)
  }

  test("zvalue interleaves: known Morton codes") {
    // reference values: interleave(x even bits, y odd bits)
    assert(z(0, 0) === 0L)
    assert(z(1, 0) === 1L)
    assert(z(0, 1) === 2L)
    assert(z(1, 1) === 3L)
    assert(z(2, 0) === 4L)
    assert(z(0xFFFF, 0xFFFF) === 0xFFFFFFFFL)
  }

  test("zvalue reconstructs both coordinates (bijective on 16-bit pairs)") {
    def unspread(v: Long): Long = {
      var r = 0L
      for (i <- 0 until 16) r |= ((v >> (2 * i)) & 1L) << i
      r
    }
    for ((x, y) <- Seq((12345L, 54321L), (0L, 65535L), (40000L, 1L))) {
      val zz = z(x, y)
      assert(unspread(zz) === x && unspread(zz >> 1) === y)
    }
  }

  test("z-sort clusters 2-D neighbors: quadrants are contiguous z ranges") {
    // the 4 quadrants of a 256x256 grid occupy disjoint z ranges
    val pts = for (x <- 0L until 256L by 17L; y <- 0L until 256L by 17L)
      yield (x, y)
    val zs = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zvalue(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    def quad(x: Long, y: Long) = (x / 128, y / 128)
    val ranges = zs.groupBy(t => quad(t._1, t._2))
      .map { case (q, ts) => q -> (ts.map(_._3).min, ts.map(_._3).max) }
    // ranges of distinct quadrants must not overlap
    val sorted = ranges.values.toSeq.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi < lo2)
      case _ =>
    }
  }

  test("zvalue roundtrips on 200 seeded-random 16-bit pairs in one pass") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    def unspread(v: Long): Long =
      (0 until 16).foldLeft(0L)((acc, i) => acc | (((v >> (2 * i)) & 1L) << i))
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zvalue(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(unspread(z) === x && unspread(z >> 1) === y, s"($x, $y) -> $z")
    }
  }

}
