package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property tests for the custom scalar kernels (seeded random inputs;
  * no Spark session needed — these pin the JVM functions codegen calls).
  */
class PropertySpec extends AnyFunSuite {

  val rnd = new Random(42)
  def randStr(maxLen: Int): String = {
    val n = rnd.nextInt(maxLen + 1)
    (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
  }
  val trials = 500

  test("jaro_winkler: bounded, symmetric, identity") {
    (1 to trials).foreach { _ =>
      val a = randStr(20)
      val b = randStr(20)
      val s = JaroWinkler.similarity(a, b)
      assert(s >= 0.0 && s <= 1.0, s"($a, $b)")
      assert(s === JaroWinkler.similarity(b, a), s"symmetry ($a, $b)")
      assert(JaroWinkler.similarity(a, a) === 1.0)
    }
  }

  test("jaro_winkler: boost never lowers jaro, only fires above 0.7") {
    (1 to trials).foreach { _ =>
      val a = randStr(15)
      val b = randStr(15)
      val j = JaroWinkler.jaro(a, b)
      val jw = JaroWinkler.similarity(a, b)
      assert(jw >= j, s"($a, $b)")
      if (j <= 0.7) assert(jw === j, s"boost below threshold ($a, $b)")
    }
  }

  test("poly_hash: in range, stable, order-sensitive") {
    (1 to trials).foreach { _ =>
      val s = randStr(300)
      val h = PolyHash.hash(s)
      assert(h >= 0L && h < 1000000007L)
      assert(h === PolyHash.hash(s))
    }
    assert(PolyHash.hash("ab") !== PolyHash.hash("ba"))
    assert(PolyHash.hash("") === 0L)
  }

  test("sorted intersect size equals set intersection size") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(xs: Seq[String]) =
      new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
    (1 to trials).foreach { _ =>
      val xs = (0 until rnd.nextInt(30)).map(_ => randStr(4))
      val ys = (0 until rnd.nextInt(30)).map(_ => randStr(4))
      val a = xs.distinct.sorted
      val b = ys.distinct.sorted
      assert(SketchOps.sortedIntersectSize(arr(a), arr(b)) ===
        a.toSet.intersect(b.toSet).size)
    }
  }

  test("minhash similarity estimates jaccard on related sets") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(xs: Seq[String]) =
      new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
    val base = (0 until 200).map(i => s"shingle_$i")
    val overlapping = (100 until 300).map(i => s"shingle_$i") // J = 1/3
    val k = 64
    val sigA = SketchOps.minhashSig(arr(base.sorted), k)
    val sigB = SketchOps.minhashSig(arr(overlapping.sorted), k)
    val agree = (0 until k).count(i =>
      sigA.getUTF8String(i).equals(sigB.getUTF8String(i)))
    val est = agree.toDouble / k
    assert(math.abs(est - 1.0 / 3.0) < 0.15, s"estimate $est far from 1/3")
  }

  test("TopKBy: any reduce/merge order equals the sorted-truncate spec") {
    // production merges partial buffers in nondeterministic order —
    // the aggregate is only correct if every shuffle of the input and
    // every split point reach the same answer as sort-and-take-k
    val agg = new TopKBy(4)
    def spec(xs: Seq[(Long, Long)]): Seq[(Long, Long)] =
      xs.sortBy { case (v, id) => (-v, id) }.take(4)
    (1 to trials).foreach { _ =>
      val xs = Seq.fill(rnd.nextInt(12))(
        (rnd.nextInt(5).toLong, rnd.nextInt(8).toLong)).distinct
      val expected = spec(xs)
      // sequential reduce over a shuffle
      val shuffled = rnd.shuffle(xs)
      assert(shuffled.foldLeft(agg.zero)(agg.reduce) === expected)
      // arbitrary split -> partial buffers -> merge (both orders)
      val cut = if (xs.isEmpty) 0 else rnd.nextInt(xs.length)
      val (l, r) = shuffled.splitAt(cut)
      val bl = l.foldLeft(agg.zero)(agg.reduce)
      val br = r.foldLeft(agg.zero)(agg.reduce)
      assert(agg.merge(bl, br) === expected)
      assert(agg.merge(br, bl) === expected, "merge must be commutative")
    }
  }

  test("pgm_ahash_bands: random images match an independent reference decode") {
    // reference implementation written from the spec, not the kernel:
    // parse canonical header, pool (r*8/h, c*8/w), threshold by
    // cross-multiplication, pack little-endian 16-bit bands
    def reference(w: Int, h: Int, px: Array[Int]): Seq[Long] = {
      val sums = new Array[Long](64); val cnts = new Array[Long](64)
      var total = 0L
      for (r <- 0 until h; c <- 0 until w) {
        val seg = (r * 8 / h) * 8 + (c * 8 / w)
        val v = px(r * w + c).toLong
        sums(seg) += v; cnts(seg) += 1; total += v
      }
      val n = w.toLong * h
      (0 until 4).map { b =>
        (0 until 16).foldLeft(0L) { (acc, j) =>
          val seg = b * 16 + j
          if (sums(seg) * n > total * cnts(seg)) acc | (1L << j) else acc
        }
      }
    }
    val expr = PgmAHashBands(
      org.apache.spark.sql.catalyst.expressions.Literal(Array.empty[Byte]))
    (1 to 200).foreach { _ =>
      val w = 1 + rnd.nextInt(24)
      val h = 1 + rnd.nextInt(24)
      val px = Array.fill(w * h)(rnd.nextInt(256))
      val payload = s"P5\n$w $h\n255\n".getBytes("UTF-8") ++
        px.map(_.toByte)
      val got = expr.compute(payload)
      assert(got != null, s"w=$w h=$h decoded null")
      val arr = (0 until 4).map(got.getLong)
      assert(arr === reference(w, h, px), s"w=$w h=$h")
    }
  }
}
