package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("heavyHitters: exact ranked counts, CMS never undercounts") {
    // skewed stream: "hot" x600, "warm" x60, singletons x200
    val rows = Seq.fill(600)("hot") ++ Seq.fill(60)("warm") ++
      (1 to 200).map(i => s"cold_$i")
    val df = rows.toDF("tok")
    val got = Sketches.heavyHitters(df, "tok", k = 2)
      .as[(String, Long, Boolean)].collect().toSeq
    assert(got.map(t => (t._1, t._2)) === Seq(("hot", 600L), ("warm", 60L)))
    assert(got.forall(_._3), "CMS estimate undercut an exact count")
  }

  test("heavyHitters ties break on the key, deterministically") {
    val df = (Seq.fill(5)("b") ++ Seq.fill(5)("a") ++ Seq.fill(2)("z"))
      .toDF("tok")
    val got = Sketches.heavyHitters(df, "tok", k = 2)
      .select("tok").as[String].collect().toSeq
    assert(got === Seq("a", "b"))
  }

  test("kmvOverlap: small groups short-circuit to exact counts") {
    // every group under k=16 distinct values -> est columns ARE exact,
    // and the intersection estimate collapses to inclusion-exclusion
    // of exact counts
    val rows =
      (1 to 10).map(i => ("a", s"doc$i")) ++
        (6 to 15).map(i => ("b", s"doc$i")) ++ // overlap 6..10 with a
        (1 to 3).map(i => ("c", s"other$i"))   // disjoint from both
    val df = rows.toDF("src", "body")
    val got = Sketches.kmvOverlap(df, "src", "body", 16)
      .orderBy("source_a", "source_b")
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("a", "b", 10L, 10L, 15L, 5L, 5L),
      ("a", "c", 10L, 3L, 13L, 0L, 0L),
      ("b", "c", 10L, 3L, 13L, 0L, 0L)))
  }

  test("kmvOverlap: sketch-path estimate tracks a true 50% overlap") {
    // 400 distinct per side, 200 shared -> union 600; k=64 keeps
    // relative error ~1/8, so assert within a loose band and exactness
    // of the verification column
    val rows =
      (1 to 400).map(i => ("a", s"v$i")) ++
        (201 to 600).map(i => ("b", s"v$i"))
    val df = rows.toDF("src", "body")
    val r = Sketches.kmvOverlap(df, "src", "body", 64)
      .as[(String, String, Long, Long, Long, Long, Long)].collect().head
    val (_, _, estA, estB, estU, estI, exact) = r
    assert(exact === 200L)
    assert(estA > 250 && estA < 600, s"est_a=$estA")
    assert(estB > 250 && estB < 600, s"est_b=$estB")
    assert(estU > 400 && estU < 900, s"est_union=$estU")
    assert(estI >= 0 && estI < 450, s"est_int=$estI")
  }
}
