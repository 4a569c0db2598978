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
}
