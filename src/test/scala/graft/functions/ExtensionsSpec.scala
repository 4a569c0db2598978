package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.SparkSession

/** The declarative registration path. `spark.sql.extensions` is a
  * STATIC conf: Spark reads it from the SparkContext's conf when a
  * session is instantiated, so it must be present at application
  * launch (`--conf spark.sql.extensions=graft.GraftExtensions`).
  * The shared test context (SparkTestBase) launches with it — every
  * session in this suite goes through GraftExtensions.apply — and
  * this spec checks the whole function surface resolves from SQL
  * with no imperative Registry call, including on a second session
  * created after the fact (cluster-notebook shape).
  */
class ExtensionsSpec extends SparkTestBase {

  test("context launched with spark.sql.extensions resolves every graft function") {
    val row = spark.sql(
      """SELECT jaro_winkler('MARTHA', 'MARHTA') AS jw,
                word_shingles('a b c', 2) AS sh,
                minhash_sig(array('a b', 'b c'), 4) AS sig,
                abs_diff_sum(array(1, 0, 1), array(0, 0, 1)) AS h
      """).collect()(0)
    assert(row.getAs[Double]("jw") === 0.9611111111111111)
    assert(row.getSeq[String](1) === Seq("a b", "b c"))
    assert(row.getSeq[String](2).length === 4)
    assert(row.getAs[Int]("h") === 1)
  }

  test("every GraftFunctions entry is resolvable by name") {
    GraftFunctions.all.foreach { case (name, _) =>
      assert(spark.catalog.functionExists(name), s"function $name not registered")
    }
  }

  test("a later session on the same context also gets the functions") {
    val shared = spark // force shared session init first
    val fresh = SparkSession.builder().getOrCreate().newSession()
    try {
      val jw = fresh.sql("SELECT jaro_winkler('abc', 'abc') AS jw")
        .collect()(0).getAs[Double]("jw")
      assert(jw === 1.0)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
