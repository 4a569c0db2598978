package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.SparkSession

/** The declarative registration path: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` exposes every graft
  * function from SQL with no imperative call.
  */
class ExtensionsSpec extends SparkTestBase {

  test("spark.sql.extensions=graft.GraftExtensions registers all functions") {
    val shared = spark // force shared session init first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.extensions", "graft.GraftExtensions")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val row = ext.sql(
        """SELECT jaro_winkler('MARTHA', 'MARHTA') AS jw,
                  word_shingles('a b c', 2) AS sh,
                  minhash_sig(array('a b', 'b c'), 4) AS sig,
                  abs_diff_sum(array(1, 0, 1), array(0, 0, 1)) AS h
        """).collect()(0)
      assert(row.getAs[Double]("jw") === 0.9611111111111111)
      assert(row.getSeq[String](1) === Seq("a b", "b c"))
      assert(row.getSeq[String](2).length === 4)
      assert(row.getAs[Int]("h") === 1)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
