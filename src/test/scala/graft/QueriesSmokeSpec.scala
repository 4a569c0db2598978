package graft

import org.apache.spark.sql.functions.col

/** Smoke: every registered query runs at sf0.001; entry() is non-empty;
  * every oracle key has a query; the oracle/query column contract holds
  * (names are compared by the driver after sorting, so they must match).
  */
class QueriesSmokeSpec extends SparkTestBase {
  val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("query names are unique across def groups") {
    val names = SparkEntry.allDefs.map(_.name)
    assert(names.distinct.size === names.size)
  }

  SparkEntry.allDefs.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty)
      df.count() // executes the plan; throws on any analysis/runtime error
    }
  }
}
