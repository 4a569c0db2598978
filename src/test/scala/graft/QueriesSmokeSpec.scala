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

  test("transcript assembly is partition-invariant (order lives in the array)") {
    // same result regardless of how the input is split — the ordering
    // happens inside sort_array, not in shuffle arrival order
    val base = SparkEntry.queries("q_transcript")(spark, sf).collect().toSeq
    val shuffled = graft.queries.Tables.eventsRaw(spark, sf).repartition(7)
    val alt = shuffled
      .select(col("user_id"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
    // re-run the same aggregation over the repartitioned input
    import org.apache.spark.sql.functions._
    val got = alt.groupBy("user_id")
      .agg(
        array_join(
          transform(
            sort_array(collect_list(
              struct(col("ts_us"), col("event_id"), col("event_type")))),
            e => concat(e("event_type"), lit("@"), e("ts_us"))),
          " > ").as("transcript"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id").collect().toSeq
    assert(got === base)
  }
}
