package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** transformWithState (state API v2): running per-(user, type) counts
  * over a real file stream land exactly on the batch groupBy of the
  * same fixture.
  */
class StatefulCountsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("typeCountsStream final totals equal the batch aggregate") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = StatefulCounts.typeCountsStream(
        EventStreams.readEventsStream(spark, sf))
      val q = stream.writeStream
        .format("memory").queryName("g_tws_counts")
        .outputMode("update")
        .option("checkpointLocation",
          s"/tmp/graft_tws_ckpt_${System.nanoTime()}")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      // Update mode re-emits a pair on every batch that touches it;
      // the RUNNING total is monotone, so max(n) is the final count
      val got = spark.table("g_tws_counts")
        .groupBy("user_id", "event_type").agg(max("n").as("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      val expected = graft.queries.Tables.events(spark, sf)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(got === expected)
      assert(got.nonEmpty)
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
