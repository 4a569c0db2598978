package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Proves the bucketed layout removes exchanges: the same join that
  * shuffles both sides on plain tables plans with zero Exchange nodes
  * when both sides are bucketed on the join key with equal counts.
  */
class BucketedTablesSpec extends SparkTestBase {
  import spark.implicits._

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed join and aggregation plan without exchanges") {
    val left = (1L to 1000L).map(i => (i, s"name_$i")).toDF("k", "name")
    val right = (1L to 1000L).map(i => (i, i * 2)).toDF("k", "v")
    BucketedTables.writeBucketed(left, "b_left", "k", 4, Seq("k"))
    BucketedTables.writeBucketed(right, "b_right", "k", 4, Seq("k"))
    try withConf(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val bl = spark.table("b_left")
      val br = spark.table("b_right")

      val joined = bl.join(br, Seq("k"))
      assert(!joined.queryExecution.executedPlan.toString.contains("Exchange"),
        "bucket-co-located join must not shuffle")
      assert(joined.count() === 1000)

      val agg = bl.groupBy("k").agg(count(lit(1)))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "aggregation on the bucket key must not shuffle")

      // contrast: the same join over non-bucketed frames exchanges
      val plain = left.join(right, Seq("k"))
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_left")
      spark.sql("DROP TABLE IF EXISTS b_right")
    }
  }
}
