package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** asofJoinBroadcast: zero-shuffle dimension-at-time lookup. Answer
  * pinned equal to the union+window asofJoin; plan pinned exchange-free.
  */
class AsOfBroadcastSpec extends SparkTestBase {

  private def leftDf: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "a", 100L), (2L, "a", 200L), (3L, "a", 200L),
      (4L, "b", 50L), (5L, "c", 100L), (6L, "a", 1000L),
      (7L, null.asInstanceOf[String], 100L)
    ).toDF("pid", "k", "t")
  }

  private def rightDf: DataFrame = {
    import spark.implicits._
    Seq(
      ("a", 90L, "a90"), ("a", 200L, "a200"), ("a", 500L, "a500"),
      ("b", 60L, "b60"),
      (null.asInstanceOf[String], 40L, "n40")
    ).toDF("k", "rt", "payload")
  }

  private def got(df: DataFrame): Set[(Long, String)] =
    df.select(col("pid"), col("payload")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("matches union+window asofJoin incl. ties, misses, null keys") {
    val expected = got(TemporalJoins.asofJoin(
      leftDf, rightDf, Seq("k"), "t", "rt", Seq("rt", "payload")))
    val bc = TemporalJoins.asofJoinBroadcast(
      leftDf, rightDf, Seq("k"), "t", "rt", Seq("rt", "payload"))
    assert(got(bc) === expected)
    assert(got(bc) === Set((1L, "a90"), (2L, "a200"), (3L, "a200"),
      (4L, null), (5L, null), (6L, "a500"), (7L, "n40")))
  }

  test("null right times dropped; null left times unmatched") {
    import spark.implicits._
    val l = Seq((1L, "a", Some(100L)), (2L, "a", None)).toDF("pid", "k", "t")
    val r = Seq(("a", Some(90L), "ok"), ("a", None, "nullts"))
      .toDF("k", "rt", "payload")
    val bc = TemporalJoins.asofJoinBroadcast(l, r, Seq("k"), "t", "rt",
      Seq("payload"))
    assert(got(bc) === Set((1L, "ok"), (2L, null)))
  }

  test("timestamp time columns and carried timestamp payload") {
    import spark.implicits._
    val l = Seq((1L, "x", 1000L), (2L, "x", 400L))
      .toDF("pid", "k", "tus")
      .withColumn("t", timestamp_micros(col("tus"))).drop("tus")
    val r = Seq(("x", 500L, "x5"), ("x", 900L, "x9"))
      .toDF("k", "rus", "payload")
      .withColumn("rt", timestamp_micros(col("rus"))).drop("rus")
    val bc = TemporalJoins.asofJoinBroadcast(l, r, Seq("k"), "t", "rt",
      Seq("rt", "payload"))
    val out = bc.select(col("pid"), col("payload"),
        unix_micros(col("rt")).as("rtus")).collect()
      .map(x => (x.getLong(0), x.getString(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).toSet
    assert(out === Set((1L, "x9", 900L), (2L, null, -1L)))
  }

  test("plan is exchange-free (left never shuffles)") {
    val bc = TemporalJoins.asofJoinBroadcast(
      leftDf, rightDf, Seq("k"), "t", "rt", Seq("payload"))
    val phys = bc.queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange"), phys)
  }

  test("oversized right side fails fast with a clear message") {
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.asofJoinBroadcast(
        leftDf, rightDf, Seq("k"), "t", "rt", Seq("payload"),
        maxRightRows = 2L)
    }
    assert(e.getMessage.contains("maxRightRows"))
  }

  test("incompatible time units rejected") {
    val l = leftDf.withColumn("t", timestamp_micros(col("t")))
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.asofJoinBroadcast(l, rightDf, Seq("k"), "t", "rt",
        Seq("payload"))
    }
    assert(e.getMessage.contains("incomparable time units"))
  }

  test("large keyspace equals window implementation") {
    import spark.implicits._
    val l = spark.range(2000).select(col("id").as("pid"),
      (col("id") % 37).as("k"), ((col("id") * 13) % 1000).as("t"))
    val r = spark.range(500).select((col("id") % 37).as("k"),
      ((col("id") * 7) % 1000).as("rt"), col("id").as("rid"))
      .groupBy("k", "rt").agg(max("rid").as("rid"))
    def ids(df: DataFrame) = df.select("pid", "rid").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toSet
    val viaWindow = ids(TemporalJoins.asofJoin(l, r, Seq("k"), "t", "rt",
      Seq("rt", "rid")))
    val viaBc = ids(TemporalJoins.asofJoinBroadcast(l, r, Seq("k"), "t",
      "rt", Seq("rt", "rid")))
    assert(viaBc === viaWindow)
  }
}
