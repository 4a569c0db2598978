package graft.plans

import graft.SparkTestBase
import graft.ops.TemporalJoins
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Native as-of join (AsOfJoinPlan/Strategy/Exec): answer pinned
  * equal to the union+window asofJoin on every edge case that
  * implementation documents, plan pinned to the custom physical
  * operator with one exchange per side and no window/union.
  */
class AsOfJoinNativeSpec extends SparkTestBase {

  private def leftDf: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "a", 100L), (2L, "a", 200L), (3L, "a", 200L), // tie with right
      (4L, "b", 50L),  // before any right row
      (5L, "c", 100L), // key with no right rows at all
      (6L, "a", 1000L),
      (7L, null.asInstanceOf[String], 100L) // null key
    ).toDF("pid", "k", "t")
  }

  private def rightDf: DataFrame = {
    import spark.implicits._
    Seq(
      ("a", 90L, "a90"), ("a", 200L, "a200"), ("a", 500L, "a500"),
      ("b", 60L, "b60"),
      (null.asInstanceOf[String], 40L, "n40")
    ).toDF("k2", "rt", "payload")
  }

  private def run(f: (DataFrame, DataFrame) => DataFrame): Set[(Long, String)] =
    f(leftDf, rightDf)
      .select(col("pid"), col("payload"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("matches union+window asofJoin on ties, misses, null keys") {
    def viaWindow(l: DataFrame, r: DataFrame) =
      TemporalJoins.asofJoin(
        l, r.withColumnRenamed("k2", "k"), Seq("k"), "t", "rt",
        Seq("rt", "payload"))
    def viaNative(l: DataFrame, r: DataFrame) =
      TemporalJoins.asofJoinNative(
        l, r.withColumnRenamed("k2", "k"), Seq("k"), "t", "rt",
        Seq("rt", "payload"))
    val expected = run(viaWindow)
    val got = run(viaNative)
    assert(got === expected)
    // and the documented semantics hold explicitly
    assert(got === Set(
      (1L, "a90"), (2L, "a200"), (3L, "a200"), (4L, null), (5L, null),
      (6L, "a500"), (7L, "n40"))) // null keys group (window convention)
  }

  test("null right times match nothing; null left times get no match") {
    import spark.implicits._
    val l = Seq((1L, "a", Some(100L)), (2L, "a", None)).toDF("pid", "k", "t")
    val r = Seq(("a", Some(90L), "ok"), ("a", None, "nullts"))
      .toDF("k", "rt", "payload")
    val expected = TemporalJoins.asofJoin(l, r, Seq("k"), "t", "rt",
        Seq("payload")).select("pid", "payload").collect()
      .map(x => (x.getLong(0), x.getString(1))).toSet
    val got = TemporalJoins.asofJoinNative(l, r, Seq("k"), "t", "rt",
        Seq("payload")).select("pid", "payload").collect()
      .map(x => (x.getLong(0), x.getString(1))).toSet
    assert(got === expected)
    assert(got === Set((1L, "ok"), (2L, null)))
  }

  test("timestamp-typed time column and multi-key grouping") {
    import spark.implicits._
    val l = Seq((1L, "x", 1, 1000L), (2L, "x", 2, 1000L), (3L, "y", 1, 1000L))
      .toDF("pid", "k1", "k2", "tus")
      .withColumn("t", timestamp_micros(col("tus"))).drop("tus")
    val r = Seq(("x", 1, 500L, "x1"), ("x", 2, 1500L, "x2late"),
        ("y", 1, 1000L, "y1"))
      .toDF("k1", "k2", "rus", "payload")
      .withColumn("rt", timestamp_micros(col("rus"))).drop("rus")
    val got = TemporalJoins.asofJoinNative(l, r, Seq("k1", "k2"), "t", "rt",
        Seq("payload")).select("pid", "payload").collect()
      .map(x => (x.getLong(0), x.getString(1))).toSet
    assert(got === Set((1L, "x1"), (2L, null), (3L, "y1")))
  }

  test("plan: AsOfJoinExec with one exchange per side, no window/union") {
    val df = TemporalJoins.asofJoinNative(
      leftDf, rightDf.withColumnRenamed("k2", "k"), Seq("k"), "t", "rt",
      Seq("payload"))
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("AsOfJoin"), phys)
    assert(!phys.contains("Window") && !phys.contains("Union"), phys)
    assert("Exchange".r.findAllIn(phys).size === 2, phys)
  }

  test("whole-stage codegen engages (starred operator, results identical)") {
    // a '*(n) AsOfJoin' line means CollapseCodegenStages accepted the
    // operator AND the generated code compiled (Spark silently falls
    // back to doExecute otherwise — this pin turns that silence into
    // a failure); the result assertion reruns an edge-case answer
    // through the fused path
    val df = TemporalJoins.asofJoinNative(
      leftDf, rightDf.withColumnRenamed("k2", "k"), Seq("k"), "t", "rt",
      Seq("payload"))
    val sel = df.select(col("pid"), col("payload"))
    val got = sel.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set(
      (1L, "a90"), (2L, "a200"), (3L, "a200"), (4L, null), (5L, null),
      (6L, "a500"), (7L, "n40")))
    // AQE finalizes the plan only at execution — inspect AFTER collect,
    // on the executed Dataset itself
    val phys = sel.queryExecution.executedPlan.toString
    assert(phys.linesIterator.exists(l =>
      l.contains("*(") && l.contains("AsOfJoin")), phys)
  }

  test("self-join on the same relation gets distinct attribute ids") {
    import spark.implicits._
    val ev = Seq((1L, "a", 100L, "p"), (2L, "a", 90L, "c"),
      (3L, "a", 95L, "c"), (4L, "b", 10L, "p"))
      .toDF("id", "k", "t", "kind")
    val l = ev.filter(col("kind") === "p").select("id", "k", "t")
    val r = ev.filter(col("kind") === "c")
      .select(col("k"), col("t").as("rt"), col("id").as("rid"))
    val got = TemporalJoins.asofJoinNative(l, r, Seq("k"), "t", "rt",
        Seq("rid")).select("id", "rid").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toSet
    assert(got === Set((1L, 3L), (4L, -1L)))
  }

  test("forward direction: earliest right at-or-after, ties inclusive") {
    val got = run((l, r) => TemporalJoins.asofJoinNative(
      l, r.withColumnRenamed("k2", "k"), Seq("k"), "t", "rt",
      Seq("rt", "payload"), direction = "forward"))
    assert(got === Set(
      (1L, "a200"), // earliest a >= 100
      (2L, "a200"), (3L, "a200"), // tie at 200 matches inclusively
      (4L, "b60"), // 60 >= 50
      (5L, null), // no c rows
      (6L, null), // nothing at-or-after 1000
      (7L, null))) // null-key right row is at 40 < 100
  }

  test("forward direction on timestamp-typed time columns") {
    import spark.implicits._
    val l = Seq((1L, "x", 100L), (2L, "x", 700L)).toDF("pid", "k", "tus")
      .withColumn("t", timestamp_micros(col("tus"))).drop("tus")
    val r = Seq(("x", 500L, "x5"), ("x", 900L, "x9"))
      .toDF("k", "rus", "payload")
      .withColumn("rt", timestamp_micros(col("rus"))).drop("rus")
    val got = TemporalJoins.asofJoinNative(l, r, Seq("k"), "t", "rt",
        Seq("payload"), direction = "forward")
      .select("pid", "payload").collect()
      .map(x => (x.getLong(0), x.getString(1))).toSet
    assert(got === Set((1L, "x5"), (2L, "x9")))
  }

  test("large keyspace round-trip equals window implementation") {
    import spark.implicits._
    val l = spark.range(2000).select(col("id").as("pid"),
      (col("id") % 37).as("k"), ((col("id") * 13) % 1000).as("t"))
    val r = spark.range(500).select((col("id") % 37).as("k"),
      ((col("id") * 7) % 1000).as("rt"), col("id").as("rid"))
      // asofJoin contract: right unique per (key, time)
      .groupBy("k", "rt").agg(max("rid").as("rid"))
    val viaWindow = TemporalJoins.asofJoin(l, r, Seq("k"), "t", "rt",
        Seq("rt", "rid")).select("pid", "rid").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toSet
    val viaNative = TemporalJoins.asofJoinNative(l, r, Seq("k"), "t", "rt",
        Seq("rt", "rid")).select("pid", "rid").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toSet
    assert(viaNative === viaWindow)
  }

  test("mismatched key/time types across sides fail fast, not silently") {
    import spark.implicits._
    // int key vs string key: the raw UnsafeRow orderings would compare
    // garbage — must raise a clear error instead
    val l = Seq((1L, 1, 100L)).toDF("pid", "k", "t")
    val rStrKey = Seq(("1", 90L, "p")).toDF("k2", "rt", "payload")
    val e1 = intercept[IllegalArgumentException] {
      TemporalJoins.asofJoinNative(l, rStrKey.withColumnRenamed("k2", "k"),
        Seq("k"), "t", "rt", Seq("payload"))
    }
    assert(e1.getMessage.contains("type mismatch"), e1.getMessage)
    // long left time vs timestamp right time
    val rTsTime = Seq((1, "p")).toDF("k", "payload")
      .withColumn("rt", timestamp_micros(lit(90L)))
    val e2 = intercept[IllegalArgumentException] {
      TemporalJoins.asofJoinNative(l, rTsTime,
        Seq("k"), "t", "rt", Seq("payload"))
    }
    assert(e2.getMessage.contains("time type mismatch"), e2.getMessage)
  }
}
