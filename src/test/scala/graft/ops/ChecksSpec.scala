package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ChecksSpec extends SparkTestBase {
  import spark.implicits._

  private def byName(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap

  test("row predicates count violating rows; NULL predicate rows pass") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "ok"), (2L, ""), (3L, null), (4L, "ok"))
      .toDF("id", "s")
    val got = byName(Checks.report(df, Seq(
      Checks.Check("s_nonempty", length(col("s")) === 0), // null s -> NULL -> pass
      Checks.Check("s_nonempty_strict",
        coalesce(length(col("s")) === 0, lit(true))))))
    assert(got("s_nonempty") === ((1L, false)))
    assert(got("s_nonempty_strict") === ((2L, false)))
  }

  test("primary key: duplicates AND null keys count as violations") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (1L, "b"), (2L, "c"), (null, "d"), (null, "e"))
      .toDF("id", "s")
    val got = byName(Checks.report(df, Nil,
      primaryKey = Some(("id_pk", Seq("id")))))
    // 5 rows, 2 distinct non-null keys -> 3 violations (1 dup + 2 null)
    assert(got("id_pk") === ((3L, false)))
  }

  test("multi-column key: any-null row and duplicated pair both count") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (1L, "a"), (1L, "b"), (2L, null))
      .toDF("k1", "k2")
    val got = byName(Checks.report(df, Nil,
      primaryKey = Some(("pk", Seq("k1", "k2")))))
    assert(got("pk") === ((2L, false)))
  }

  test("empty table: every check passes with 0 violations, not null") {
    val df = Seq.empty[(Long, String)].toDF("id", "s")
    val got = byName(Checks.report(df, Seq(
        Checks.Check("always", lit(true))),
      primaryKey = Some(("id_pk", Seq("id")))))
    assert(got("always") === ((0L, true)))
    assert(got("id_pk") === ((0L, true)))
  }

  test("one fused pass: a multi-check report plans a single scan of the input") {
    val df = spark.range(100).withColumn("s", concat(lit("v"), col("id")))
    val rep = Checks.report(df, Seq(
      Checks.Check("a", col("id") < 0),
      Checks.Check("b", length(col("s")) === 0),
      Checks.Check("c", col("id") > 1000)))
    val scans = rep.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Range (0, 100"))
    assert(scans === 1, "each check must NOT re-scan the input")
  }

  test("duplicate check names are rejected") {
    val df = Seq((1L, "x")).toDF("id", "s")
    intercept[IllegalArgumentException] {
      Checks.report(df, Seq(
        Checks.Check("dup", lit(false)), Checks.Check("dup", lit(true))))
    }
  }

  test("requirePass: silent when green, throws naming every failing check") {
    val df = Seq((1L, "a"), (1L, "b"), (2L, "")).toDF("id", "s")
    Checks.requirePass(df, Seq(Checks.Check("never", lit(false))))
    val e = intercept[IllegalStateException] {
      Checks.requirePass(df, Seq(
        Checks.Check("s_nonempty", length(col("s")) === 0),
        Checks.Check("fine", lit(false))),
        primaryKey = Some(("id_pk", Seq("id"))))
    }
    assert(e.getMessage.contains("s_nonempty (1 violations)"))
    assert(e.getMessage.contains("id_pk (1 violations)"))
    assert(!e.getMessage.contains("fine"))
  }
}
