package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Unit pins for [[PlanLint]]: each rule must FIRE on a constructed
  * bad plan and STAY QUIET on the corresponding safe shape, so the
  * all-queries sweep (AllPlansLintSpec) is known to be testing
  * something.
  */
class PlanLintSpec extends SparkTestBase {
  import spark.implicits._

  private def findings(df: org.apache.spark.sql.DataFrame): Set[String] =
    PlanLint.lint(df).map(_.rule).toSet

  test("cross_product fires on a real cross join, not on scalar re-injection") {
    val a = (1 to 10).toDF("x")
    val b = (1 to 10).toDF("y")
    assert(findings(a.crossJoin(b)).contains("cross_product"))
    // scalar re-inject: crossJoin with a 1-row global aggregate
    val scalar = b.agg(sum($"y").as("tot"))
    assert(!findings(a.crossJoin(scalar)).contains("cross_product"))
    // J8 shape: a cross join of two scalar frames is also safe
    val scalar2 = b.agg(max($"y").as("m"))
    assert(findings(scalar.crossJoin(scalar2)).isEmpty)
  }

  test("global_window fires on a raw-table window, not over an aggregate") {
    val df = (1 to 100).map(i => (i % 7, i)).toDF("k", "v")
    val raw = df.withColumn("rn", row_number().over(Window.orderBy($"v")))
    assert(findings(raw).contains("global_window"))
    // the histogram pattern: global window over aggregated input
    val hist = df.groupBy($"k").agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(Window.orderBy($"n")))
    assert(!findings(hist).contains("global_window"))
    // keyed window over raw input is fine
    val keyed = df.withColumn("rn",
      row_number().over(Window.partitionBy($"k").orderBy($"v")))
    assert(!findings(keyed).contains("global_window"))
  }

  test("single_partition_no_combine fires on a raw funnel, not a scalar agg") {
    val df = (1 to 100).map(i => (i % 7, i)).toDF("k", "v")
    // the raw global window funnels every row through one partition
    val raw = df.withColumn("rn", row_number().over(Window.orderBy($"v")))
    assert(findings(raw).contains("single_partition_no_combine"))
    // a scalar aggregate's single-partition exchange carries one
    // partial row per upstream partition — map-side combined, safe
    assert(!findings(df.agg(sum($"v").as("s")))
      .contains("single_partition_no_combine"))
  }

  test("subquery plans are linted too") {
    val big = (1 to 100).map(i => (i % 7, i)).toDF("k", "v")
    big.createOrReplaceTempView("lint_big")
    // scalar subquery is safe (aggregate below its exchange)
    val ok = spark.sql(
      "SELECT k FROM lint_big WHERE v > (SELECT avg(v) FROM lint_big)")
    assert(!findings(ok).contains("single_partition_no_combine"))
  }
}
