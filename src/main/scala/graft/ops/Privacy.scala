package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy screens for training-data release: k-anonymity over a set of
  * quasi-identifier columns. A row is k-anonymous when at least `k`
  * rows share its full quasi-identifier combination; groups below `k`
  * are re-identification risks and get suppressed (or generalized by
  * the caller coarsening the quasi-ids and re-running).
  *
  * Scale shape: both entry points cost exactly ONE hash shuffle on the
  * quasi-identifier key. `suppress` uses a window count rather than an
  * agg + self-join so the data moves once; the report is a partial-agg
  * tree over the grouped counts (map-side combine, tiny final stage).
  * Complements the PII scrub in [[graft.text.TextAnalysis.scrubPii]]:
  * scrubbing removes direct identifiers, this bounds linkage risk from
  * the quasi-identifiers that remain.
  */
object Privacy {

  /** Rows whose quasi-identifier group has >= k members (the released
    * subset). One shuffle: window count over the quasi-id partition.
    */
  def suppress(df: DataFrame, quasiIds: Seq[String], k: Int): DataFrame = {
    require(quasiIds.nonEmpty,
      "suppress with no quasi-identifier columns degenerates to ONE " +
        "global group — a privacy screen that passes everything; a " +
        "misconfigured column list must fail loudly")
    require(k >= 1, s"k=$k must be >= 1")
    require(!df.columns.contains("__n"),
      "suppress uses a temp __n count column; input already has one")
    val w = Window.partitionBy(quasiIds.map(col): _*)
    df.withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n") >= k)
      .drop("__n")
  }

  /** One-row k-anonymity report: group count, unsafe-group count,
    * suppressed-row count, and the suppression rate in basis points
    * (integer — engine-portable, no float summing).
    */
  def report(df: DataFrame, quasiIds: Seq[String], k: Int): DataFrame = {
    require(quasiIds.nonEmpty,
      "report with no quasi-identifier columns checks nothing — " +
        "one global group always reports safe; fail loudly instead")
    require(k >= 1, s"k=$k must be >= 1")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(
        count(lit(1)).cast("long").as("n_groups"),
        sum(when(col("__n") < k, 1L).otherwise(0L)).cast("long")
          .as("n_unsafe_groups"),
        sum(when(col("__n") < k, col("__n")).otherwise(0L)).cast("long")
          .as("n_suppressed_rows"),
        sum(col("__n")).cast("long").as("n_rows"))
      .select(col("n_groups"), col("n_unsafe_groups"),
        col("n_suppressed_rows"),
        floor(col("n_suppressed_rows") * 10000.0 / col("n_rows") + 0.5)
          .cast("long").as("suppressed_bp"))
  }
}
