package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed column profiling — the data-quality screen every ingest
  * runs before data enters the corpus: per-column null count, exact
  * distinct count, and (string-truncated) min/max.
  *
  * One pass over the data: all per-column aggregates run in a single
  * `agg` (Spark plans the multi-distinct via Expand — n_cols× row
  * amplification pre-shuffle, but each expanded row is one column's
  * value, so the shuffle carries ≈ the table's cell count, partially
  * aggregated). The 1-row result is exploded to a (column, stats) long
  * format on the driver side of the plan — zero extra jobs.
  *
  * Values are profiled as 16-char string prefixes: bounds a profile
  * row to O(1) regardless of document size (profiling 100 TB of text
  * must not carry documents into the agg), and keeps min/max
  * deterministic and engine-portable (lexicographic on the truncation,
  * same on both engines).
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      val s = substring(col(c).cast("string"), 1, 16)
      Seq(
        sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(s).as(s"${c}__min"),
        max(s).as(s"${c}__max"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"),
          col(s"${c}__nulls").as("n_nulls"),
          col(s"${c}__nd").as("n_distinct"),
          col(s"${c}__min").as("min_v"),
          col(s"${c}__max").as("max_v"))): _*)).as("s"))
      .select("s.*")
      .orderBy("col_name")
  }
}
