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

  /** Benford's-law first-digit ppm, rounded: log10(1 + 1/d) · 1e6.
    * Hardcoded so the expectation is an integer literal on every
    * engine — no log10 float surface in the comparison.
    */
  val benfordPpm: Map[Int, Long] = Map(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** Benford leading-digit audit over a positive BIGINT amount column
    * (pass money as integer cents — a double's string form is not
    * engine-portable, an integer's is). Returns one row per digit 1-9
    * with observed count, observed ppm (integer DIV), the Benford
    * expectation, and the signed deviation — the standard
    * fabricated-data / corrupted-feed screen.
    *
    * Scale shape: leading digit is a map-side projection; the groupBy
    * collapses to ≤ 9 partially-aggregated rows, and the total is a
    * window over those 9 rows — nothing data-sized crosses the wire
    * twice.
    */
  def benford(df: DataFrame, amount: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val expMap = typedLit(benfordPpm)
    // drop non-positive amounts BEFORE the digit cast: ANSI mode
    // throws casting a leading '-', and 0 has no Benford digit
    val counts = df.filter(amount > 0)
      .select(substring(amount.cast("string"), 1, 1).cast("int").as("digit"))
      .filter(col("digit").between(1, 9))
      .groupBy("digit")
      .agg(count(lit(1)).as("n"))
    // join against a full 1-9 digit spine: a digit with ZERO
    // observations is exactly the strongest fabricated-data signal
    // (its dev_ppm is the largest deviation in the table), and a
    // groupBy alone would silently omit that row — a downstream
    // abs(dev_ppm) screen would see nothing wrong
    val spine = df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    spine.join(counts, Seq("digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("__total", sum(col("n")).over(Window.partitionBy()))
      .withColumn("obs_ppm",
        expr("CASE WHEN __total = 0 THEN 0L ELSE n * 1000000L DIV __total END"))
      .withColumn("exp_ppm", element_at(expMap, col("digit")))
      .withColumn("dev_ppm", col("obs_ppm") - col("exp_ppm"))
      .drop("__total")
      .orderBy("digit")
  }
}
