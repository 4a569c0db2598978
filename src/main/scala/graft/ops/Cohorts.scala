package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention: bucket users by the month of their FIRST activity
  * (the cohort), then count how many distinct users of each cohort are
  * active again 0, 1, 2, … months later — the standard retention
  * triangle.
  *
  * Scale shape: two shuffles, both on bounded keys. (1) min-timestamp
  * per user — partial agg combines map-side, so the shuffle carries one
  * row per user per input partition at most; (2) the activity stream
  * re-shuffles on the user key to pick up its cohort month (the agg
  * output is already partitioned on that key, so only the bigger side
  * moves), then count(DISTINCT user) per (cohort, offset) — Spark
  * expands the distinct into a two-level agg that also partially
  * combines. Months are pure integer arithmetic (year*12+month), no
  * date-diff float surface.
  */
object Cohorts {

  /** Retention counts per (cohort_month 'yyyy-MM', month_offset) for
    * offsets in [0, maxOffset]. `tsCol` may be DATE or TIMESTAMP.
    */
  def retention(activity: DataFrame, userCol: String, tsCol: String,
      maxOffset: Int): DataFrame = {
    require(maxOffset >= 0, s"maxOffset=$maxOffset must be >= 0")
    val monthIdx = (year(col(tsCol)) * 12 + month(col(tsCol)) - 1).cast("int")
    val firsts = activity
      .groupBy(col(userCol))
      .agg(min(monthIdx).as("__cohort_idx"))
    activity
      .select(col(userCol), monthIdx.as("__m"))
      .join(firsts, Seq(userCol))
      .withColumn("month_offset", (col("__m") - col("__cohort_idx")).cast("int"))
      .filter(col("month_offset") <= maxOffset)
      .groupBy(
        concat_ws("-",
          format_string("%04d", (col("__cohort_idx") / 12).cast("int")),
          format_string("%02d", pmod(col("__cohort_idx"), lit(12)) + 1))
          .as("cohort_month"),
        col("month_offset"))
      .agg(count_distinct(col(userCol)).cast("long").as("n_users"))
  }

  /** Recency-decayed activity score per key: each event contributes
    * `1e6 / 2^(age_days div halfLifeDays)` ppm — a step-wise
    * exponential half-life decay, the recency-weighted popularity /
    * feature primitive. Weights are EXACT integers (ppm DIV a power of
    * two), so the score is order-, partitioning-, and engine-portable
    * — no float summation surface. Events after `asOf` clamp to age 0.
    *
    * Scale shape: the weight is a map-side projection; the only
    * shuffle is the partially-aggregated groupBy(key) — one row per
    * key per map partition on the wire.
    */
  def decayScore(events: DataFrame, keyCol: String, tsCol: String,
      asOf: String, halfLifeDays: Int): DataFrame = {
    require(halfLifeDays >= 1, s"halfLifeDays=$halfLifeDays must be >= 1")
    // 2^k overflows past k=62; ages beyond 62 half-lives score 0 ppm
    // anyway, so clamp the exponent instead of overflowing
    val k = expr(
      s"least(greatest(datediff(DATE'$asOf', to_date($tsCol)), 0) " +
        s"DIV $halfLifeDays, 62L)")
    events
      .withColumn("__k", k)
      .withColumn("__w", expr("1000000L DIV CAST(power(2, __k) AS BIGINT)"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("__w")).cast("long").as("score_ppm"))
  }
}
