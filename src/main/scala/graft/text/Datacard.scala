package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Relational, StageCache}

/** Per-source corpus datacard — the one-page report a dataset release
  * ships (docs, token/char volume, language mix, exact-duplicate rate,
  * median length per source). Everything is integer-exact: rates are
  * `1e6 * part DIV whole` ppm, the median is the lower-median rank
  * pick from the per-source length histogram.
  *
  * Scale shape: one pass computes the per-doc features map-side
  * (token count, md5 digest), then two source-keyed aggregations ride
  * it — the main rollup (count/sum/distinct, map-side combined) and
  * the length histogram that feeds the median pick. The feature frame
  * is persisted so the text is scanned and tokenized once; windows run
  * over histogram rows (≤ sources × length domain), never raw docs.
  */
object Datacard {

  def report(docs: DataFrame, sourceCol: String = "source"): DataFrame = {
    val base = StageCache.persisted(docs.select(
      col(sourceCol).as("source"), col("lang"), col("n_chars"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("__toks"),
      md5(col("text")).as("__digest")))
    val agg = base.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("__toks").cast("long").as("n_tokens"),
      sum("n_chars").cast("long").as("sum_chars"),
      countDistinct("lang").cast("long").as("n_langs"),
      sum(when(col("lang") === "en", lit(1L)).otherwise(lit(0L))).as("__en"),
      countDistinct("__digest").as("__uniq"))
      .withColumn("en_ppm",
        expr("CAST((1000000 * __en) DIV n_docs AS BIGINT)"))
      .withColumn("dup_ppm",
        expr("CAST((1000000 * (n_docs - __uniq)) DIV n_docs AS BIGINT)"))
    val med = Relational.groupedMedian(
      base.select("source", "n_chars"), "source", "n_chars")
      .withColumnRenamed("median", "p50_chars")
    agg.join(med, Seq("source"))
      .select("source", "n_docs", "n_tokens", "sum_chars", "p50_chars",
        "n_langs", "en_ppm", "dup_ppm")
  }
}
