package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines source/sink — the interchange format of large text
  * corpora (one JSON object per line, newline-delimited; what C4/
  * RefinedWeb-style dumps ship as). Not a reference format (SURVEY
  * §2.1 scopes the reference's connectors out); this is part of the
  * LLM-pipeline extension surface.
  *
  * Schema is EXPLICIT on scan: Spark's JSON inference is a full extra
  * pass over the data (absurd at 100 TB) and infers per-run (a field
  * that is null in today's sample changes type tomorrow). Embedded
  * newlines/quotes in text fields are safe — the JSON writer escapes
  * them, so one record per physical line holds by construction.
  */
object JsonSources {

  /** JSON-lines scan with a caller-supplied schema. Fields absent in a
    * record arrive as null; malformed lines fail the job (FAILFAST)
    * rather than silently dropping corpus rows — at pipeline scale a
    * bad shard should page someone, not shrink the dataset.
    */
  def scanJsonl(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  /** JSON-lines sink; `singleFile` mirrors CsvSources.writeCsv (small
    * report frames only — a corpus shard set should keep its
    * partitioning).
    */
  def writeJsonl(df: DataFrame, path: String,
      singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").json(path)
  }
}
