package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV ingestion mirroring the reference's scan conventions
  * (SURVEY.md §2.1):
  *
  *  - S1: `scan_csv(infer_schema=False)` — header row, every column
  *    read as string, casts applied explicitly downstream
  *    (reference `delinquent_data_submitters.py:37`);
  *  - S2: custom separator (pipe-delimited statewide extracts,
  *    reference `scorecard.py:32`);
  *  - S4 header-offset: skip leading junk rows before the header
  *    (reference `permit_inspection_licenses.py:19`, header_row=4);
  *  - S9: CSV sink with header.
  *
  * All-string reading is the semantics trap: Spark's inferSchema would
  * guess types per-file (nondeterministic across files); the reference
  * deliberately reads strings and casts per-column. At scale the
  * all-string scan also avoids a second inference pass over the data.
  */
object CsvSources {

  /** All-string CSV scan (header row). Empty fields arrive as null —
    * use Normalize.isBlank for the ''-vs-null distinction the
    * reference cares about.
    */
  def scanCsv(spark: SparkSession, path: String, sep: String = ","): DataFrame =
    spark.read
      .option("header", "true")
      .option("sep", sep)
      .csv(path)

  /** All-string CSV scan skipping `skipRows` physical lines before the
    * header line (Excel-ish exports with title banners).
    */
  def scanCsvSkipRows(spark: SparkSession, path: String, skipRows: Int): DataFrame = {
    val raw = spark.read.text(path)
    // tag physical order cheaply; monotonically_increasing_id preserves
    // file order within a partition and csv text files read in order
    val withIdx = raw.withColumn("__idx", monotonically_increasing_id())
    val header = withIdx.orderBy("__idx").limit(skipRows + 1)
      .orderBy(desc("__idx")).limit(1)
      .collect()(0).getString(0)
    val cols = header.split(",", -1)
    val body = withIdx.filter(col("__idx") > skipRows).drop("__idx")
    val parts = split(col("value"), ",", -1)
    body.select(cols.zipWithIndex.map { case (c, i) =>
      element_at(parts, i + 1).as(c.trim)
    }: _*)
  }

  /** CSV sink with header; coalesce(1) mirrors the reference's
    * single-file outputs (only for small report frames — never
    * coalesce a big frame to 1).
    */
  def writeCsv(df: DataFrame, path: String, sep: String = ",",
      singleFile: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite")
      .option("header", "true")
      .option("sep", sep)
      .csv(path)
  }
}
