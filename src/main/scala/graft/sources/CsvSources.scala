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
    *
    * `multiLine` is ON: the WRITER quotes embedded newlines
    * (RFC 4180), but Spark's default reader splits records at raw
    * newlines regardless of quoting, so a `Line\nBreak LLC` name came
    * back as two broken records (adversarial-fixture find — the cast
    * layer then exploded on the quoted tail). The scale cost is real
    * and documented: multiLine parses each FILE as one unsplittable
    * stream (parallelism across files, not within them), which is the
    * price of newline-bearing fields in this format — corpora that
    * need within-file splits should use the parquet/JSONL paths, or
    * guarantee newline-free fields and read with multiLine off.
    */
  def scanCsv(spark: SparkSession, path: String, sep: String = ",",
      multiLine: Boolean = true): DataFrame =
    spark.read
      .option("header", "true")
      .option("sep", sep)
      .option("multiLine", multiLine.toString)
      .csv(path)

  /** RFC-4180 split of ONE line (driver-side, used on the header only):
    * honors double-quoted fields containing the separator and escaped
    * `""` quotes.
    */
  private[sources] def splitCsvLine(line: String, sep: Char): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val ch = line.charAt(i)
      if (inQ) {
        if (ch == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { cur += '"'; i += 1 }
          else inQ = false
        } else cur += ch
      } else {
        if (ch == '"') inQ = true
        else if (ch == sep) { out += cur.result(); cur.clear() }
        else cur += ch
      }
      i += 1
    }
    out += cur.result()
    out.toSeq
  }

  /** All-string CSV scan skipping `skipRows` physical lines before the
    * header line (Excel-ish exports with title banners — a small,
    * manually-supplied single file in the reference, and required to be
    * a SINGLE file here: the banner offset is per-file).
    *
    * The header is parsed with an RFC-4180 splitter and the body goes
    * through Spark's real CSV parser (`from_csv`), so quoted fields
    * containing the separator are safe. Row order: for a single text
    * file, partitions are byte ranges in file order and
    * `monotonically_increasing_id` is (partition << 33) + offset, so
    * ids ascend with file position; the banner+header rows live in the
    * first partition (ids 0..skipRows) for any sane partition size.
    * Known limit: fields with EMBEDDED NEWLINES can't survive any
    * line-oriented skip (use `scanCsv` after stripping the banner
    * upstream if you need multiline fields).
    */
  def scanCsvSkipRows(spark: SparkSession, path: String, skipRows: Int,
      sep: String = ","): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    // the header line is split with sep.head while the body parse gets
    // the full string — a multi-char sep would garble the schema
    // silently (and "" would throw a bare NoSuchElementException)
    require(sep.length == 1,
      s"scanCsvSkipRows supports single-character separators, got '$sep'")
    val raw = spark.read.text(path)
    // The banner offset is per-file: a glob or directory would take the
    // header from whichever file head() reads first and keep every other
    // file's banner rows as data. Fail instead of corrupting silently.
    val files = raw.inputFiles
    require(files.length == 1,
      s"scanCsvSkipRows requires a single file; '$path' resolved to " +
        s"${files.length} files (banner offsets are per-file — read each " +
        "file separately or strip banners upstream)")
    val headLines = raw.head(skipRows + 1)
    require(headLines.length > skipRows,
      s"$path has fewer than ${skipRows + 1} lines — no header at offset $skipRows")
    val cols = splitCsvLine(headLines(skipRows).getString(0), sep.head).map(_.trim)
    val schema = StructType(cols.map(c => StructField(c, StringType)))
    raw
      .withColumn("__idx", monotonically_increasing_id())
      .filter(col("__idx") > skipRows)
      .select(from_csv(col("value"), schema,
        Map("sep" -> sep, "quote" -> "\"", "escape" -> "\"")).as("__r"))
      .select(cols.map(c => col(s"__r.`$c`")): _*)
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
      // the WRITER defaults these to true (the reader defaults them to
      // false) — a '  padded  ' value would be silently trimmed on the
      // way out and the round-trip would no longer reproduce the table
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)
  }
}
