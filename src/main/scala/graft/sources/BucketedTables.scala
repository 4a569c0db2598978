package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed parquet tables: the storage-layout half of the shuffle
  * story. A join or aggregation keyed on the bucket column of two
  * tables bucketed into the SAME number of buckets runs with NO
  * exchange — each task reads matching bucket files from both sides.
  * At the 100 TB scale this is the difference between re-shuffling the
  * fact table on every join and shuffling it once at ingest:
  * dispensation-style fact tables get bucketed by their join key
  * (dea/license/patient id) when first landed, and every downstream
  * report joins bucket-to-bucket.
  *
  * (The reference has no storage layout control at all — Polars
  * single-file scans; this is purely the Spark-scale path.)
  */
object BucketedTables {

  /** Write `df` as a bucketed (optionally sorted) parquet table in the
    * session catalog. Sorting within buckets additionally removes the
    * sort step of a sort-merge join on the bucket+sort key. `path`
    * makes the table external (data at an explicit location instead of
    * the session warehouse directory).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, sortCols: Seq[String] = Nil,
      path: Option[String] = None): Unit = {
    val w0 = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(nBuckets, bucketCol)
    val w1 = path.fold(w0)(p => w0.option("path", p))
    (if (sortCols.nonEmpty) w1.sortBy(sortCols.head, sortCols.tail: _*) else w1)
      .saveAsTable(table)
  }
}
