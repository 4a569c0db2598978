package graft.sources

import org.apache.spark.sql.SparkSession

/** Input-freshness guard (reference `files.warn_file_age`, called
  * before every manually-downloaded input read — e.g.
  * `delinquent_data_submitters.py:481-487`, `techs.py:16`,
  * `pharmacy_deas_not_in_mp.py:10`): the reference pipelines run on
  * hand-exported CSVs, and the classic operational failure is running
  * this week's report on last week's download. Driver-side ops
  * tooling, not a relational operator — no query registration; the
  * age check goes through the Hadoop FileSystem so the same call
  * works on local files, HDFS, or an object store (where a "file" is
  * the newest object under the prefix).
  */
object Freshness {

  /** Age report for a path: modification time of the path itself, or
    * of the NEWEST file beneath it for a directory (a parquet/CSV
    * sink directory is as fresh as its last-written part).
    */
  final case class FileAge(path: String, ageMillis: Long, stale: Boolean)

  def fileAge(spark: SparkSession, path: String,
      maxAgeMillis: Long, nowMillis: Long = System.currentTimeMillis())
      : FileAge = {
    require(maxAgeMillis >= 0, s"maxAgeMillis=$maxAgeMillis must be >= 0")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val status = fs.getFileStatus(p) // throws FileNotFoundException: a
    // MISSING input is a hard error, not a warning
    val mtime =
      if (!status.isDirectory) status.getModificationTime
      else {
        // newest FILE beneath the directory, never the directory's own
        // mtime: deleting/renaming a stray temp file bumps the dir
        // mtime, which would make 10-day-old data look fresh — the
        // exact failure this guard exists to catch. An EMPTY directory
        // is maximally stale (age = now), not fresh.
        val it = fs.listFiles(p, true)
        var newest = Long.MinValue
        while (it.hasNext) {
          val f = it.next()
          if (f.getModificationTime > newest) newest = f.getModificationTime
        }
        if (newest == Long.MinValue) 0L else newest
      }
    val age = math.max(0L, nowMillis - mtime)
    FileAge(path, age, stale = age > maxAgeMillis)
  }

  /** The reference call shape: check, warn on stderr when stale
    * (default threshold: 1 day — "did you download this today?"),
    * return the report so callers can gate harder.
    */
  def warnFileAge(spark: SparkSession, path: String,
      maxAgeMillis: Long = 24L * 60 * 60 * 1000): FileAge = {
    val r = fileAge(spark, path, maxAgeMillis)
    if (r.stale) {
      val hours = r.ageMillis / (60 * 60 * 1000.0)
      System.err.println(
        f"[freshness] WARNING: $path is $hours%.1f hours old " +
          f"(threshold ${maxAgeMillis / (60 * 60 * 1000.0)}%.1f h) — stale input?")
    }
    r
  }
}
