package graft

import org.apache.spark.sql.SparkSession

/** Scale linter over the registered query surface: builds every named
  * query (no execution beyond what the builder itself forces) and runs
  * [[graft.ops.PlanLint]] on its prepared physical plan, printing one
  * line per finding. AllPlansLintSpec is the pinned form of this sweep
  * (findings must match the documented allowlist); this main is the
  * iteration tool — run it after adding a query to see what the linter
  * thinks before the spec tells you.
  *
  * Usage: runMain graft.Lint <sfDir> [queryName ...]
  */
object Lint {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq
      else SparkEntry.allDefs.map(_.name)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var clean = 0
    names.foreach { n =>
      try {
        val findings = graft.ops.PlanLint.lint(
          SparkEntry.queries(n)(spark, sfDir))
        if (findings.isEmpty) clean += 1
        else findings.foreach(f => println(s"$n\t$f"))
      } catch {
        case e: Throwable => println(s"$n\tLINT_ERROR\t${e.getMessage}")
      }
      graft.ops.StageCache.releaseAll()
      spark.catalog.clearCache()
    }
    println(s"\n${names.size} queries linted, $clean clean")
    spark.stop()
  }
}
