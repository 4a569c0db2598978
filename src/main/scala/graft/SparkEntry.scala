package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query over the TESTDATA.md parquet fixtures, with an equivalent
  * DuckDB oracle SQL where the semantics are ANSI-SQL-expressible.
  */
object SparkEntry {

  /** All registered operator queries, in registration order. */
  val allDefs: Seq[QueryDef] =
    Flagship.defs ++ CoreQueries.defs ++ JoinQueries.defs ++
      AggQueries.defs ++ StringArrayQueries.defs ++ DateMathQueries.defs ++
      ExtQueries.defs ++ EventQueries.defs ++ CsvQueries.defs ++
      AuditQueries.defs ++ AdvancedQueries.defs ++ ScaleQueries.defs ++
      SelectionQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_delinquent")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
