package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator query: a Spark DataFrame program plus (when
  * SQL-expressible) an equivalent DuckDB SQL oracle over the same parquet
  * tables. Column names and row order must match the oracle exactly —
  * every computed column is aliased identically on both sides and every
  * query ends in a total ORDER BY so the comparison is deterministic.
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

/** Parquet fixture tables (TESTDATA.md). */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events fixture has shipped `ts` two ways across testdata
    * generations: parquet TIMESTAMP(NANOS) (read nanos-as-long via the
    * legacy conf, then `ts div 1000` — lossless integer division) and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (reads as TIMESTAMP_NTZ).
    * Branch on the resolved type so both land on the same microsecond
    * TimestampType column; the NTZ cast is value-preserving because the
    * session timezone is UTC (asserted at session build).
    */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Collision-free key for per-dataset /tmp sink paths and SQL view
    * names: the dir's digits for readability plus an md5 prefix of the
    * FULL path. The previous digits-only key conflated distinct
    * dataset dirs that share digits (any two `…/sf0.01` copies), so
    * concurrent runs against different dirs raced on the same
    * `mode("overwrite")` sink. Same-dir concurrent runs still share a
    * path by design (same input → same sink).
    */
  def tmpKey(d: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    d.replaceAll("[^0-9]", "") + "_" + digest
  }

  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
