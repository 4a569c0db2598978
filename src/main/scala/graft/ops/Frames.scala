package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frame-diff utilities (SURVEY.md §2.14): the engine-side equivalent of
  * the reference's `df_compare` + check_masked month-over-month audit
  * (reference check_masked.py:48-75). `dfCompare` is schema-level (no
  * jobs when `colOnly`); `maskedDiff` is the full drift report as ONE
  * distributed query — two scalar aggregates cross-joined, so the audit
  * of two 100 TB extracts is two scans and no shuffle wider than a
  * partial-agg tree.
  */
object Frames {

  /** Structural diff of two frames. `rowsA`/`rowsB` are populated only
    * when counting was requested (dfCompare(colOnly = false)).
    */
  final case class FrameDiff(
      onlyInA: Seq[String],
      onlyInB: Seq[String],
      dtypeDiffs: Seq[(String, String, String)],
      rowsA: Option[Long],
      rowsB: Option[Long]) {
    def columnsEqual: Boolean = onlyInA.isEmpty && onlyInB.isEmpty
    def schemaEqual: Boolean = columnsEqual && dtypeDiffs.isEmpty
    def pctChange: Option[Double] =
      for { a <- rowsA; b <- rowsB if b != 0L }
        yield ((a - b).toDouble / b) * 100
    def report: String = {
      val sb = new StringBuilder
      if (onlyInA.nonEmpty) sb ++= s"columns only in a: ${onlyInA.mkString(", ")}\n"
      if (onlyInB.nonEmpty) sb ++= s"columns only in b: ${onlyInB.mkString(", ")}\n"
      dtypeDiffs.foreach { case (c, ta, tb) => sb ++= s"dtype differs for $c: a=$ta b=$tb\n" }
      (rowsA, rowsB) match {
        case (Some(a), Some(b)) =>
          sb ++= s"row counts: a=$a b=$b"
          pctChange.foreach(p => sb ++= f" (${p}%.2f%% change)")
          sb ++= "\n"
        case _ => ()
      }
      if (sb.isEmpty) "frames are structurally equal" else sb.result().trim
    }
  }

  /** Compare two frames structurally (reference df_compare usage at
    * check_masked.py:48: `df_compare(mask, prev, col_only=True)`).
    * With `colOnly` no Spark job runs — pure schema comparison; without
    * it both frames are counted (two jobs, no collect of data).
    */
  def dfCompare(a: DataFrame, b: DataFrame, colOnly: Boolean = true): FrameDiff = {
    val aCols = a.columns.toSeq
    val bCols = b.columns.toSet
    val aSet = aCols.toSet
    val shared = aCols.filter(bCols)
    val aTypes = a.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val bTypes = b.schema.map(f => f.name -> f.dataType.simpleString).toMap
    FrameDiff(
      onlyInA = aCols.filterNot(bCols),
      onlyInB = b.columns.toSeq.filterNot(aSet),
      dtypeDiffs = shared.flatMap { c =>
        val (ta, tb) = (aTypes(c), bTypes(c))
        if (ta == tb) None else Some((c, ta, tb))
      },
      rowsA = if (colOnly) None else Some(a.count()),
      rowsB = if (colOnly) None else Some(b.count()))
  }

  /** The check_masked drift report (check_masked.py:52-72) as one
    * 1-row frame: current/previous row counts, percent change (2 dp,
    * same op order as the reference: `((cur - prev) / prev) * 100`),
    * and the min/max of the current extract's date column.
    */
  def maskedDiff(cur: DataFrame, prev: DataFrame, dateCol: String): DataFrame = {
    val c = cur.agg(
      count(lit(1)).as("n_cur"),
      min(col(dateCol)).cast("string").as("min_date"),
      max(col(dateCol)).cast("string").as("max_date"))
    val p = prev.agg(count(lit(1)).as("n_prev"))
    // Guard the empty-previous-extract case (same Option semantics as
    // FrameDiff.pctChange): a null pct_change is the audit signal, not
    // a double-division Infinity that diverges between engines.
    c.crossJoin(p).select(
      col("n_cur"), col("n_prev"),
      when(col("n_prev") =!= 0,
        round(((col("n_cur").cast("double") - col("n_prev")) / col("n_prev")) * 100, 2))
        .as("pct_change"),
      col("min_date"), col("max_date"))
  }

  /** SCD2 history collapse (gaps-and-islands): turn per-version
    * snapshot rows `(keys…, attrs…, version)` into effective-dated
    * history `(keys…, attrs…, valid_from, valid_to, is_current)` —
    * consecutive versions with unchanged attrs collapse into one
    * validity interval; any attr change opens a new one. The standard
    * warehouse shape for "what did this dimension row look like as of
    * version v" without storing every snapshot.
    *
    * Change detection is null-safe (`<=>` over the attr struct — a
    * null attr value is a value, matching SQL IS DISTINCT FROM), so
    * nullable attrs are handled. (key, version) pairs must be unique;
    * versions need not be contiguous — ordering is by version rank,
    * so an absent snapshot simply doesn't advance history. Rows with a
    * NULL version are DROPPED: an effective-dating without a date is
    * meaningless, and letting it through would also make the history
    * engine-dependent (Spark windows order ASC NULLS FIRST, other
    * engines NULLS LAST — the adversarial gate caught exactly that
    * divergence through a null order date).
    *
    * Scale shape: one key-partitioned window pass over the snapshots
    * (change flag + running island id, SAME window spec so one
    * shuffle + sort serves both), then a keyed aggregate that reuses
    * that partitioning; the is_current window runs over collapsed
    * intervals only. No joins, nothing driver-side.
    */
  def scd2(df: DataFrame, keyCols: Seq[String], attrCols: Seq[String],
      versionCol: String): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty,
      "scd2 needs at least one key column and one attr column")
    Seq("__chg", "__run", "valid_from", "valid_to", "is_current").foreach(c =>
      require(!df.columns.contains(c),
        s"scd2 appends a '$c' column; input already has one"))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol))
    val attrs = struct(attrCols.map(col): _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val collapsed = df
      .filter(col(versionCol).isNotNull)
      .withColumn("__chg",
        when(lag(attrs, 1).over(w) <=> attrs, lit(0)).otherwise(lit(1)))
      .withColumn("__run", sum(col("__chg")).over(wRun))
      .groupBy(((keyCols ++ attrCols).map(col) :+ col("__run")): _*)
      .agg(min(col(versionCol)).as("valid_from"),
        max(col(versionCol)).as("valid_to"))
    val wKey = Window.partitionBy(keyCols.map(col): _*)
    collapsed
      .withColumn("is_current",
        col("valid_to") === max(col("valid_to")).over(wKey))
      .select(((keyCols ++ attrCols).map(col) :+ col("valid_from") :+
        col("valid_to") :+ col("is_current")): _*)
  }

  /** Order-independent whole-table fingerprint — the anti-entropy
    * primitive for comparing a table across clusters / replication
    * paths / reruns WITHOUT moving the data: ship three BIGINTs, not
    * 100 TB. Per row: poly_hash(md5(concat_ws('|', cols))) — md5
    * narrows any row to a fixed 32-char surface, the polynomial fold
    * maps it into [0, 1e9+7). Aggregated two ways, both commutative
    * and so partitioning/order-proof: a bit_xor (catches value flips)
    * and a modular sum over decimal(38,0) (catches row
    * duplication/omission that xor's self-cancellation misses —
    * a row appearing twice xors to zero but sums twice). Engine-
    * portable: both engines spell md5, the char fold, bit_xor and a
    * HUGEINT/decimal modular sum exactly (see q_table_checksum's
    * oracle).
    *
    * Pass only columns with engine-stable string forms (strings,
    * integers, dates — NOT raw doubles; cast money to integer cents
    * first). Nulls: concat_ws skips them, so (NULL,'x') == ('x',NULL)
    * — include a not-null key column first if that distinction
    * matters.
    */
  def tableChecksum(df: DataFrame, cols: Seq[String]): DataFrame =
    groupedChecksum(df, Seq.empty, cols)

  /** [[tableChecksum]] per group — the per-shard/per-partition form:
    * comparing checksums shard-by-shard means a mismatch resyncs ONE
    * shard, not the table. `extraAggs` lets callers fuse additional
    * channels (e.g. a token sum for a loader manifest) into the same
    * single aggregation pass.
    */
  def groupedChecksum(df: DataFrame, groupCols: Seq[String],
      cols: Seq[String], extraAggs: Seq[Column] = Seq.empty): DataFrame = {
    require(cols.nonEmpty, "groupedChecksum needs at least one column")
    require(!df.columns.contains("__fp"),
      "groupedChecksum uses a temp __fp column; input already has one")
    val rowFp = graft.functions.PolyHash(
      md5(concat_ws("|", cols.map(col): _*)))
    val base = df.withColumn("__fp", rowFp)
    val aggs = Seq(
      count(lit(1)).as("n_rows"),
      expr("bit_xor(__fp)").as("xor_fp"),
      pmod(sum(col("__fp").cast("decimal(38,0)")), lit(1000000007L))
        .cast("long").as("sum_fp")) ++ extraAggs
    if (groupCols.isEmpty) base.agg(aggs.head, aggs.tail: _*)
    else base.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
