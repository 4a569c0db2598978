package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass data-quality constraint suite — the ingest gate a 100 TB
  * pipeline runs BEFORE admitting a snapshot (semantic ancestor: the
  * reference's extract gates, `check_masked.py:48-72`'s column/row
  * audit and the fail-fast emptiness checks behind
  * `Relational.requireEmpty`). The difference from calling
  * requireEmpty N times is the execution shape: every row-predicate
  * check compiles to a conditional count inside ONE fused global
  * aggregate, so N constraints cost one scan of the table (plus one
  * distinct-aggregate phase when a primary-key check is present) —
  * not N jobs. At 100 TB the difference is N-1 full-table reads.
  *
  * Row-predicate checks: `violation` is a boolean Column; a row where
  * it evaluates TRUE counts against the check. NULL evaluations count
  * as PASS — callers who want null-is-violation say so explicitly
  * (`coalesce(pred, lit(true))`), keeping the predicate's semantics
  * identical to what the same text means in an external SQL engine.
  *
  * Primary-key check: violations = `count(*) − count(distinct key)` —
  * every row beyond the first of a duplicated key counts, and every
  * NULL-key row counts (count distinct ignores nulls), which is
  * exactly PRIMARY KEY semantics (unique AND not null). Multi-column
  * keys count a row whenever ANY key column is null.
  *
  * Returns one row per check: (check_name, n_violations, pass),
  * ordered by check_name.
  *
  * Scale note: the PK check is EXACT (count distinct plans an Expand —
  * roughly a second aggregate phase over the key column). That is the
  * right default for an ingest gate, where "0 violations" must mean
  * zero; a trillion-row advisory profile that only needs "roughly
  * unique" can swap in approx_count_distinct as a row-predicate-free
  * variant at a fraction of the cost.
  */
object Checks {

  /** A named row-level constraint; `violation` TRUE = the row fails. */
  final case class Check(name: String, violation: Column)

  /** The gate form of [[report]]: run the suite and THROW (naming
    * every failing check and its violation count) unless all checks
    * pass. One scan either way. In a `foreachBatch` body this makes
    * admission batch-atomic: a poisoned micro-batch fails the stream
    * before any of its rows reach the sink, instead of half-writing —
    * the streaming twin of the batch ingest gate (StreamingSpec pins
    * the contract).
    */
  def requirePass(df: DataFrame, checks: Seq[Check],
      primaryKey: Option[(String, Seq[String])] = None): Unit = {
    val failing = report(df, checks, primaryKey)
      .filter(!col("pass"))
      .select(col("check_name"), col("n_violations"))
      .collect()
    if (failing.nonEmpty) throw new IllegalStateException(
      "constraint suite failed: " + failing.map(r =>
        s"${r.getString(0)} (${r.getLong(1)} violations)").mkString(", "))
  }

  def report(df: DataFrame, checks: Seq[Check],
      primaryKey: Option[(String, Seq[String])] = None): DataFrame = {
    val names = checks.map(_.name) ++ primaryKey.map(_._1)
    require(names.nonEmpty, "Checks.report: no checks given")
    require(names.distinct.length == names.length,
      s"duplicate check names: ${names.diff(names.distinct).mkString(", ")}")
    // one fused aggregate row: conditional counts for the predicates
    // (count skips NULL/false and is 0 — not NULL — on an empty
    // table), count(*) − countDistinct for the key. Internally the
    // report row uses positional aliases and carries the caller's
    // names only as literals, so a name may contain ANY character
    // (quotes, backticks, dots) without breaking column resolution.
    val safe = names.indices.map(i => s"__check_$i")
    val aggs = (checks.map(c => count(when(c.violation, lit(true)))) ++
      primaryKey.map { case (nm, cols) =>
        require(cols.nonEmpty, s"primary-key check $nm: no key columns")
        count(lit(1)) - countDistinct(col(cols.head), cols.tail.map(col): _*)
      }).zip(safe).map { case (c, s) => c.as(s) }
    val row = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single report row to (check_name, n_violations)
    val kv = names.zip(safe).map { case (n, s) =>
      struct(lit(n).as("check_name"), col(s).as("n_violations")) }
    row.select(explode(array(kv: _*)).as("kv"))
      .select(col("kv.check_name").as("check_name"),
        col("kv.n_violations").as("n_violations"))
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy("check_name")
  }
}
