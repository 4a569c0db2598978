package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Key-normalization kit (SURVEY.md §2.8). The reference's core idiom is
  * "normalize → join": trim/upper keys before every equi-join
  * (reference `delinquent_data_submitters.py:42-45`). Pure `Column`
  * functions, all codegen'd built-ins.
  */
object Normalize {

  /** trim + uppercase — the standard join-key cleanup. */
  def cleanKey(c: Column): Column = upper(trim(c))

  /** trim + lowercase — the standard email cleanup. */
  def cleanEmail(c: Column): Column = lower(trim(c))

  /** zero-pad to `n` chars (reference `unreg_presc.py:47` zfill).
    * Unlike bare `lpad`, does NOT truncate values already longer than
    * `n`, and a leading +/- sign stays in front of the inserted zeros
    * ("-5" -> "-005", not "00-5") — Polars/Python zfill semantics.
    */
  def zfill(c: Column, n: Int): Column = {
    val sign = substring(c, 1, 1)
    val signed = sign.isin("-", "+")
    when(length(c) >= n, c)
      .when(signed, concat(sign, lpad(substring(c, 2, n), n - 1, "0")))
      .otherwise(lpad(c, n, "0"))
  }

  /** strip one trailing suffix from a fixed list, longest-first
    * (reference `mm1.py:35-56` iterated strip_suffix over degree list).
    */
  def stripSuffixes(c: Column, suffixes: Seq[String]): Column = {
    val pattern = suffixes.sortBy(-_.length)
      .map(java.util.regex.Pattern.quote)
      .mkString("(?:", "|", ")$")
    regexp_replace(c, pattern, "")
  }

  /** collapse internal whitespace runs to single spaces + trim. */
  def cleanWhitespace(c: Column): Column =
    trim(regexp_replace(c, "[ \\t\\n\\r\\f]+", " "))

  /** empty-string-or-null predicate — the reference checks both states
    * explicitly ('' is not falsey in Polars; SURVEY.md §7 trap (a)).
    */
  def isBlank(c: Column): Column = c.isNull || trim(c) === lit("")

  /** parse int, null on failure (Polars `str.to_integer(strict=False)`).
    * `try_cast`, not `cast`: Spark 4 defaults to ANSI mode, where a
    * plain cast THROWS on malformed input instead of returning null.
    */
  def toIntLenient(c: Column): Column = trim(c).try_cast("int")

  /** STRICT value remap (Polars `replace_strict`, reference
    * `unreg_pharmacists.py:120-121`): every non-null input must be a
    * key of `mapping`, or the JOB FAILS naming the offending value —
    * the contract that catches a new unexpected code the day it
    * appears instead of silently propagating a null through three
    * downstream joins. Nulls map to null (no mapping consulted),
    * matching Polars. The guard is IN-PLAN (`raise_error` in the
    * otherwise-branch), so the operator stays a lazy codegen'd
    * when-chain — no extra pass, no action, broadcast- and
    * pushdown-transparent like any other Column.
    *
    * For a lenient remap (unmapped → null or passthrough), use a
    * plain when/otherwise chain — see q_when_case.
    */
  def replaceStrict(c: Column, mapping: Seq[(String, String)]): Column = {
    require(mapping.nonEmpty, "replaceStrict: mapping must be non-empty")
    val chain = mapping.tail.foldLeft(
      when(c === mapping.head._1, lit(mapping.head._2))) {
      case (acc, (k, v)) => acc.when(c === k, lit(v))
    }
    when(c.isNull, lit(null).cast("string"))
      .otherwise(chain.otherwise(raise_error(concat(
        lit("replace_strict: unmapped key '"), c.cast("string"),
        lit("' — extend the mapping or use a lenient when/otherwise remap")))))
  }

  /** 1 -> "1st", 2 -> "2nd", ... (reference `mu_extras.py:140` ordinal
    * map_elements UDF) — pure Column expression, no UDF.
    */
  def ordinal(n: Column): Column = {
    val mod100 = n % 100
    val mod10 = n % 10
    val suffix = when(mod100.between(11, 13), "th")
      .when(mod10 === 1, "st")
      .when(mod10 === 2, "nd")
      .when(mod10 === 3, "rd")
      .otherwise("th")
    concat(n.cast("string"), suffix)
  }
}
