package graft.time

import java.time.{DayOfWeek, LocalDate}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Business-day / calendar helpers (SURVEY.md §2.9 D7 — the reference
  * keeps these driver-side: `num_and_dt.add_business_days` at
  * delinquent_data_submitters.py:432, the last-Sunday computation at
  * dhs_upload.py:13-22, and the next-business-week bounds at
  * delinquent_data_submitters.py:110-129).
  *
  * Scalar (java.time) forms mirror the reference's driver-side use;
  * `addBusinessDaysCol` is the frame-scale form — pure date arithmetic
  * on codegen'd built-ins, no UDF, for applying a deadline column to
  * millions of rows.
  */
object BusinessCalendar {

  def isWeekend(d: LocalDate): Boolean =
    d.getDayOfWeek == DayOfWeek.SATURDAY || d.getDayOfWeek == DayOfWeek.SUNDAY

  /** Add `n` business days (Mon-Fri, minus `holidays`), stepping one
    * day at a time (n is small in every reference use). Negative `n`
    * steps backwards. A weekend/holiday start rolls in the step
    * direction before counting — Polars `add_business_days(roll=
    * 'forward')` semantics.
    */
  def addBusinessDays(d: LocalDate, n: Int,
      holidays: Set[LocalDate] = Set.empty): LocalDate = {
    val step = if (n < 0) -1 else 1
    def isBiz(x: LocalDate): Boolean = !isWeekend(x) && !holidays(x)
    var cur = d
    while (!isBiz(cur)) cur = cur.plusDays(step)
    var left = math.abs(n)
    while (left > 0) {
      cur = cur.plusDays(step)
      while (!isBiz(cur)) cur = cur.plusDays(step)
      left -= 1
    }
    cur
  }

  /** The most recent Sunday strictly before `today` (reference
    * dhs_upload.py:13-22: `today - (weekday + 1)` — a Sunday maps to
    * the PREVIOUS Sunday, not itself).
    */
  def lastSunday(today: LocalDate): LocalDate =
    today.minusDays(today.getDayOfWeek.getValue.toLong)

  /** (next Monday, next Friday) strictly after `today` — the
    * next-business-week window of delinquent_data_submitters.py:
    * 120-123 (`days_to_mon = 7 - weekday`).
    */
  def nextBusinessWeek(today: LocalDate): (LocalDate, LocalDate) = {
    val nextMon = today.plusDays(8L - today.getDayOfWeek.getValue)
    (nextMon, nextMon.plusDays(4))
  }

  /** Column form of [[addBusinessDays]] for n >= 0, no holidays:
    * closed-form (no iteration, no UDF) — roll a weekend start
    * forward to Monday, then weeks = (weekday + n) / 5 whole weeks
    * plus the remainder.
    */
  def addBusinessDaysCol(d: Column, n: Int): Column = {
    require(n >= 0, s"addBusinessDaysCol supports n >= 0 (got $n)")
    // dayofweek: Sun=1..Sat=7 -> Mon-0-based 0..6 (Sat=5, Sun=6)
    val dow = pmod(dayofweek(d) + 5, lit(7))
    val rolled = date_add(d,
      when(dow === 5, 2).when(dow === 6, 1).otherwise(0))
    val wd = when(dow >= 5, 0).otherwise(dow) // weekday of rolled start
    val total = wd + lit(n)
    val weeks = floor(total / lit(5.0)).cast("int")
    val rem = pmod(total, lit(5))
    date_add(date_sub(rolled, wd), weeks * 7 + rem)
  }
}
