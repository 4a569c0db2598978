package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** DEA / NPI registration-number checksums, composed from codegen'd
  * built-ins (higher-order array functions) — no UDFs.
  *
  * Semantics from the reference:
  *  - DEA (reference `awarxe_cleanup.py:57-69`): the 7 digits after the
  *    two letters; checksum = sum(digits at odd positions 1,3,5) +
  *    2 * sum(digits at even positions 2,4,6); its last digit must equal
  *    digit 7 (the check digit).
  *  - NPI (reference `awarxe_cleanup.py:183-199`): 10 digits; Luhn with
  *    the 80840 prefix folded in as a constant +24: double every digit of
  *    the first 9 counting from the right-most, sum the digit-sums of the
  *    doubled values plus the untouched digits, add 24; valid when
  *    (10 - sum % 10) % 10 == check digit (the 10th).
  */
object Checksums {

  /** Digits of `c` (a numeric-string column) as array<int>. */
  private def digits(c: Column): Column =
    transform(split(c, ""), ch => ch.cast("int"))

  /** DEA number validity: 2 letters + 7 digits + mod-10 checksum.
    * Input is the full 9-char registration number.
    */
  def deaValid(dea: Column): Column = {
    val up = upper(trim(dea))
    // reference pattern (`awarxe_cleanup.py:46`): registrant-type letter,
    // any second letter, 7 digits with at least one nonzero
    val shapeOk = up.rlike("^[ABCFGHMPR][A-Z][0-9]{7}$") &&
      substring(up, 3, 7) =!= lit("0000000")
    val ds = digits(substring(up, 3, 7)) // 7 digits, 1-based index in SQL fns
    // odd positions (1st,3rd,5th) and even positions (2nd,4th,6th)
    val odd = element_at(ds, 1) + element_at(ds, 3) + element_at(ds, 5)
    val even = element_at(ds, 2) + element_at(ds, 4) + element_at(ds, 6)
    val check = (odd + even * 2) % 10
    shapeOk && (check === element_at(ds, 7))
  }

  /** NPI validity: 10 digits + Luhn checksum with +24 prefix constant. */
  def npiValid(npi: Column): Column = {
    val t = trim(npi)
    val shapeOk = t.rlike("^[0-9]{10}$")
    val first9 = digits(substring(t, 1, 9))
    // double digits at positions 1,3,5,7,9 (odd 1-based = even offset from
    // the right within the first 9), digit-sum via d*2 - 9 when d*2 > 9
    val summed = aggregate(
      zip_with(first9, sequence(lit(1), lit(9)), (d, i) => {
        val doubled = d * 2
        when(i % 2 === 1, when(doubled > 9, doubled - 9).otherwise(doubled))
          .otherwise(d)
      }),
      lit(0), (acc, x) => acc + x) + lit(24)
    val check = (lit(10) - (summed % 10)) % 10
    shapeOk && (check === element_at(digits(t), 10))
  }
}
