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

  /** DEA number validity: 2 letters + 7 digits + mod-10 checksum.
    * Input is the full 9-char registration number.
    *
    * Expression shape (r16, guide "eliminate non-codegen work in the
    * hot path"): straight-line scalar substring+cast arithmetic — the
    * previous split→transform→element_at form allocated a string
    * array plus an int array PER ROW inside whole-stage codegen just
    * to read 7 fixed positions. Values are identical (same digits,
    * same integer arithmetic); the shapeOk guard short-circuits the
    * digit casts for malformed inputs exactly as before (Spark's And
    * skips the right side when the left is false).
    */
  def deaValid(dea: Column): Column = {
    val up = upper(trim(dea))
    // reference pattern (`awarxe_cleanup.py:46`): registrant-type letter,
    // any second letter, 7 digits with at least one nonzero
    val shapeOk = up.rlike("^[ABCFGHMPR][A-Z][0-9]{7}$") &&
      substring(up, 3, 7) =!= lit("0000000")
    // digit i of the 7 (1-based) = char i+2 of the registration number
    def d(i: Int) = substring(up, i + 2, 1).cast("int")
    // odd positions (1st,3rd,5th) and even positions (2nd,4th,6th)
    val odd = d(1) + d(3) + d(5)
    val even = d(2) + d(4) + d(6)
    val check = (odd + even * 2) % 10
    shapeOk && (check === d(7))
  }

  /** NPI validity: 10 digits + Luhn checksum with +24 prefix constant.
    * Same scalar expression shape as [[deaValid]] (r16): the previous
    * split→zip_with(sequence)→aggregate fold built three arrays per
    * row; the Luhn sum over 9 fixed positions is plain int arithmetic.
    */
  def npiValid(npi: Column): Column = {
    val t = trim(npi)
    val shapeOk = t.rlike("^[0-9]{10}$")
    def d(i: Int) = substring(t, i, 1).cast("int")
    // double digits at positions 1,3,5,7,9 (odd 1-based = even offset
    // from the right within the first 9), digit-sum via 2d - 9 when
    // 2d > 9 — identical per-position terms to the zipped fold, summed
    // left-to-right in the same order
    def dbl(i: Int) = {
      val doubled = d(i) * 2
      when(doubled > 9, doubled - 9).otherwise(doubled)
    }
    val summed = dbl(1) + d(2) + dbl(3) + d(4) + dbl(5) + d(6) + dbl(7) +
      d(8) + dbl(9) + lit(24)
    val check = (lit(10) - (summed % 10)) % 10
    shapeOk && (check === d(10))
  }
}
