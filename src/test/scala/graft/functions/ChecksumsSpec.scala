package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ChecksumsSpec extends SparkTestBase {
  import spark.implicits._

  test("DEA checksum (awarxe_cleanup.py:57-69 semantics)") {
    // AB1234563: odd digits 1+3+5=9, even 2+4+6=12 doubled=24, 33 % 10 = 3 = check
    val cases = Seq(
      ("AB1234563", true),   // valid checksum
      ("AB1234561", false),  // wrong check digit
      ("XY1234563", false),  // first letter not a registrant type
      ("AB123456", false),   // too short
      ("ab1234563", true),   // lowercase input normalized
      ("AB0000000", false))  // all-zero digit part excluded by pattern
    val df = cases.toDF("dea", "want")
      .withColumn("got", Checksums.deaValid(col("dea")))
    assert(df.filter(col("got") =!= col("want")).count() === 0)
  }

  test("NPI Luhn checksum (awarxe_cleanup.py:183-199 semantics)") {
    // 1234567893 is the CMS documentation example NPI
    val cases = Seq(
      ("1234567893", true),
      ("1234567890", false),
      ("123456789", false),   // 9 digits
      ("12345678931", false)) // 11 digits
    val df = cases.toDF("npi", "want")
      .withColumn("got", Checksums.npiValid(col("npi")))
    assert(df.filter(col("got") =!= col("want")).count() === 0)
  }
}
