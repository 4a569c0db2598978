package graft.ops

import graft.SparkTestBase
import graft.functions.DateFormats
import org.apache.spark.sql.functions._

class NormalizeSpec extends SparkTestBase {
  import spark.implicits._

  test("ordinal suffixes incl. teens") {
    val cases = Seq(1 -> "1st", 2 -> "2nd", 3 -> "3rd", 4 -> "4th",
      11 -> "11th", 12 -> "12th", 13 -> "13th", 21 -> "21st",
      22 -> "22nd", 101 -> "101st", 111 -> "111th")
    val df = cases.toDF("n", "want")
      .withColumn("got", Normalize.ordinal(col("n")))
    assert(df.filter(col("got") =!= col("want")).count() === 0)
  }

  test("zfill pads to width") {
    val df = Seq("7", "123456", "1234567").toDF("s")
      .withColumn("z", Normalize.zfill(col("s"), 6))
    assert(df.as[(String, String)].collect().map(_._2).toSeq ===
      Seq("000007", "123456", "1234567"))
  }

  test("zfill keeps a leading sign in front of the zeros (Python semantics)") {
    val df = Seq("-5", "+5", "-", "-123456").toDF("s")
      .withColumn("z", Normalize.zfill(col("s"), 4))
    assert(df.as[(String, String)].collect().map(_._2).toSeq ===
      Seq("-005", "+005", "-000", "-123456"))
  }

  test("stripSuffixes removes one trailing suffix, longest-first") {
    val df = Seq("SMITH MD", "JONES DO", "NODEG", "TRAP MDMD").toDF("s")
      .withColumn("r", Normalize.stripSuffixes(col("s"), Seq(" MD", " DO", "MD")))
    assert(df.as[(String, String)].collect().map(_._2).toSeq ===
      Seq("SMITH", "JONES", "NODEG", "TRAP MD"))
  }

  test("replaceStrict remaps, passes nulls, and FAILS on unmapped keys") {
    val mapping = Seq("P" -> "pharmacist", "T" -> "technician")
    // happy path: all keys mapped, nulls pass through untouched
    val ok = Seq(Some("P"), Some("T"), None).toDF("code")
      .withColumn("r", Normalize.replaceStrict(col("code"), mapping))
      .as[(Option[String], Option[String])].collect().toSeq
    assert(ok === Seq(Some("P") -> Some("pharmacist"),
      Some("T") -> Some("technician"), None -> None))
    // the strictness contract (Polars replace_strict,
    // unreg_pharmacists.py:120-121): an unmapped key aborts the job
    // naming the value, instead of propagating a silent null
    val err = intercept[Exception] {
      Seq("P", "X").toDF("code")
        .withColumn("r", Normalize.replaceStrict(col("code"), mapping))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(err).exists(m =>
      m != null && m.contains("unmapped key 'X'")), s"got: $err")
  }

  test("isBlank covers null, empty, whitespace") {
    val df = Seq(Some(""), Some("  "), Some("x"), None)
      .toDF("s").withColumn("b", Normalize.isBlank(col("s")))
    assert(df.as[(Option[String], Boolean)].collect().map(_._2).toSeq ===
      Seq(true, true, false, true))
  }

  test("toIntLenient: malformed input yields null, not an ANSI error") {
    val df = Seq(" 42 ", "7", "x9", "", "3.5", "12345678901234567890")
      .toDF("s").withColumn("i", Normalize.toIntLenient(col("s")))
    assert(df.as[(String, Option[Int])].collect().map(_._2).toSeq ===
      Seq(Some(42), Some(7), None, None, None, None))
  }

  test("chrono -> JDK date format translation") {
    assert(DateFormats.chronoToJdk("%Y-%m-%d") === "yyyy-MM-dd")
    assert(DateFormats.chronoToJdk("%m/%d/%Y") === "MM/dd/yyyy")
    assert(DateFormats.chronoToJdk("%B %d, %Y") === "MMMM dd, yyyy")
    assert(DateFormats.chronoToJdk("%Y-%-m-%-d") === "yyyy-M-d")
    assert(DateFormats.chronoToJdk("%Y-%m-%d %H:%M:%S%.f") ===
      "yyyy-MM-dd HH:mm:ss.SSSSSS")
    assert(DateFormats.chronoToJdk("%-m/%-d/%Y %-l:%-M:%-S %p") ===
      "M/d/yyyy h:m:s a")
    intercept[IllegalArgumentException](DateFormats.chronoToJdk("%Q"))
  }

  test("translated formats parse real dates in Spark") {
    val df = Seq("03/07/1995", "11/21/2001").toDF("s")
      .withColumn("d", to_date(col("s"), DateFormats.chronoToJdk("%m/%d/%Y")))
    assert(df.filter(col("d").isNull).count() === 0)
    assert(df.select(date_format(col("d"), "yyyy-MM-dd")).as[String].collect().toSeq ===
      Seq("1995-03-07", "2001-11-21"))
  }
}
