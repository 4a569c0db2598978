package graft.sources

import graft.SparkTestBase
import java.nio.file.{Files, Paths}

class CsvSourcesSpec extends SparkTestBase {
  import spark.implicits._

  test("scanCsvSkipRows skips banner lines before the header") {
    val dir = Files.createTempDirectory("graft_csv_skip").toString
    val f = Paths.get(dir, "report.csv")
    Files.writeString(f,
      """Quarterly Report
        |Generated: 2026-01-01
        |id,name,amount
        |1,alpha,10
        |2,beta,20
        |3,,30
        |""".stripMargin)
    val df = CsvSources.scanCsvSkipRows(spark, f.toString, skipRows = 2)
    assert(df.columns.toSeq === Seq("id", "name", "amount"))
    val rows = df.orderBy("id")
      .as[(Option[String], Option[String], Option[String])].collect().toSeq
    // empty field -> null, same as scanCsv (Spark CSV semantics)
    assert(rows === Seq(
      (Some("1"), Some("alpha"), Some("10")),
      (Some("2"), Some("beta"), Some("20")),
      (Some("3"), None, Some("30"))))
  }

  test("scanCsvSkipRows honors RFC-4180 quoting in header and body") {
    val dir = Files.createTempDirectory("graft_csv_quote").toString
    val f = Paths.get(dir, "quoted.csv")
    Files.writeString(f, Seq(
      "BANNER LINE",
      "id,\"name, full\",note",
      "1,\"Smith, John\",\"said \"\"hi\"\"\"",
      "2,plain,ok",
      "").mkString("\n"))
    val df = CsvSources.scanCsvSkipRows(spark, f.toString, skipRows = 1)
    assert(df.columns.toSeq === Seq("id", "name, full", "note"))
    val rows = df.orderBy("id")
      .as[(String, String, String)].collect().toSeq
    assert(rows === Seq(
      ("1", "Smith, John", "said \"hi\""),
      ("2", "plain", "ok")))
  }

  test("scanCsvSkipRows keeps file order across multiple partitions") {
    val dir = Files.createTempDirectory("graft_csv_multi").toString
    val f = Paths.get(dir, "big.csv")
    val body = (1 to 5000).map(i => s"$i,val$i").mkString("\n")
    Files.writeString(f, s"BANNER\nid,v\n$body\n")
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
      val df = CsvSources.scanCsvSkipRows(spark, f.toString, skipRows = 1)
      assert(df.rdd.getNumPartitions > 1) // the skip must survive a split file
      assert(df.count() === 5000)
      assert(df.filter($"id" === "1" && $"v" === "val1").count() === 1)
      assert(df.filter($"id" === "BANNER" || $"id" === "id").count() === 0)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("scanCsvSkipRows rejects a multi-file directory instead of corrupting") {
    val dir = Files.createTempDirectory("graft_csv_twofiles")
    Files.writeString(dir.resolve("a.csv"), "BANNER\nid,v\n1,x\n")
    Files.writeString(dir.resolve("b.csv"), "BANNER\nid,v\n2,y\n")
    val e = intercept[IllegalArgumentException] {
      CsvSources.scanCsvSkipRows(spark, dir.toString, skipRows = 1)
    }
    assert(e.getMessage.contains("single file"))
  }

  test("all-string scan: every column is string, empty field round-trips") {
    val dir = Files.createTempDirectory("graft_csv_str").toString
    CsvSources.writeCsv(
      Seq(("x", Some(1)), ("y", None)).toDF("a", "b"), dir)
    val back = CsvSources.scanCsv(spark, dir)
    assert(back.schema.fields.forall(_.dataType.typeName == "string"))
    assert(back.count() === 2)
  }
}
