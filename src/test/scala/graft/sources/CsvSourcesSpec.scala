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
    val rows = df.orderBy("id").as[(String, String, String)].collect().toSeq
    assert(rows === Seq(("1", "alpha", "10"), ("2", "beta", "20"), ("3", "", "30")))
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
