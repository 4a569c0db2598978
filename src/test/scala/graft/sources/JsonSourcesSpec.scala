package graft.sources

import graft.SparkTestBase

class JsonSourcesSpec extends SparkTestBase {
  import spark.implicits._

  test("jsonl round-trip survives embedded newlines, quotes, and nulls") {
    val df = Seq(
      (1L, "line one\nline two", "en"),
      (2L, "she said \"hi\" \\ bye", "de"),
      (3L, null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("id", "text", "lang")
    val dir = java.nio.file.Files
      .createTempDirectory("jsonl_spec").toString
    JsonSources.writeJsonl(df, dir)
    val back = JsonSources.scanJsonl(spark, dir, df.schema)
      .orderBy("id").as[(Long, String, String)].collect().toSeq
    assert(back === Seq(
      (1L, "line one\nline two", "en"),
      (2L, "she said \"hi\" \\ bye", "de"),
      (3L, null, null)))
  }

  test("scanJsonl fails fast on a malformed line instead of dropping it") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_bad").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/part.json"),
      """{"id": 1, "text": "ok"}""" + "\n" + """{"id": oops""" + "\n")
    val schema = Seq((1L, "x")).toDF("id", "text").schema
    val e = intercept[Exception] {
      JsonSources.scanJsonl(spark, dir, schema).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c =>
      Option(c.getMessage).exists(m =>
        m.contains("FAILFAST") || m.contains("Malformed"))),
      s"expected a FAILFAST/malformed error, got: ${e.getMessage}")
  }
}
