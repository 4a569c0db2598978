package graft.ops

import graft.SparkTestBase

class ProfilerSpec extends SparkTestBase {
  import spark.implicits._

  test("profile counts nulls and distincts, truncates min/max to 16 chars") {
    val df = Seq(
      (Some(1L), Some("aardvark-aardvark-aardvark")),
      (Some(2L), None),
      (None, Some("zebra"))).toDF("k", "v")
    val out = Profiler.profile(df, Seq("k", "v"))
      .as[(String, Long, Long, Option[String], Option[String])].collect()
      .map(r => r._1 -> r).toMap
    assert(out("k") === ("k", 1L, 2L, Some("1"), Some("2")))
    // min/max computed over TRUNCATED values; 16-char cap bounds the row
    assert(out("v") === ("v", 1L, 2L, Some("aardvark-aardvar"), Some("zebra")))
  }

  test("profile is one row per column, sorted") {
    val df = Seq((1, "x")).toDF("b", "a")
    val names = Profiler.profile(df, Seq("b", "a"))
      .select("col_name").as[String].collect().toSeq
    assert(names === Seq("a", "b"))
  }
}
