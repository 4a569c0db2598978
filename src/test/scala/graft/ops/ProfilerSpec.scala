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

  test("benford counts leading digits with integer ppm vs expectation") {
    // 4× leading-1, 2× leading-2, 2× leading-9; zero/negative dropped.
    // EVERY digit 1-9 gets a row: a digit with zero observations is
    // the strongest fabricated-data signal, and omitting its row would
    // hide exactly the deviation a screen looks for.
    val df = Seq(100L, 19L, 1L, 1234L, 2L, 250L, 9L, 99L, 0L, -5L)
      .toDF("cents")
    val out = Profiler.benford(df, org.apache.spark.sql.functions.col("cents"))
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) ===
      Seq((1, 4L), (2, 2L), (3, 0L), (4, 0L), (5, 0L), (6, 0L), (7, 0L),
        (8, 0L), (9, 2L)))
    val one = out.head
    assert(one._3 === 4L * 1000000L / 8L)       // obs_ppm = 500000
    assert(one._4 === 301030L)                  // Benford expectation
    assert(one._5 === one._3 - one._4)          // signed deviation
    // an absent digit reports the full negative expectation, not nothing
    val three = out(2)
    assert(three._3 === 0L && three._5 === -124939L)
  }
}
