package graft.ops

import graft.SparkTestBase

class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  // groups: (1,"a") x3, (1,"b") x1, (2,"a") x2
  private def df = Seq(
    (1, "a", 10L), (1, "a", 11L), (1, "a", 12L),
    (1, "b", 20L),
    (2, "a", 30L), (2, "a", 31L)
  ).toDF("qid1", "qid2", "v")

  test("suppress keeps only rows in groups of size >= k") {
    val out = Privacy.suppress(df, Seq("qid1", "qid2"), 2)
      .select("v").as[Long].collect().toSet
    assert(out === Set(10L, 11L, 12L, 30L, 31L))
    // k=1 is a no-op
    assert(Privacy.suppress(df, Seq("qid1", "qid2"), 1).count() === 6)
  }

  test("report counts groups, unsafe groups, suppressed rows, and rate") {
    val r = Privacy.report(df, Seq("qid1", "qid2"), 2)
      .as[(Long, Long, Long, Long)].collect().head
    // 3 groups, 1 unsafe (the singleton), 1 row suppressed of 6 -> 1667 bp
    assert(r === ((3L, 1L, 1L, 1667L)))
  }

  test("report with k=1 flags nothing") {
    val r = Privacy.report(df, Seq("qid1"), 1)
      .as[(Long, Long, Long, Long)].collect().head
    assert(r === ((2L, 0L, 0L, 0L)))
  }

  test("suppress rejects k < 1") {
    val e = intercept[IllegalArgumentException] {
      Privacy.suppress(df, Seq("qid1"), 0)
    }
    assert(e.getMessage.contains("k=0"))
  }
}
