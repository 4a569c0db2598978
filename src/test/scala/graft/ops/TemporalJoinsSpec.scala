package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class TemporalJoinsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asofJoin: latest at-or-before match, equality included, no-match is null") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),  // after both quotes -> q2
      (2L, "u1", ts("2024-01-01 09:00:00")),  // simultaneous with q1 -> q1 (>= semantics)
      (3L, "u1", ts("2024-01-01 08:00:00")),  // before any quote -> null
      (4L, "u2", ts("2024-01-01 12:00:00"))   // other key, one quote
    ).toDF("trade_id", "sym", "t")
    val right = Seq(
      ("u1", ts("2024-01-01 09:00:00"), 100L), // q1
      ("u1", ts("2024-01-01 09:30:00"), 200L), // q2
      ("u2", ts("2024-01-01 11:00:00"), 300L)
    ).toDF("sym", "qt", "quote")
    val out = TemporalJoins.asofJoin(left, right, Seq("sym"), "t", "qt",
        Seq("quote", "qt"))
      .orderBy("trade_id")
      .select("trade_id", "quote").as[(Long, Option[Long])].collect().toSeq
    assert(out === Seq((1L, Some(200L)), (2L, Some(100L)), (3L, None),
      (4L, Some(300L))))
  }

  test("asofJoin: null payload field in the matched row stays null (not back-filled)") {
    val left = Seq(("u1", ts("2024-01-01 10:00:00"))).toDF("sym", "t")
    val right = Seq(
      ("u1", ts("2024-01-01 09:00:00"), Some(100L), Some("a")),
      // matched row: quote is legitimately null, src is "b" — the output
      // must carry (null, "b"), never mix in 100L from the older row
      ("u1", ts("2024-01-01 09:30:00"), None, Some("b"))
    ).toDF("sym", "qt", "quote", "src")
    val out = TemporalJoins.asofJoin(left, right, Seq("sym"), "t", "qt",
        Seq("quote", "src"))
      .select("quote", "src").as[(Option[Long], Option[String])].collect().toSeq
    assert(out === Seq((None, Some("b"))))
  }

  test("asofJoin: right rows with null time are dropped, not matched-first") {
    val left = Seq(("u1", ts("2024-01-01 10:00:00")),
      ("u2", ts("2024-01-01 10:00:00"))).toDF("sym", "t")
    val right = Seq(
      ("u1", None, Some(999L)),                            // null time: ignored
      ("u1", Some(ts("2024-01-01 09:00:00")), Some(100L)),
      ("u2", None, Some(888L))                             // only a null-time row
    ).toDF("sym", "qt", "quote")
    val out = TemporalJoins.asofJoin(left, right, Seq("sym"), "t", "qt",
        Seq("quote"))
      .orderBy("sym").select("quote").as[Option[Long]].collect().toSeq
    assert(out === Seq(Some(100L), None))
  }

  test("asofJoin rejects colliding right column names") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("v", "t")
    val r = Seq((2L, ts("2024-01-01 09:00:00"))).toDF("v", "qt")
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.asofJoin(l, r, Seq.empty, "t", "qt", Seq("v"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("rangeJoinBinned: half-open bounds, intervals spanning bin boundaries") {
    val iv = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")),
      // crosses a day-bin boundary
      (20L, ts("2024-01-01 12:00:00"), ts("2024-01-02 12:00:00"))
    ).toDF("ivid", "s", "e")
    val pts = Seq(
      (1L, ts("2024-01-01 00:00:00")),  // start inclusive: iv10
      (2L, ts("2024-01-02 00:00:00")),  // end exclusive for iv10; inside iv20
      (3L, ts("2024-01-01 18:00:00")),  // inside both
      (4L, ts("2024-01-03 00:00:00"))   // inside none
    ).toDF("pid", "pt")
    val out = TemporalJoins.rangeJoinBinned(iv, "s", "e", pts, "pt", 86400L)
      .select("ivid", "pid").as[(Long, Long)].collect().toSet
    assert(out === Set((10L, 1L), (10L, 3L), (20L, 2L), (20L, 3L)))
  }

  test("rangeJoinBinned: inverted interval (end <= start) is dropped, no fanout") {
    val iv = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")),  // valid
      (2L, ts("2024-06-01 00:00:00"), ts("2024-01-01 00:00:00")),  // inverted
      (3L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"))   // empty
    ).toDF("ivid", "s", "e")
    val pts = Seq((1L, ts("2024-01-01 12:00:00"))).toDF("pid", "pt")
    val out = TemporalJoins.rangeJoinBinned(iv, "s", "e", pts, "pt", 3600L)
      .select("ivid").as[Long].collect().toSeq
    assert(out === Seq(1L))
  }

  test("rangeJoinBinned: interval longer than the bin still matches exactly") {
    val iv = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-05 00:00:00")))
      .toDF("ivid", "s", "e")
    val pts = (1 to 6).map(i => (i.toLong, ts(f"2024-01-0$i 12:00:00")))
      .toDF("pid", "pt")
    val out = TemporalJoins.rangeJoinBinned(iv, "s", "e", pts, "pt", 3600L)
      .select("pid").as[Long].collect().toSet
    assert(out === Set(1L, 2L, 3L, 4L))
  }
}
