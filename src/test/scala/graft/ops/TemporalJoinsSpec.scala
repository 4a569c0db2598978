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

  test("intervalOverlapJoin: overlap pairs once each, half-open touch excluded") {
    // key k1: a1=[0,100) overlaps b1=[50,150) and CONTAINS b2=[10,20);
    // a1 touches b3=[100,200) exactly (half-open -> no overlap);
    // key k2 separates a2 from k1's b rows entirely
    val a = Seq(("k1", 1L, 0L, 100L), ("k2", 2L, 0L, 100L))
      .toDF("k", "a_id", "a_s", "a_e")
    val b = Seq(("k1", 1L, 50L, 150L), ("k1", 2L, 10L, 20L),
      ("k1", 3L, 100L, 200L)).toDF("k", "b_id", "b_s", "b_e")
    val out = TemporalJoins.intervalOverlapJoin(a, b, Seq("k"),
        "a_s", "a_e", "b_s", "b_e", binMicros = 10L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 1L), (1L, 2L)))
  }

  test("intervalOverlapJoin: pair sharing MANY bins still emits exactly once") {
    // both intervals span 10 bins together; the first-common-bin gate
    // must collapse the 10 candidate meetings to one output row
    val a = Seq(("k", 1L, 0L, 100L)).toDF("k", "a_id", "a_s", "a_e")
    val b = Seq(("k", 9L, 5L, 95L)).toDF("k", "b_id", "b_s", "b_e")
    val out = TemporalJoins.intervalOverlapJoin(a, b, Seq("k"),
      "a_s", "a_e", "b_s", "b_e", binMicros = 10L)
    assert(out.count() === 1L)
  }

  test("intervalOverlapJoin: equals naive overlap join for every bin width") {
    // deterministic pseudo-random intervals; the binned plan must give
    // the identical pair set for tiny, matched, and huge bins
    val rows = (0 until 60).map { i =>
      val s = (i * 37 % 97).toLong
      (s"k${i % 3}", i.toLong, s, s + 1 + (i * 13 % 29))
    }
    val a = rows.filter(_._2 % 2 == 0).toDF("k", "a_id", "a_s", "a_e")
    val b = rows.filter(_._2 % 2 == 1)
      .map(r => (r._1, r._2, r._3, r._4)).toDF("k", "b_id", "b_s", "b_e")
    val naive = a.join(b, Seq("k"))
      .filter(col("a_s") < col("b_e") && col("b_s") < col("a_e"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    for (bin <- Seq(1L, 7L, 1000L)) {
      val binned = TemporalJoins.intervalOverlapJoin(a, b, Seq("k"),
          "a_s", "a_e", "b_s", "b_e", bin)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      assert(binned === naive, s"bin=$bin")
    }
  }

  test("intervalOverlapJoin: degenerate intervals are dropped") {
    val a = Seq(("k", 1L, 10L, 10L)).toDF("k", "a_id", "a_s", "a_e")
    val b = Seq(("k", 2L, 0L, 100L)).toDF("k", "b_id", "b_s", "b_e")
    assert(TemporalJoins.intervalOverlapJoin(a, b, Seq("k"),
      "a_s", "a_e", "b_s", "b_e", 10L).count() === 0L)
  }

  test("rangeJoinBinnedLeft: empty and degenerate intervals survive, null-padded") {
    val iv = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")), // has pts
      (20L, ts("2024-05-01 00:00:00"), ts("2024-05-02 00:00:00")), // empty
      (30L, ts("2024-06-01 00:00:00"), ts("2024-06-01 00:00:00"))  // degenerate
    ).toDF("ivid", "s", "e")
    val pts = Seq(
      (1L, ts("2024-01-01 06:00:00")), (2L, ts("2024-01-01 18:00:00"))
    ).toDF("pid", "pt")
    val out = TemporalJoins.rangeJoinBinnedLeft(iv, "ivid", "s", "e",
        pts, "pt", 86400L)
      .select("ivid", "pid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    // matched interval emits per point; unmatched AND degenerate
    // intervals each emit one null-padded row (LEFT semantics — the
    // inner path drops degenerates, the left path must not)
    assert(out === Set((10L, 1L), (10L, 2L), (20L, -1L), (30L, -1L)))
  }

  test("randomized: rangeJoinBinned equals the naive containment join at every bin width") {
    // seeded intervals/points over a tight time window so bins are
    // heavily shared; ~1/6 inverted or empty intervals and ~10% null
    // fields must simply vanish (no fanout, no null matches). The
    // expected set is computed directly from the generated data —
    // point in [s, e), half-open — independent of the binned pipeline.
    val rnd = new scala.util.Random(20260815L)
    def t(sec: Int): java.sql.Timestamp =
      ts(f"2024-01-01 00:${sec / 60}%02d:${sec % 60}%02d")
    def nsec(): Option[Int] =
      if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(900))
    val ivRaw: Seq[(Long, Option[Int], Option[Int])] = (1 to 120).map { i =>
      val s = nsec()
      val e =
        if (s.isEmpty || rnd.nextInt(6) == 0) nsec()
        else s.map(_ + rnd.nextInt(120) - 20) // some inverted/empty
      (i.toLong, s, e)
    }
    val ptRaw: Seq[(Long, Option[Int])] = (1 to 200).map(i => (i.toLong, nsec()))
    val expected = (for {
      (ivid, Some(s), Some(e)) <- ivRaw if s < e
      (pid, Some(p)) <- ptRaw if p >= s && p < e
    } yield (ivid, pid)).toSet
    val iv = ivRaw.map { case (id, s, e) =>
      (id, s.map(t).orNull, e.map(t).orNull)
    }.toDF("ivid", "s", "e")
    val pts = ptRaw.map { case (id, p) =>
      (id, p.map(t).orNull)
    }.toDF("pid", "pt")
    for (bin <- Seq(1L, 7L, 60L, 3600L)) {
      val got = TemporalJoins.rangeJoinBinned(iv, "s", "e", pts, "pt", bin)
        .select("ivid", "pid").as[(Long, Long)].collect().toSet
      assert(got === expected, s"binSeconds=$bin diverges from naive join")
    }
  }

  test("randomized: window, native (codegen merge) and broadcast as-of agree") {
    // seeded generator: small key space + coarse times force heavy
    // ties, simultaneous left/right rows, empty groups, and ~10% null
    // times on both sides; one nullable payload field exercises
    // null-passthrough (never back-filled). The right side is deduped
    // to one row per (key, time) — the documented uniqueness contract.
    val rnd = new scala.util.Random(20260814L)
    def nt(): java.lang.Long =
      if (rnd.nextInt(10) == 0) null else java.lang.Long.valueOf(rnd.nextInt(40).toLong)
    val left = (1 to 300).map { i =>
      (i.toLong, s"k${rnd.nextInt(8)}", nt())
    }.toDF("lid", "k", "lt")
    val right = (1 to 300).map { i =>
      (s"k${rnd.nextInt(8)}", nt(), i.toLong,
        if (rnd.nextInt(4) == 0) null else s"v$i")
    }.toDF("k", "rt", "rid", "tag")
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("k", "rt").orderBy("rid")))
      .filter(col("__rn") === 1).drop("__rn")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(col("lid"), col("k"), col("lt"), col("rid"), col("tag"))
        .collect().map(_.toString).sorted.toSeq
    val win = canon(TemporalJoins.asofJoin(
      left, right, Seq("k"), "lt", "rt", Seq("rid", "tag")))
    val nat = canon(TemporalJoins.asofJoinNative(
      left, right, Seq("k"), "lt", "rt", Seq("rid", "tag")))
    val bro = canon(TemporalJoins.asofJoinBroadcast(
      left, right, Seq("k"), "lt", "rt", Seq("rid", "tag")))
    assert(nat === win, "native backward diverges from window reference")
    assert(bro === win, "broadcast diverges from window reference")
    // forward = backward on the negated time axis: the window
    // reference on negated copies is the independent spec
    val fwd = canon(TemporalJoins.asofJoinNative(
      left, right, Seq("k"), "lt", "rt", Seq("rid", "tag"),
      direction = "forward"))
    val fwdRef = canon(TemporalJoins.asofJoin(
        left.withColumn("lt", -col("lt")),
        right.withColumn("rt", -col("rt")),
        Seq("k"), "lt", "rt", Seq("rid", "tag"))
      .withColumn("lt", -col("lt")))
    assert(fwd === fwdRef, "native forward diverges from negated-axis reference")
    val broFwd = canon(TemporalJoins.asofJoinBroadcast(
      left, right, Seq("k"), "lt", "rt", Seq("rid", "tag"),
      direction = "forward"))
    assert(broFwd === fwdRef,
      "broadcast forward diverges from negated-axis reference")
  }
}
