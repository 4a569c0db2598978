package graft.ops

import graft.SparkTestBase
import java.sql.Timestamp

class CohortsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("retention buckets users by first month and counts distinct returns") {
    val activity = Seq(
      // u1: cohort 2024-01, active again in 01 (twice) and 02
      (1L, ts("2024-01-05 00:00:00")),
      (1L, ts("2024-01-20 00:00:00")),
      (1L, ts("2024-02-10 00:00:00")),
      // u2: cohort 2024-01, active in 01 and 03
      (2L, ts("2024-01-15 00:00:00")),
      (2L, ts("2024-03-01 00:00:00")),
      // u3: cohort 2024-02 only
      (3L, ts("2024-02-28 00:00:00"))
    ).toDF("user_id", "ts")
    val out = Cohorts.retention(activity, "user_id", "ts", 3)
      .orderBy("cohort_month", "month_offset")
      .as[(String, Int, Long)].collect().toSeq
    assert(out === Seq(
      ("2024-01", 0, 2L),  // u1, u2
      ("2024-01", 1, 1L),  // u1 in Feb
      ("2024-01", 2, 1L),  // u2 in Mar
      ("2024-02", 0, 1L))) // u3
  }

  test("retention caps offsets at maxOffset and crosses year boundaries") {
    val activity = Seq(
      (1L, ts("2023-12-05 00:00:00")),
      (1L, ts("2024-01-05 00:00:00")),  // offset 1 across the year line
      (1L, ts("2024-06-05 00:00:00")))  // offset 6 > max -> dropped
      .toDF("user_id", "ts")
    val out = Cohorts.retention(activity, "user_id", "ts", 2)
      .orderBy("month_offset").as[(String, Int, Long)].collect().toSeq
    assert(out === Seq(("2023-12", 0, 1L), ("2023-12", 1, 1L)))
  }

  test("decayScore halves per half-life, clamps future events to age 0") {
    val events = Seq(
      (1L, ts("2024-01-31 10:00:00")), // age 0  -> 1000000
      (1L, ts("2024-01-24 00:00:00")), // age 7  -> 500000
      (1L, ts("2024-01-10 00:00:00")), // age 21 -> 125000
      (2L, ts("2024-02-05 00:00:00")), // future -> clamp to 1000000
      (2L, ts("2022-01-01 00:00:00"))  // ancient: 2^(759 div 7=108)->clamp 62 -> 0
    ).toDF("user_id", "ts")
    val out = Cohorts.decayScore(events, "user_id", "ts", "2024-01-31", 7)
      .orderBy("user_id").as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 3L, 1625000L), (2L, 2L, 1000000L)))
  }

  test("randomized: retention equals a single-threaded reference") {
    // seeded activity over 30 users x 14 months; the expected triangle
    // is computed directly from (user -> month list) maps, independent
    // of the two-shuffle pipeline
    val rnd = new scala.util.Random(20260818L)
    val rows = (1 to 600).map { _ =>
      val u = rnd.nextInt(30).toLong + 1
      val m = rnd.nextInt(14) // months since 2023-11
      val mon = 2023 * 12 + 10 + m // 0-based month index
      (u, ts(f"${mon / 12}%04d-${mon % 12 + 1}%02d-${rnd.nextInt(28) + 1}%02d 12:00:00"))
    }
    val maxOffset = 5
    val byUser = rows.groupBy(_._1).map { case (u, xs) =>
      u -> xs.map { case (_, t) =>
        val d = t.toLocalDateTime.toLocalDate
        d.getYear * 12 + d.getMonthValue - 1
      }
    }
    val expected = byUser.toSeq.flatMap { case (u, months) =>
      val cohort = months.min
      months.map(m => (cohort, m - cohort, u))
    }.filter(_._2 <= maxOffset).distinct
      .groupBy { case (c, o, _) => (c, o) }
      .map { case ((c, o), xs) =>
        (f"${c / 12}%04d-${c % 12 + 1}%02d", o, xs.size.toLong)
      }.toSet
    val got = Cohorts.retention(rows.toDF("user_id", "ts"), "user_id", "ts",
        maxOffset)
      .as[(String, Int, Long)].collect().toSet
    assert(got === expected)
  }

  test("decayScore is partitioning-invariant (exact integer weights)") {
    val events = (1L to 200L)
      .map(i => (i % 7, ts(f"2024-01-${(i % 30 + 1)}%02d 12:00:00")))
      .toDF("user_id", "ts")
    val a = Cohorts.decayScore(events, "user_id", "ts", "2024-01-31", 7)
      .orderBy("user_id").as[(Long, Long, Long)].collect().toSeq
    val b = Cohorts.decayScore(events.repartition(17), "user_id", "ts",
        "2024-01-31", 7)
      .orderBy("user_id").as[(Long, Long, Long)].collect().toSeq
    assert(a === b && a.map(_._2).sum === 200L)
  }
}
