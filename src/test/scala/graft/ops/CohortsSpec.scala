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
}
