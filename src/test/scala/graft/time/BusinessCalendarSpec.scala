package graft.time

import java.time.LocalDate
import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BusinessCalendarSpec extends SparkTestBase {
  import spark.implicits._
  import BusinessCalendar._

  // 2026-08-10 is a Monday
  private val mon = LocalDate.of(2026, 8, 10)

  test("addBusinessDays skips weekends in both directions") {
    assert(addBusinessDays(mon, 4) === mon.plusDays(4)) // Fri
    assert(addBusinessDays(mon, 5) === mon.plusDays(7)) // next Mon
    assert(addBusinessDays(mon.plusDays(4), 1) === mon.plusDays(7)) // Fri+1 = Mon
    assert(addBusinessDays(mon, -1) === mon.minusDays(3)) // prev Fri
  }

  test("addBusinessDays rolls a weekend start forward and skips holidays") {
    val sat = mon.plusDays(5)
    assert(addBusinessDays(sat, 0) === mon.plusDays(7)) // roll to Mon
    assert(addBusinessDays(sat, 1) === mon.plusDays(8)) // Tue
    val holiday = Set(mon.plusDays(1)) // Tue is a holiday
    assert(addBusinessDays(mon, 1, holiday) === mon.plusDays(2)) // Wed
  }

  test("lastSunday: a Sunday maps to the previous Sunday") {
    val sun = LocalDate.of(2026, 8, 9)
    assert(lastSunday(sun) === sun.minusDays(7))
    assert(lastSunday(mon) === sun)
    assert(lastSunday(mon.plusDays(2)) === sun)
  }

  test("nextBusinessWeek spans the following Mon-Fri") {
    val (m, f) = nextBusinessWeek(mon)
    assert(m === mon.plusDays(7) && f === mon.plusDays(11))
    val (m2, f2) = nextBusinessWeek(LocalDate.of(2026, 8, 9)) // a Sunday
    assert(m2 === mon && f2 === mon.plusDays(4))
  }

  test("addBusinessDaysCol agrees with the scalar form over a month") {
    val starts = (0 until 31).map(i => java.sql.Date.valueOf(mon.plusDays(i)))
    for (n <- Seq(0, 1, 3, 5, 9, 10)) {
      val got = starts.toDF("d")
        .select(col("d"), addBusinessDaysCol(col("d"), n).as("r"))
        .as[(java.sql.Date, java.sql.Date)].collect()
      got.foreach { case (d, r) =>
        assert(r.toLocalDate === addBusinessDays(d.toLocalDate, n),
          s"start=$d n=$n")
      }
    }
  }
}
