package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FramesSpec extends SparkTestBase {
  import spark.implicits._

  test("dfCompare: identical schemas report equal, colOnly runs no count") {
    val a = Seq((1L, "x")).toDF("id", "v")
    val b = Seq((2L, "y"), (3L, "z")).toDF("id", "v")
    val d = Frames.dfCompare(a, b)
    assert(d.columnsEqual && d.schemaEqual)
    assert(d.rowsA.isEmpty && d.rowsB.isEmpty)
    assert(d.report === "frames are structurally equal")
  }

  test("dfCompare: column and dtype drift is reported both ways") {
    val a = Seq((1L, "x", 0.5)).toDF("id", "v", "extra_a")
    val b = Seq(("1", "y", true)).toDF("id", "v", "extra_b")
    val d = Frames.dfCompare(a, b)
    assert(d.onlyInA === Seq("extra_a") && d.onlyInB === Seq("extra_b"))
    assert(d.dtypeDiffs === Seq(("id", "bigint", "string")))
    assert(!d.schemaEqual && d.columnsEqual === false)
  }

  test("dfCompare with counts computes percent change") {
    val a = spark.range(110).toDF("id")
    val b = spark.range(100).toDF("id")
    val d = Frames.dfCompare(a, b, colOnly = false)
    assert(d.rowsA === Some(110L) && d.rowsB === Some(100L))
    assert(d.pctChange.exists(p => math.abs(p - 10.0) < 1e-12))
    assert(d.report.contains("a=110 b=100"))
  }

  test("maskedDiff emits one report row with drift and date range") {
    val cur = Seq(("2026-01-03", 1), ("2026-01-28", 2), ("2026-01-10", 3))
      .toDF("d", "x").withColumn("d", to_date($"d"))
    val prev = Seq(("2025-12-01", 1), ("2025-12-02", 2))
      .toDF("d", "x").withColumn("d", to_date($"d"))
    val r = Frames.maskedDiff(cur, prev, "d").collect()(0)
    assert(r.getAs[Long]("n_cur") === 3L && r.getAs[Long]("n_prev") === 2L)
    assert(r.getAs[Double]("pct_change") === 50.0)
    assert(r.getAs[String]("min_date") === "2026-01-03")
    assert(r.getAs[String]("max_date") === "2026-01-28")
  }

  test("maskedDiff: empty previous extract yields null pct_change, not Infinity") {
    val cur = Seq(("2026-01-03", 1)).toDF("d", "x").withColumn("d", to_date($"d"))
    val prev = cur.filter(lit(false))
    val r = Frames.maskedDiff(cur, prev, "d").collect()(0)
    assert(r.getAs[Long]("n_cur") === 1L && r.getAs[Long]("n_prev") === 0L)
    assert(r.isNullAt(r.fieldIndex("pct_change")))
  }

  test("scd2 collapses runs, reopens on A->B->A, null-safe, marks current") {
    val snaps = Seq(
      // key 1: A,A,B,A -> three intervals; B and the 2nd A reopen
      (1L, 2001, Some("A")), (1L, 2002, Some("A")),
      (1L, 2003, Some("B")), (1L, 2005, Some("A")), // gap year 2004 absent
      // key 2: null attr is a VALUE: null,null collapse; X reopens
      (2L, 2001, None), (2L, 2002, None), (2L, 2003, Some("X")))
      .toDF("k", "ver", "attr")
    val out = Frames.scd2(snaps, Seq("k"), Seq("attr"), "ver")
      .orderBy("k", "valid_from")
      .as[(Long, Option[String], Int, Int, Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, Some("A"), 2001, 2002, false),
      (1L, Some("B"), 2003, 2003, false),
      (1L, Some("A"), 2005, 2005, true),
      (2L, None, 2001, 2002, false),
      (2L, Some("X"), 2003, 2003, true)))
  }

  test("randomized: scd2 equals a single-threaded run-collapse reference") {
    // seeded snapshots: 12 keys, unique versions per key, attrs drawn
    // from a 3-value domain INCLUDING null so the null-safe compare
    // and reopen paths are exercised constantly; the expected history
    // is a direct per-key fold over the sorted snapshot list
    val rnd = new scala.util.Random(20260819L)
    val snaps = (1 to 12).flatMap { k =>
      val versions = rnd.shuffle((1 to 40).toList).take(5 + rnd.nextInt(15)).sorted
      versions.map(v => (k.toLong, v,
        rnd.nextInt(3) match {
          case 0 => Some("A"); case 1 => Some("B"); case _ => None
        }))
    }
    val expected = snaps.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
      val sorted = rows.sortBy(_._2)
      val runs = sorted.foldLeft(List.empty[(Option[String], Int, Int)]) {
        case (acc, (_, v, a)) => acc match {
          case (pa, from, _) :: tail if pa == a => (pa, from, v) :: tail
          case _ => (a, v, v) :: acc
        }
      }.reverse
      runs.zipWithIndex.map { case ((a, from, to), i) =>
        (k, a, from, to, i == runs.size - 1)
      }
    }.toSet
    val got = Frames.scd2(snaps.toDF("k", "ver", "attr"),
        Seq("k"), Seq("attr"), "ver")
      .as[(Long, Option[String], Int, Int, Boolean)].collect().toSet
    assert(got === expected)
  }

  test("scd2 multi-attr: change in ANY attr opens a new interval") {
    val snaps = Seq(
      (1L, 1, "a", 10), (1L, 2, "a", 10), (1L, 3, "a", 20))
      .toDF("k", "ver", "s", "n")
    val out = Frames.scd2(snaps, Seq("k"), Seq("s", "n"), "ver")
      .orderBy("valid_from")
      .as[(Long, String, Int, Int, Int, Boolean)].collect().toSeq
    assert(out === Seq((1L, "a", 10, 1, 2, false), (1L, "a", 20, 3, 3, true)))
  }

  test("tableChecksum is order- and partitioning-invariant") {
    val df = (1L to 100L).map(i => (i, s"name$i")).toDF("k", "v")
    val a = Frames.tableChecksum(df, Seq("k", "v")).collect()(0)
    val b = Frames.tableChecksum(
      df.orderBy($"k".desc).repartition(17), Seq("k", "v")).collect()(0)
    assert(a === b)
    assert(a.getAs[Long]("n_rows") === 100L)
  }

  test("groupedChecksum channels fold to the whole-table checksum") {
    val df = (1L to 60L).map(i => (i % 3, i, s"v$i")).toDF("g", "k", "v")
    val grouped = Frames.groupedChecksum(df, Seq("g"), Seq("k", "v")).collect()
    val whole = Frames.tableChecksum(df, Seq("k", "v")).collect()(0)
    assert(grouped.map(_.getAs[Long]("n_rows")).sum === whole.getAs[Long]("n_rows"))
    assert(grouped.map(_.getAs[Long]("xor_fp")).reduce(_ ^ _) ===
      whole.getAs[Long]("xor_fp"))
    assert(grouped.map(_.getAs[Long]("sum_fp")).sum % 1000000007L ===
      whole.getAs[Long]("sum_fp"))
  }

  test("groupedChecksum fuses extra aggregates into the same pass") {
    val df = Seq((0L, 1L, "a", 10L), (0L, 2L, "b", 20L), (1L, 3L, "c", 5L))
      .toDF("g", "k", "v", "w")
    val out = Frames.groupedChecksum(df, Seq("g"), Seq("k", "v"),
      Seq(org.apache.spark.sql.functions.sum("w").as("w_sum")))
      .orderBy("g").collect()
    assert(out.map(_.getAs[Long]("w_sum")).toSeq === Seq(30L, 5L))
  }

  test("tableChecksum detects a value flip and a duplicated row") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val base = Frames.tableChecksum(df, Seq("k", "v")).collect()(0)
    val flipped = Frames.tableChecksum(
      Seq((1L, "a"), (2L, "c")).toDF("k", "v"), Seq("k", "v")).collect()(0)
    assert(base.getAs[Long]("xor_fp") !== flipped.getAs[Long]("xor_fp"))
    // duplicating BOTH rows xors every fingerprint out to 0 — the sum
    // channel is what catches replay/duplication corruption
    val doubled = Frames.tableChecksum(
      df.unionAll(df), Seq("k", "v")).collect()(0)
    assert(doubled.getAs[Long]("xor_fp") === 0L)
    assert(doubled.getAs[Long]("sum_fp") ===
      (2L * base.getAs[Long]("sum_fp")) % 1000000007L)
    assert(doubled.getAs[Long]("n_rows") === 4L)
  }
}
