package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Decontamination, deterministic sampling, sequence packing. */
class PipelineOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("contaminationHits counts shared shingles; clean docs are absent") {
    val bench = Seq((1L, "the quick brown fox")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "a quick brown dog"),    // shares "quick brown"
      (11L, "the quick brown fox"),  // shares all 3 shingles
      (12L, "entirely different words here")).toDF("doc_id", "text")
    val vocab = Decontaminate.benchmarkShingles(bench, "text", 2)
    val hits = Decontaminate.contaminationHits(corpus, vocab, "doc_id", "text", 2)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(hits === Seq((10L, 1L), (11L, 3L)))
  }

  test("fuzzyContamination catches a paraphrase exact overlap underweights") {
    // bench doc vs a train doc with ONE word swapped: most shingles
    // still match -> high Jaccard, flagged; the unrelated doc is not
    val bench = Seq(
      (100L, "what is the capital city of france paris obviously today"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "what is the capital city of france paris obviously now"),
      (2L, "completely unrelated sentence about spark shuffles and joins"))
      .toDF("doc_id", "text")
    val got = Decontaminate.fuzzyContamination(corpus, bench,
        "doc_id", "text", threshold = 0.3)
      .select("train_id", "bench_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 100L)))
  }

  test("hashGate fractions: 0 keeps nothing, 1 keeps all, mid is stable") {
    val df = spark.range(1000).toDF("id")
    assert(df.filter(Sampling.hashGate(col("id"), 0.0)).count() === 0)
    assert(df.filter(Sampling.hashGate(col("id"), 1.0)).count() === 1000)
    val n1 = df.filter(Sampling.hashGate(col("id"), 0.5)).count()
    val n2 = df.repartition(13).filter(Sampling.hashGate(col("id"), 0.5)).count()
    assert(n1 === n2)                      // partitioning-invariant
    assert(n1 > 350 && n1 < 650)           // roughly the asked fraction
  }

  test("stratified applies per-stratum fractions with a default") {
    val df = (1L to 400L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val kept = Sampling.stratified(df, "id", "lang", Map("en" -> 0.0), 1.0)
    val byLang = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(!byLang.contains("en") && byLang("de") === 200L)
  }

  test("sqrtTemperatureMixture flattens head sources, keeps tiny ones whole") {
    // big: 400 docs, small: 4 docs. With scale=2.5: rate(big)=0.125,
    // rate(small)=1.0 (4 <= 2.5^2) — every small-source doc survives,
    // the big source is cut to ~scale*sqrt(n)=50
    val df = ((1L to 400L).map(i => (i, "big")) ++
      (1001L to 1004L).map(i => (i, "small"))).toDF("id", "src")
    val kept = Sampling.sqrtTemperatureMixture(df, "id", "src", scale = 2.5)
    val bySrc = kept.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(bySrc("small") === 4L)
    assert(bySrc("big") > 20L && bySrc("big") < 90L)
    // partitioning-invariant: the gate is a pure function of the id
    val rep = Sampling.sqrtTemperatureMixture(
      df.repartition(13), "id", "src", scale = 2.5).count()
    assert(rep === kept.count())
  }

  test("dedupeLines drops repeats after first occurrence, keeps order") {
    val df = Seq(
      "a\nb\na\nc\nb",
      "solo",
      "").toDF("t")
    val got = df.select(TextAnalysis.dedupeLines(col("t")).as("d"))
      .as[String].collect().toSeq
    assert(got === Seq("a\nb\nc", "solo", ""))
  }

  test("scrubPii redacts emails and phone numbers, leaves the rest") {
    val df = Seq(
      "mail bob.smith+x@foo.org or call 602-555-1234 now",
      "no pii here 12345").toDF("t")
    val got = df.select(TextAnalysis.scrubPii(col("t")).as("s"))
      .as[String].collect().toSeq
    assert(got === Seq(
      "mail <EMAIL> or call <PHONE> now",
      "no pii here 12345"))
  }

  test("packBins: greedy bins never exceed capacity, oversize doc gets its own bin") {
    val df = Seq(
      (1L, "g", 300L), (2L, "g", 300L),    // 300+300>512 -> doc 2 starts bin 1
      (3L, "g", 900L),                     // 300+900>512 -> oversize, own bin 2
      (4L, "g", 100L),                     // 900+100>512 -> bin 3
      (5L, "g", 400L),                     // 100+400<=512 -> packs with doc 4
      (6L, "h", 200L)).toDF("id", "g", "w") // new group resets to bin 0
    val out = Packing.packBins(df, Seq("g"), "id", "w", 512)
      .orderBy("id").select("id", "bin").as[(Long, Int)].collect().toSeq
    assert(out === Seq((1L, 0), (2L, 1), (3L, 2), (4L, 3), (5L, 3), (6L, 0)))
  }

  test("packBins: no bin's total exceeds capacity except single oversize docs") {
    val df = (1L to 200L).map(i => (i, s"g${i % 3}", (i * 37 % 400) + 1))
      .toDF("id", "g", "w")
    val bins = Packing.packBins(df, Seq("g"), "id", "w", 512)
      .groupBy("g", "bin")
      .agg(sum("w").as("tot"), count(lit(1)).as("n"))
      .filter(col("tot") > 512 && col("n") > 1)
    assert(bins.count() === 0L)
  }

  test("randomized: packBins equals a per-group sequential greedy reference") {
    // seeded weights around the capacity (some oversize) across 4
    // groups; expected bin ids come from the greedy recurrence written
    // directly as a per-group fold in id order
    val rnd = new scala.util.Random(20260821L)
    val rows = (1L to 300L).map(i =>
      (i, s"g${rnd.nextInt(4)}", rnd.nextInt(140).toLong + 1))
    val capacity = 100
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (_, rs) =>
      var bin = 0; var filled = 0L; var first = true
      rs.sortBy(_._1).map { case (id, _, w) =>
        if (first) { filled = w; first = false }
        else if (filled + w > capacity) { bin += 1; filled = w }
        else filled += w
        id -> bin
      }
    }.toMap
    val got = Packing.packBins(rows.toDF("id", "g", "w"),
        Seq("g"), "id", "w", capacity)
      .select("id", "bin").as[(Long, Int)].collect()
      .map { case (id, b) => id -> b }.toMap
    assert(got === expected)
  }

  test("packBins: ungrouped path requires explicit opt-in (scale trap)") {
    val df = Seq((1L, 10L)).toDF("id", "w")
    val e = intercept[IllegalArgumentException] {
      Packing.packBins(df, Seq.empty, "id", "w", 512)
    }
    assert(e.getMessage.contains("one partition"))
    // opt-in still works for small frames
    val out = Packing.packBins(df, Seq.empty, "id", "w", 512,
      allowGlobal = true)
    assert(out.select("bin").as[Int].collect().toSeq === Seq(0))
  }

  test("packBinsSharded: all rows kept, capacity holds per (shard, bin)") {
    val df = (1L to 300L).map(i => (i, (i * 37 % 400) + 1)).toDF("id", "w")
    val out = Packing.packBinsSharded(df, nShards = 8, "id", "w", 512)
    assert(out.count() === 300L)
    // shards actually spread the rows (crc32 over 300 ids hits >1 shard)
    assert(out.select("shard").distinct().count() > 1L)
    val over = out.groupBy("shard", "bin")
      .agg(sum("w").as("tot"), count(lit(1)).as("n"))
      .filter(col("tot") > 512 && col("n") > 1)
    assert(over.count() === 0L)
  }

  test("tokenBudget: inclusive running sum, over-budget doc dropped whole") {
    val df = Seq(
      ("s1", 1L, 400L), ("s1", 2L, 500L), ("s1", 3L, 200L),
      ("s2", 1L, 2000L), ("s2", 2L, 900L)) // head over budget: dropped whole
      .toDF("src", "id", "w")
    val out = Sampling.tokenBudget(df, Seq("src"), Seq(col("id")), "w", 1000L)
      .select("src", "id", "cum").as[(String, Long, Long)].collect().toSet
    // s1: 400, 900 admitted; 1100 crosses -> dropped. s2: 2000 crosses
    // immediately (dropped, not truncated); 900 alone never reached
    // budget-wise? cum for s2 id=2 is 2900 -> also out
    assert(out === Set(("s1", 1L, 400L), ("s1", 2L, 900L)))
  }

  test("balancedShards: all rows assigned, shard totals near-equal") {
    // weights spanning three decimal magnitudes, ids dense
    val rows = (1L to 400L).map(i => (i, 5L + (i * 37) % 995))
    val df = rows.toDF("id", "w")
    val out = Sampling.balancedShards(df, "id", "w", shards = 8)
    assert(out.count() === 400)
    assert(out.select("shard").distinct().count() === 8)
    val totals = out.groupBy("shard").agg(sum("w").as("t"))
      .select("t").as[Long].collect()
    val spread = (totals.max - totals.min).toDouble / totals.max
    // snake within magnitude cells: imbalance bounded by one doc's
    // weight per cell; on this fixture that is a few percent
    assert(spread < 0.10, s"shard totals too uneven: ${totals.toSeq}")
    // deterministic: a second run over a repartitioned input agrees
    val again = Sampling.balancedShards(df.repartition(7), "id", "w",
      shards = 8)
    assert(out.orderBy("id").collect().toSeq ===
      again.orderBy("id").collect().toSeq)
  }

  test("balancedShards: per-cell snake counts differ by at most one") {
    // within every (magnitude, subgroup) cell the boustrophedon hands
    // out ranks round-robin over 2S — shard counts in a cell can never
    // differ by more than 1, which is what makes global balance hold
    val rnd = new scala.util.Random(23)
    val rows = (1L to 500L).map(i => (i, 1L + rnd.nextInt(5000)))
    val out = Sampling.balancedShards(rows.toDF("id", "w"), "id", "w",
        shards = 8, subgroups = 4)
      .select(length(col("w").cast("string")).as("mag"),
        pmod(col("id"), lit(4)).as("sub"), col("shard"))
      .groupBy("mag", "sub", "shard").count()
      .groupBy("mag", "sub")
      .agg((max("count") - min("count")).as("spread"))
      .select("spread").as[Long].collect()
    assert(out.nonEmpty && out.forall(_ <= 1L),
      s"cell shard counts uneven: ${out.toSeq}")
  }

  test("rendezvousShards: resize moves ~1/(S+1) of keys, never more kinds") {
    val ids = (1L to 2000L).toDF("id")
    val s8 = Sampling.rendezvousShards(ids, "id", 8)
      .withColumnRenamed("shard", "s8")
    val s9 = Sampling.rendezvousShards(ids, "id", 9)
      .withColumnRenamed("shard", "s9")
    val joined = s8.join(s9, "id").select("id", "s8", "s9")
      .as[(Long, Int, Int)].collect()
    assert(joined.forall(r => r._2 >= 0 && r._2 < 8 && r._3 >= 0 && r._3 < 9))
    val moved = joined.filter(r => r._2 != r._3)
    // HRW: a key moves iff its NEW shard's draw wins — expect ~2000/9
    // ≈ 222; allow generous sampling noise either side
    assert(moved.length > 120 && moved.length < 350,
      s"${moved.length} keys moved, expected ≈ 222")
    // every moved key moves TO the new shard, never between old shards
    assert(moved.forall(_._3 == 8),
      "a resize must only move keys onto the added shard")
    // balance: md5 draws spread keys evenly-ish over 8 shards
    val counts = joined.groupBy(_._2).map(_._2.length)
    assert(counts.min > 150 && counts.max < 350, s"uneven: $counts")
  }

  test("rateGate: column rate matches hashGate at the same literal rate; nested") {
    val df = spark.range(0, 1000).toDF("id")
    for (r <- Seq(0.0, 0.25, 1.0)) {
      val viaRate = df.filter(Sampling.rateGate(col("id"), lit(r))).count()
      val viaLit = df.filter(Sampling.hashGate(col("id"), r)).count()
      assert(viaRate === viaLit, s"rate $r: column gate $viaRate != literal $viaLit")
    }
    // monotone: everything kept at 0.2 is kept at 0.6
    val low = df.filter(Sampling.rateGate(col("id"), lit(0.2)))
    val high = df.filter(Sampling.rateGate(col("id"), lit(0.6)))
    assert(low.exceptAll(high).count() === 0)
  }


  test("rateGate equals hashGate across 16 random rates (same draws)") {
    val rnd = new scala.util.Random(11)
    val df = spark.range(0, 500).toDF("id")
    (1 to 16).map(_ => rnd.nextDouble()).foreach { r =>
      val viaRate = df.filter(Sampling.rateGate(col("id"), lit(r))).count()
      val viaLit = df.filter(Sampling.hashGate(col("id"), r)).count()
      assert(viaRate === viaLit, s"rate $r")
    }
  }


  test("paddingReport: length-sorting eliminates waste a mixed batch pays") {
    // two batches of 2: arrival order pairs (10,100) twice -> pad 180;
    // sorted pairs (100,100) and (10,10) -> pad 0
    val docs = Seq((1L, "g", 10L), (2L, "g", 100L), (3L, "g", 10L),
      (4L, "g", 100L)).toDF("id", "grp", "w")
    val r = Packing.paddingReport(docs, Seq("grp"), "id", "w", batchRows = 2)
      .collect()(0)
    assert(r.getAs[Long]("pad_sorted_ppm") === 0L)
    // arrival: each batch pads 10 -> 100: waste 90 per batch over 200
    // slots/batch -> 180/400 = 450000 ppm
    assert(r.getAs[Long]("pad_arrival_ppm") === 450000L)
  }

  test("paddingReport: a ragged final batch pads against its own max") {
    val docs = Seq((1L, "g", 5L), (2L, "g", 7L), (3L, "g", 9L))
      .toDF("id", "grp", "w")
    val r = Packing.paddingReport(docs, Seq("grp"), "id", "w", batchRows = 2)
      .collect()(0)
    // sorted desc: batch0 = (9,7) pad 2 over 18; batch1 = (5) pad 0 over 5
    assert(r.getAs[Long]("pad_sorted_ppm") === (1000000L * 2 / 23))
  }

  test("systematicSample: picks are weight-proportional per stratum") {
    // stratum A: 10 docs x 100 tokens = 1000 total; step 250 -> 4 picks
    // stratum B: 3 docs x 100 = 300 -> 1 pick
    val docs = ((1L to 10L).map(i => (i, "A", 100L)) ++
      (11L to 13L).map(i => (i, "B", 100L))).toDF("id", "src", "w")
    val out = Sampling.systematicSample(docs, Seq("src"),
      Seq(org.apache.spark.sql.functions.col("id")), "w", step = 250L)
    val picks = out.groupBy("src")
      .agg(org.apache.spark.sql.functions.sum("n_picks").as("n"))
      .as[(String, Long)].collect().toMap
    assert(picks("A") === 4L)
    assert(picks("B") === 1L)
  }

  test("systematicSample: a row heavier than step carries multiple picks") {
    val docs = Seq((1L, "A", 1000L), (2L, "A", 10L)).toDF("id", "src", "w")
    val out = Sampling.systematicSample(docs, Seq("src"),
      Seq(org.apache.spark.sql.functions.col("id")), "w", step = 250L)
      .as[(Long, String, Long, Long)].collect().toSeq
    // grid points 125, 375, 625, 875 all fall inside row 1
    assert(out.map(t => (t._1, t._4)) === Seq((1L, 4L)))
  }

  test("systematicSample is partitioning-invariant") {
    val docs = (1L to 50L).map(i => (i, s"s${i % 3}", 10L + i % 7))
      .toDF("id", "src", "w")
    val a = Sampling.systematicSample(docs, Seq("src"),
      Seq(org.apache.spark.sql.functions.col("id")), "w", 60L)
      .orderBy("id").collect().toSeq
    val b = Sampling.systematicSample(docs.repartition(11), Seq("src"),
      Seq(org.apache.spark.sql.functions.col("id")), "w", 60L)
      .orderBy("id").collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  test("rateGate: negative rate keeps NOTHING (hex truncation would invert it)") {
    // hex() of a negative int renders 16 F's; lpad truncates to "ff",
    // which would admit ~255/256 of rows — the clamp must keep zero
    val df = (1L to 200L).toDF("id")
      .withColumn("r", lit(-0.25))
    assert(df.filter(Sampling.rateGate(col("id"), col("r"))).count() === 0L)
    // and rate >= 1.0 keeps everything
    assert(df.filter(Sampling.rateGate(col("id"), lit(1.0))).count() === 200L)
  }

  test("sqrtTemperatureMixture: null-source docs are gated, not silently dropped") {
    val df = ((1L to 30L).map(i => (i, "a")) ++
      (31L to 40L).map(i => (i, null: String))).toDF("id", "src")
    // scale large enough that every source keeps everything: all 40
    // rows must survive, INCLUDING the null-source group
    val kept = Sampling.sqrtTemperatureMixture(df, "id", "src", scale = 100.0)
    assert(kept.count() === 40L)
    assert(kept.filter(col("src").isNull).count() === 10L,
      "null-source rows must ride the null-safe rate join")
  }

  test("balancedShards: string ids shard without a numeric cast (ANSI-safe)") {
    val df = (1 to 40).map(i => (s"doc-$i", (i % 7 + 1) * 10L))
      .toDF("id", "w")
    val out = Sampling.balancedShards(df, "id", "w", shards = 3)
    val byShard = out.groupBy("shard").agg(sum("w").as("tw"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byShard.keySet.subsetOf(Set(0, 1, 2)) && byShard.nonEmpty)
  }
}
