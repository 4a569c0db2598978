package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkTestBase {
  import spark.implicits._

  test("keepFirst keeps exactly one row per key by priority order") {
    val df = Seq(
      ("d1", "N", 1), ("d1", "Y", 2), ("d1", "Y", 3),
      ("d2", "N", 4)).toDF("dea", "active", "seq")
    val out = Relational.keepFirst(df, Seq("dea"),
      Seq(col("active").desc, col("seq").asc))
      .orderBy("dea").as[(String, String, Int)].collect()
    assert(out.toSeq === Seq(("d1", "Y", 2), ("d2", "N", 4)))
  }

  test("fallbackMatch: stage-2 only fires for rows missed by stage 1") {
    val left = Seq(("a", "f1"), ("b", "f2"), ("c", "f3")).toDF("pk", "fk")
    val right = Seq(("a", "x", "primaryA"), ("zz", "f2", "fallbackB"))
      .toDF("rpk", "rfk", "tag")
    val out = Relational.fallbackMatch(left, right, ("pk", "rpk"), ("fk", "rfk"))
      .select("pk", "tag").as[(String, String)].collect().toSet
    // a matches primary; b misses primary, matches fallback; c matches nothing
    assert(out === Set(("a", "primaryA"), ("b", "fallbackB")))
  }

  test("randomized: fallbackMatch equals its set-comprehension reference") {
    // small key domains force plenty of primary hits, fallback-only
    // hits, multi-matches on both stages, and full misses; the
    // expected pair set is the two-stage definition written directly:
    // primary equi pairs, plus fallback equi pairs for left rows with
    // NO primary match anywhere in right
    val rnd = new scala.util.Random(20260820L)
    def k(n: Int): String = s"k${rnd.nextInt(n)}"
    val leftRows = (1 to 80).map(i => (i.toLong, k(12), k(8)))
    val rightRows = (1 to 60).map(j => (k(12), k(8), j.toLong))
    val primaryKeys = rightRows.map(_._1).toSet
    val expected = (for {
      (lid, pk, fk) <- leftRows
      (rpk, rfk, rid) <- rightRows
      if (pk == rpk) || (!primaryKeys.contains(pk) && fk == rfk)
    } yield (lid, rid)).toSet
    val got = Relational.fallbackMatch(
        leftRows.toDF("lid", "pk", "fk"),
        rightRows.toDF("rpk", "rfk", "rid"),
        ("pk", "rpk"), ("fk", "rfk"))
      .select("lid", "rid").as[(Long, Long)].collect()
    assert(got.length === got.toSet.size, "duplicate match pairs emitted")
    assert(got.toSet === expected)
  }

  test("valueCounts sorts by count desc then value") {
    val df = Seq("x", "y", "y", "z", "z").toDF("v")
    val out = Relational.valueCounts(df, "v").as[(String, Long)].collect().toSeq
    assert(out === Seq(("y", 2L), ("z", 2L), ("x", 1L)))
  }

  test("argmaxCount returns all tied argmax groups") {
    val df = Seq("a", "a", "b", "b", "c").toDF("k")
    val out = Relational.argmaxCount(df, Seq("k"))
      .orderBy("k").as[(String, Long)].collect().toSeq
    assert(out === Seq(("a", 2L), ("b", 2L)))
  }

  test("sampleN is exact-n and deterministic") {
    val df = (1 to 100).toDF("id").withColumn("id", col("id").cast("long"))
    val s1 = Relational.sampleN(df, 20, Seq("id")).as[Long].collect().toSeq
    val s2 = Relational.sampleN(df, 20, Seq("id")).as[Long].collect().toSeq
    assert(s1.size === 20 && s1 === s2)
  }

  test("saltedJoin result is identical to the plain join") {
    val fact = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d"))
      .toDF("k", "payload")   // key 1 is "skewed"
    val dim = Seq((1L, "dim1"), (2L, "dim2"), (3L, "dim3")).toDF("k", "attr")
    val plain = fact.join(dim, Seq("k")).orderBy("k", "payload")
      .collect().toSeq
    val salted = Relational.saltedJoin(fact, dim, "k", salts = 4)
      .select("k", "payload", "attr").orderBy("k", "payload")
      .collect().toSeq
    assert(salted === plain && salted.size === 4)
  }

  test("saltedJoin rejects join types that would duplicate dim rows") {
    val fact = Seq((1L, "a")).toDF("k", "payload")
    val dim = Seq((1L, "dim1")).toDF("k", "attr")
    intercept[IllegalArgumentException](
      Relational.saltedJoin(fact, dim, "k", salts = 4, joinType = "right"))
  }

  test("guardedLeftJoin enriches like a plain left join on a unique dim") {
    val fact = Seq((1, "a"), (2, "b"), (3, "c"), (1, "d")).toDF("k", "v")
    val dim = Seq((1, "X"), (2, "Y")).toDF("k", "name")
    val got = Relational.guardedLeftJoin(fact, dim, "k")
      .orderBy("v").as[(Int, String, String)].collect().toSeq
    assert(got === Seq((1, "a", "X"), (2, "b", "Y"), (3, "c", null),
      (1, "d", "X")))
  }

  test("guardedLeftJoin aborts naming the hot key on dim fan-out") {
    val fact = Seq((1, "a")).toDF("k", "v")
    val dim = Seq((1, "X"), (1, "X2"), (2, "Y")).toDF("k", "name")
    val e = intercept[Exception] {
      Relational.guardedLeftJoin(fact, dim, "k").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("guardedLeftJoin") &&
      m.contains("'1'")), s"unexpected error: $e")
    // raising the bound admits the documented fan-out
    assert(Relational.guardedLeftJoin(fact, dim, "k",
      maxMatchesPerKey = 2L).count() === 2)
  }

  test("requireEmpty passes on empty, throws with a preview otherwise") {
    val ok = Seq.empty[Long].toDF("k")
    Relational.requireEmpty(ok, "should not throw")
    val bad = Seq(7L, 8L).toDF("k")
    val e = intercept[IllegalStateException](
      Relational.requireEmpty(bad, "bad rows found"))
    assert(e.getMessage.contains("bad rows found") && e.getMessage.contains("[7]"))
  }

  test("semiByKey / antiByKey partition the frame") {
    val df = Seq(1L, 2L, 3L, 4L).toDF("k")
    val lookup = Seq(2L, 4L, 9L).toDF("other")
    val semi = Relational.semiByKey(df, "k", lookup, "other").as[Long].collect().toSet
    val anti = Relational.antiByKey(df, "k", lookup, "other").as[Long].collect().toSet
    assert(semi === Set(2L, 4L) && anti === Set(1L, 3L))
  }

  test("upsert keeps the newest version per key, passes through the rest") {
    val base = Seq((1L, 1, "a"), (2L, 1, "b"), (3L, 1, "c")).toDF("k", "ver", "v")
    val upd = Seq((2L, 2, "B"), (4L, 2, "D")).toDF("k", "ver", "v")
    val out = Relational.upsert(base, upd, Seq("k"), "ver")
      .orderBy("k").as[(Long, Int, String)].collect().toSeq
    assert(out === Seq((1L, 1, "a"), (2L, 2, "B"), (3L, 1, "c"), (4L, 2, "D")))
  }

  test("editDistancePairs: in-block pairs within maxDist, each pair once") {
    val df = Seq(
      (1L, "n1", "kitten"),
      (2L, "n1", "sitten"),   // dist 1 from kitten
      (3L, "n1", "sitting"),  // dist 2 from sitten, 3 from kitten
      (4L, "n2", "kitten")    // other block: never paired with n1 rows
    ).toDF("id", "blk", "name")
    val out = Relational.editDistancePairs(df, "id", "blk", "name", 2)
      .select("key_a", "key_b", "dist")
      .as[(Long, Long, Int)].collect().toSet
    assert(out === Set((1L, 2L, 1), (2L, 3L, 2)))
  }

  test("deletionNeighborhoodPairs covers every edit kind and nothing past 1") {
    val df = Seq(
      (1L, "n1", "kitten"),
      (2L, "n1", "sitten"),   // substitution -> dist 1
      (3L, "n1", "kittens"),  // insertion -> dist 1
      (4L, "n1", "kitte"),    // deletion -> dist 1
      (5L, "n1", "kitten"),   // equal -> dist 0
      (6L, "n1", "sittin"),   // dist 2 from kitten: shares a deletion
                              // variant with sitten only
      (7L, "n2", "kitten")    // other block: never paired with n1 rows
    ).toDF("id", "blk", "name")
    val out = Relational.deletionNeighborhoodPairs(df, "id", "blk", "name")
      .select("key_a", "key_b", "dist")
      .as[(Long, Long, Int)].collect().toSet
    assert(out === Set((1L, 2L, 1), (1L, 3L, 1), (1L, 4L, 1), (1L, 5L, 0),
      (2L, 5L, 1), (3L, 5L, 1), (4L, 5L, 1), (2L, 6L, 1)))
  }

  test("deletionNeighborhoodPairs agrees with editDistancePairs at maxDist=1") {
    // randomized-ish corpus without RNG: md5-derived 6-char strings over
    // a 3-letter alphabet make distance-<=1 collisions common
    val base = spark.range(300).selectExpr("id",
      "cast(id % 3 as string) as blk",
      "substring(regexp_replace(md5(cast(id as string)), '[^abc]', ''), 1, 4) as name")
      .filter(length(col("name")) >= 2)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("key_a", "key_b", "dist")
      .as[(Long, Long, Int)].collect().toSet
    val brute = key(Relational.editDistancePairs(base, "id", "blk", "name", 1))
    val symspell = key(Relational.deletionNeighborhoodPairs(base, "id", "blk", "name"))
    assert(symspell === brute)
    assert(brute.nonEmpty)
  }

  test("upsert breaks equal-version ties toward updates, deterministically") {
    val base = Seq((1L, 5, "old"), (2L, 5, "keep")).toDF("k", "ver", "v")
    val upd = Seq((1L, 5, "new")).toDF("k", "ver", "v")
    val out = Relational.upsert(base, upd, Seq("k"), "ver")
      .orderBy("k").as[(Long, Int, String)].collect().toSeq
    assert(out === Seq((1L, 5, "new"), (2L, 5, "keep")))
  }

  test("deletionNeighborhood ≡ blocked pairing on a dense random space") {
    // tiny alphabet + short strings = the densest possible edit-1
    // neighborhood, including empty and length-1 strings real name
    // data never exercises
    val rnd = new scala.util.Random(7)
    val rows = (1L to 150L).map { i =>
      val len = rnd.nextInt(5)
      (i, "blk", (0 until len).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString)
    }.toDF("id", "blk", "s")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("key_a", "key_b", "dist")
        .as[(Long, Long, Int)].collect().toSet
    val brute = key(Relational.editDistancePairs(rows, "id", "blk", "s", 1))
    val sym = key(Relational.deletionNeighborhoodPairs(rows, "id", "blk", "s"))
    assert(sym === brute)
    assert(brute.size > 100, s"dense space expected, got ${brute.size} pairs")
  }

  test("forwardFill carries the last non-null within the group only") {
    val df = Seq(
      ("a", 1L, Some(10.0)), ("a", 2L, None), ("a", 3L, Some(30.0)),
      ("a", 4L, None),
      ("b", 1L, None), ("b", 2L, Some(5.0))) // leading null stays null
      .map { case (g, i, v) => (g, i, v.map(Double.box).orNull) }
      .toDF("g", "i", "v")
    val got = Relational.forwardFill(df, Seq("g"), Seq(col("i")), "v")
      .orderBy("g", "i")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(got === Seq(
      ("a", 1L, Some(10.0)), ("a", 2L, Some(10.0)), ("a", 3L, Some(30.0)),
      ("a", 4L, Some(30.0)),
      ("b", 1L, None), ("b", 2L, Some(5.0))))
  }

  test("bloomSemiJoin matches the plain semi join exactly") {
    val fact = (1L to 1000L).map(i => (i, i % 97)).toDF("row_id", "key")
    val dim = Seq(3L, 42L, 96L).toDF("dk")
    val got = Relational.bloomSemiJoin(fact, dim, "key", "dk",
      expectedItems = 3)
      .select("row_id").as[Long].collect().toSet
    val want = fact.join(dim, fact("key") === dim("dk"), "left_semi")
      .select("row_id").as[Long].collect().toSet
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("bloomSemiJoin's filter prunes most non-matching rows pre-join") {
    import org.apache.spark.sql.GraftShim
    val dim = Seq(5L, 10L).toDF("dk")
    val bf = dim.stat.bloomFilter("dk", 2, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val fact = (1L to 10000L).toDF("key")
    val survivors = fact.filter(GraftShim.column(
        graft.functions.BloomMightContain(
          GraftShim.expression(col("key")), bos.toByteArray)))
      .count()
    // 2 true keys + ~1% fpp of 10k — generous ceiling, zero flake
    assert(survivors >= 2 && survivors <= 500,
      s"bloom let $survivors of 10000 rows through")
  }

  test("bloomSemiJoin on STRING keys matches the plain semi join") {
    // the round-5 advice case: stat.bloomFilter hashes strings via the
    // UTF-8 binary path; probing with the long path returned false
    // negatives. Pin the fixed string-probing branch exactly.
    val fact = (1L to 500L).map(i => (i, s"name_${i % 37}")).toDF("row_id", "key")
    val dim = Seq("name_3", "name_17", "name_36", "absent").toDF("dk")
    val got = Relational.bloomSemiJoin(fact, dim, "key", "dk",
      expectedItems = 4)
      .select("row_id").as[Long].collect().toSet
    val want = fact.join(dim, fact("key") === dim("dk"), "left_semi")
      .select("row_id").as[Long].collect().toSet
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("bloomSemiJoin rejects mixed key types eagerly") {
    val fact = Seq(("1", 1L)).toDF("key", "v")
    val dim = Seq(1L).toDF("dk")
    val e = intercept[IllegalArgumentException] {
      Relational.bloomSemiJoin(fact, dim, "key", "dk", expectedItems = 1)
    }
    assert(e.getMessage.contains("both integral or both string"))
  }

  test("editDistancePairs maxBlockRows guard: passes under, throws over") {
    val df = Seq(
      (1L, "n1", "kitten"), (2L, "n1", "sitten"), (3L, "n1", "sitting"),
      (4L, "n2", "kitten")).toDF("id", "blk", "name")
    // limit above the hottest block (3 rows): same answer as unguarded
    val ok = Relational.editDistancePairs(df, "id", "blk", "name", 2,
      maxBlockRows = Some(3L))
      .select("key_a", "key_b", "dist").as[(Long, Long, Int)].collect().toSet
    assert(ok === Set((1L, 2L, 1), (2L, 3L, 2)))
    // limit below: fails fast with the block named in the message
    val e = intercept[Exception] {
      Relational.editDistancePairs(df, "id", "blk", "name", 2,
        maxBlockRows = Some(2L)).count()
    }
    assert(e.getMessage.contains("maxBlockRows"), e.getMessage)
  }

  test("editDistancePairsBucketed ≡ editDistancePairs on a dense space") {
    // one hot block (the pathological input for the unguarded pairing),
    // string lengths spanning several buckets so ghost-bucket matching
    // is exercised across every adjacent-bucket boundary
    val rnd = new scala.util.Random(11)
    val rows = (1L to 200L).map { i =>
      val len = rnd.nextInt(7) // buckets 0..3 at maxDist=1 (width 2)
      (i, "blk", (0 until len).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString)
    }.toDF("id", "blk", "s")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("key_a", "key_b", "dist")
        .as[(Long, Long, Int)].collect().toSet
    for (maxDist <- Seq(0, 1, 2)) {
      val brute = key(Relational.editDistancePairs(rows, "id", "blk", "s", maxDist))
      val bucketed = key(Relational.editDistancePairsBucketed(
        rows, "id", "blk", "s", maxDist))
      assert(bucketed === brute, s"maxDist=$maxDist")
      assert(brute.size > 50, s"dense space expected at maxDist=$maxDist")
    }
  }

  test("sampleN orders by the portable md5 key (DuckDB-recomputable)") {
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
    val got = Relational.sampleN(df, 5, Seq("k")).select("k").as[Long]
      .collect().toSet
    // reference order computed independently of the operator
    val want = (1L to 100L)
      .sortBy(i => java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
      .take(5).toSet
    assert(got === want)
  }

  test("groupedMedian picks the lower-median, matches a sort reference") {
    // odd group, even group (lower median), all-ties group, singleton
    val rows = Seq(
      ("a", 5L), ("a", 1L), ("a", 9L),                    // median 5
      ("b", 4L), ("b", 2L), ("b", 8L), ("b", 6L),         // lower median 4
      ("c", 7L), ("c", 7L), ("c", 7L),                    // median 7
      ("d", 3L))                                          // median 3
    val got = Relational.groupedMedian(rows.toDF("k", "v"), "k", "v")
      .orderBy("k").as[(String, Long)].collect().toSeq
    val want = rows.groupBy(_._1).toSeq.map { case (k, vs) =>
      val sorted = vs.map(_._2).sorted
      (k, sorted((sorted.size + 1) / 2 - 1))              // rank (n+1) div 2
    }.sortBy(_._1)
    assert(got === want)
  }

  test("groupedMedian agrees with the row_number formulation at random") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(500)((s"g${rnd.nextInt(5)}", rnd.nextInt(12).toLong))
    val got = Relational.groupedMedian(rows.toDF("k", "v"), "k", "v")
      .orderBy("k").as[(String, Long)].collect().toSeq
    val want = rows.groupBy(_._1).toSeq.map { case (k, vs) =>
      val sorted = vs.map(_._2).sorted
      (k, sorted((sorted.size + 1) / 2 - 1))
    }.sortBy(_._1)
    assert(got === want)
  }

}
