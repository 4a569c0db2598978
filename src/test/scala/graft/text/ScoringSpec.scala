package graft.text

import graft.SparkTestBase

class ScoringSpec extends SparkTestBase {
  import spark.implicits._

  test("bm25: more occurrences of a rarer term scores higher") {
    val docs = Seq(
      (1L, "cat cat cat dog"),
      (2L, "cat dog dog dog"),
      (3L, "bird bird bird bird"),
      (4L, "dog dog dog dog")).toDF("id", "txt")
    val scores = Scoring.bm25(docs, Seq("id"), "txt", Seq("cat"))
      .as[(Long, Double)].collect().toMap
    // df(cat)=2 of 4; doc 1 has tf 3 vs doc 2 tf 1; docs 3/4 score 0
    assert(scores(1L) > scores(2L))
    assert(scores(2L) > 0.0)
    assert(scores(3L) === 0.0 && scores(4L) === 0.0)
  }

  test("bm25: multi-term score is the sum of per-term scores") {
    val docs = Seq(
      (1L, "cat dog fish"),
      (2L, "fish fish fish")).toDF("id", "txt")
    val both = Scoring.bm25(docs, Seq("id"), "txt", Seq("cat", "dog"))
      .as[(Long, Double)].collect().toMap
    val cat = Scoring.bm25(docs, Seq("id"), "txt", Seq("cat"))
      .as[(Long, Double)].collect().toMap
    val dog = Scoring.bm25(docs, Seq("id"), "txt", Seq("dog"))
      .as[(Long, Double)].collect().toMap
    assert(both(1L) === cat(1L) + dog(1L))
    assert(both(2L) === 0.0)
  }

  test("bm25: saturation — tf doubling gains less than linearly") {
    val docs = Seq(
      (1L, "x a a a a a a a"),
      (2L, "x x a a a a a a"),
      (4L, "x x x x a a a a")).toDF("id", "txt")
    val s = Scoring.bm25(docs, Seq("id"), "txt", Seq("x"))
      .as[(Long, Double)].collect().toMap
    assert(s(2L) > s(1L) && s(4L) > s(2L))
    assert(s(4L) - s(2L) < s(2L) - s(1L)) // diminishing returns in tf
  }

  test("bigramFluency: corpus-common continuations score above salad") {
    // bigram counts: "the cat"=3, "cat sat"=2, "sat the"=1, "the dog"=1,
    // "dog sat"=1, "sat down"=1; prefix counts: the=4, cat=2, sat=2, dog=1
    val docs = Seq(
      (1L, "the cat sat"),       // 5/6 — the corpus's repeated phrasing
      (2L, "the cat sat"),
      (3L, "sat the cat"),       // 4/6 — same tokens reshuffled
      (4L, "x"),                 // < 2 tokens -> no row
      (5L, "the dog sat down"))  // 3/7 — one-off continuations
      .toDF("id", "txt")
    val out = Scoring.bigramFluency(docs, "id", "txt")
      .orderBy("id")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out.map(_._1) === Seq(1L, 2L, 3L, 5L))
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L) === byId(2L).copy(_1 = 1L)) // identical docs tie
    assert(byId(1L)._5 > byId(3L)._5,
      "repeated phrasing must outscore the reshuffled token salad")
    assert(byId(3L)._5 > byId(5L)._5)
    assert(byId(1L)._5 === 5.0 / 6.0 && byId(3L)._5 === 4.0 / 6.0 &&
      byId(5L)._5 === 3.0 / 7.0)
  }

  test("phraseScores: exact ppm discounted lift, min-count filter") {
    // N = 7 tokens; "new york" occurs 3x (c_a = c_b = 3);
    // every other pair occurs < 3 times and is filtered
    val docs = Seq((1L, "new york new york"), (2L, "new york city"))
      .toDF("id", "txt")
    val got = Scoring.phraseScores(docs, "txt")
      .as[(String, Long, Long)].collect().toSeq
    graft.ops.StageCache.releaseAll()
    assert(got === Seq(("new york", 3L, (1L * 7L * 1000000L) / 9L)))
  }

  test("phraseScores rejects minCount <= delta") {
    val docs = Seq((1L, "a b")).toDF("id", "txt")
    intercept[IllegalArgumentException] {
      Scoring.phraseScores(docs, "txt", delta = 2L, minCount = 2L)
    }
  }
}
