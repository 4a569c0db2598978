package graft.text

import graft.SparkTestBase

class DatacardSpec extends SparkTestBase {
  import spark.implicits._

  // srcA: 4 docs, one exact dup pair, 2 en of 4; lengths 3,5,5,9
  // srcB: 1 doc, no dups, not en
  private val docs = Seq(
    (1L, "aaa", "en", "srcA", 3L),
    (2L, "bbbbb", "en", "srcA", 5L),
    (3L, "bbbbb", "de", "srcA", 5L), // exact dup of doc 2
    (4L, "ccc cc cc", "fr", "srcA", 9L),
    (5L, "dd dd", "de", "srcB", 5L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("datacard: dup rate, language mix, and lower median per source") {
    val out = Datacard.report(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("srcA")
    assert(a.getAs[Long]("n_docs") === 4L)
    // 4 docs, 3 distinct digests -> 1 dup -> 250000 ppm
    assert(a.getAs[Long]("dup_ppm") === 250000L)
    assert(a.getAs[Long]("en_ppm") === 500000L)
    assert(a.getAs[Long]("n_langs") === 3L)
    // lengths 3,5,5,9 -> lower median rank (4+1) DIV 2 = 2 -> 5
    assert(a.getAs[Long]("p50_chars") === 5L)
    val b = out("srcB")
    assert(b.getAs[Long]("n_docs") === 1L)
    assert(b.getAs[Long]("dup_ppm") === 0L)
    assert(b.getAs[Long]("en_ppm") === 0L)
    assert(b.getAs[Long]("p50_chars") === 5L)
    graft.ops.StageCache.releaseAll()
  }

  test("datacard token volume sums whitespace token counts") {
    val out = Datacard.report(docs).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_tokens")).toMap
    assert(out("srcA") === (1L + 1L + 1L + 3L))
    assert(out("srcB") === 2L)
    graft.ops.StageCache.releaseAll()
  }
}
