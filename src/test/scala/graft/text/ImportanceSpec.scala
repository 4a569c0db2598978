package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ImportanceSpec extends SparkTestBase {
  import spark.implicits._

  // target (tgt=true) speaks "alpha beta", raw-only docs speak
  // "gamma delta" — disjoint bigram vocabularies, so target-like docs
  // must outscore off-target ones
  private val docs = Seq(
    (1L, "alpha beta alpha beta alpha", true),
    (2L, "alpha beta alpha beta", true),
    (3L, "alpha beta alpha", false), // target-LIKE but unflagged
    (4L, "gamma delta gamma delta", false),
    (5L, "gamma delta gamma", false),
    (6L, "solo", false)) // < 2 tokens: no bigrams
    .toDF("doc_id", "text", "tgt")

  test("target-vocabulary docs outscore off-target docs") {
    val out = Importance.importanceScores(docs, "doc_id", "text",
      col("tgt"), buckets = 64)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(out(3L) > out(4L)) // target-like raw doc beats off-target
    assert(out(1L) > out(4L) && out(2L) > out(5L))
    graft.ops.StageCache.releaseAll()
  }

  test("a doc with fewer than 2 tokens scores 0 over 0 grams") {
    val out = Importance.importanceScores(docs, "doc_id", "text",
      col("tgt"), buckets = 64)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(6L) === ((0L, 0L)))
    assert(out.size === 6)
    graft.ops.StageCache.releaseAll()
  }

  test("scores are partitioning-invariant") {
    val a = Importance.importanceScores(docs, "doc_id", "text",
      col("tgt"), buckets = 64).orderBy("doc_id").collect().toSeq
    val b = Importance.importanceScores(docs.repartition(7), "doc_id",
      "text", col("tgt"), buckets = 64).orderBy("doc_id").collect().toSeq
    assert(a === b)
    graft.ops.StageCache.releaseAll()
  }
}
