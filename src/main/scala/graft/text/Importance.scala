package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PolyHash
import graft.ops.StageCache

/** Hashed n-gram importance scoring for data selection — the DSIR
  * shape (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"): represent both the raw corpus and a small
  * high-quality TARGET subset as bags of hashed bigrams, estimate a
  * per-bucket rate for each side, and score every raw document by how
  * target-like its bigram buckets are. Selection then keeps the
  * highest-scoring documents (or samples proportional to score).
  *
  * Engine-exact by construction: bucket ids are `poly_hash(bigram) %
  * buckets` (the codegen'd char fold both engines replay), per-bucket
  * scores are add-one-smoothed rate ratios in integer ppm —
  * `1e6 * (cnt_t+1)(R+B) DIV (cnt_r+1)(T+B)` over decimal(38,0) — and
  * the per-document score is the integer mean of its buckets' ppm
  * scores, so no float ever aggregates. (DSIR's product-of-rates
  * becomes an additive mean here: log-free, order-proof, and the
  * per-document ranking it induces is what selection consumes.)
  *
  * Scale shape: the exploded bigram stream shuffles ONCE keyed by
  * bucket (≤ `buckets` distinct keys, map-side combined) to build the
  * stats; the stats table is ≤ `buckets` rows — broadcast — so scoring
  * the stream back is map-side; the only other shuffle is the final
  * per-document mean keyed by id. The target subset is a flag column,
  * not a second scan.
  */
object Importance {

  /** One row per bigram occurrence: (id, `__tgt`, bucket). The
    * zip-with-shifted-self bigram build (not per-index element_at)
    * matches Scoring.bigramFluency — O(len) per doc.
    */
  private def bigramBuckets(docs: DataFrame, idCol: String,
      textCol: String, targetPred: Column, buckets: Int): DataFrame = {
    val t = col("__toks")
    val bgs = TextAnalysis.bigramsT(t)
    docs
      .select(col(idCol), targetPred.as("__tgt"),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__tgt"), explode(bgs).as("bg"))
      .select(col(idCol), col("__tgt"),
        pmod(PolyHash(col("bg")), lit(buckets.toLong)).as("bucket"))
  }

  /** Per-document importance: (idCol, n_grams, imp_ppm), one row per
    * input document (documents with fewer than 2 tokens score 0 over
    * 0 grams). `targetPred` marks the target subset WITHIN `docs` —
    * rows failing it are raw-only mass.
    */
  def importanceScores(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // the stream feeds the stats build AND the score probe — persist so
    // tokenize+explode runs once (caller releases via StageCache)
    val bs = StageCache.persisted(
      bigramBuckets(docs, idCol, textCol, targetPred, buckets))
    val stats = bs.groupBy("bucket").agg(
      count(lit(1)).as("cnt_r"),
      sum(when(col("__tgt"), lit(1L)).otherwise(lit(0L))).as("cnt_t"))
    // in-plan guard (raise_error, same pattern as guardedLeftJoin): a
    // target predicate that matches NOTHING makes every bucket score
    // the same degenerate smoothing constant — selection by garbage
    // ranks, with long-overflow risk in the per-doc sum at corpus
    // scale. Fail loudly; an all-raw run is a configuration error.
    val tot = broadcast(stats.agg(
        sum("cnt_r").cast("long").as("r_tot"),
        sum("cnt_t").cast("long").as("t_tot"))
      .withColumn("t_tot",
        when(col("t_tot") <= 0, raise_error(lit(
          "importanceScores: targetPred matched no bigram occurrence — " +
            "an empty target subset scores nothing meaningfully (check " +
            "the predicate/column)")).cast("long"))
          .otherwise(col("t_tot"))))
    val dec = "decimal(38,0)"
    val scores = stats.crossJoin(tot)
      .withColumn("__num",
        (col("cnt_t") + 1).cast(dec) * (col("r_tot") + buckets).cast(dec)
          * lit(1000000L).cast(dec))
      .withColumn("__den",
        (col("cnt_r") + 1).cast(dec) * (col("t_tot") + buckets).cast(dec))
      .select(col("bucket"),
        expr("CAST(__num DIV __den AS BIGINT)").as("score_ppm"))
    val perDoc = bs.join(broadcast(scores), Seq("bucket"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        sum("score_ppm").as("__sum"))
      .withColumn("imp_ppm", expr("CAST(__sum DIV n_grams AS BIGINT)"))
      .select(col(idCol), col("n_grams"), col("imp_ppm"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("imp_ppm"), lit(0L)).as("imp_ppm"))
  }
}
