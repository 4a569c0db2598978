package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Test-set decontamination — the training-pipeline op of flagging
  * corpus documents that share n-gram shingles with a benchmark /
  * evaluation set, so they can be dropped before training.
  *
  * Scale shape: the benchmark shingle vocabulary is small by
  * construction (benchmarks are thousands of docs, not billions) — it
  * broadcasts; the corpus explodes its shingles map-side and the only
  * shuffle is the per-doc hit count (map-side partial agg on doc id).
  * The corpus text itself never crosses the wire.
  */
object Decontaminate {

  /** Distinct shingle vocabulary of a benchmark frame. */
  def benchmarkShingles(bench: DataFrame, textCol: String, n: Int): DataFrame =
    bench.select(explode(Dedup.shingles(col(textCol), n)).as("tok")).distinct()

  /** Per-document count of shingles shared with the benchmark
    * vocabulary (docs with zero hits don't appear — they're clean).
    * Shingle sets are distinct per doc, so the join-row count per doc
    * IS the overlap size.
    */
  def contaminationHits(corpus: DataFrame, benchVocab: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame =
    corpus.select(col(idCol), explode(Dedup.shingles(col(textCol), n)).as("tok"))
      .join(broadcast(benchVocab), Seq("tok"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hits"))

  /** FUZZY decontamination: training documents that are MinHash
    * near-duplicates of a benchmark document — the paraphrase-tolerant
    * complement to [[contaminationHits]] (raw shingle overlap misses a
    * lightly reworded eval question; near-dup Jaccard catches it).
    * Returns (train_id, bench_id, jaccard) for every pair clearing
    * `threshold`, so the caller can both DROP train docs and report
    * WHICH benchmark items leaked.
    *
    * Scale shape: the benchmark is SMALL by construction (thousands of
    * docs), so this is the broadcast-index probe
    * ([[Dedup.minhashPairsBroadcastIndex]]): the benchmark's bucket
    * and shingle tables broadcast, the corpus is shingled and sketched
    * exactly once in a single map pass, and the only shuffle in the
    * plan is the per-pair dedupe over rows that actually collided with
    * a benchmark bucket — the corpus text, its shingle sets, and its
    * sketches never cross the wire. (The general incremental probe,
    * which this used through round 10, shuffle-joins the corpus
    * shingle table into the candidates and re-shingles the corpus on
    * the verify branch: a corpus-sized exchange plus a duplicated map
    * pass that only best-effort exchange reuse could dedupe. Measured
    * at the 10×-documents tier the broadcast shape is ~1.9× faster,
    * 3.44 → 1.78 s min-of-2; see SCALE.md.) Corpus ids must be
    * disjoint from benchmark ids.
    */
  def fuzzyContamination(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 2, k: Int = 16,
      bands: Int = 8, threshold: Double = 0.3,
      fastKernel: Boolean = true): DataFrame =
    // the kernel must match on BOTH sides (band keys from the two
    // kernels never collide — same contract as the staged-index paths)
    Dedup.minhashPairsBroadcastIndex(
        Dedup.minhashIndexView(bench, idCol, textCol, n, k, bands,
          fastKernel),
        corpus, idCol, textCol, n, k, bands, threshold, fastKernel)
      .select(col("id_a").as("train_id"), col("id_b").as("bench_id"),
        col("jaccard"))
}
