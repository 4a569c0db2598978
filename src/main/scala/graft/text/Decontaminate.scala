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
}
