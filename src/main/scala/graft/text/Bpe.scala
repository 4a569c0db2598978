package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One merge step of byte-pair-encoding tokenizer training,
  * distributed: count adjacent symbol pairs over the corpus vocabulary
  * (distinct words weighted by frequency — the classic BPE trick that
  * makes corpus size irrelevant to the pair table), pick the most
  * frequent pair deterministically (count desc, pair asc), and measure
  * the merge's effect with greedy left-to-right application semantics.
  *
  * Scale shape: the only corpus-wide pass is the word-frequency
  * aggregate; everything after operates on DISTINCT words (vocabulary-
  * sized, not corpus-sized). The winning pair is a model parameter —
  * one collected row — and merge application is per-word windows over
  * the exploded symbol stream. Overlap correctness: for a pair of two
  * different symbols, merge sites are independent; for a doubled
  * symbol ("aa" in "aaaa"), greedy BPE merges floor(run/2) times —
  * counted here as the odd-ranked links of each same-pair island, the
  * exact sequential-scan answer without a sequential scan.
  *
  * A full trainer iterates this step; each iteration re-folds the
  * vocabulary's symbol streams and re-counts — `iters` scans of the
  * VOCAB, never the corpus.
  */
object Bpe {

  /** The pair table + the winning merge's effect, as one report:
    * top-`k` pairs by weighted count with the corpus symbol totals
    * before and after applying merge #1. Deterministic end to end.
    */
  def mergeStepReport(documents: DataFrame, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val spark = documents.sparkSession
    // vocabulary: distinct words + corpus frequency (the corpus-wide
    // pass; everything below is vocab-sized)
    val words = graft.ops.StageCache.persisted(documents
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq")))
    // exploded symbol stream per word, with the following symbol
    val wW = Window.partitionBy("w").orderBy("pos")
    val stream = graft.ops.StageCache.persisted(words
      .select(col("w"), col("freq"),
        // split AFTER each code point ((?<=.) — Java regex '.' is one
        // code point), not on "": the empty-pattern split cuts at
        // UTF-16 unit boundaries, tearing non-BMP characters (emoji,
        // CJK extensions) into lone surrogate halves that pollute the
        // pair table — and diverging from the oracle's per-CHARACTER
        // substr. The zero-width match at end-of-string still emits
        // one trailing ""; drop it BEFORE the lead window or the last
        // real symbol would see nxt = "" instead of null
        posexplode(split(col("w"), "(?<=.)")).as(Seq("pos", "sym")))
      .filter(col("sym") =!= "")
      .withColumn("nxt", lead("sym", 1).over(wW)))
    val links = stream.filter(col("nxt").isNotNull)
    val pairCounts = links
      .groupBy(col("sym").as("a"), col("nxt").as("b"))
      .agg(sum("freq").as("cnt"))
    val top = pairCounts
      .orderBy(col("cnt").desc, col("a").asc, col("b").asc).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("a").asc,
          col("b").asc)))
    // winning pair = model parameter: one collected row. An empty
    // pair table (empty corpus, or every word a single symbol) is a
    // VALID degenerate state: report zero rows instead of throwing
    // NoSuchElementException out of head()
    val winner = top.filter(col("rank") === 1).select("a", "b").take(1)
    if (winner.isEmpty)
      return top.select(col("rank"), col("a"), col("b"), col("cnt"),
        lit(0L).as("total_syms_before"), lit(0L).as("total_syms_after"))
    val Row(a0: String, b0: String) = winner(0)
    // greedy merge sites for (a0, b0): independent when a0 != b0;
    // for a doubled symbol, the odd-ranked links of each island of
    // consecutive (a0, a0) links (= floor(run/2) merges per run)
    val members = links.filter(col("sym") === a0 && col("nxt") === b0)
    val isl = members.withColumn("island",
      col("pos") - row_number().over(wW))
    val rnInIsland = row_number().over(
      Window.partitionBy("w", "island").orderBy("pos"))
    val merges = isl.withColumn("rn", rnInIsland)
      .filter(lit(a0 != b0) || col("rn") % 2 === 1)
      .groupBy("w").agg(count(lit(1)).as("m"), first("freq").as("freq"))
    val totBefore = stream.agg(sum("freq").as("v")).head().getLong(0)
    val totMerged = merges.agg(coalesce(sum(col("m") * col("freq")), lit(0L))
      .as("v")).head().getLong(0)
    top.select(col("rank"), col("a"), col("b"), col("cnt"),
        lit(totBefore).as("total_syms_before"),
        lit(totBefore - totMerged).as("total_syms_after"))
      .orderBy("rank")
  }
}
