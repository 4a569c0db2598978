package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relevance scoring over a document corpus: BM25 with a rational
  * ("odds") idf — `(N - df + 0.5) / (df + 0.5)` instead of its log —
  * so the whole score is +,-,*,/ on doubles and therefore bit-identical
  * across engines (IEEE 754 arithmetic is exactly specified; `ln` is
  * not). NOTE: dropping the log preserves the PER-TERM ranking
  * (monotone), but a multi-term sum of odds is NOT a monotone
  * image of the summed-log form — rare terms weigh more here than
  * in textbook BM25. The odds form is this engine's deterministic
  * contract (the oracle spells the same arithmetic), not a claim
  * of rank-equivalence to the log form on multi-term queries.
  *
  * Scale shape: per-document term frequencies are map-side HOF counts
  * over the token array (no explode, no shuffle); the corpus statistics
  * (N, avgdl, one df per term) are ONE partial-aggregated reduction to
  * a single tiny row, broadcast back onto the corpus. Scoring a 100 TB
  * corpus is two scans and zero wide shuffles.
  */
object Scoring {

  /** BM25 scores for `terms` over `textCol`, one row per input row:
    * (idCols..., score). Tokenization is whitespace (TextAnalysis
    * .tokens); k1/b are the standard free parameters.
    */
  def bm25(df: DataFrame, idCols: Seq[String], textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one term")
    val tfCols = terms.indices.map(i => s"__tf$i")
    val withTf = df.select(
      idCols.map(col) ++
        Seq(size(TextAnalysis.tokens(col(textCol))).cast("double").as("__dl")) ++
        terms.zip(tfCols).map { case (t, c) =>
          size(filter(TextAnalysis.tokens(col(textCol)), x => x === t))
            .cast("double").as(c)
        }: _*)
    val aggs =
      Seq(count(lit(1)).cast("double").as("__n_docs"),
        (sum(col("__dl")) / count(lit(1)).cast("double")).as("__avgdl")) ++
        tfCols.map(c => sum(when(col(c) > 0, 1).otherwise(0))
          .cast("double").as(s"${c}_df"))
    val stats = withTf.agg(aggs.head, aggs.tail: _*)
    // one global stats row, broadcast back onto the corpus
    val score = tfCols.map { c =>
      val tf = col(c); val dfT = col(s"${c}_df")
      ((col("__n_docs") - dfT + 0.5) / (dfT + 0.5)) *
        ((tf * (k1 + 1)) /
          (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (col("__dl") / col("__avgdl")))))
    }.reduce(_ + _)
    withTf.crossJoin(broadcast(stats))
      .select(idCols.map(col) :+ score.as("score"): _*)
  }

  /** Per-document top-`k` terms by tf-idf, with the same rational
    * ("odds") idf as [[bm25]] — `(N - df + 0.5) / (df + 0.5)` unlogged,
    * so the score is pure +,-,*,/ on doubles (bit-identical across
    * engines; for a SINGLE term the ranking matches textbook tf-idf
    * — log is monotone — but tf × odds is not a monotone image of
    * tf × log-odds, so which terms make a document's top-k can
    * differ from the log form: rare terms weigh more here. The
    * odds form is the deterministic engine contract).
    * Returns (idCol, term, rk, score), rk in 1..k, ties broken by term.
    *
    * Scale shape: tf is one (id, term) aggregation of the exploded
    * tokens; df reduces the tf table again on term (map-side
    * combinable — input rows are already distinct per doc); the
    * df-join back co-partitions on term with no extra exchange; N is a
    * one-row broadcast. The top-k window shuffles on id — at 100 TB
    * every stage is a keyed reduction of data that must move anyway;
    * nothing is quadratic and no vocabulary table sits on the driver.
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // blank docs tokenize to [""]: the empty string must not surface
    // as a document's "top term" or accrue a df like a real term
    val toks = df.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    // persisted: tf feeds BOTH the df reduction and the join's probe
    // side — without it Spark duplicates the explode+aggregate subtree
    // on each (at cluster scale: a checkpoint/staging table). Routed
    // through StageCache: the result is lazy, so the CALLER releases
    // (StageCache.releaseAll) once it has been consumed.
    val tf = graft.ops.StageCache.persisted(
      toks.groupBy(idCol, "term").agg(count(lit(1)).as("tf")))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("dft"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(idCol).orderBy(col("score").desc, col("term").asc)
    tf.join(dft, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf").cast("double") *
        ((col("n_docs").cast("double") - col("dft").cast("double") + 0.5) /
          (col("dft").cast("double") + 0.5)))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("term"), col("rk"), col("score"))
  }

  /** Corpus-trained bigram fluency (the KenLM-shaped signal without a
    * model file): per document, how often its adjacent token pairs
    * recur across the corpus, relative to how often their prefix
    * tokens start ANY bigram — `fluency` = Σ count(w1 w2) / Σ count(w1 ·),
    * a length-weighted average conditional probability. Boilerplate
    * and fluent prose score high; token salad scores low. All
    * accumulations are INTEGER sums (accumulation-order-proof, so the
    * oracle hash-matches); the single double division happens once per
    * doc at the end. Docs with fewer than 2 tokens emit no row.
    *
    * Scale shape: two vocabulary-sized aggregations (bigram and prefix
    * counts) over the exploded pairs, joined back co-partitioned on
    * their own keys, then one per-doc reduction — the exact shape of
    * q_token_rarity one order up. Frequency-head skew mirrors token
    * skew; at 100 TB broadcast the head of the bigram table.
    */
  def bigramFluency(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // zip the token array with its shifted self rather than indexing
    // element_at(t, i) per position — each element_at re-evaluates the
    // split subtree, turning tokenization O(len) into O(len²) per doc
    // (measured: the indexed form was ~6x slower at sf0.1). zip_with
    // pads the shorter side with null; the final slice drops that
    // (t_n, null) tail pair.
    val t = col("__toks")
    val bgs = TextAnalysis.bigramsT(t)
    // the exploded pairs feed the frequency build AND the probe join —
    // persisted so neither consumer recomputes the explode (StageCache:
    // caller releases after consuming the lazy result)
    val e = graft.ops.StageCache.persisted(df
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(bgs).as("bg")))
    // prefix counts DERIVE from the bigram vocab (sum of bfreq over
    // w1) — a vocabulary-sized reduction instead of a second full
    // shuffle of the exploded pairs; both frequencies then ride ONE
    // vocab-sized frame joined back on bg, so the big side crosses the
    // wire once for the aggregate and once for the probe (same key —
    // the exchange is reusable), never on a second key
    val bf = e.groupBy("bg").agg(count(lit(1)).as("bfreq"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val uf = bf.groupBy("w1").agg(sum("bfreq").cast("long").as("ufreq"))
    val freqs = bf.join(uf, Seq("w1")).select("bg", "bfreq", "ufreq")
    e.join(freqs, Seq("bg"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        sum("bfreq").cast("long").as("sum_bigram_freq"),
        sum("ufreq").cast("long").as("sum_prefix_freq"))
      .withColumn("fluency",
        col("sum_bigram_freq").cast("double") /
          col("sum_prefix_freq").cast("double"))
  }

  /** word2phrase collocation mining (Mikolov et al., "Distributed
    * Representations of Words and Phrases...", eq. 6): adjacent pairs
    * scored by the discounted lift
    * `(count(ab) - delta) * N / (count(a) * count(b))` — pairs that
    * co-occur far above chance are phrase-merge candidates for
    * tokenizer/corpus prep. The score is emitted as EXACT integer
    * parts-per-million (`score_ppm`, truncating div), so ranking and
    * hashing are engine- and order-independent — no float in sight.
    *
    * Overflow bound: `(c_ab - delta) * N * 1e6` rides a long — safe to
    * N ≈ 3e6 tokens with max-count pairs; past that switch the product
    * to decimal(38,0) (the q_corr moment pattern). Scale shape: two
    * corpus explodes (unigram + bigram) into vocabulary-sized counts,
    * a keyed join of the bigram vocab against the unigram vocab on
    * each word, and a 1-row broadcast of N — vocabulary-sized frames
    * everywhere after the aggregates.
    */
  def phraseScores(df: DataFrame, textCol: String, delta: Long = 2L,
      minCount: Long = 3L): DataFrame = {
    require(minCount > delta,
      s"minCount=$minCount must exceed delta=$delta (score must stay positive)")
    val t = col("__toks")
    val bgs = TextAnalysis.bigramsT(t)
    val toksDf = graft.ops.StageCache.persisted(
      df.select(TextAnalysis.tokens(col(textCol)).as("__toks")))
    // blank docs tokenize to [""] (the documented convention): the
    // phantom empty token must not enter the unigram vocab or
    // n_tokens, or every pair's score_ppm deflates with blank-doc
    // volume (n_tokens rides the numerator)
    val uni = toksDf.select(explode(t).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
    val bg = toksDf.select(explode(bgs).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= minCount)
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
    bg.join(uni.select(col("w").as("w1"), col("c").as("c_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_b")), "w2")
      .crossJoin(broadcast(uni.agg(sum("c").cast("long").as("n_tokens"))))
      .select(col("bg").as("bigram"), col("c_ab"),
        expr(s"((c_ab - $delta) * n_tokens * 1000000) div (c_a * c_b)")
          .as("score_ppm"))
  }
}
