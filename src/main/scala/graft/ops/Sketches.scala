package graft.ops

import org.apache.spark.sql.{DataFrame, GraftShim}
import org.apache.spark.sql.functions._

/** Driver-buildable frequency sketches applied as plan literals. The
  * heavyweight sketch family (MinHash/SimHash signatures, HLL) lives
  * in `graft.dedup` / `graft.functions.SketchExpressions`; this is the
  * count-min side: bounded-memory frequency estimation for heavy-
  * hitter screens.
  */
object Sketches {

  /** Exact top-`k` heavy hitters of `keyCol` (count desc, key asc),
    * each probed against a count-min sketch of the same column:
    * returns (keyCol, exact_cnt, cms_ge_exact). `cms_ge_exact` is the
    * CMS one-sided guarantee (estimate never undercounts) — TRUE for
    * every row by construction, which makes it an engine-independent
    * invariant the oracle can assert without reproducing the sketch.
    *
    * Scale shape: the sketch build is one aggregation pass with a
    * fixed  d×w counter grid (eps/confidence pick the grid, NOT the
    * data size) merged on the driver — the CMS answer to "per-key
    * counts don't fit anywhere"; the exact top-k is a map-side-combined
    * count + TakeOrdered. At 100 TB you keep the sketch and drop the
    * exact pass; here the exact pass IS the verification.
    */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int,
      eps: Double = 0.001, confidence: Double = 0.99): DataFrame = {
    // eager contract checks BEFORE the corpus-wide sketch pass: the
    // probe expression (CmsEstimate) is StringType-only, and a null
    // key would probe to null — both would otherwise surface as a
    // confusing failure AFTER the expensive build (bloomSemiJoin sets
    // the validate-eagerly pattern)
    require(df.schema(keyCol).dataType ==
      org.apache.spark.sql.types.StringType,
      s"heavyHitters probes a string-keyed CMS; cast $keyCol " +
        s"(${df.schema(keyCol).dataType.simpleString}) to string first")
    // null keys are excluded end-to-end: CmsEstimate is nullIntolerant
    // (a null key row would carry cms_ge_exact = null, breaking the
    // "TRUE for every row by construction" invariant the oracle asserts)
    val dfNn = df.filter(col(keyCol).isNotNull)
    val cms = dfNn.stat.countMinSketch(col(keyCol), eps, confidence, seed = 42)
    val bos = new java.io.ByteArrayOutputStream()
    cms.writeTo(bos)
    val est = GraftShim.column(graft.functions.CmsEstimate(
      GraftShim.expression(col(keyCol)), bos.toByteArray))
    dfNn.groupBy(keyCol)
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col(keyCol).asc)
      .limit(k)
      .withColumn("cms_ge_exact", est >= col("exact_cnt"))
  }

  /** KMV (k-minimum-values) distinct-overlap estimates for every
    * ordered pair of `groupCol` values: per group keep the k smallest
    * md5 hashes of distinct `valueCol` content; the k-th smallest
    * estimates the group's distinct count, the k-th smallest of two
    * merged sketches estimates the union, and inclusion-exclusion
    * gives the intersection. Returns one row per pair with
    * `(est_a, est_b, est_union, est_int, exact_int)` — the exact
    * intersection rides along as the verification column, the same
    * pattern as [[heavyHitters]].
    *
    * Deterministic by construction (md5 order, integer-only math:
    * value of the first 14 hex digits, estimate = (k-1)*2^56 div v),
    * so the whole report is engine-replayable bit-for-bit — no RNG,
    * no floats. Groups with fewer than k distinct values short-circuit
    * to their exact count (the sketch IS the set).
    *
    * Scale shape: the only pass over the corpus is the distinct
    * (group, digest) projection; everything after operates on
    * |groups| x k sketch rows (tiny — pair merges join against a
    * broadcast pair dim). At 100 TB the sketches are what you persist
    * per source/day and merge across snapshots; `k` bounds both
    * memory and estimate error (relative error ~ 1/sqrt(k)).
    */
  def kmvOverlap(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame = {
    require(k >= 2 && k <= 128, s"k must be in [2, 128], got $k (128 " +
      "keeps (k-1)*2^56 inside BIGINT)")
    import org.apache.spark.sql.expressions.Window
    // distinct (group, content-hash): the one corpus-wide pass. Null
    // values are excluded UP FRONT: md5(null) is null, which sorts
    // first ascending and would occupy sketch slot rn=1 — a phantom
    // element inflating n_sk and shifting vk — while the exact
    // verification self-join (null-rejecting equality on h) can never
    // see it, so est and exact would silently diverge on any corpus
    // with null text.
    val d = StageCache.persisted(df
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("src"), md5(col(valueCol)).as("h"))
      .distinct())
    val w = Window.partitionBy("src").orderBy("h")
    val sk = StageCache.persisted(
      d.withColumn("rn", row_number().over(w)).filter(col("rn") <= k))
    // first 14 hex digits as an exact BIGINT (< 2^56); guard the
    // 16^-14 all-zero-prefix hash against div-by-zero
    def v14(h: org.apache.spark.sql.Column) =
      greatest(conv(substring(h, 1, 14), 16, 10).cast("long"), lit(1L))
    // integral divide (`div`), NOT `/`: long / long is DOUBLE division
    // in Spark SQL, and (k-1)*2^56 is beyond double's 2^53 exactness
    def intDiv(a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column) =
      GraftShim.column(new org.apache.spark.sql.catalyst.expressions
        .IntegralDivide(GraftShim.expression(a), GraftShim.expression(b)))
    def estFrom(nSk: org.apache.spark.sql.Column,
        vk: org.apache.spark.sql.Column) =
      when(nSk < k, nSk.cast("long"))
        .otherwise(intDiv(lit((k - 1).toLong * (1L << 56)), vk))
    val perSrc = sk.groupBy("src").agg(
      max("rn").as("n_sk"),
      max(when(col("rn") === k, v14(col("h")))).as("vk"))
    val pairDim = perSrc.select(col("src").as("sa"), col("n_sk").as("na"),
        col("vk").as("va"))
      .join(perSrc.select(col("src").as("sb"), col("n_sk").as("nb"),
        col("vk").as("vb")), col("sa") < col("sb"))
    val pairKeys = broadcast(pairDim.select("sa", "sb"))
    // merged sketch per pair: k smallest of the two sketches' union
    val merged = sk.join(pairKeys, col("src") === col("sa"))
      .select("sa", "sb", "h")
      .unionByName(sk.join(pairKeys, col("src") === col("sb"))
        .select("sa", "sb", "h"))
      .distinct()
      .withColumn("rn",
        row_number().over(Window.partitionBy("sa", "sb").orderBy("h")))
      .filter(col("rn") <= k)
    val perPair = merged.groupBy("sa", "sb").agg(
      max("rn").as("n_u"),
      max(when(col("rn") === k, v14(col("h")))).as("vu"))
    // exact intersection (verification column): digest-only self-join
    val exact = d.select(col("src").as("sa"), col("h"))
      .join(d.select(col("src").as("sb"), col("h")), Seq("h"))
      .filter(col("sa") < col("sb"))
      .groupBy("sa", "sb").agg(count(lit(1)).as("exact_int"))
    pairDim.join(perPair, Seq("sa", "sb"))
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        estFrom(col("na"), col("va")).as("est_a"),
        estFrom(col("nb"), col("vb")).as("est_b"),
        estFrom(col("n_u"), col("vu")).as("est_union"))
      .withColumn("est_int",
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L)))
      .join(exact.select(col("sa").as("source_a"), col("sb").as("source_b"),
        col("exact_int")), Seq("source_a", "source_b"), "left")
      .withColumn("exact_int", coalesce(col("exact_int"), lit(0L)))
  }
}
