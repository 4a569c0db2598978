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
    val cms = df.stat.countMinSketch(col(keyCol), eps, confidence, seed = 42)
    val bos = new java.io.ByteArrayOutputStream()
    cms.writeTo(bos)
    val est = GraftShim.column(graft.functions.CmsEstimate(
      GraftShim.expression(col(keyCol)), bos.toByteArray))
    df.groupBy(keyCol)
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col(keyCol).asc)
      .limit(k)
      .withColumn("cms_ge_exact", est >= col("exact_cnt"))
  }
}
