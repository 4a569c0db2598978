package graft

import graft.ops.PlanLint

/** The whole registered query surface swept through the scale linter
  * ([[graft.ops.PlanLint]]): no query may plan a cross product, an
  * unkeyed window over un-aggregated input, or a no-combine
  * single-partition funnel unless it is on the allowlist below with a
  * reason. This is the automated form of the per-query plan audits in
  * PlanSpec — a NEW query cannot land with a quadratic join or a
  * one-task funnel without either fixing it or documenting why here.
  */
class AllPlansLintSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Documented exemptions — every entry carries its justification.
    * The linter already auto-exempts the safe shapes (scalar re-inject
    * cross joins, histogram-input global windows), so what lands here
    * is a deliberate algorithmic choice, not noise.
    */
  private val allow: Map[String, Set[String]] = Map(
    // exact brute-force cosine baseline: the broadcast side is the
    // LIMIT-k query frame (model-sized by construction, Ann.scala) —
    // the documented exact path the bucketed variants are judged
    // against
    "q_ann_brute" -> Set("cross_product"),
    "q_ann_recall" -> Set("cross_product"),
    "q_mrl_recall" -> Set("cross_product"),
    "q_quantized_topk" -> Set("cross_product"),
    "q_rrf" -> Set("cross_product"),
    // pair-predicate (label-inequality) join against the broadcast
    // query frame — same bounded broadcast side as the brute baseline
    "q_hard_negatives" -> Set("cross_product"),
    // KMV sketch-row pair merges: both sides are one-row-per-source
    // sketch tables (|sources|^2 pairs, sources is a handful), joined
    // on a non-equi pair predicate by design
    "q_kmv_overlap" -> Set("cross_product"))

  test("every registered query plans clean under the scale linter") {
    val bad = scala.collection.mutable.ListBuffer.empty[String]
    for (q <- SparkEntry.allDefs) {
      val rules =
        try PlanLint.lint(q.fn(spark, sf)).map(_.rule).toSet
        catch { case e: Throwable =>
          bad += s"${q.name}: lint failed: ${e.getMessage}"; Set.empty[String]
        }
      val extra = rules -- allow.getOrElse(q.name, Set.empty)
      if (extra.nonEmpty)
        bad += s"${q.name}: ${extra.mkString(", ")}"
      graft.ops.StageCache.releaseAll()
      spark.catalog.clearCache()
    }
    assert(bad.isEmpty,
      s"scale-lint findings outside the allowlist:\n  ${bad.mkString("\n  ")}")
  }
}
