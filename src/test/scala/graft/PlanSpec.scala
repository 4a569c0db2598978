package graft

import org.apache.spark.sql.execution.FormattedMode

/** Plan-shape regression tests: the scale properties audited by hand
  * via graft.Explain, pinned so a refactor can't silently regress them.
  * Assertions use only stable plan-node names (TakeOrderedAndProject,
  * SortMergeJoin, PushedFilters), not expression internals.
  */
class PlanSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(FormattedMode)

  test("top-k plans TakeOrderedAndProject, never a global sort+limit") {
    assert(plan("q_topk").contains("TakeOrderedAndProject"))
  }

  test("flagship joins broadcast their dimension sides (no SortMergeJoin)") {
    for (q <- Seq("q_delinquent", "q_join_left", "q_join_inner", "q_fuzzy_join")) {
      val p = plan(q)
      assert(!p.contains("SortMergeJoin"), s"$q fell back to SortMergeJoin")
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
        s"$q has no broadcast join")
    }
  }

  test("parquet scans push filters down") {
    val p = plan("q_filter_conj")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
      "filter did not reach the parquet scan")
  }

  test("column pruning reaches the scan (ReadSchema is narrow)") {
    // q_select_rename projects 4 of customer's columns; the scan must
    // not read the whole row
    val p = plan("q_select_rename")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.nonEmpty && !read.contains("c_mktsegment"),
      s"scan reads unprojected columns: $read")
  }

  test("IVF fine search joins on cell with no corpus Exchange before it") {
    // cell assignment is a map-side projection, so the join's INPUT
    // subtrees (printed BELOW the join line in the formatted tree)
    // must contain no shuffle Exchange — only the BroadcastExchange
    // of the (small) query side
    val p = plan("q_ann_ivf")
    val tree = p.substring(0, p.indexOf("\n(1) "))
    val belowJoin = tree.substring(tree.indexOf("BroadcastHashJoin"))
    val shuffles = belowJoin.linesIterator
      .filter(_.contains("Exchange"))
      .filterNot(_.contains("BroadcastExchange")).toSeq
    assert(shuffles.isEmpty,
      s"corpus shuffles before the IVF fine-search join: $shuffles")
  }

  test("ngram jaccard aggregates map-side before its exchange") {
    // inverted-index count: a partial HashAggregate must sit below the
    // Exchange that feeds the final HashAggregate
    val p = plan("q_ngram_jaccard")
    val aggs = p.linesIterator.count(_.trim.startsWith("+- HashAggregate"))
    assert(p.contains("HashAggregate") && aggs >= 2,
      "expected partial+final aggregate pair")
    assert(!p.contains("SortMergeJoin"))
  }
}
