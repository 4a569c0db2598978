package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{GraftExecShim, LocalLimitExec,
  SparkPlan}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec,
  ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec,
  CartesianProductExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Static scale linter for physical plans: walks the prepared plan (the
  * tree EnsureRequirements produced, exchanges included — under AQE the
  * initial plan, via [[GraftExecShim.initialPhysicalPlan]]) and flags
  * the shapes that are survivable on a 60k-row fixture but fatal at
  * 100 TB. PlanSpec pins these properties for individual flagship
  * queries; the linter is the same audit as a REUSABLE check that
  * AllPlansLintSpec sweeps across every registered query — a new query
  * cannot land with a quadratic join or a single-partition funnel
  * without either fixing it or justifying it on the allowlist.
  *
  * Rules (each with a deliberate safe-shape exemption, so findings are
  * SIGNAL — the engine's own standard patterns don't drown them):
  *  - `cross_product`: a CartesianProduct or BroadcastNestedLoopJoin —
  *    O(|L|·|R|) pair growth. EXEMPT when the broadcast/either side is
  *    a grouping-free (scalar, 1-row) aggregate: re-injecting a global
  *    aggregate over the table is the standard broadcast pattern
  *    (q_scalar_reinject and the corpus-stat joins in bm25/tfidf).
  *    What remains flagged — e.g. the brute-force ANN baselines whose
  *    broadcast side is a LIMIT-k frame — must be justified on the
  *    caller's allowlist.
  *  - `global_window`: a Window with an EMPTY partition spec — every
  *    row funnels through one task's sort buffer. EXEMPT when an
  *    aggregate sits below it: a global window over a histogram /
  *    pair-frequency table is the documented bounded-input pattern
  *    (q_median_mode, q_benford, q_bpe_step).
  *  - `single_partition_no_combine`: a shuffle to SinglePartition whose
  *    subtree contains NO partial aggregate / local limit — raw rows
  *    (not map-side-combined partials or a bounded head) cross the
  *    wire into one task.
  *
  * Scan pushdown is deliberately NOT a linter rule: for v1 file scans
  * the `PushedFilters` metadata is DERIVED from the translatable subset
  * of the scan's own data filters, so "translatable but unpushed" is
  * unrepresentable in the plan — PlanSpec pins pushdown the effective
  * way, by asserting a non-empty `PushedFilters` on specific queries.
  */
object PlanLint {

  /** One flagged anti-pattern: `rule` id, offending `node` class, and a
    * short human `detail`.
    */
  final case class Finding(rule: String, node: String, detail: String) {
    override def toString: String = s"$rule @ $node: $detail"
  }

  /** Lint a frame's prepared physical plan (AQE-aware), including
    * subquery plans.
    */
  def lint(df: DataFrame): Seq[Finding] =
    lintPlan(GraftExecShim.initialPhysicalPlan(df))

  def lintPlan(root: SparkPlan): Seq[Finding] = {
    val planes = allPlans(root)
    planes.flatMap { p =>
      p.collect {
        case j: CartesianProductExec
            if !isScalarSide(j.left) && !isScalarSide(j.right) =>
          Finding("cross_product", "CartesianProduct",
            s"${j.left.nodeName} x ${j.right.nodeName}") :: Nil
        case j: BroadcastNestedLoopJoinExec
            if !isScalarSide(broadcastSide(j)) =>
          Finding("cross_product", "BroadcastNestedLoopJoin",
            s"${j.joinType} join with no equi key") :: Nil
        case w: WindowExec
            if w.partitionSpec.isEmpty && !hasCombine(w.child) =>
          Finding("global_window", "Window",
            "empty PARTITION BY over un-aggregated input: " +
              "one task sorts every row") :: Nil
        case w: WindowGroupLimitExec
            if w.partitionSpec.isEmpty && !hasCombine(w.child) =>
          Finding("global_window", "WindowGroupLimit",
            "empty PARTITION BY over un-aggregated input: " +
              "one task scans every row") :: Nil
        case e: ShuffleExchangeExec
            if e.outputPartitioning == SinglePartition &&
              !hasCombine(e.child) =>
          Finding("single_partition_no_combine", "Exchange",
            "raw rows shuffle to one partition with no map-side " +
              "combine or local limit below") :: Nil
      }.flatten
    }
  }

  /** The side a BroadcastNestedLoopJoin broadcasts. */
  private def broadcastSide(j: BroadcastNestedLoopJoinExec): SparkPlan =
    j.buildSide match {
      case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
      case _ => j.right
    }

  /** True when `p` is structurally a 1-row scalar frame: a chain of
    * unary nodes (project/filter/exchange/codegen wrappers) ending in a
    * grouping-free aggregate, or a join of two such frames (the J8
    * horizontal-concat shape). Deliberately NOT a subtree `exists` — a
    * LIMIT-k side that merely CONTAINS a scalar aggregate somewhere
    * upstream is not 1-row and must stay flagged.
    */
  private def isScalarSide(p: SparkPlan): Boolean = p match {
    case a: HashAggregateExec => a.groupingExpressions.isEmpty
    case a: ObjectHashAggregateExec => a.groupingExpressions.isEmpty
    case a: SortAggregateExec => a.groupingExpressions.isEmpty
    // the binary case covers ONLY joins (two 1-row frames join to one
    // 1-row frame — the J8 horizontal-concat shape). A Union of two
    // scalar aggregates is 2 rows, not 1: bounded, but not the 1-row
    // contract this exemption documents, so it stays flagged and goes
    // through the caller's allowlist if legitimate.
    case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
      isScalarSide(j.left) && isScalarSide(j.right)
    case u if u.children.size == 1 => isScalarSide(u.children.head)
    case _ => false
  }

  /** The root plan plus every (transitively reachable) subquery plan. */
  private def allPlans(root: SparkPlan): Seq[SparkPlan] = {
    val subs = root.collect { case p => p.subqueries }.flatten
    root +: subs.flatMap(allPlans)
  }

  /** True when `p`'s subtree combines/bounds rows before they funnel:
    * a partial aggregate or a local limit anywhere below the shuffle.
    */
  private def hasCombine(p: SparkPlan): Boolean =
    p.exists {
      case _: HashAggregateExec | _: ObjectHashAggregateExec |
           _: SortAggregateExec | _: LocalLimitExec => true
      case _ => false
    }
}
