package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan,
  SparkStrategy}

/** Native as-of join: the full custom-operator stack — a resolved
  * logical node, a planner [[SparkStrategy]], and a physical
  * [[AsOfJoinExec]] whose per-partition state is O(1) — registered via
  * `SparkSessionExtensions` (GraftExtensions) or imperatively through
  * `spark.experimental.extraStrategies`.
  *
  * Semantics match [[graft.ops.TemporalJoins.asofJoin]] (left as-of:
  * for each left row, the LATEST right row with equal keys and
  * rightTime <= leftTime; unmatched left rows keep null payload;
  * right rows with null time match nothing; left rows with null time
  * match nothing; null keys group together — the window/groupBy
  * convention that implementation established, pinned equivalent by
  * AsOfJoinNativeSpec).
  *
  * Scale shape vs the union+window formulation: each side shuffles
  * ONCE on its own keys and sorts by (keys, time); the merge then
  * consumes both sorted streams with a single buffered cursor — no
  * union row widening (the window path pads every right row with null
  * left columns and vice versa before the shuffle), no window state,
  * and the right side's payload is projected only when it becomes a
  * match candidate. At 100 TB that halves shuffle bytes for wide
  * schemas and removes the post-window filter pass.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightPayload: Seq[Attribute])
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, payload) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt,
        payload) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightPayload: Seq[Attribute])
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  // both sides co-partitioned on the keys (EnsureRequirements inserts
  // the exchanges and validates compatibility, exactly as for a
  // sort-merge join) ...
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // ... and sorted by (keys, time) so the merge is a linear scan
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOutput = left.output
    val rOutput = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val payload = rightPayload
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // per-partition: projections and orderings are codegen'd objects,
      // built on the executor
      val lKeyProj = UnsafeProjection.create(lKeys, lOutput)
      val rKeyProj = UnsafeProjection.create(rKeys, rOutput)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOutput)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOutput)
      val payloadProj = UnsafeProjection.create(
        payload.map(a => a: Expression), rOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(
        lKeys.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(
        Seq(lTime.dataType))
      // bind against nullability-FORCED payload attrs: an unmatched
      // left row carries a null payload even when the right column is
      // non-nullable, and a non-nullable BoundReference would read
      // that null as 0/""
      val resultProj = UnsafeProjection.create(
        outAttrs.map(a => a: Expression),
        lOutput ++ payload.map(_.withNullability(true)))
      val nullPayload = new GenericInternalRow(payload.length)
      val joined = new JoinedRow
      val rBuf = rIter.buffered

      new Iterator[InternalRow] {
        // latest consumed right row whose (key, time) qualified, with
        // its key copied out of the projection buffer
        private var matchKey: InternalRow = null
        private var matchPayload: InternalRow = null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val lt = lTimeProj(l)
          val ltNull = lt.isNullAt(0)
          // advance the right cursor past every row at-or-before this
          // left row; rows are never revisited (left times are
          // nondecreasing within a key), so the scan is linear
          var continue = true
          while (continue && rBuf.hasNext) {
            val r = rBuf.head
            val rk = rKeyProj(r)
            val c = keyOrd.compare(rk, lk)
            if (c < 0) {
              rBuf.next() // right key behind every remaining left row
            } else if (c == 0) {
              val rt = rTimeProj(r)
              if (rt.isNullAt(0)) {
                rBuf.next() // null right time matches nothing
              } else if (!ltNull && timeOrd.compare(rt, lt) <= 0) {
                matchKey = rk.copy()
                matchPayload = payloadProj(r).copy()
                rBuf.next()
              } else {
                continue = false // right row is in this left row's future
              }
            } else {
              continue = false // right key ahead: keep for later keys
            }
          }
          val p =
            if (!ltNull && matchKey != null &&
              keyOrd.compare(matchKey, lk) == 0) matchPayload
            else nullPayload
          resultProj(joined(l, p))
        }
      }
    }
  }
}
