package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Grouped top-k as a true AGGREGATE (typed `Aggregator` — the
  * SURVEY §2.14 UDAF surface): per group, the k largest (value, id)
  * pairs ordered (value desc, id asc), maintained as a bounded sorted
  * buffer through reduce/merge.
  *
  * Why not the row_number window (q_group_topk): the window SHUFFLES
  * AND SORTS every row of every group to keep k of them — at 100 TB
  * the exchange carries the whole table. An aggregate gets partial
  * aggregation for free: each map task sends at most k rows PER GROUP
  * PER PARTITION into the shuffle, so the exchange volume is
  * O(groups·k·partitions), independent of table size. Same answer,
  * plan-pinned in PlanSpec, value-pinned against the window oracle in
  * q_group_topk_agg.
  *
  * The buffer is a sorted Seq, insertion O(k) — fine for report-shaped
  * k (treat k <= ~100); a binary heap only pays off far beyond that.
  */
class TopKBy(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k >= 1, s"k=$k must be >= 1")

  /** (value desc, id asc) — a beats b when it sorts earlier. */
  private def beats(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Long, Long)] = Seq.empty

  override def reduce(buf: Seq[(Long, Long)],
      in: (Long, Long)): Seq[(Long, Long)] =
    if (buf.length >= k && beats(buf.last, in)) buf
    else {
      val (before, after) = buf.span(beats(_, in))
      (before :+ in) ++ after.take(k - before.length - 1)
    }

  override def merge(a: Seq[(Long, Long)],
      b: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    // merge of two sorted runs, truncated at k
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var (i, j) = (0, 0)
    while (out.length < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && beats(a(i), b(j)))) {
        out += a(i); i += 1
      } else { out += b(j); j += 1 }
    }
    out.toSeq
  }

  override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}

object TopKBy {
  /** DataFrame-API handle: `topKBy(3)(col("n_chars"), col("doc_id"))`
    * aggregates to `array<struct<_1 value, _2 id>>` in rank order.
    */
  def topKBy(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKBy(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
}
