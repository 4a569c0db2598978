package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** `transformWithState` showcase — Spark 4's arbitrary-state API v2,
  * the successor to `flatMapGroupsWithState` (which EventStreams uses
  * for sessionization): typed state variables are declared against a
  * handle instead of threaded through one opaque state object, so a
  * processor can hold a MAP of sub-states per key (here: per-user
  * event-type counts in a `MapState`), each independently updatable
  * and TTL-able, backed by the RocksDB state store.
  *
  * Emits one row per (user, type) touched in a micro-batch carrying
  * the new RUNNING total — so the last emission per pair equals the
  * batch groupBy count, which is exactly what the spec pins against a
  * static aggregate of the same fixture.
  */
case class EventIn(user_id: Long, event_type: String)
case class TypeCount(user_id: Long, event_type: String, n: Long)

class TypeCountsProcessor
    extends StatefulProcessor[Long, EventIn, TypeCount] {

  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, Long]("counts",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[EventIn],
      timerValues: TimerValues): Iterator[TypeCount] = {
    // fold the batch locally, touch the store once per distinct type
    val delta = scala.collection.mutable.Map.empty[String, Long]
    rows.foreach { e =>
      delta(e.event_type) = delta.getOrElse(e.event_type, 0L) + 1L
    }
    delta.toSeq.sortBy(_._1).iterator.map { case (t, d) =>
      val n = (if (counts.containsKey(t)) counts.getValue(t) else 0L) + d
      counts.updateValue(t, n)
      TypeCount(key, t, n)
    }
  }
}

object StatefulCounts {

  /** Running per-(user, event_type) counts over a stream. Works on a
    * streaming frame (RocksDB state store required —
    * `spark.sql.streaming.stateStore.providerClass`); the batch twin
    * is a plain groupBy count, which the spec compares against.
    */
  def typeCountsStream(events: DataFrame): Dataset[TypeCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_type")).as[EventIn]
      .groupByKey(_.user_id)
      .transformWithState(new TypeCountsProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
