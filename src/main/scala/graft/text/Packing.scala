package graft.text

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField}

/** Sequence packing for training batches: greedy first-fit-in-order
  * assignment of documents to fixed-capacity bins by token count — the
  * standard "pack short documents into one context window"
  * preprocessing step.
  *
  * Semantics (true greedy, sequential within a group): walk the group
  * in `orderCol` order keeping a running `filled`; when adding the next
  * document would exceed `capacity`, close the bin and start a new one
  * with that document. A bin therefore NEVER exceeds capacity unless a
  * single document is itself larger than capacity, in which case it
  * gets a bin of its own (truncation is the tokenizer's job, not the
  * packer's).
  *
  * Scale shape: greedy packing is inherently a sequential scan with a
  * data-dependent reset, so it is not expressible as a window prefix
  * sum. We shuffle once (hash-partition by the group columns), sort
  * within partitions, and run the scan as a streaming iterator — no
  * per-group buffering, groups parallelize across executors. The
  * sequential unit is one group; with no group columns the whole frame
  * is coalesced to one partition (documented: global packing of an
  * unbounded corpus should be grouped, e.g. by shard key, first).
  */
object Packing {

  /** Greedy packing (see object doc). With NO group columns the whole
    * frame funnels through ONE partition — correct, but a silent scale
    * trap on a large corpus, so the ungrouped path must be opted into
    * with `allowGlobal = true` (or, better, use [[packBinsSharded]],
    * which manufactures a shard key and keeps the scan parallel).
    */
  def packBins(df: DataFrame, groupCols: Seq[String], orderCol: String,
      weightCol: String, capacity: Int,
      allowGlobal: Boolean = false): DataFrame = {
    require(capacity > 0, s"capacity must be positive (got $capacity)")
    require(groupCols.nonEmpty || allowGlobal,
      "packBins with no group columns coalesces the ENTIRE frame to one " +
        "partition (greedy packing is a sequential scan). Pass group " +
        "columns, use packBinsSharded for a manufactured shard key, or " +
        "opt in explicitly with allowGlobal = true on a small frame.")
    val outSchema = df.schema.add(StructField("bin", IntegerType, nullable = false))
    val wIdx = df.schema.fieldIndex(weightCol)
    val gIdx = groupCols.map(df.schema.fieldIndex)
    val sorted =
      (if (groupCols.nonEmpty) df.repartition(groupCols.map(col): _*)
       else df.coalesce(1))
        .sortWithinPartitions((groupCols :+ orderCol).map(col): _*)
    sorted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var bin = 0
      var filled = 0L
      var first = true
      it.map { r =>
        val k = gIdx.map(r.get)
        val w = r.getAs[Number](wIdx).longValue()
        if (first || k != curKey) {
          curKey = k; bin = 0; filled = w; first = false
        } else if (filled + w > capacity) {
          bin += 1; filled = w
        } else filled += w
        Row.fromSeq(r.toSeq :+ bin)
      }
    }(Encoders.row(outSchema))
  }

  /** Global packing at scale: hash-shard by the order key into
    * `nShards` deterministic shards, then pack each shard
    * independently — the parallel answer to "pack the whole corpus"
    * that [[packBins]]'s ungrouped path can't give. Bin ids are
    * per-shard (output carries the `shardCol`); capacity holds within
    * every (shard, bin). The packing is greedy per shard in `orderCol`
    * order, so the result is deterministic for a fixed shard count —
    * it is a DIFFERENT (equally valid) packing than the global
    * single-scan one, which is the trade that buys the parallelism.
    */
  def packBinsSharded(df: DataFrame, nShards: Int, orderCol: String,
      weightCol: String, capacity: Int,
      shardCol: String = "shard"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1 (got $nShards)")
    require(!df.columns.contains(shardCol),
      s"packBinsSharded writes a '$shardCol' column; input already has one")
    val sharded = df.withColumn(shardCol,
      pmod(crc32(col(orderCol).cast("string")), lit(nShards)).cast("int"))
    packBins(sharded, Seq(shardCol), orderCol, weightCol, capacity)
  }
}
