package graft.text

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
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
    require(!df.columns.contains("bin"),
      "packBins appends a 'bin' column; input already has one (schema.add " +
        "would silently produce a duplicate-name struct)")
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

  /** Padding-efficiency report: fixed-size row batches pad every
    * sequence to the batch max, so the waste is
    * `Σ_batches (rows·max − sum)`. This computes that waste per group
    * under BOTH batch orders — length-sorted (the length-bucketing
    * trick) and arrival order (the naive loader) — so the saving from
    * sorting reads off one row: `pad_sorted_ppm` vs `pad_arrival_ppm`
    * (ppm of the padded slot volume, integer-exact). The standard
    * batch-assembly decision input for inference servers and training
    * loaders alike.
    *
    * Scale shape: each variant is one group-keyed window + an
    * aggregate over (group, batch) — batch-count rows, not documents;
    * the two variants shuffle on the SAME keys (eligible for exchange
    * reuse) and the final rollup joins two group-sized frames. Input
    * here is (id, group, weight) only — never document text.
    */
  def paddingReport(df: DataFrame, groupCols: Seq[String], idCol: String,
      weightCol: String, batchRows: Int): DataFrame = {
    require(batchRows >= 1, s"batchRows must be >= 1 (got $batchRows)")
    require(groupCols.nonEmpty,
      "paddingReport windows per group; an ungrouped global row_number " +
        "would funnel the corpus through one partition")
    val g = groupCols.map(col)
    def waste(order: Seq[org.apache.spark.sql.Column],
        label: String): DataFrame = {
      val w = Window.partitionBy(g: _*).orderBy(order: _*)
      df.withColumn("__rn", row_number().over(w))
        .withColumn("__b", expr(s"CAST((__rn - 1) DIV $batchRows AS BIGINT)"))
        .groupBy((g :+ col("__b")): _*)
        .agg(count(lit(1)).as("__n"), max(col(weightCol)).as("__mx"),
          sum(col(weightCol)).as("__sm"))
        .groupBy(g: _*)
        .agg(sum(col("__n") * col("__mx") - col("__sm")).cast("long").as(s"pad_$label"),
          sum(col("__n") * col("__mx")).cast("long").as(s"slots_$label"))
    }
    val sorted = waste(Seq(col(weightCol).desc, col(idCol)), "sorted")
    val arrival = waste(Seq(col(idCol)), "arrival")
    sorted.join(arrival, groupCols)
      // zero-slot groups (all weights 0) report 0 ppm: the unguarded
      // DIV is an ANSI DIVIDE_BY_ZERO that would fail the whole report
      .withColumn("pad_sorted_ppm",
        expr("CAST(CASE WHEN slots_sorted = 0 THEN 0 ELSE " +
          "(1000000 * pad_sorted) DIV slots_sorted END AS BIGINT)"))
      .withColumn("pad_arrival_ppm",
        expr("CAST(CASE WHEN slots_arrival = 0 THEN 0 ELSE " +
          "(1000000 * pad_arrival) DIV slots_arrival END AS BIGINT)"))
      .select((g :+ col("pad_sorted_ppm") :+ col("pad_arrival_ppm")): _*)
  }
}
