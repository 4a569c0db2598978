package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph analytics over plain edge DataFrames — the iterative,
  * value-propagating complement to `Dedup.clusters`' min-label
  * connected components (reference analog: the od.py-style entity
  * graphs stay tiny there; at training-corpus scale the near-dup pair
  * graph and event-transition graphs are the real instances).
  */
object Graph {

  /** Weighted PageRank in EXACT integer arithmetic. Ranks are
    * "nanorank" longs that start at `scale / N` per node; each
    * iteration routes `dampNum/dampDen` of a node's rank along its
    * out-edges proportionally to edge weight, plus the uniform
    * `(1 - d)` base mass. Every step is integer multiply + truncating
    * division + integer sum — no doubles anywhere — so the result is
    * independent of partitioning AND aggregation order, and an
    * external engine replays it bit-for-bit (group-sums of doubles are
    * neither). The remainder mass lost to truncation and to dangling
    * nodes (no out-edges) is deliberately NOT redistributed: that
    * keeps each iteration a single keyed join + aggregate with no
    * global renormalization pass, and ranking order is unaffected.
    *
    * Contract: ids castable to long, weights positive (truncating DIV
    * equals floor only for non-negative operands).
    *
    * Scale shape: the edge⋈out-weight join is loop-INVARIANT, so it is
    * fused once into a persisted (src, dst, w, ow) table and every
    * iteration is exactly one keyed equi-join (rank onto that table)
    * plus one hash aggregate — both shuffle on bare longs. Iterations
    * localCheckpoint every `checkpointEvery` rounds (not every round:
    * a ≤5-deep unrolled plan is cheap, and skipping the per-round
    * barrier lets one action drive the whole loop — measured 30 → 12
    * Spark jobs at iters=3). The only driver scalar is the
    * node count (a bounded model parameter, same class as ANN
    * pivots). Contribution terms stay under scale × max-edge-weight ≈
    * 2^53 headroom for any realistic weight; sums ride longs.
    *
    * Returns (node: long, rank: long) — rank in scale-ths.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iters: Int, scale: Long = 1000000000L,
      dampNum: Long = 85L, dampDen: Long = 100L,
      checkpointEvery: Int = 5): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    require(dampDen >= 1 && dampNum >= 0 && dampNum <= dampDen,
      s"damping $dampNum/$dampDen must lie in [0,1]")
    require(checkpointEvery >= 1, s"checkpointEvery=$checkpointEvery must be >= 1")
    // internal persists route through StageCache (r16, guide §1.2/§5):
    // the loop frames are multi-consumer (nodes and ew feed every
    // iteration), but the RESULT stays LAZY — the previous shape ran
    // an EAGER localCheckpoint(true) of the final ranks so it could
    // unpersist before returning, which forced a synchronous
    // materialization barrier (plus a block write + re-read) inside
    // plan construction. Now one caller action drives the whole loop
    // and the CALLER releases the caches after consuming
    // (StageCache.releaseAll — the minhash/tfidf contract; a released
    // stage recomputes rather than failing, so early release is safe).
    val e = StageCache.persisted(
      edges.select(col(srcCol).cast("long").as("__src"),
        col(dstCol).cast("long").as("__dst"),
        col(weightCol).cast("long").as("__w")),
      StorageLevel.MEMORY_AND_DISK)
    val nodes = StageCache.persisted(
      e.select(col("__src").as("node"))
        .unionByName(e.select(col("__dst").as("node")))
        .distinct(),
      StorageLevel.MEMORY_AND_DISK)
    // the node count is a bounded model parameter (the `base` mass per
    // node) — the loop's only driver action
    val n = nodes.count()
    require(n > 0, "pageRank: empty edge list")
    val base = (scale * (dampDen - dampNum)) / (dampDen * n)
    // loop-invariant: each edge's share of its source's out-weight
    // never changes, so the edge⋈out-weight join runs ONCE, not once
    // per iteration
    val ew = StageCache.persisted(
      e.join(e.groupBy("__src").agg(sum("__w").as("__ow")), "__src")
        .select(col("__src"), col("__dst"), col("__w"), col("__ow")),
      StorageLevel.MEMORY_AND_DISK)
    var pr = nodes.withColumn("rank", lit(scale / n))
    for (i <- 1 to iters) {
      val contrib = ew
        .join(pr.select(col("node").as("__src"), col("rank").as("__pr")),
          "__src")
        .select(col("__dst").as("node"),
          expr("(__pr * __w) DIV __ow").as("__c"))
        .groupBy("node").agg(sum("__c").as("__S"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"), (lit(base) +
          expr(s"($dampNum * coalesce(__S, 0L)) DIV $dampDen")).as("rank"))
      // truncate lineage only every few rounds: the barrier costs a
      // job per round, while a few-iterations-deep unrolled plan costs
      // nothing — one action at the end drives the whole loop
      if (i % checkpointEvery == 0 && i < iters) pr = pr.localCheckpoint(false)
    }
    pr
  }

  /** Per-node triangle counts via the id-oriented node-iterator join:
    * edges are canonicalized to a<b, wedges form by joining (a,b) with
    * (b,c) — a<b<c holds by construction, so every triangle closes
    * exactly once through the (a,c) membership join, with no
    * post-hoc dedup. The id orientation plays the role degree
    * orientation plays in the classic algorithm: each triangle is
    * enumerated from its smallest vertex only, capping the wedge
    * fan-out. Scale shape: one distinct + two keyed equi-joins on bare
    * longs; the hot spot is wedge count Σ deg²(b) — for power-law
    * graphs switch the orientation column to a degree rank (drop-in:
    * relabel ids by ascending degree first). Result is exact integer
    * counts — engine-replayable.
    *
    * Returns (node: long, n_triangles: long), nodes in ≥1 triangle.
    */
  def triangleCounts(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    // StageCache persist + LAZY result (r16, guide §1.2/§5): the
    // previous eager localCheckpoint existed only so the edge cache
    // could be unpersisted before returning — a synchronous
    // materialization (compute + block write + re-read) inside plan
    // construction. The caller now drives the whole count with one
    // action and releases the cache after consuming (releaseAll).
    val und = StageCache.persisted(
      edges.select(
        least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("a"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("b"))
        .where(col("a") =!= col("b") && col("a").isNotNull)
        .distinct(),
      StorageLevel.MEMORY_AND_DISK)
    val wedges = und.join(und.select(col("a").as("b"), col("b").as("c")), "b")
    val tri = wedges.join(und.select(col("a"), col("b").as("c")),
      Seq("a", "c"))
    tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }
}
