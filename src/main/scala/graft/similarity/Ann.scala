package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Two paths:
  *  - brute-force cosine top-k: exact baseline; queries × corpus join,
  *    per-query TakeOrdered. At 100 TB the corpus side stays
  *    partitioned and the (small) query set broadcasts.
  *  - IVF (inverted-file) top-k: coarse-quantize the corpus against a
  *    small deterministic pivot set (nearest pivot = cell); a query
  *    searches only its own cell (nprobe=1). The pivot assignment is
  *    one broadcast join; the fine search joins on the cell id, so the
  *    candidate set per query shrinks by ~|pivots|×.
  *
  * The dot product folds left-to-right in double precision
  * (`aggregate(zip_with(...))`) — the same fold the DuckDB oracle
  * writes, so scores are bit-identical across engines.
  */
object Ann {

  /** Left-to-right double-precision dot product of two float arrays.
    * Native codegen'd loop, bit-identical to the
    * `aggregate(zip_with(...))` fold the oracle evaluates.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VecDot(a, b)

  /** L2 norm (same fold). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — the textbook formula, which is 0/0 (NaN, or
    * an ANSI divide-by-zero error in interpreted eval) on zero-norm
    * inputs. Search/pair operators all route through the internal
    * zero-guarded [[cosineSim]] instead; use this only where inputs
    * are known non-zero.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** dp/(na·nb) guarded to NULL when either norm is zero: a zero
    * embedding (dead/padding row) has no cosine direction, and the
    * unguarded 0/0 is NaN — which Spark and DuckDB both order ABOVE
    * every real similarity, so one zero vector would become the
    * rank-1 "nearest neighbor" of every query and pair with every row
    * under any threshold. NULL instead sorts LAST under desc ordering
    * and fails every >= threshold filter. (No-op on well-formed
    * corpora; every search/pair entry point routes through this.)
    */
  private def cosineSim(dp: Column, na: Column, nb: Column): Column =
    when(na =!= 0.0 && nb =!= 0.0, dp / (na * nb))

  /** [[cosineSim]] for fused multi-ranking report queries (q_mrl_recall):
    * the zero-guarded cosine as a reusable building block, so a report
    * that scores one pair table at several truncation widths composes
    * the exact per-width expression the separate search entry points
    * would have evaluated (bit-identical scores, one pair pass).
    */
  private[graft] def cosineGuarded(dp: Column, na: Column, nb: Column): Column =
    cosineSim(dp, na, nb)

  /** Self-pair exclusion shared by every search entry point. All of
    * them expose `excludeSelf` (default true — the corpus-is-queries
    * convention of the registered queries); pass false when the query
    * table's vec_id space is independent of the corpus's, where a
    * coincidental id collision would silently drop a legitimate
    * neighbor (the hazard quantizedTopK's doc describes).
    */
  private def dropSelf(df: DataFrame, exclude: Boolean): DataFrame =
    if (exclude) df.filter(col("qid") =!= col("nid")) else df

  /** Brute-force cosine top-k: for each query row, the k nearest corpus
    * rows (self excluded). Query set should be small: it is broadcast.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    // norms precomputed per ROW, not per pair (same IEEE value — the
    // per-pair oracle formulation produces identical bits)
    val q = broadcast(queries.select(col("vec_id").as("qid"),
      col("embedding").as("qvec"), norm(col("embedding")).as("qnrm")))
    val c = corpus.select(col("vec_id").as("nid"),
      col("embedding").as("nvec"), norm(col("embedding")).as("nnrm"))
    val scored = dropSelf(q.crossJoin(c), excludeSelf)
      .withColumn("sim", cosineSim(dot(col("qvec"), col("nvec")), col("qnrm"), col("nnrm")))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("sim"))
  }

  /** Hard-negative mining for contrastive training: for each query
    * row, the `k` most cosine-similar corpus rows whose `labelCol`
    * DIFFERS from the query's — the near-miss negatives that sit
    * closest to the decision boundary, which a contrastive loss learns
    * most from (random in-batch negatives are overwhelmingly easy).
    * The label inequality is a PAIR predicate, so it rides the same
    * broadcast nested-loop join as the brute-force baseline — exact
    * by construction. At 100 TB, restrict the corpus side to the
    * query's IVF cells first (compose with [[ivfTopK]]'s cell
    * assignment): cell-restricted mining accepts the same recall
    * trade the search path already does, and the join becomes a
    * cell-keyed equi-join instead of a broadcast sweep.
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int,
      labelCol: String = "label"): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("qid"),
      col(labelCol).as("qlabel"), col("embedding").as("qvec"),
      norm(col("embedding")).as("qnrm")))
    val c = corpus.select(col("vec_id").as("nid"), col(labelCol).as("nlabel"),
      col("embedding").as("nvec"), norm(col("embedding")).as("nnrm"))
    val scored = q.crossJoin(c)
      .filter(col("qlabel") =!= col("nlabel"))
      .withColumn("sim", cosineSim(dot(col("qvec"), col("nvec")), col("qnrm"), col("nnrm")))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("qlabel"), col("nid"), col("nlabel"),
        col("rank"), col("sim"))
  }

  /** Reciprocal-rank-fusion hybrid retrieval: fuse two rankers — cosine
    * similarity (normalized, favors directional match) and raw dot
    * product (unnormalized, favors high-magnitude corpus vectors; the
    * stand-in for any second scoring channel, e.g. BM25 in a
    * text+vector hybrid stack) — with the standard RRF score
    * `sum_r 1/(rrfK + rank_r)` over each ranker's top-`n` list
    * (Cormack et al.; a pair absent from a list contributes 0).
    * Returns the top-`k` fused candidates per query as
    * (qid, nid, rank, rrf).
    *
    * One broadcast pass computes BOTH channel scores per (query,
    * corpus) pair — the dot product is shared work, cosine just
    * divides by the precomputed norms — then two row_number windows
    * per qid produce the channel ranks. RRF arithmetic is
    * `1/(integer + integer)` doubles with one two-term sum: bit-exact
    * and order-free across engines, unlike score-interpolation fusion
    * which inherits float summation order. At 100 TB each ranker
    * would feed its own top-n (IVF/LSH for the vector channel, an
    * inverted index for the text channel) and only the ≤2n per-query
    * candidates meet for fusion — the fusion itself is rank-only, so
    * it never touches embeddings again.
    */
  def rrfTopK(queries: DataFrame, corpus: DataFrame, n: Int, k: Int,
      rrfK: Int = 60, excludeSelf: Boolean = true): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("qid"),
      col("embedding").as("qvec"), norm(col("embedding")).as("qnrm")))
    val c = corpus.select(col("vec_id").as("nid"),
      col("embedding").as("nvec"), norm(col("embedding")).as("nnrm"))
    val scored = dropSelf(q.crossJoin(c), excludeSelf)
      .withColumn("dp", dot(col("qvec"), col("nvec")))
      .withColumn("sim", cosineSim(col("dp"), col("qnrm"), col("nnrm")))
    val wCos = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
    val wDot = Window.partitionBy("qid").orderBy(col("dp").desc, col("nid").asc)
    val wFuse = Window.partitionBy("qid").orderBy(col("rrf").desc, col("nid").asc)
    scored
      .withColumn("rank_cos", row_number().over(wCos))
      .withColumn("rank_dot", row_number().over(wDot))
      .filter(col("rank_cos") <= n || col("rank_dot") <= n)
      .withColumn("rrf",
        when(col("rank_cos") <= n, lit(1.0) / (lit(rrfK) + col("rank_cos")))
          .otherwise(lit(0.0)) +
        when(col("rank_dot") <= n, lit(1.0) / (lit(rrfK) + col("rank_dot")))
          .otherwise(lit(0.0)))
      .withColumn("rank", row_number().over(wFuse))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("rrf"))
  }

  /** Deterministic pivot set: the `nPivots` corpus rows with the lowest
    * ids (a stand-in for k-means centroids; deterministic beats clever
    * for reproducibility).
    */
  def pivots(corpus: DataFrame, nPivots: Int): DataFrame =
    corpus.orderBy("vec_id").limit(nPivots)
      .select(col("vec_id").as("pid"), col("embedding").as("pvec"))

  /** Assign every row to its nearest pivot (cell id = pivot id).
    *
    * The pivots are MODEL PARAMETERS (nPivots × dim floats): collect
    * them once on the driver, precompute their norms with the same
    * left-to-right double fold the engines use (bit-identical), and
    * inline them as literals — cell assignment is then a single
    * map-side projection whose argmax is `array_max` over
    * (sim, -pid) structs (struct ordering = sim desc, pid asc on
    * ties). Zero shuffle, zero join: the corpus never moves for
    * indexing. The previous formulation cross-joined corpus × pivots
    * and ran a `row_number` window partitioned by vec_id — a full
    * shuffle of the nPivots×-expanded corpus, the dominant indexing
    * cost at scale.
    */
  def assignCells(df: DataFrame, pivotDf: DataFrame): DataFrame =
    assignInlined(df, collectPivots(pivotDf))

  /** Test hook: counts the driver-side model-parameter jobs (pivot
    * seed collects, Lloyd iteration aggregates) so a spec can pin that
    * a multi-consumer report trains each [[IvfModel]] exactly once —
    * the q_ann_recall_trained single-training shape is a measured
    * cost-model invariant (train-per-consumer silently doubles every
    * index-build corpus scan), and unlike the minhash cache pins it is
    * invisible in the physical plan (training happens at BUILD time),
    * so the pin counts these hooks instead.
    */
  private[graft] object TrainTelemetry {
    val seedCollects = new java.util.concurrent.atomic.AtomicInteger(0)
    val lloydIters = new java.util.concurrent.atomic.AtomicInteger(0)
    val lshCollects = new java.util.concurrent.atomic.AtomicInteger(0)
    def reset(): Unit = {
      seedCollects.set(0); lloydIters.set(0); lshCollects.set(0)
    }
  }

  private def collectPivots(pivotDf: DataFrame): Array[(Long, Array[Float], Double)] = {
    TrainTelemetry.seedCollects.incrementAndGet()
    pivotDf.select(col("pid"), col("pvec")).orderBy("pid").collect().map { r =>
      val pv = r.getSeq[Float](1).toArray
      // same fold as VecDot: left-to-right, each term in double
      val pn = math.sqrt(pv.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
      (r.getLong(0), pv, pn)
    }
  }

  private def pivotSims(pivotData: Array[(Long, Array[Float], Double)]) = {
    val nrm = norm(col("embedding"))
    // zero-norm guard: under ANSI a zero-norm row (or pivot) would
    // DIVIDE_BY_ZERO the whole assignment scan; sim -2 sits below any
    // real cosine, so a dead row just lands in the tie-break cell and
    // a dead pivot's cell attracts nothing
    array(pivotData.map { case (pid, pv, pn) =>
      struct(when(nrm =!= 0.0 && lit(pn) =!= 0.0,
          dot(col("embedding"), typedlit(pv)) / (nrm * lit(pn)))
          .otherwise(lit(-2.0)).as("sim"),
        lit(-pid).as("npid"))
    }.toIndexedSeq: _*)
  }

  private def assignInlined(df: DataFrame,
      pivotData: Array[(Long, Array[Float], Double)]): DataFrame =
    df.withColumn("cell", -array_max(pivotSims(pivotData)).getField("npid"))

  /** Multi-probe variant: ONE row per (row, probed cell) for the
    * query's `nprobe` nearest pivots — still a pure map-side
    * projection (sort the inlined (sim, -pid) structs desc, slice,
    * explode). Struct desc order ties on -pid desc = pid asc, matching
    * the oracle's (cos DESC, pid) ranking.
    */
  private def probeInlined(df: DataFrame,
      pivotData: Array[(Long, Array[Float], Double)], nprobe: Int): DataFrame =
    df.withColumn("cell",
      explode(transform(
        slice(sort_array(pivotSims(pivotData), asc = false), 1, nprobe),
        s => -s.getField("npid"))))

  /** k-means-trained IVF pivots: run `iters` Lloyd iterations from the
    * deterministic lowest-id seeds and return the refined centroids as
    * inlinable pivot data. Per-(cell, dim) means are rounded to 6 dp
    * and narrowed to float before re-inlining — the kmeansStep oracle
    * recipe — so the trained pivots are bit-identical across engines
    * and a DuckDB oracle can replay the whole training. Cells that
    * lose every member drop out (both engines derive that from the
    * same assignment). Each iteration is one corpus scan + one
    * map-side-combined (cell, dim) mean aggregation; the centroids are
    * model parameters, so the corpus never shuffles for training —
    * at 100 TB the loop's cost is `iters` scans, same as any k-means.
    */
  private def trainedPivotData(corpus: DataFrame, nPivots: Int,
      iters: Int,
      seed: Option[Array[(Long, Array[Float], Double)]] = None
  ): Array[(Long, Array[Float], Double)] = {
    var piv = seed.getOrElse(collectPivots(pivots(corpus, nPivots)))
    for (_ <- 1 to iters) {
      TrainTelemetry.lloydIters.incrementAndGet()
      val means = assignInlined(corpus, piv)
        .select(col("cell"), posexplode(col("embedding")).as(Seq("p", "v")))
        .groupBy("cell", "p")
        .agg(round(avg(col("v").cast("double")), 6).as("m"))
        .collect()
      piv = means.groupBy(_.getLong(0)).toArray.sortBy(_._1).map {
        case (pid, rows) =>
          val vec = rows.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat)
          // same fold as collectPivots: left-to-right, terms in double
          val pn = math.sqrt(vec.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
          (pid, vec, pn)
      }
    }
    piv
  }

  /** IVF top-k: the corpus is coarse-quantized to its nearest pivot's
    * cell; each query searches its `nprobe` nearest cells (cells
    * partition the corpus, so multi-probe candidates are distinct by
    * construction). `trainIters > 0` refines the seed pivots with that
    * many k-means iterations first ([[trainedPivotData]]) — better
    * cell boundaries, higher recall at the same nprobe, for the cost
    * of `trainIters` extra corpus scans at index-build time.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nPivots: Int,
      nprobe: Int = 1, trainIters: Int = 0,
      excludeSelf: Boolean = true): DataFrame =
    ivfTopKModel(ivfModel(corpus, nPivots, trainIters), queries, corpus, k,
      nprobe, excludeSelf)

  /** A collected IVF pivot set — the model parameters (nPivots × dim
    * floats + norms) every IVF consumer inlines. Build it ONCE with
    * [[ivfModel]] and share it across consumers: training
    * (`trainIters` Lloyd iterations) costs one corpus scan + one
    * driver collect per iteration, so a report that calls the
    * train-inside entry points twice (search + candidate count) pays
    * the whole training twice — the q_ann_recall_trained shape this
    * type exists to fix.
    */
  final class IvfModel private[similarity] (
      private[similarity] val data: Array[(Long, Array[Float], Double)])

  def ivfModel(corpus: DataFrame, nPivots: Int,
      trainIters: Int = 0): IvfModel =
    new IvfModel(
      if (trainIters > 0) trainedPivotData(corpus, nPivots, trainIters)
      else collectPivots(pivots(corpus, nPivots)))

  /** Refine an existing model with `trainIters` Lloyd iterations —
    * lets a report that evaluates untrained-vs-trained start the
    * training from the already-collected seed pivots instead of
    * re-collecting them (one fewer driver job per report).
    */
  def ivfModelFrom(seed: IvfModel, corpus: DataFrame,
      trainIters: Int): IvfModel =
    new IvfModel(trainedPivotData(corpus, seed.data.length, trainIters,
      Some(seed.data)))

  /** [[ivfTopK]] over a pre-built [[IvfModel]]. */
  def ivfTopKModel(model: IvfModel, queries: DataFrame, corpus: DataFrame,
      k: Int, nprobe: Int = 1, excludeSelf: Boolean = true): DataFrame =
    ivfTopKCells(model, queries, assignedCells(corpus, model), k, nprobe,
      excludeSelf)

  /** The corpus with its [[IvfModel]] cell assignment — the frame every
    * IVF consumer (search, candidate count, multi-probe variant) joins
    * against. Build it ONCE per (model, corpus) and persist it
    * (StageCache) when a report has several consumers: the assignment
    * is a full corpus scan evaluating nPivots inlined dot products per
    * row, so a report that calls two consumers through the
    * corpus-taking entry points pays that scan once per consumer —
    * and the inlined pivot literals are repeated once per subtree,
    * doubling the plan the optimizer must chew through.
    */
  def assignedCells(corpus: DataFrame, model: IvfModel): DataFrame =
    assignInlined(corpus, model.data)

  /** [[ivfTopKModel]] over a PRE-ASSIGNED cell table (from
    * [[assignedCells]], typically persisted) — the multi-consumer
    * report shape: nprobe 1 and 2 searches share one assignment scan.
    */
  def ivfTopKCells(model: IvfModel, queries: DataFrame, cells: DataFrame,
      k: Int, nprobe: Int = 1, excludeSelf: Boolean = true): DataFrame = {
    val qcells =
      if (nprobe <= 1) assignInlined(queries, model.data)
      else probeInlined(queries, model.data, nprobe)
    searchCells(qcells, cells, k, excludeSelf)
  }

  /** Probe the prepared cell table with cell-assigned queries: the
    * shared search tail of every IVF variant.
    */
  private def searchCells(qcells: DataFrame, cells: DataFrame,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    val q = broadcast(qcells.select(col("vec_id").as("qid"),
      col("embedding").as("qvec"), norm(col("embedding")).as("qnrm"), col("cell")))
    val scored = dropSelf(q.join(cells.select(col("vec_id").as("nid"),
        col("embedding").as("nvec"), norm(col("embedding")).as("nnrm"), col("cell")),
        Seq("cell")), excludeSelf)
      .withColumn("sim", cosineSim(dot(col("qvec"), col("nvec")), col("qnrm"), col("nnrm")))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("sim"))
  }

  /** Incremental IVF maintenance — the daily-embedding-ingest shape:
    * pivots and the cell index belong to the EXISTING corpus (at
    * scale, a persisted table); a new `delta` batch is assigned
    * map-side with the same inlined pivots and unioned in. The corpus
    * is never re-scanned or re-assigned per delta, and because cell
    * assignment is row-independent, searching the merged index is
    * IDENTICAL to re-indexing corpus+delta from scratch with the
    * corpus's pivots — which is exactly what the oracle replays.
    * (Pivot drift is a re-TRAIN decision, made on its own cadence.)
    */
  def ivfTopKIncremental(queries: DataFrame, corpus: DataFrame,
      delta: DataFrame, k: Int, nPivots: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val piv = collectPivots(pivots(corpus, nPivots))
    val cells = graft.ops.StageCache.persisted(assignInlined(corpus, piv))
      .unionByName(assignInlined(delta, piv))
    searchCells(assignInlined(queries, piv), cells, k, excludeSelf)
  }

  /** The candidate (qid, nid) pairs an IVF probe would score — the
    * COST side of the recall/cost trade (every candidate is one dot
    * product at search time). q_ann_recall_trained reports it next to
    * recall_bp so the tuning decision — more training vs more probes —
    * reads off a single row.
    */
  def ivfCandidates(queries: DataFrame, corpus: DataFrame, nPivots: Int,
      nprobe: Int = 1, trainIters: Int = 0): DataFrame =
    ivfCandidatesModel(ivfModel(corpus, nPivots, trainIters), queries,
      corpus, nprobe)

  /** [[ivfCandidates]] over a pre-built [[IvfModel]] — pair it with
    * [[ivfTopKModel]] so the recall-vs-cost report trains once.
    */
  def ivfCandidatesModel(model: IvfModel, queries: DataFrame,
      corpus: DataFrame, nprobe: Int = 1): DataFrame =
    ivfCandidatesCells(model, queries, assignedCells(corpus, model), nprobe)

  /** [[ivfCandidatesModel]] over a PRE-ASSIGNED cell table — pair it
    * with [[ivfTopKCells]] so the recall-vs-cost report assigns the
    * corpus once per model, not once per consumer.
    */
  def ivfCandidatesCells(model: IvfModel, queries: DataFrame,
      cells: DataFrame, nprobe: Int = 1): DataFrame = {
    val qcells =
      if (nprobe <= 1) assignInlined(queries, model.data)
      else probeInlined(queries, model.data, nprobe)
    broadcast(qcells.select(col("vec_id").as("qid"), col("cell")))
      .join(cells.select(col("vec_id").as("nid"), col("cell")), Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .select("qid", "nid")
  }

  /** LSH-bucketed ANN (random-hyperplane signatures): the sign pattern
    * of dot products against `nBits` deterministic normal vectors (the
    * lowest-id corpus rows — reproducible stand-ins for sampled
    * hyperplanes) forms the bucket key; a query probes only its own
    * bucket. The normals are model parameters: collected once on the
    * driver (nBits × dim floats) and inlined into the plan, so bucket
    * assignment is a map-side scalar computation — the corpus never
    * shuffles for indexing (vs IVF's argmax-over-pivots window), and
    * the fine search joins on the bucket key.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nBits: Int = 8, nprobe: Int = 1,
      excludeSelf: Boolean = true): DataFrame = {
    val m = lshModel(corpus, nBits)
    lshTopKPrepared(m, lshCorpusBuckets(m, corpus), queries, k, nprobe,
      excludeSelf)
  }

  /** The collected LSH hyperplane set — the model parameters (nBits ×
    * dim floats) every LSH consumer inlines. Build it ONCE with
    * [[lshModel]] and share it across probes: collecting the normals
    * is a driver job whose input is a corpus-wide TakeOrdered scan,
    * so a report that calls [[lshTopK]] once per nprobe setting pays
    * that scan (and the driver round-trip) once per consumer — the
    * same per-consumer index-build duplication [[IvfModel]] fixes for
    * the IVF family.
    */
  final class LshModel private[similarity] (
      private[similarity] val normals: Seq[Array[Float]])

  def lshModel(corpus: DataFrame, nBits: Int): LshModel = {
    TrainTelemetry.lshCollects.incrementAndGet()
    new LshModel(corpus.orderBy("vec_id").limit(nBits)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray).toSeq)
  }

  /** The corpus with its sign-bucket key — the build side of every LSH
    * probe. Like [[assignedCells]]: build once per (model, corpus) and
    * persist when several probes share it (the bucket key evaluates
    * nBits inlined dot products per corpus row).
    */
  def lshCorpusBuckets(model: LshModel, corpus: DataFrame): DataFrame = {
    val normals = model.normals
    val bits = normals.length
    def dotsOf(v: Column): Column =
      array(normals.map(nv => dot(v, typedlit(nv))): _*)
    def bucketFrom(dots: Column, flipPos: Column): Column =
      concat((0 until bits).map { i =>
        val bit = element_at(dots, i + 1) >= 0
        when(bit =!= (flipPos === i), lit("1")).otherwise(lit("0"))
      }: _*)
    corpus.withColumn("__dots", dotsOf(col("embedding")))
      .select(col("vec_id").as("nid"), col("embedding").as("nvec"),
        norm(col("embedding")).as("nnrm"),
        bucketFrom(col("__dots"), lit(-1)).as("bucket"))
  }

  /** [[lshTopK]] over a pre-built [[LshModel]] and a PRE-BUCKETED
    * corpus (from [[lshCorpusBuckets]], typically persisted) — the
    * multi-consumer report shape: nprobe 1 and 2 probes share one
    * normals collect and one corpus bucket scan.
    */
  def lshTopKPrepared(model: LshModel, corpusBuckets: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int = 1,
      excludeSelf: Boolean = true): DataFrame = {
    val normals = model.normals
    val bits = normals.length // < nBits on a tiny corpus
    require(nprobe >= 1 && nprobe <= bits + 1,
      s"nprobe=$nprobe must be in [1, bits+1=${bits + 1}]")
    // the per-hyperplane dot products, computed ONCE per row into an
    // array column — bucket, probe buckets, and flip margins all read
    // from it instead of re-evaluating the fold
    def dotsOf(v: Column): Column =
      array(normals.map(nv => dot(v, typedlit(nv))): _*)
    // bit i of the bucket, optionally flipped: '1' iff sign XOR flip
    def bucketFrom(dots: Column, flipPos: Column): Column =
      concat((0 until bits).map { i =>
        val bit = element_at(dots, i + 1) >= 0
        when(bit =!= (flipPos === i), lit("1")).otherwise(lit("0"))
      }: _*)
    val noFlip = lit(-1)
    // bit positions by ascending |margin| (the multi-probe order: the
    // cheapest bits to have landed on the wrong side), ties by position
    def flipOrder(dots: Column): Column = sort_array(
      array((0 until bits).map(i =>
        struct(abs(element_at(dots, i + 1)).as("m"), lit(i).as("i"))): _*))
    val c = corpusBuckets
    // query probes: own bucket + (nprobe-1) single-bit flips. Probe
    // keys are pairwise distinct and a corpus row lives in exactly one
    // bucket, so multi-probe candidates are distinct by construction.
    val q = broadcast(queries.withColumn("__dots", dotsOf(col("embedding")))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        norm(col("embedding")).as("qnrm"),
        explode(array((bucketFrom(col("__dots"), noFlip) +:
          (1 until nprobe).map(j => bucketFrom(col("__dots"),
            element_at(flipOrder(col("__dots")), j).getField("i")))): _*))
          .as("bucket")))
    val scored = dropSelf(q.join(c, Seq("bucket")), excludeSelf)
      .withColumn("sim", cosineSim(dot(col("qvec"), col("nvec")), col("qnrm"), col("nnrm")))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("sim"))
  }

  /** One Lloyd iteration of k-means over the embedding column: assign
    * every vector to its nearest current centroid (cosine), then emit
    * the recomputed per-cell per-dimension means. Centroids are model
    * parameters (k × dim floats) inlined as literals, so assignment is
    * a pure map-side projection — the only shuffle in the step is the
    * (cell, dim) mean aggregation, which is map-side combined. At
    * 100 TB the full k-means loop is this step run to convergence; the
    * corpus is scanned once per iteration and never re-partitioned.
    * Initial centroids default to the deterministic lowest-id rows
    * (same convention as [[pivots]]).
    */
  def kmeansStep(corpus: DataFrame, k: Int): DataFrame =
    assignCells(corpus, pivots(corpus, k))
      .select(col("cell"), posexplode(col("embedding")).as(Seq("p", "v")))
      .select(col("cell"), (col("p") + 1).as("dim"), col("v").cast("double").as("v"))
      .groupBy("cell", "dim")
      .agg(round(avg("v"), 6).as("centroid_v"), count(lit(1)).as("n_members"))

  /** Embedding-cosine near-duplicate pairs within a blocking column. */
  def cosinePairs(df: DataFrame, blockCol: String, threshold: Double): DataFrame = {
    val base = df.select(col(blockCol).as("blk"), col("vec_id").as("id"),
      col("embedding").as("v"), norm(col("embedding")).as("nrm"))
    val a = base.select(col("blk"), col("id").as("id_a"), col("v").as("v_a"),
      col("nrm").as("nrm_a"))
    val b = base.select(col("blk"), col("id").as("id_b"), col("v").as("v_b"),
      col("nrm").as("nrm_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", cosineSim(dot(col("v_a"), col("v_b")), col("nrm_a"), col("nrm_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Two-stage quantized search — the production memory path for a
    * 100 TB embedding corpus: the COARSE pass scores int8-dequantized
    * vectors (the index stores codes: 4× less scan IO than floats)
    * and keeps `rerank` candidates per query; the FINE pass fetches
    * only those candidates' float vectors (join back on id — the
    * "fetch from the store" shape) and re-ranks with exact cosine to
    * the final top `k`. Quantization noise can reorder NEIGHBORS but
    * the re-rank restores exact order among survivors, so recall@k is
    * governed by `rerank`/k, not by code precision.
    *
    * `excludeSelf` (default true) drops candidates with `nid == qid` —
    * the right semantics ONLY when queries and corpus share one id
    * space (the self-join "find my neighbors" use). With an
    * INDEPENDENT query table pass false: a corpus vector that merely
    * coincides with a query's vec_id is a legitimate neighbor there,
    * and the default would silently exclude it.
    */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      rerank: Int, excludeSelf: Boolean = true): DataFrame = {
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    def dequantized(df: DataFrame) = Quantize.int8(df, "embedding")
      .select(col("vec_id"),
        Quantize.dequantize(col("q"), col("mn"), col("mx")).as("dv"))
      .select(col("vec_id"), col("dv"), sqrt(dot(col("dv"), col("dv"))).as("dnrm"))
    val q = broadcast(dequantized(queries)
      .select(col("vec_id").as("qid"), col("dv").as("qv"), col("dnrm").as("qnrm")))
    val c = dequantized(corpus)
      .select(col("vec_id").as("nid"), col("dv").as("nv"), col("dnrm").as("nnrm"))
    val wq = Window.partitionBy("qid").orderBy(col("qsim").desc, col("nid").asc)
    val paired = q.crossJoin(c)
    val coarse = (if (excludeSelf) paired.filter(col("qid") =!= col("nid"))
                  else paired)
      .withColumn("qsim", cosineSim(dot(col("qv"), col("nv")), col("qnrm"), col("nnrm")))
      .withColumn("crank", row_number().over(wq))
      .filter(col("crank") <= rerank)
      .select("qid", "nid")
    // fine: fetch ONLY the candidates' float vectors, exact cosine
    val qf = broadcast(queries.select(col("vec_id").as("qid"),
      col("embedding").as("qvec"), norm(col("embedding")).as("qfn")))
    val wf = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
    coarse
      .join(corpus.select(col("vec_id").as("nid"),
        col("embedding").as("nvec"), norm(col("embedding")).as("nfn")), Seq("nid"))
      .join(qf, Seq("qid"))
      .withColumn("sim", cosineSim(dot(col("qvec"), col("nvec")), col("qfn"), col("nfn")))
      .withColumn("rank", row_number().over(wf))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("sim"))
  }

  /** Semantic dedup (the SemDeDup recipe, Abbas et al. 2023): coarse-
    * cluster the embeddings into IVF cells, then within each cell drop
    * every vector that has a LOWER-id neighbor with cosine similarity
    * >= `threshold` — one deterministic survivor per semantic
    * near-dup group (the pair rule, not transitive chaining: b dies
    * to a, c dies only if it also has its own lower-id neighbor).
    * Returns the kept rows as (vec_id, cell).
    *
    * Scale shape: cell assignment is the inlined-pivot map-side
    * projection of [[assignCells]] (no index shuffle); the candidate
    * pairing is quadratic ONLY within a cell — the whole point of the
    * coarse clustering is that cells are capped (at 100 TB: pick
    * nPivots ~ n/10⁴, or recurse the split on oversized cells); the
    * drop set carries bare ids and resolves as a LEFT ANTI join on
    * vec_id. Embeddings never cross a shuffle: both pair sides read
    * from the same cell-partitioned scan.
    */
  def semanticDedup(corpus: DataFrame, nPivots: Int,
      threshold: Double): DataFrame = {
    // persisted: the assigned corpus feeds both pair sides AND the
    // final anti join — unpersisted, Spark would recompute the scan +
    // pivot argmax three times (at cluster scale: a staging table).
    // Registered with StageCache: the result is lazy, so the caller
    // owns release (StageCache.releaseAll after consuming).
    val cells = graft.ops.StageCache.persisted(
      assignCells(corpus, pivots(corpus, nPivots))
        .select(col("vec_id"), col("embedding"), col("cell")))
    val base = cells.select(col("cell"), col("vec_id").as("id"),
      col("embedding").as("v"), norm(col("embedding")).as("nrm"))
    val dropped = base.select(col("cell"), col("id").as("id_a"),
        col("v").as("v_a"), col("nrm").as("nrm_a"))
      .join(base.select(col("cell"), col("id").as("id_b"),
        col("v").as("v_b"), col("nrm").as("nrm_b")), Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim",
        cosineSim(dot(col("v_a"), col("v_b")), col("nrm_a"), col("nrm_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_b").as("vec_id")).distinct()
    cells.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cell"))
  }
}
