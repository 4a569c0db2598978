package graft.similarity

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AnnSpec extends SparkTestBase {
  import spark.implicits._

  // unit-ish vectors: 0/1 close to each other, 2 close to 3, 4 alone
  val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.9f, 0.1f)),
    (4L, Array(0.0f, 0.0f, 1.0f)))
    .toDF("vec_id", "embedding")

  test("cosine: orthogonal -> 0, identical -> 1") {
    val df = vecs.as("a").crossJoin(vecs.as("b"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        Ann.cosine(col("a.embedding"), col("b.embedding")).as("sim"))
    val m = df.as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(math.abs(m((0L, 0L)) - 1.0) < 1e-12)
    assert(math.abs(m((0L, 2L))) < 1e-12)
    assert(m((0L, 1L)) > 0.99)
  }

  test("bruteForceTopK returns k ranked neighbors per query") {
    val out = Ann.bruteForceTopK(vecs.filter(col("vec_id") === 0), vecs, 2)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSeq
    assert(out === Seq((0L, 1L, 1), (0L, 2L, 2)) ||
      (out.head == ((0L, 1L, 1)) && out.size == 2))
  }

  test("hardNegatives returns only cross-label neighbors, nearest first") {
    // labels: 0/1 -> A, 2/3 -> B, 4 -> C. Query 0's nearest overall is 1
    // (same label, excluded); its hardest negatives are cross-label.
    val labeled = vecs.withColumn("label",
      when(col("vec_id") <= 1, 0).when(col("vec_id") <= 3, 1).otherwise(2))
    val out = Ann.hardNegatives(labeled.filter(col("vec_id") === 0), labeled, 2)
      .select("qid", "qlabel", "nid", "nlabel", "rank")
      .as[(Long, Int, Long, Int, Int)].collect().toSeq
    assert(out.size === 2)
    assert(out.forall { case (_, ql, nid, nl, _) => ql != nl && nid != 1L })
    assert(out.map(_._5) === Seq(1, 2))
    // vecs 2/3/4 are all orthogonal to query 0 (sim 0) -> nid asc ties
    assert(out.map(_._3) === Seq(2L, 3L))
  }

  test("ivfTopK searches within the query's cell only") {
    // 2 pivots = vec 0 and vec 1 (lowest ids); every vector lands in a cell
    val out = Ann.ivfTopK(vecs.filter(col("vec_id") === 4), vecs, 3, 2)
      .select("qid", "nid").as[(Long, Long)].collect()
    // all results share the query's cell; no self-match
    assert(out.forall(_._1 == 4L) && out.forall(_._2 != 4L))
    assert(out.nonEmpty)
  }

  test("ivfTopK nprobe=2 is a superset of nprobe=1 candidates") {
    val one = Ann.ivfTopK(vecs.filter(col("vec_id") === 4), vecs, 5, 2, nprobe = 1)
      .select("nid").as[Long].collect().toSet
    val two = Ann.ivfTopK(vecs.filter(col("vec_id") === 4), vecs, 5, 2, nprobe = 2)
      .select("nid").as[Long].collect().toSet
    assert(one.subsetOf(two))
    // with 2 pivots, nprobe=2 covers every cell = brute force
    val brute = Ann.bruteForceTopK(vecs.filter(col("vec_id") === 4), vecs, 5)
      .select("nid").as[Long].collect().toSet
    assert(two === brute)
  }

  test("lshTopK probes only the query's sign bucket") {
    // v5 = -v0 flips the sign bit of the v5-normal for v0/v1 only, so
    // {0,1} share a bucket apart from {2,3,4} and from {5}
    val vecs6 = vecs.union(
      Seq((5L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    val out = Ann.lshTopK(vecs6.filter(col("vec_id") === 0), vecs6, 2, 8)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSeq
    // k=2 requested but the bucket holds only one neighbor
    assert(out === Seq((0L, 1L, 1)))
  }

  test("lshTopK nprobe=2 also probes the lowest-margin flipped bucket") {
    // normals = 2 lowest-id vectors: n0=(1,0), n1=(0,1). Buckets:
    // 0,1 -> "11"; 2,3 -> "10". Query 2=(0.9,-0.1): own bucket "10"
    // holds only 3; its lowest-|margin| bit is n1 (|−0.1| < |0.9|),
    // flipping it probes "11" and reaches 0 and 1.
    val planar = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.9f, -0.1f)), (3L, Array(0.8f, -0.2f)))
      .toDF("vec_id", "embedding")
    def nids(nprobe: Int): Set[Long] =
      Ann.lshTopK(planar.filter(col("vec_id") === 2), planar, 5, 2, nprobe)
        .select("nid").as[Long].collect().toSet
    assert(nids(1) === Set(3L))
    assert(nids(2) === Set(3L, 0L, 1L))
  }

  test("cosinePairs finds the two close pairs under blocking") {
    val blocked = vecs.withColumn("blk", lit(1))
    val pairs = Ann.cosinePairs(blocked, "blk", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 1L), (2L, 3L)))
  }

  test("kmeansStep: every vector lands in one cell; means are per-cell") {
    // k=2 seeds = ids 0 and 1 (both near the x axis), so cluster 0/1
    // splits {0,1} and {2,3,4} fall to whichever seed is nearer
    val out = Ann.kmeansStep(vecs, 2)
      .orderBy("cell", "dim")
      .as[(Long, Int, Double, Long)].collect()
    val dims = out.map(_._2).distinct.sorted
    assert(dims.toSeq === Seq(1, 2, 3))
    // membership counts are consistent across dims within a cell and
    // sum to the corpus size
    val byCell = out.groupBy(_._1).map { case (c, rs) =>
      val ns = rs.map(_._4).distinct
      assert(ns.length === 1, s"cell $c has inconsistent n_members")
      ns.head
    }
    assert(byCell.sum === 5L)
  }

  test("semanticDedup keeps the lowest-id survivor per in-cell group") {
    // 2 pivots = vecs 0 and 1, each its own cell: 1 SURVIVES despite
    // cos(0,1)=0.994 because near-dups in different coarse cells are
    // never compared — the documented SemDeDup tradeoff. 2/3 both land
    // in pivot 1's cell (cos 0.11 vs 0) and 3 dies to 2; 4 ties 0.0 to
    // both pivots -> lowest pid's cell, orthogonal to 0, survives.
    val kept = Ann.semanticDedup(vecs, nPivots = 2, threshold = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(kept === Set(0L, 1L, 2L, 4L))
  }

  test("semanticDedup at an impossible threshold keeps everything") {
    val kept = Ann.semanticDedup(vecs, nPivots = 2, threshold = 1.1)
      .select("vec_id").as[Long].collect().toSet
    assert(kept === Set(0L, 1L, 2L, 3L, 4L))
  }

  test("quantizedTopK with rerank=all equals exact brute force") {
    // the fine pass re-ranks with exact cosine, so when the coarse pass
    // keeps every candidate the result must be bit-identical to
    // bruteForceTopK — the property that catches any corruption in the
    // dequantized coarse scoring (e.g. the getFloat-on-double ArrayData
    // bug the q_quantized_topk oracle exposed)
    val qs = vecs.filter(col("vec_id") <= 1)
    val brute = Ann.bruteForceTopK(qs, vecs, 3)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSet
    val quant = Ann.quantizedTopK(qs, vecs, 3, rerank = 4)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSet
    assert(quant === brute)
    assert(brute.nonEmpty)
  }

  test("quantizedTopK coarse pass ranks near-exact on well-separated vectors") {
    // rerank=k (no slack): survivors are picked purely by the COARSE
    // quantized scores, which for well-separated clusters must already
    // agree with the exact ranking — pins that dequantized (double)
    // vectors score sanely through the native dot
    val out = Ann.quantizedTopK(vecs.filter(col("vec_id") === 0), vecs,
      1, rerank = 1).select("qid", "nid").as[(Long, Long)].collect().toSeq
    assert(out === Seq((0L, 1L)), s"coarse pass picked $out, not the near dup")
  }

  test("ivfTopK trainIters: k-means pivots recover clusters bad seeds split") {
    // 18 vectors in 3 tight axis clusters; the 3 LOWEST ids all sit in
    // cluster x, so the untrained seeds split cluster x three ways and
    // scatter y/z — 2 Lloyd iterations must migrate the centroids onto
    // the true clusters, after which in-cell search equals brute force
    def v(axis: Int, jit: Float) = Array.tabulate(3)(i =>
      (if (i == axis) 1.0f else 0.0f) + (if (i == (axis + 1) % 3) jit else 0.0f))
    val rows = (0 until 18).map { i =>
      val axis = i / 6 // ids 0-5 on x, 6-11 on y, 12-17 on z
      (i.toLong, v(axis, 0.02f * (i % 6)))
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val qs = corpus.filter(col("vec_id") % 6 === 0)
    def hits(df: org.apache.spark.sql.DataFrame) = {
      val brute = Ann.bruteForceTopK(qs, corpus, 3).select("qid", "nid")
        .as[(Long, Long)].collect().toSet
      df.select("qid", "nid").as[(Long, Long)].collect().toSet
        .intersect(brute).size
    }
    val trained = hits(Ann.ivfTopK(qs, corpus, 3, 3, trainIters = 2))
    val untrained = hits(Ann.ivfTopK(qs, corpus, 3, 3))
    assert(trained === 9, s"trained IVF should equal brute force, got $trained/9")
    assert(untrained < trained,
      s"seeds from one cluster should underperform ($untrained vs $trained)")
  }

  test("rrfTopK: fusion promotes the candidate both channels agree on") {
    // query 0 with n=2: cosine submits (1, 3) — direction match first;
    // dot submits (2, 3) — magnitude first. Vector 3 is the only
    // candidate BOTH channels list, so its two terms 1/62+1/62 beat
    // the single 1/61 of either channel winner; 1 and 2 then tie and
    // break by nid
    val rows = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.0f)),    // cos rank 1 (dir match), dot 0.9 -> dot rank 3
      (2L, Array(8.0f, 8.0f)),    // cos 0.707 -> cos rank 3, dot 8 -> dot rank 1
      (3L, Array(2.0f, 0.45f)))   // cos ~0.976 rank 2, dot 2.0 rank 2
      .toDF("vec_id", "embedding")
    val out = Ann.rrfTopK(rows.filter(col("vec_id") === 0), rows, n = 2, k = 3)
      .select("nid", "rank", "rrf").as[(Long, Int, Double)].collect()
      .sortBy(_._2)
    assert(out.map(_._1).toSeq === Seq(3L, 1L, 2L))
    val expected3 = 1.0 / 62 + 1.0 / 62
    assert(out.head._3 === expected3, "rrf must be the exact two-term sum")
    assert(out(1)._3 === 1.0 / 61 && out(2)._3 === 1.0 / 61)
  }

  test("prefix-truncated search ranks by the prefix only (MRL eval primitive)") {
    // full width: vec 2 is an exact direction match (cos 1.0) and beats
    // vec 1 (cos 0.8, trailing mass); truncating to the first 2 dims
    // hides that trailing mass -> both tie at cos 1.0 and nid breaks
    // toward 1 — the ranking flip q_mrl_recall's report quantifies
    val rows = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.8f, 0.0f, 0.6f, 0.0f)),
      (2L, Array(0.7f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    def cut(d: Int) = rows.select(col("vec_id"),
      slice(col("embedding"), 1, d).as("embedding"))
    val fullTop = Ann.bruteForceTopK(rows.filter(col("vec_id") === 0), rows, 1)
      .select("nid").as[Long].head()
    val truncTop = Ann.bruteForceTopK(
        cut(2).filter(col("vec_id") === 0), cut(2), 1)
      .select("nid").as[Long].head()
    assert(fullTop === 2L && truncTop === 1L)
  }

  test("rrfTopK: a candidate outside one channel's top-n contributes one term") {
    // n=1: each channel submits only its winner; fused list is the two
    // winners with single-term scores, ordered by rank-1 term then nid
    val rows = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.0f)),
      (2L, Array(8.0f, 8.0f)),
      (3L, Array(2.0f, 0.45f)))
      .toDF("vec_id", "embedding")
    val out = Ann.rrfTopK(rows.filter(col("vec_id") === 0), rows, n = 1, k = 3)
      .select("nid", "rrf").as[(Long, Double)].collect().toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === 1.0 / 61 && out(2L) === 1.0 / 61)
  }

  test("a zero-norm embedding never outranks a real neighbor (NaN guard)") {
    // unguarded, 0/0 cosine is NaN and Spark ranks NaN ABOVE every
    // real similarity: the dead row would be everyone's rank-1 hit
    // and semanticDedup's lowest-id zero vector would delete its cell
    val rows = Seq(
      (0L, Array(0.0f, 0.0f)),          // dead/padding row
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val top = Ann.bruteForceTopK(rows.filter(col("vec_id") === 1), rows, 2)
      .orderBy("rank").select("nid").as[Long].collect().toSeq
    assert(top === Seq(2L, 3L), s"zero vector ranked: $top")
    val kept = Ann.semanticDedup(rows, nPivots = 1, threshold = 0.5)
      .select("vec_id").as[Long].collect().toSet
    graft.ops.StageCache.releaseAll()
    assert(kept.contains(3L) && kept.contains(0L),
      "the zero vector must not near-dup anything (and nothing dups it)")
  }

  test("excludeSelf=false keeps a corpus row sharing the query's id") {
    // independent id spaces: corpus row 1 is a legitimate neighbor of
    // query 1, not a self-pair
    val corpus = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val query = Seq((1L, Array(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val withSelf = Ann.bruteForceTopK(query, corpus, 1, excludeSelf = false)
      .select("nid").as[Long].collect().toSeq
    assert(withSelf === Seq(1L))
    val without = Ann.bruteForceTopK(query, corpus, 1)
      .select("nid").as[Long].collect().toSeq
    assert(without === Seq(2L), "default drops the id-colliding row")
  }

  test("q_ann_recall_trained trains each IvfModel exactly once") {
    // The IvfModel refactor (r10) collapsed the report's index builds:
    // one seed-pivot collect shared by both models (ivfModelFrom
    // refines the already-collected seed) and exactly trainIters=2
    // Lloyd iterations TOTAL — not per consumer (search + candidate
    // count each read the same model). Training happens at plan-BUILD
    // time, so this cost-model invariant is invisible to plan pins;
    // the telemetry counters pin it instead. A regression to the
    // train-inside entry points would read 2 seed collects / 4 Lloyd
    // iterations and double every index-build corpus scan of the
    // 100 TB report.
    Ann.TrainTelemetry.reset()
    graft.SparkEntry.queries("q_ann_recall_trained")(
      spark, "/root/testdata/sf0.001")
    graft.ops.StageCache.releaseAll()
    assert(Ann.TrainTelemetry.seedCollects.get() === 1,
      "seed pivots must be collected exactly once for the whole report")
    assert(Ann.TrainTelemetry.lloydIters.get() === 2,
      "the trained model must run its 2 Lloyd iterations exactly once")
  }

  test("q_ann_recall builds each index family's model exactly once") {
    // The r16 sharing refactor: ivf/ivf2 read one IvfModel (one seed
    // collect) and lsh/lsh2 read one LshModel (one normals collect) —
    // the per-probe-setting entry points each re-collected their model
    // (a corpus-wide TakeOrdered + driver job per consumer). Model
    // builds happen at plan-BUILD time, invisible to plan pins, so the
    // telemetry counters pin the cost model like the trained report's.
    Ann.TrainTelemetry.reset()
    graft.SparkEntry.queries("q_ann_recall")(spark, "/root/testdata/sf0.001")
    graft.ops.StageCache.releaseAll()
    assert(Ann.TrainTelemetry.seedCollects.get() === 1,
      "IVF pivots must be collected exactly once for ivf AND ivf2")
    assert(Ann.TrainTelemetry.lshCollects.get() === 1,
      "LSH normals must be collected exactly once for lsh AND lsh2")
  }
}
