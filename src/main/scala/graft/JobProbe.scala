package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Scheduled-job A/B probe for the streaming-admission fixed cost
  * (VERDICT r11 task 6). With AQE on, every exchange materialization is
  * its own scheduled job, so jobs-per-micro-batch is a direct proxy for
  * the per-batch fixed machinery a continuous ingest multiplies by
  * batch count. Runs the SAME two half-corpus batches through the old
  * two-pipeline shape (within-batch pair self-join + separate
  * incremental probe + two anti joins — the r11 admitBatch body) and
  * the fused [[Dedup.admissionDrops]] shape, printing jobs per batch
  * and asserting the admitted id sets are identical.
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobCount.incrementAndGet(); ()
        }
      })
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val conf = spark.sparkContext.hadoopConfiguration

    def freshDir(d: String): String = {
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) fs.delete(p, true)
      d
    }

    // r11 admitBatch body (pre-fusion), reconstructed verbatim minus
    // the param-stamp bookkeeping — same staging appends either way.
    def admitOld(batch: DataFrame, idxDir: String): DataFrame = {
      val shPath = s"$idxDir/shingles"; val bkPath = s"$idxDir/buckets"
      val fs = new org.apache.hadoop.fs.Path(idxDir).getFileSystem(conf)
      val hasIndex = fs.exists(new org.apache.hadoop.fs.Path(bkPath))
      val batchIdx = Dedup.minhashIndex(batch, "doc_id", "text", 2, 16, 8,
        fastKernel = true)
      val inBatch = Dedup.minhashPairsFromIndex(batchIdx, 0.3)
        .select(col("id_b").as("doc_id")).distinct()
      val survivors = batch.join(inBatch, Seq("doc_id"), "left_anti")
      val admitted =
        if (!hasIndex) survivors
        else {
          val staged = Dedup.MinhashIndex(
            spark.read.parquet(shPath), spark.read.parquet(bkPath))
          val hits = Dedup.incrementalMinhashPairsFromIndex(staged,
            batchIdx, 0.3).select(col("id_a").as("doc_id")).distinct()
          survivors.join(hits, Seq("doc_id"), "left_anti")
        }
      val out = admitted.localCheckpoint(true)
      val admIds = out.select(col("doc_id").as("id"))
      batchIdx.shingles.join(admIds, Seq("id"), "left_semi")
        .write.mode("append").parquet(shPath)
      batchIdx.buckets.join(admIds, Seq("id"), "left_semi")
        .write.mode("append").parquet(bkPath)
      graft.ops.StageCache.releaseAll()
      out
    }

    def measure(label: String, step: DataFrame => DataFrame): Set[Long] = {
      val b1 = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      val b2 = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      var ids = Set.empty[Long]
      for ((b, i) <- Seq(b1 -> 1, b2 -> 2)) {
        jobCount.set(0)
        val out = step(b)
        ids ++= out.select("doc_id")
          .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect()
        Thread.sleep(500)
        println(s"[probe] $label batch$i jobs=${jobCount.get()}")
      }
      ids
    }

    freshDir("/tmp/graft_probe_idx_old")
    val oldIds = measure("OLD(two-pipeline)",
      b => admitOld(b, "/tmp/graft_probe_idx_old"))
    freshDir("/tmp/graft_probe_idx_new")
    val newIds = measure("NEW(fused-drops)",
      b => graft.streaming.CorpusStreams.admitBatch(
        b, "/tmp/graft_probe_idx_new", "doc_id", "text"))
    // r15: the default verify routing is the forced-carry sentinel
    // (no pair-table persist, no routing-count job); this arm re-runs
    // the same batches with the size gate ACTIVE so the per-batch job
    // saving of the default is a measured delta, not an assertion
    freshDir("/tmp/graft_probe_idx_gate")
    val gateIds = measure("GATED(count+persist)",
      b => graft.streaming.CorpusStreams.admitBatch(
        b, "/tmp/graft_probe_idx_gate", "doc_id", "text",
        verifyMinPairs = Dedup.VerifyUseConf))
    require(gateIds == newIds,
      s"gated vs forced-carry admitted sets differ: " +
        s"only-gated=${(gateIds -- newIds).take(5)} " +
        s"only-forced=${(newIds -- gateIds).take(5)}")
    require(oldIds == newIds,
      s"admitted sets differ: only-old=${(oldIds -- newIds).take(5)} " +
        s"only-new=${(newIds -- oldIds).take(5)}")
    println(s"[probe] equivalence OK (${newIds.size} admitted docs)")
    // staged-index state: same admitted ids + same deterministic
    // left_semi filter of the same batch index ⇒ identical tables;
    // checked directly anyway (id set + bucket row count).
    def stagedIds(d: String): (Set[Long], Long) = (
      spark.read.parquet(s"$d/shingles").select("id")
        .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet,
      spark.read.parquet(s"$d/buckets").count())
    val (oSh, oBk) = stagedIds("/tmp/graft_probe_idx_old")
    val (nSh, nBk) = stagedIds("/tmp/graft_probe_idx_new")
    require(oSh == nSh && oBk == nBk,
      s"staged index differs: ids ${oSh.size} vs ${nSh.size}, " +
        s"bucket rows $oBk vs $nBk")
    println(s"[probe] staged index identical (${nSh.size} ids, $nBk bucket rows)")
    spark.stop()
  }
}
