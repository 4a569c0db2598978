package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Variant-timing harness for the sf1 heavy-tail dedup queries (dev
  * tool, like Prof): min-of-2 wall clock + Spark job count per
  * pipeline, run through count() with Bench-style cache hygiene.
  * This is the harness behind the round-8 adoptions (no-persist
  * one-shot minhash, df>=2 prefix pruning, exactly-once simhash
  * banding); keep it pointed at the CURRENT operators so a regression
  * in any of them shows up as a delta here before it shows in Bench.
  * Usage: runMain graft.Tune [sfDir]   (sfDir: Bench's /tmp/graft_sf1)
  */
object Tune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      })
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(name: String)(f: => DataFrame): Unit = {
      val ts = (1 to 2).map { _ =>
        graft.ops.StageCache.releaseAll()
        spark.catalog.clearCache()
        System.gc()
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        val n = f.count()
        val t = (System.nanoTime() - t0) / 1e9
        (t, jobs.get() - j0, n)
      }
      val best = ts.minBy(_._1)
      println(f"[tune] $name%-28s ${best._1}%7.2f s  ${best._2}%3d jobs  ${best._3}%9d rows")
    }

    time("minhashPairs") {
      Dedup.minhashPairs(docs, "doc_id", "text", 2, 16, 8, 0.1)
    }
    time("incrementalMinhashPairs") {
      val index = Dedup.minhashIndexView(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text")
      Dedup.incrementalMinhashPairs(index,
        docs.filter(pmod(col("doc_id"), lit(2)) === 1),
        "doc_id", "text", threshold = 0.1)
    }
    time("ngramJaccardPairsPruned") {
      Dedup.ngramJaccardPairsPruned(docs, "doc_id", "text",
        Seq("lang", "source"), 2, 0.09)
    }
    time("ngramJaccardPairs") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        Seq("lang", "source"), 2, 0.09)
    }
    time("simhashPairs") {
      Dedup.simhashPairs(docs, "doc_id", "text", 3)
    }
    time("duplicateSpans w=8") {
      Dedup.duplicateSpans(docs, "doc_id", "text", 8)
    }
    time("removeDuplicateSpans w=8") {
      Dedup.removeDuplicateSpans(docs, "doc_id", "text", 8)
    }
    spark.stop()
  }
}
