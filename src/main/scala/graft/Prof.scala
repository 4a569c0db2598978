package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Stage-level profiler for the heavy text/dedup pipelines (dev tool).
  * Usage: runMain graft.Prof [sfDir]
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }

    // warmup: JIT + parquet footer caching, so stage timings are honest
    docs.count(); docs.select(sum(length(col("text")))).collect()

    time("tokens only") {
      docs.select(TextAnalysis.tokens(col("text")).as("t"))
        .select(sum(size(col("t")))).collect()(0).getLong(0)
    }
    time("shingles") {
      docs.select(Dedup.shingles(col("text"), 2).as("sh"))
        .select(sum(size(col("sh")))).collect()(0).getLong(0)
    }
    time("shingles+sig") {
      docs.select(Dedup.shingles(col("text"), 2).as("sh"))
        .select(Dedup.minhashSignature(col("sh"), 16).as("sig"))
        .select(sum(size(col("sig")))).collect()(0).getLong(0)
    }
    time("simhash bits") {
      docs.select(Dedup.simhashBits(col("text")).as("b"))
        .select(sum(size(col("b")))).collect()(0).getLong(0)
    }
    time("minhash candidates") {
      import org.apache.spark.storage.StorageLevel
      val shDf = docs.select(col("doc_id").as("id"),
        Dedup.shingles(col("text"), 2).as("sh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val buckets = shDf
        .withColumn("sig", Dedup.minhashSignature(col("sh"), 16))
        .select(col("id"), posexplode(Dedup.lshBands(col("sig"), 16, 8))
          .as(Seq("band", "bucket")))
      val n = buckets.select(col("band"), col("bucket"), col("id").as("id_a"))
        .join(buckets.select(col("band"), col("bucket"), col("id").as("id_b")),
          Seq("band", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct().count()
      shDf.unpersist()
      n
    }
    time("full minhashPairs") {
      Dedup.minhashPairs(docs, "doc_id", "text", 2, 16, 8, 0.1).count()
    }
    time("full simhashPairs") {
      Dedup.simhashPairs(docs, "doc_id", "text", 3).count()
    }
    time("full ngramJaccardPairs") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        Seq("lang", "source"), 2, 0.09).count()
    }
    time("cosinePairs sf") {
      graft.similarity.Ann.cosinePairs(
        spark.read.parquet(sfDir + "/embeddings.parquet"), "label", 0.3).count()
    }
    time("clusters from cosinePairs") {
      val pairs = graft.similarity.Ann.cosinePairs(
        spark.read.parquet(sfDir + "/embeddings.parquet"), "label", 0.3)
      Dedup.clusters(pairs).count()
    }
    time("text_analysis") {
      docs.withColumn("toks", TextAnalysis.tokens(col("text")))
        .select(col("doc_id"), size(col("toks")).as("n"),
          TextAnalysis.subwordCountT(col("toks")).as("sw"),
          TextAnalysis.langIdT(col("toks")).as("lang"),
          TextAnalysis.qualityScoreT(col("text"), col("toks")).as("q"),
          TextAnalysis.fingerprint(col("text")).as("fp"))
        .count()
    }
    spark.stop()
  }
}
