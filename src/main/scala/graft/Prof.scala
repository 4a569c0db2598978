package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Stage-level profiler for the dedup pipelines (dev tool).
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

    time("tokens only") {
      docs.select(graft.text.TextAnalysis.tokens(col("text")).as("t"))
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
    time("full minhashPairs") {
      Dedup.minhashPairs(docs, "doc_id", "text", 2, 16, 8, 0.1).count()
    }
    time("full minhashPairs again") {
      Dedup.minhashPairs(docs, "doc_id", "text", 2, 16, 8, 0.1).count()
    }
    spark.stop()
  }
}
