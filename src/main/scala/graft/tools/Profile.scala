package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.dedup.Dedup

/** Ad-hoc stage profiler for the dedup hot path (not part of the
  * driver contract; local iteration only).
  */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val shDf = time("shingles+persist") {
        val d = docs.select(col("doc_id").as("id"),
          Dedup.shingles(col("text"), 2).as("sh"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        d.write.format("noop").mode("overwrite").save(); d
      }
      val buckets = time("sig+bands+persist") {
        val b = shDf
          .withColumn("sig", Dedup.minhashSignature(col("sh"), 16))
          .select(col("id"), posexplode(Dedup.lshBands(col("sig"), 16, 8))
            .as(Seq("band", "bucket")))
          .persist(StorageLevel.MEMORY_AND_DISK)
        b.write.format("noop").mode("overwrite").save(); b
      }
      val candidates = time("bucket self-join+distinct") {
        val c = buckets.select(col("band"), col("bucket"), col("id").as("id_a"))
          .join(buckets.select(col("band"), col("bucket"), col("id").as("id_b")),
            Seq("band", "bucket"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b").distinct()
          .persist(StorageLevel.MEMORY_AND_DISK)
        c.write.format("noop").mode("overwrite").save(); c
      }
      time("verify joins+jaccard") {
        candidates
          .join(shDf.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
          .join(shDf.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
          .select(col("id_a"), col("id_b"),
            (graft.functions.SketchExpressions
              .sortedIntersectSize(col("sh_a"), col("sh_b")).cast("double") /
              (size(col("sh_a")) + size(col("sh_b")) -
                graft.functions.SketchExpressions
                  .sortedIntersectSize(col("sh_a"), col("sh_b"))))
              .as("jaccard"))
          .filter(col("jaccard") >= 0.3)
          .write.format("noop").mode("overwrite").save()
      }
      time("full minhashPairs") {
        Dedup.minhashPairs(docs, "doc_id", "text")
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
