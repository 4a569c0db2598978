package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training batches: assign documents to
  * fixed-capacity bins by cumulative token count — the standard
  * "pack short documents into one context window" preprocessing step.
  *
  * The assignment is a running sum over a window partitioned by the
  * grouping columns in a deterministic order: bin k holds the rows
  * whose preceding cumulative weight lands in [k*capacity,
  * (k+1)*capacity). One shuffle (the window partitioning), codegen'd
  * arithmetic, deterministic output. Oversized single documents get
  * their own bin (they exceed capacity alone — truncation is the
  * tokenizer's job, not the packer's).
  */
object Packing {

  def packBins(df: DataFrame, groupCols: Seq[String], orderCol: String,
      weightCol: String, capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive (got $capacity)")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(weightCol)).over(w))
      .withColumn("bin",
        floor((col("__cum") - col(weightCol)) / capacity).cast("int"))
      .drop("__cum")
  }
}
