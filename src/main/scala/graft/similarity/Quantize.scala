package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization: per-vector min/max affine int8 — the
  * standard 4× storage/bandwidth reduction before a 100 TB ANN index
  * build. Pure map-side projection (per-row array HOFs, zero
  * shuffles); dequantization error is bounded by (mx-mn)/254 per
  * component.
  *
  * All arithmetic runs in double with a fixed operation order —
  * `floor((x - mn) * scale + 0.5) - 127` — so quantized codes are
  * engine-reproducible (floor-of-half-up, not platform `round`).
  */
object Quantize {

  /** scale = 254/(mx-mn), or 0 for a constant vector (all components
    * then quantize to -127).
    */
  private def scale(mn: Column, mx: Column): Column =
    when(mx > mn, lit(254.0) / (mx - mn)).otherwise(0.0)

  /** Quantize `embCol` (array<float>) to array<long> codes in
    * [-127, 127] with per-vector range columns: appends mn, mx
    * (double) and `q` (the codes).
    */
  def int8(df: DataFrame, embCol: String): DataFrame = {
    val withRange = df
      .withColumn("mn", array_min(col(embCol)).cast("double"))
      .withColumn("mx", array_max(col(embCol)).cast("double"))
    // NaN guard: one NaN component makes array_max NaN (Spark orders
    // NaN greatest), scale NaN, and every code floor(NaN) — the whole
    // vector would silently corrupt (ANSI: the cast errors; non-ANSI:
    // all codes collapse to -127). A non-finite vector quantizes to
    // NULL instead: visible downstream, never wrong-but-plausible.
    withRange.withColumn("q",
      when(!isnan(col("mn")) && !isnan(col("mx")),
        transform(col(embCol), x =>
          floor((x.cast("double") - col("mn")) * scale(col("mn"), col("mx")) + 0.5)
            .cast("long") - 127)))
  }

  /** Reconstruct approximate doubles from int8 codes + range (a
    * constant vector dequantizes back to mn).
    */
  def dequantize(q: Column, mn: Column, mx: Column): Column =
    transform(q, c =>
      when(mx > mn, (c.cast("double") + 127.0) * ((mx - mn) / 254.0) + mn)
        .otherwise(mn))
}
