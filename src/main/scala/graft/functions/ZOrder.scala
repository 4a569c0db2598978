package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values for multi-dimensional data layout.
  *
  * Sorting (or range-partitioning) a table by the interleaved bits of
  * two columns clusters rows that are close in BOTH dimensions into the
  * same files, so parquet min/max zone maps prune scans filtered on
  * EITHER column — the layout trick behind "OPTIMIZE ZORDER BY" in
  * lakehouse engines, available here as plain column arithmetic:
  * `df.repartitionByRange(col("z")).sortWithinPartitions("z")` before a
  * write gives 2-D-pruned files with no engine support needed.
  *
  * Implementation is the classic bit-spreading magic-number chain — a
  * handful of shifts/masks, pure built-in expressions, fully inside
  * whole-stage codegen (no UDF, no custom Expression needed).
  */
object ZOrder {

  /** Spread the low 16 bits of `v` to even bit positions (0, 2, …, 30). */
  def spread16(v: Column): Column = {
    val v0 = v.bitwiseAND(lit(0xFFFFL))
    val v1 = (v0.bitwiseOR(shiftleft(v0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val v2 = (v1.bitwiseOR(shiftleft(v1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = (v2.bitwiseOR(shiftleft(v2, 2))).bitwiseAND(lit(0x33333333L))
    (v3.bitwiseOR(shiftleft(v3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit values: x in even bits, y in odd.
    * Monotone per 2×2 quadrant — close (x, y) pairs get close z values.
    */
  def zvalue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))
}
