package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit average-hash (aHash) of a string payload, returned as 4
  * sixteen-bit band values for LSH bucketing: the first `capChars`
  * codepoints are downsampled into 64 segments, each bit = segment
  * mean intensity > global mean (integer cross-multiplication), bits
  * pack little-endian into 4 bands. "Intensity" is the Unicode
  * codepoint — the stand-in for a grayscale pixel at the stubbed
  * media-decode boundary, and the same value DuckDB's `ascii` returns,
  * so the oracle replays the hash exactly even on non-ASCII text.
  *
  * One pass over the UTF-8 bytes (plus a byte-count prescan for the
  * segment map), no allocation beyond the two 64-slot accumulators:
  * the codegen replacement for the staged higher-order-function
  * formulation, which evaluated interpreted and ~15x slower.
  */
case class AHashBands(child: Expression, capChars: Int)
    extends UnaryExpression {

  require(capChars >= 64, s"capChars=$capChars must be >= 64")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ahash_bands"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a StringType input, got ${child.dataType}")

  /** Called from both interpreted eval and generated code. */
  def compute(s: UTF8String): ArrayData = {
    val nb = s.numBytes()
    // prescan: chars (codepoint starts) in the first capChars chars
    var n = 0
    var i = 0
    while (i < nb && n < capChars) {
      if ((s.getByte(i) & 0xC0) != 0x80) n += 1
      i += 1
    }
    val out = new Array[Long](4)
    if (n == 0) return new GenericArrayData(out)
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var total = 0L
    i = 0
    var c = 0
    while (c < n) {
      val b0 = s.getByte(i) & 0xFF
      var cp = 0
      var len = 1
      if (b0 < 0x80) { cp = b0 }
      else if ((b0 & 0xE0) == 0xC0) {
        cp = ((b0 & 0x1F) << 6) | (s.getByte(i + 1) & 0x3F); len = 2
      } else if ((b0 & 0xF0) == 0xE0) {
        cp = ((b0 & 0x0F) << 12) | ((s.getByte(i + 1) & 0x3F) << 6) |
          (s.getByte(i + 2) & 0x3F); len = 3
      } else {
        cp = ((b0 & 0x07) << 18) | ((s.getByte(i + 1) & 0x3F) << 12) |
          ((s.getByte(i + 2) & 0x3F) << 6) | (s.getByte(i + 3) & 0x3F)
        len = 4
      }
      val seg = c * 64 / n // exact integer floor, same as the oracle's //
      sums(seg) += cp
      cnts(seg) += 1
      total += cp
      c += 1
      i += len
    }
    var b = 0
    while (b < 4) {
      var v = 0L
      var j = 0
      while (j < 16) {
        val seg = b * 16 + j
        if (sums(seg) * n > total * cnts(seg)) v |= (1L << j)
        j += 1
      }
      out(b) = v
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ahash", this, classOf[AHashBands].getName)
    defineCodeGen(ctx, ev, v => s"$ref.compute($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
