package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass character-class census of a string:
  * `[n_chars, lower, upper, digit, whitespace]` (ASCII classes, SP/TAB/
  * LF/CR whitespace; "other" is `n - the rest`). Replaces the
  * count-by-regex-strip idiom — `length(s) - length(regexp_replace(s,
  * cls, ''))` — which rewrites the full string once PER CLASS; this
  * walks the UTF-8 bytes once with no allocation (codepoints counted
  * as non-continuation bytes, so `n` matches `length()` exactly) and
  * stays inside whole-stage codegen.
  */
case class CharClassCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_class_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a StringType input, got ${child.dataType}")

  /** Called from both interpreted eval and generated code. */
  def compute(s: UTF8String): ArrayData = {
    val nb = s.numBytes()
    var n = 0L; var lo = 0L; var up = 0L; var di = 0L; var ws = 0L
    var i = 0
    while (i < nb) {
      val b = s.getByte(i)
      // UTF-8 continuation bytes are 10xxxxxx; everything else starts
      // a codepoint (multi-byte lead bytes are negative as signed,
      // so they fall through every ASCII class test into "other")
      if ((b & 0xC0) != 0x80) {
        n += 1
        if (b >= 'a' && b <= 'z') lo += 1
        else if (b >= 'A' && b <= 'Z') up += 1
        else if (b >= '0' && b <= '9') di += 1
        else if (b == ' ' || b == '\t' || b == '\n' || b == '\r') ws += 1
      }
      i += 1
    }
    new GenericArrayData(Array(n, lo, up, di, ws))
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ccc", this, classOf[CharClassCounts].getName)
    defineCodeGen(ctx, ev, v => s"$ref.compute($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
