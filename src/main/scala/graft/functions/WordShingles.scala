package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct, sorted word n-shingles of a text column in ONE native
  * pass. Exactly the semantics of the composable chain
  * `sort_array(array_distinct(transform(sequence(...), concat_ws(" ",
  * slice(split(trim(text), "\s+"), ...)))))` that the DuckDB oracle
  * evaluates — including the quirk that an empty/whitespace-only text
  * tokenizes to a single empty token (regex-split behavior), which
  * yields no shingles for n >= 2. Sorting is unsigned-byte order
  * (UTF8String), matching sort_array.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a StringType input, got ${child.dataType.simpleString}")
  override protected def nullSafeEval(v: Any): Any =
    WordShingles.shingle(v.asInstanceOf[UTF8String].toString, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShingles.shingle($c.toString(), $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {

  def shingle(text: String, n: Int): GenericArrayData = {
    val trimmed = text.trim
    // regex-split semantics: splitting "" by \s+ yields [""]
    val tokens: Array[String] =
      if (trimmed.isEmpty) Array("") else trimmed.split("\\s+")
    if (tokens.length < n) return new GenericArrayData(Array.empty[Any])
    val set = new java.util.TreeSet[UTF8String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= tokens.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      set.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    val out = new Array[Any](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  def apply(text: Column, n: Int): Column =
    GraftShim.column(WordShingles(GraftShim.expression(text), n))
}
