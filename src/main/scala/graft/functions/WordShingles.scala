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
  * slice(split(trim(text), ..), ...)))))` that the DuckDB oracle
  * evaluates — including the quirk that an empty/space-only text
  * tokenizes to a single empty token (regex-split behavior), which
  * yields no shingles for n >= 2. Sorting is unsigned-byte order
  * (UTF8String), matching sort_array.
  *
  * Tokenization is pinned to the SQL sides exactly: trim strips
  * SPACES only (JVM `String.trim` strips every char <= U+0020 —
  * leading tabs would silently vanish here but not in the oracle),
  * the separator class is `[ \t\n\r\f]` (RE2's `\s`; Java's `\s`
  * additionally eats U+000B), and the split keeps leading AND
  * trailing empty tokens (limit −1) as Spark `split` and DuckDB
  * `string_split_regex` both do.
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

  /** SQL-trim (spaces only), not JVM trim (all controls <= U+0020). */
  private def trimSpaces(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  def shingle(text: String, n: Int): GenericArrayData = {
    val trimmed = trimSpaces(text)
    // regex-split semantics: splitting "" yields [""]; limit -1 keeps
    // trailing empties like Spark split / DuckDB string_split_regex
    val tokens: Array[String] =
      if (trimmed.isEmpty) Array("") else trimmed.split("[ \t\n\r\f]+", -1)
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
