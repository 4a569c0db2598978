package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity in [0, 1].
  *
  * The reference's only nonstandard relational operator: a fuzzy join that
  * equi-joins on DOB and then keeps pairs with Jaro-Winkler similarity >=
  * 0.8 (reference `od.py:83,125`, via the `polars_distance` Rust plugin,
  * which computes the textbook Jaro-Winkler with prefix scaling 0.1, prefix
  * length <= 4, boost threshold 0.7 — the same definition DuckDB's
  * `jaro_winkler_similarity` uses, so the oracle can check us exactly).
  *
  * Implemented as a native Catalyst [[BinaryExpression]] with codegen (a
  * static-call `defineCodeGen`, which keeps it inside whole-stage codegen
  * rather than falling back to interpreted eval like a Scala UDF would).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs StringType inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.similarity(
      l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.similarity($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  private final val WinklerScaling = 0.1
  private final val BoostThreshold = 0.7
  private final val MaxPrefix = 4

  /** Textbook Jaro similarity: match window = max(|a|,|b|)/2 - 1. */
  def jaro(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatched = new Array[Boolean](la)
    val bMatched = new Array[Boolean](lb)
    var matches = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatched(j) && a.charAt(i) == b.charAt(j)) {
          aMatched(i) = true
          bMatched(j) = true
          matches += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: mismatched aligned pairs, halved with INTEGER
    // division (Winkler's original strcmp95 `T /= 2` — what RapidFuzz,
    // DuckDB's jaro_winkler_similarity, and polars_distance all do;
    // exact-/2.0 halving differs on odd counts)
    var transpositions = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatched(i)) {
        while (!bMatched(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / la + m / lb + (m - (transpositions / 2)) / m) / 3.0
  }

  /** Jaro-Winkler: boost by shared prefix when jaro > 0.7. */
  def similarity(a: String, b: String): Double = {
    val j = jaro(a, b)
    if (j <= BoostThreshold) return j
    var prefix = 0
    val n = math.min(MaxPrefix, math.min(a.length, b.length))
    while (prefix < n && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    j + prefix * WinklerScaling * (1.0 - j)
  }

  /** Column-level entry point: `jaro_winkler($"a", $"b")`. */
  def apply(a: Column, b: Column): Column =
    GraftShim.column(JaroWinkler(GraftShim.expression(a), GraftShim.expression(b)))
}
