package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two float/double arrays, accumulated LEFT-TO-RIGHT in
  * double precision — bit-identical to the composable
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0.0, +)`
  * fold (which the DuckDB oracle evaluates) but a native codegen'd
  * loop instead of interpreted per-element lambdas.
  *
  * Element access dispatches on the DECLARED element type: ArrayData
  * `getFloat` over an array<double> reads half of each 8-byte slot and
  * returns garbage bits (it does not widen), so reading must match the
  * schema — the round-6 q_quantized_topk oracle caught exactly that on
  * the dequantized (double) vectors.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elem(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t, _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e =>
        elem(e).exists(t => t == FloatType || t == DoubleType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float>/array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  private lazy val leftIsDouble = elem(left).contains(DoubleType)
  private lazy val rightIsDouble = elem(right).contains(DoubleType)

  // a null ELEMENT nulls the whole fold in the zip_with reference
  // (null product -> null sum); dataType must reflect that the result
  // can be null even for non-null array inputs
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VecDot.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      leftIsDouble, rightIsDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}Box =
         |  graft.functions.VecDot.dot($a, $b, $leftIsDouble, $rightIsDouble);
         |if (${ev.value}Box == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}Box.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Sequential double fold; length = min(|a|,|b|) matching zip_with
    * over equal-length fixtures (zip_with pads with null and the HOF
    * fold would null out on ragged inputs — keep vectors equal-length).
    * A null ELEMENT returns null (boxed), matching the reference fold:
    * `double(null) * y` is null and the `+` fold swallows the whole
    * sum — silently reading the slot as 0/garbage bits would rank a
    * corrupt embedding instead of flagging it.
    */
  def dot(a: ArrayData, b: ArrayData, aDouble: Boolean,
      bDouble: Boolean): java.lang.Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
      acc += x * y
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    GraftShim.column(VecDot(GraftShim.expression(a), GraftShim.expression(b)))
}
