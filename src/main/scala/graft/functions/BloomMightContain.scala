package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Probabilistic membership test against a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]], inlined into the plan
  * as its serialized bytes (the same "model parameters collected once,
  * shipped as literals" pattern as the ANN pivots): the filter rides
  * the serialized expression to every executor, deserializes once per
  * task thread via the transient lazy, and the per-row test stays
  * inside whole-stage codegen (Spark's own runtime row-filter
  * expression is `private[sql]`; this is the public-API equivalent).
  *
  * May return true for absent keys (rate = the fpp the filter was
  * built with), never false for present ones — callers follow with an
  * exact join; see `Relational.bloomSemiJoin`.
  */
case class BloomMightContain(child: Expression, bytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a LongType key, got ${child.dataType}")

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  /** Called from both interpreted eval and generated code. */
  def test(v: Long): Boolean = filter.mightContainLong(v)

  override protected def nullSafeEval(v: Any): Any =
    test(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", this,
      classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, v => s"$ref.test($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
