package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
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
  * Accepts a LONG key (probed via the filter's long hash path — the
  * path `put` uses for every integral type) or a STRING key (probed as
  * UTF-8 bytes, matching `putString`'s binary hashing). The two hash
  * families are incompatible: the key column's type must match what
  * the filter was BUILT from, which `Relational.bloomSemiJoin`
  * validates eagerly.
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
    if (child.dataType == LongType || child.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a LongType or StringType key, got ${child.dataType}")

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  /** Called from both interpreted eval and generated code. */
  def test(v: Long): Boolean = filter.mightContainLong(v)

  /** String path: UTF-8 bytes, identical to putString's binary hash. */
  def testString(v: UTF8String): Boolean =
    filter.mightContainBinary(v.getBytes)

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType => test(v.asInstanceOf[Long])
    case _        => testString(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", this,
      classOf[BloomMightContain].getName)
    val call = if (child.dataType == LongType) "test" else "testString"
    defineCodeGen(ctx, ev, v => s"$ref.$call($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
