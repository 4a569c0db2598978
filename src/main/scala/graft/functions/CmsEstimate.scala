package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Frequency estimate of a string key against a pre-built
  * [[org.apache.spark.util.sketch.CountMinSketch]], inlined into the
  * plan as serialized bytes (same pattern as [[BloomMightContain]]:
  * sketch = model parameter, transient lazy deserialize per executor,
  * per-row probe inside whole-stage codegen).
  *
  * CMS guarantees estimate >= true count always, and estimate <=
  * true count + eps*N with probability 1-delta — the right sketch for
  * "how hot is this key" probes (join-skew salting decisions,
  * stop-token thresholds) where a full groupBy per probe would be
  * absurd at 100 TB.
  */
case class CmsEstimate(child: Expression, bytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a StringType key, got ${child.dataType}")

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(bytes)

  /** Called from both interpreted eval and generated code. String keys
    * hash identically whether added as java.lang.String (the
    * DataFrameStatFunctions build path) or probed here.
    */
  def estimate(v: UTF8String): Long = sketch.estimateCount(v.toString)

  override protected def nullSafeEval(v: Any): Any =
    estimate(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", this, classOf[CmsEstimate].getName)
    defineCodeGen(ctx, ev, v => s"$ref.estimate($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
