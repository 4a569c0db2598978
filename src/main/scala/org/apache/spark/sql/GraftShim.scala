package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column <-> Expression conversion (Spark 4
  * split the public Column API from Catalyst; `classic.ExpressionUtils`
  * is the supported internal path). Lives in the org.apache.spark.sql
  * package purely for access; our code is all under `graft.*`.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a temp SQL function backed by a Catalyst expression
    * builder (functionRegistry is private[sql]).
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Wrap an already-resolved logical plan as a DataFrame
    * (`Dataset.ofRows` is private[sql]) — the entry point for custom
    * logical operators like [[graft.plans.AsOfJoinPlan]].
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
