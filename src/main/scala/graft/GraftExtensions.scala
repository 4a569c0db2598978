package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Declarative session extension: start any Spark application with
  * `--conf spark.sql.extensions=graft.GraftExtensions` and every graft
  * expression is available from SQL on every session of the cluster —
  * no imperative registration call needed. This is the deployment path
  * for a shared cluster (Thrift server / Connect / notebook fleets)
  * where user code never touches the Scala API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}
