package graft.functions

import org.apache.spark.sql.{GraftShim, SparkSession}

/** Registers the custom Catalyst expressions as SQL functions so
  * `spark.sql("SELECT jaro_winkler(a, b) ...")` works — the reference's
  * users drive everything through a query surface, so the extensions
  * must be reachable from SQL, not only from the Scala DSL.
  */
object Registry {
  def registerAll(spark: SparkSession): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      GraftShim.registerFunction(spark, name, builder)
    }
}
