package graft.functions

import org.apache.spark.sql.{GraftShim, SparkSession}

/** Registers the custom Catalyst expressions as SQL functions so
  * `spark.sql("SELECT jaro_winkler(a, b) ...")` works — the reference's
  * users drive everything through a query surface, so the extensions
  * must be reachable from SQL, not only from the Scala DSL.
  */
object Registry {
  def registerAll(spark: SparkSession): Unit = {
    GraftShim.registerFunction(spark, "jaro_winkler",
      exprs => JaroWinkler(exprs(0), exprs(1)))
    GraftShim.registerFunction(spark, "poly_hash",
      exprs => PolyHash(exprs.head))
    GraftShim.registerFunction(spark, "vec_dot",
      exprs => VecDot(exprs(0), exprs(1)))
    GraftShim.registerFunction(spark, "simhash_bits",
      exprs => SimHashBits(exprs.head))
    GraftShim.registerFunction(spark, "sorted_intersect_size",
      exprs => SortedIntersectSize(exprs(0), exprs(1)))
  }
}
