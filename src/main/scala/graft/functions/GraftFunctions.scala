package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.IntegerType

/** The single table of graft's custom Catalyst expressions as SQL
  * function builders. Consumed by both registration paths:
  * [[Registry.registerAll]] (imperative, on an existing session) and
  * [[graft.GraftExtensions]] (declarative,
  * `spark.sql.extensions=graft.GraftExtensions`).
  */
object GraftFunctions {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "jaro_winkler" -> (exprs => JaroWinkler(exprs(0), exprs(1))),
    "poly_hash" -> (exprs => PolyHash(exprs.head)),
    "vec_dot" -> (exprs => VecDot(exprs(0), exprs(1))),
    "simhash_bits" -> (exprs => SimHashBits(exprs.head)),
    "sorted_intersect_size" ->
      (exprs => SortedIntersectSize(exprs(0), exprs(1))),
    "abs_diff_sum" -> (exprs => AbsDiffSum(exprs(0), exprs(1))),
    "word_shingles" -> (exprs =>
      WordShingles(exprs(0), intLit(exprs(1), "word_shingles", "n"))),
    "minhash_sig" -> (exprs =>
      MinHashSig(exprs(0), intLit(exprs(1), "minhash_sig", "k"))),
    "char_class_counts" -> (exprs => CharClassCounts(exprs.head)),
    "ahash_bands" -> (exprs =>
      AHashBands(exprs(0), intLit(exprs(1), "ahash_bands", "capChars"))),
    "pgm_ahash_bands" -> (exprs => PgmAHashBands(exprs.head))
  )
}
