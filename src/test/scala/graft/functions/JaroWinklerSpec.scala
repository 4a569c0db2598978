package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class JaroWinklerSpec extends SparkTestBase {
  import spark.implicits._

  // expected values cross-checked against DuckDB jaro_winkler_similarity
  // (same strcmp95 definition as the reference's polars_distance dep)
  val known: Seq[(String, String, Double)] = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("CRATE", "TRACE", 0.7333333333333334),
    ("Customer#000000106", "Supplier#000000061", 0.7891737891737892),
    ("abc", "abc", 1.0),
    ("", "abc", 0.0),
    ("", "", 1.0),
    ("a", "b", 0.0))

  test("scalar similarity matches strcmp95 reference values") {
    known.foreach { case (a, b, want) =>
      assert(JaroWinkler.similarity(a, b) === want, s"($a, $b)")
    }
  }

  test("symmetry") {
    known.foreach { case (a, b, _) =>
      assert(JaroWinkler.similarity(a, b) === JaroWinkler.similarity(b, a))
    }
  }

  test("expression evaluates through codegen on a DataFrame") {
    val df = known.toDF("a", "b", "want")
      .withColumn("got", JaroWinkler(col("a"), col("b")))
    assert(df.filter(col("got") =!= col("want")).count() === 0)
  }

  test("null-safe: null input yields null") {
    val df = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .withColumn("got", JaroWinkler(col("a"), col("b")))
    assert(df.filter(col("got").isNull).count() === 1)
  }
}
