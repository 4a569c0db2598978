package graft.similarity

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkTestBase {
  import spark.implicits._

  test("int8: codes span [-127, 127], endpoints map to the extremes") {
    val df = Seq((1L, Seq(-1.0f, 0.0f, 1.0f))).toDF("id", "emb")
    val out = Quantize.int8(df, "emb")
      .select("q").as[Seq[Long]].collect().head
    assert(out === Seq(-127L, 0L, 127L))
  }

  test("int8: constant vector quantizes to -127 without dividing by zero") {
    val df = Seq((1L, Seq(0.5f, 0.5f, 0.5f))).toDF("id", "emb")
    val out = Quantize.int8(df, "emb")
      .select("q").as[Seq[Long]].collect().head
    assert(out === Seq(-127L, -127L, -127L))
  }

  test("dequantize: roundtrip error bounded by half a step") {
    val vecs = Seq(
      (1L, Seq(-0.83f, 0.12f, 0.47f, -0.20f, 0.9f)),
      (2L, Seq(10.0f, 10.5f, 11.0f, 12.75f, 10.1f)))
      .toDF("id", "emb")
    val back = Quantize.int8(vecs, "emb")
      .select(col("emb"),
        Quantize.dequantize(col("q"), col("mn"), col("mx")).as("deq"),
        ((col("mx") - col("mn")) / 254.0).as("step"))
      .select(col("emb"), col("deq"), col("step"))
      .as[(Seq[Float], Seq[Double], Double)].collect()
    back.foreach { case (emb, deq, step) =>
      emb.zip(deq).foreach { case (x, xd) =>
        assert(math.abs(x.toDouble - xd) <= step * 0.5 + 1e-12,
          s"err ${math.abs(x.toDouble - xd)} vs half-step ${step * 0.5}")
      }
    }
  }

  test("dequantize: constant vector reconstructs mn exactly") {
    val df = Seq((1L, Seq(2.5f, 2.5f))).toDF("id", "emb")
    val out = Quantize.int8(df, "emb")
      .select(Quantize.dequantize(col("q"), col("mn"), col("mx")).as("deq"))
      .as[Seq[Double]].collect().head
    assert(out === Seq(2.5, 2.5))
  }
}
