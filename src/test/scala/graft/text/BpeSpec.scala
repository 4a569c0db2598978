package graft.text

import graft.SparkTestBase

/** BPE merge step: pair counting, deterministic winner, and the greedy
  * overlap semantics for doubled symbols (floor(run/2) merges).
  */
class BpeSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  test("doubled-symbol winner merges floor(run/2) times per run") {
    import spark.implicits._
    // "aaaa" twice + "aaa" once -> pair (a,a) count = 2*3 + 2 = 8 wins;
    // greedy merges: floor(4/2)*2 + floor(3/2) = 5 -> after = 11 - 5
    val docs = Seq("aaaa aaaa aaa", "xy").toDF("text")
    val r = Bpe.mergeStepReport(docs, "text", 3).collect()
    val top = r.find(_.getInt(0) == 1).get
    assert((top.getString(1), top.getString(2), top.getLong(3)) ===
      (("a", "a", 8L)))
    // total symbols: aaaa(4)+aaaa(4)+aaa(3)+xy(2) = 13; distinct-word
    // weighting: aaaa freq 2 -> streams 4*2 + 3 + 2 = 13
    assert(top.getLong(4) === 13L)
    assert(top.getLong(5) === 13L - 5L)
  }

  test("distinct-pair winner merges at every site independently") {
    import spark.implicits._
    // "abab ab" -> (a,b) = 2 + 1 * freqs; sites merge independently
    val docs = Seq("abab abab ab").toDF("text")
    val r = Bpe.mergeStepReport(docs, "text", 1).collect().head
    assert((r.getString(1), r.getString(2)) === (("a", "b")))
    // abab freq 2: pairs (a,b)x2,(b,a)x1 each -> (a,b) cnt = 2*2+1 = 5
    assert(r.getLong(3) === 5L)
    // merges: abab -> 2 sites x freq 2 = 4, ab -> 1; after = 10 - 5
    assert(r.getLong(4) === 10L)
    assert(r.getLong(5) === 5L)
  }

  test("non-BMP characters are one symbol, not two surrogate halves") {
    import spark.implicits._
    // U+1F600 is a surrogate PAIR in UTF-16: a unit-boundary split
    // would tear it into two invalid half-characters and count 4
    // symbols for "ok😀" (total 8 at freq 2); the code-point split
    // counts 3 (total 6) and no pair side is a surrogate fragment
    val docs = Seq("ok😀 ok😀").toDF("text")
    val r = Bpe.mergeStepReport(docs, "text", 2).collect()
    assert(r.head.getLong(4) === 6L,
      "total_syms_before must be 3 symbols x freq 2")
    r.foreach { row =>
      assert(!row.getString(1).exists(Character.isSurrogate) ||
        row.getString(1).codePointCount(0, row.getString(1).length) == 1,
        s"pair side '${row.getString(1)}' is a torn surrogate half")
    }
  }

  test("empty pair table (single-symbol words) reports zero rows, not a crash") {
    import spark.implicits._
    val docs = Seq("a b c", "a b").toDF("text")
    assert(Bpe.mergeStepReport(docs, "text", 3).count() === 0L)
  }
}
