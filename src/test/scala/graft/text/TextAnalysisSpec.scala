package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("tokenCount / subwordCount") {
    val df = Seq("one two three", "  padded   tokens  ", "extraordinarily long")
      .toDF("t")
      .select(TextAnalysis.tokenCount(col("t")).as("n"),
        TextAnalysis.subwordCount(col("t")).as("sw"))
    val rows = df.as[(Int, Int)].collect().toSeq
    assert(rows.map(_._1) === Seq(3, 2, 2))
    // "extraordinarily"(15) -> ceil(15/4)=4, "long"(4) -> 1
    assert(rows(2)._2 === 5)
  }

  test("langId picks the language with most stopword hits") {
    val df = Seq(
      "the cat and the dog is in it",
      "der hund und die katze ist ein tier",
      "el perro y la casa es un lugar",
      "xyzzy plugh qwerty").toDF("t")
      .select(TextAnalysis.langId(col("t")).as("lang"))
    assert(df.as[String].collect().toSeq === Seq("en", "de", "es", "und"))
  }

  test("fingerprint: stable, sensitive, whitespace-normalized") {
    val df = Seq("hello world", "hello  world ", "hello worlds")
      .toDF("t").select(TextAnalysis.fingerprint(col("t")).as("fp"))
    val fps = df.as[Long].collect().toSeq
    assert(fps(0) === fps(1), "collapsed whitespace must not change fp")
    assert(fps(0) !== fps(2))
    assert(fps.forall(f => f >= 0 && f < 1000000007L))
  }

  test("bigramsT: ordered with repeats; short arrays yield empty") {
    val df = Seq("a b a b", "solo", "").toDF("t")
      .select(TextAnalysis.bigramsT(TextAnalysis.tokens(col("t"))).as("bg"))
    val got = df.as[Seq[String]].collect().toSeq
    assert(got(0) === Seq("a b", "b a", "a b")) // multiset, not a shingle set
    assert(got(1) === Seq.empty && got(2) === Seq.empty)
  }

  test("dupFraction: repeats over total, empty array is 0") {
    val df = Seq(
      Seq("a", "b", "a", "a"),  // 2 repeats of 4 -> 0.5
      Seq("x", "y"),            // none -> 0.0
      Seq.empty[String])        // empty -> 0.0
      .toDF("arr").select(TextAnalysis.dupFraction(col("arr")).as("f"))
    assert(df.as[Double].collect().toSeq === Seq(0.5, 0.0, 0.0))
  }

  test("qualityScore ranks clean prose above junk") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and it is a fine day in the sun",
      "@@@@ #### 1234 !!!! %%%% ^^^^ &&&& **** (((( ))))")
      .toDF("t").select(TextAnalysis.qualityScore(col("t")).as("q"))
    val Seq(good, junk) = df.as[Double].collect().toSeq
    assert(good > junk)
    assert(good >= 0.0 && good <= 1.0 && junk >= 0.0 && junk <= 1.0)
  }

  test("maskTokens: deterministic, rate-gated, 0/256 extremes exact") {
    val df = Seq((7L, "one two three four five six seven eight nine ten"))
      .toDF("id", "txt")
      .select(col("id"), TextAnalysis.tokens(col("txt")).as("toks"))
    def run(rate: Int) = df
      .select(TextAnalysis.maskTokens(col("id"), col("toks"), rate).as("m"))
      .select(col("m.masked"), col("m.n_masked"))
      .as[(String, Long)].collect().head
    assert(run(0) === (("one two three four five six seven eight nine ten", 0L)))
    val (allMasked, n) = run(256)
    assert(n === 10L && allMasked === Seq.fill(10)("<mask>").mkString(" "))
    // deterministic: two evaluations agree; gate is per (id, pos)
    assert(run(38) === run(38))
    val (_, n38) = run(38)
    assert(n38 >= 0L && n38 < 10L)
  }

  test("maskTokens: empty token array yields no phantom masks") {
    // sequence(1, 0) counts DOWN and zip_with null-pads: unguarded,
    // an empty array could emit up to 2 spurious '<mask>' tokens
    val df = Seq((1L, Seq.empty[String])).toDF("id", "toks")
    val (masked, n) = df
      .select(TextAnalysis.maskTokens(col("id"), col("toks"), 256).as("m"))
      .select(col("m.masked"), col("m.n_masked"))
      .as[(String, Long)].collect().head
    assert(n === 0L)
    assert(masked === "")
  }

  test("chunks: overlap, trailing short chunk, and the 1-chunk edges") {
    def chunk(s: String, size: Int, overlap: Int): Seq[String] =
      Seq(s).toDF("t")
        .select(TextAnalysis.chunks(col("t"), size, overlap).as("c"))
        .as[Seq[String]].collect().head
    val ten = "0123456789"
    // size 4, overlap 1 -> stride 3: starts 1,4,7 cover to the end
    assert(chunk(ten, 4, 1) === Seq("0123", "3456", "6789"))
    // size 4, overlap 2 -> stride 2: last chunk short but reaches end
    assert(chunk(ten, 4, 2) === Seq("0123", "2345", "4567", "6789"))
    // text shorter than size -> exactly one chunk
    assert(chunk("abc", 4, 1) === Seq("abc"))
    // exact fit -> one chunk, no phantom trailing chunk
    assert(chunk("abcd", 4, 1) === Seq("abcd"))
    // empty text -> one empty chunk (documented)
    assert(chunk("", 4, 1) === Seq(""))
  }
}
