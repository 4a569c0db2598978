package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkTestBase {
  import spark.implicits._

  private def parse1(url: String): (String, String, String, String, String, String) =
    Seq(url).toDF("u")
      .select(Urls.parse(col("u")).as("p"))
      .select("p.scheme", "p.host", "p.domain", "p.path", "p.query_clean",
        "p.canonical")
      .as[(String, String, String, String, String, String)]
      .collect().head

  test("parse: all components of a full URL") {
    val (scheme, host, domain, path, qc, canon) =
      parse1("https://www.cdn.example.com/a/b/?utm_source=x&id=2&ref=tw#frag")
    assert(scheme === "https")
    assert(host === "www.cdn.example.com")
    assert(domain === "example.com")
    assert(path === "/a/b/")
    assert(qc === "id=2") // utm_source and ref stripped, order kept
    assert(canon === "cdn.example.com/a/b?id=2")
  }

  test("canonicalize folds scheme/www/slash/tracking variants") {
    val variants = Seq(
      "https://www.a.example.com/docs/5/?utm_source=feed&id=2&utm_campaign=x",
      "http://a.example.com/docs/5?id=2",
      "https://a.example.com/docs/5?id=2&fbclid=abc")
    val canons = variants.toDF("u")
      .select(Urls.canonicalize(col("u")).as("c")).as[String].collect().toSeq
    assert(canons.distinct === Seq("a.example.com/docs/5?id=2"))
    // a genuinely different page does NOT fold
    val other = Seq("https://a.example.com/docs/6?id=2").toDF("u")
      .select(Urls.canonicalize(col("u")).as("c")).as[String].collect().head
    assert(other !== canons.head)
  }

  test("canonicalize: tracking-only query drops the '?', no query stays bare") {
    val got = Seq(
      "https://a.example.com/p?utm_source=x&gclid=1",
      "https://a.example.com/p",
      "https://www.example.com/")
      .toDF("u").select(Urls.canonicalize(col("u")).as("c"))
      .as[String].collect().toSeq
    assert(got === Seq("a.example.com/p", "a.example.com/p", "example.com"))
  }

  test("query: a '?' inside the fragment is NOT a query") {
    val got = Seq(
      "https://a.example.com/b#frag?x=1", // ? belongs to the fragment
      "https://a.example.com/b?x=1#frag", // real query before fragment
      "https://a.example.com/b")
      .toDF("u").select(Urls.query(col("u")).as("q"))
      .as[String].collect().toSeq
    assert(got === Seq("", "x=1", ""))
    // canonical key consequence: the fragment-? page folds to the bare
    // path, not to a phantom "?x=1" variant
    val canon = Seq("https://a.example.com/b#frag?x=1").toDF("u")
      .select(Urls.canonicalize(col("u")).as("c")).as[String].collect().head
    assert(canon === "a.example.com/b")
  }

  test("registrableDomain: last two labels; bare two-label host unchanged") {
    val got = Seq(
      "https://deep.cdn.static.example.com/x",
      "https://example.org/y")
      .toDF("u").select(Urls.registrableDomain(col("u")).as("d"))
      .as[String].collect().toSeq
    assert(got === Seq("example.com", "example.org"))
  }

  test("charClassDiversity: extremes and the empty string") {
    val rows = Seq(
      "",            // empty: 0 diversity, 0 top share
      "aaaaaa",      // one class: simpson 0, top_share 1
      "aA1 .")       // five classes, one char each: uniform over 5
      .toDF("t")
      .select(TextAnalysis.charClassDiversity(col("t")).as("cd"))
      .select("cd.simpson", "cd.top_share")
      .as[(Double, Double)].collect().toSeq
    assert(rows(0) === ((0.0, 0.0)))
    assert(rows(1) === ((0.0, 1.0)))
    assert(math.abs(rows(2)._1 - 0.8) < 1e-12) // 1 - 5*(1/5)^2
    assert(math.abs(rows(2)._2 - 0.2) < 1e-12)
  }

  test("charClassDiversity flags a separator wall below clean prose") {
    val Seq(prose, wall) = Seq(
      "The quick brown fox jumps over 3 lazy dogs.",
      "==============================")
      .toDF("t")
      .select(TextAnalysis.charClassDiversity(col("t")).as("cd"))
      .select("cd.simpson").as[Double].collect().toSeq
    assert(prose > 0.3 && wall === 0.0)
  }
}
