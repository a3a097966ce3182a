package graft

import graft.llm.{TextOps, UrlOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case goldens for URL canonicalization and the hashed-feature
  * scorer — the cases the oracle query's synthetic URLs don't reach:
  * non-URL passthrough, non-default ports, scheme-mismatched default
  * ports, hostless values, tracking-only queries, and empty documents.
  */
class UrlOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.normalizeUrl($"u")).as[String].collect().toSeq

  private def domain(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.urlDomain($"u")).as[String].collect().toSeq

  test("normalizeUrl: scheme/host lowercase, path case preserved") {
    assert(norm("HTTP://ExAmPle.COM/CaseSensitive/Path") ==
      Seq("http://example.com/CaseSensitive/Path"))
  }

  test("normalizeUrl: default port stripped only for its own scheme") {
    assert(norm(
      "https://example.com:443/a",
      "http://example.com:80/a",
      "https://example.com:80/a",   // 80 is NOT https's default -> kept
      "http://example.com:8080/a") ==
      Seq("https://example.com/a", "http://example.com/a",
        "https://example.com:80/a", "http://example.com:8080/a"))
  }

  test("normalizeUrl: fragment dropped, tracking params removed, others ordered") {
    assert(norm(
      "https://example.com/p?utm_source=x&q=1&fbclid=z&b=2#sec",
      "https://example.com/p?utm_campaign=only",  // tracking-only -> no query
      "https://example.com#top") ==               // no path -> '/'
      Seq("https://example.com/p?q=1&b=2",
        "https://example.com/p",
        "https://example.com/"))
  }

  test("normalizeUrl: www stripped, non-URL values pass through unchanged") {
    assert(norm("https://WWW.Example.com/x", "not a url", "") ==
      Seq("https://example.com/x", "not a url", ""))
  }

  test("urlDomain: two-label, public-suffix three-label, deep subdomains, bare host") {
    assert(domain(
      "https://a.b.news.example.com/x",
      "https://shop.example.co.uk/x",
      "https://example.ac.jp/x",
      "https://localhost/x") ==
      Seq("example.com", "example.co.uk", "example.ac.jp", "localhost"))
  }

  test("withHashedLinearScore: empty and token-less docs score 0.0, label false") {
    val out = Seq((1L, "some regular words here"), (2L, ""), (3L, "!!! ???"))
      .toDF("doc_id", "text")
    val scored = TextOps.withHashedLinearScore(out, "text")
      .select($"doc_id", $"score", $"label").as[(Long, Double, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(scored(2L) == ((0.0, false)))
    assert(scored(3L) == ((0.0, false))) // punctuation-only normalizes away
    // score is a mean of dyadic weights in [-0.5, 0.5)
    assert(scored(1L)._1 >= -0.5 && scored(1L)._1 < 0.5)
    assert(scored(1L)._2 == scored(1L)._1 > 0)
  }

  test("withHashedLinearScore is deterministic across evaluations") {
    val df = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val a = TextOps.withHashedLinearScore(df, "text").select($"score").as[Double].head()
    val b = TextOps.withHashedLinearScore(df, "text").select($"score").as[Double].head()
    assert(a == b)
  }
}
