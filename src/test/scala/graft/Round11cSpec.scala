package graft

import graft.ops.Urls
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 part 3: URL canonicalization edge cases. */
class Round11cSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[Option[String]] =
    urls.toDF("url").select(Urls.canonical(col("url")).as("c"))
      .collect().map(r => Option(r.getString(0))).toSeq

  test("case, www, default port, fragment, trailing slash all normalize") {
    assert(canon(
      "HTTPS://WWW.Example.COM:443/A/B/#frag",
      "https://example.com/A/B",
      "http://example.com:80/",
      "http://example.com") === Seq(
      Some("https://example.com/A/B"), // path case is SIGNIFICANT, host case is not
      Some("https://example.com/A/B"),
      Some("http://example.com"),
      Some("http://example.com")))
  }

  test("non-default ports and non-www subdomains survive") {
    assert(canon(
      "https://example.com:8443/x",
      "http://example.com:443/x", // 443 is NOT http's default
      "https://api.example.com/x") === Seq(
      Some("https://example.com:8443/x"),
      Some("http://example.com:443/x"),
      Some("https://api.example.com/x")))
  }

  test("tracking params drop, the rest sort; empty query collapses") {
    assert(canon(
      "https://e.com/p?utm_source=x&b=2&a=1",
      "https://e.com/p?a=1&b=2&gclid=abc",
      "https://e.com/p?utm_campaign=y&fbclid=z&ref=tw") === Seq(
      Some("https://e.com/p?a=1&b=2"),
      Some("https://e.com/p?a=1&b=2"),
      Some("https://e.com/p")))
  }

  test("userinfo stays in the (lowercased) authority — dedup keys, not fetchable URLs") {
    assert(canon("https://User:Pw@e.com/x", "https://user:pw@e.com/x") ===
      Seq(Some("https://user:pw@e.com/x"), Some("https://user:pw@e.com/x")))
  }

  test("non-http schemes and schemeless strings yield NULL") {
    assert(canon("ftp://e.com/f", "not a url 7", "mailto:x@e.com",
      "//protocol-relative.com/x") === Seq(None, None, None, None))
  }
}
