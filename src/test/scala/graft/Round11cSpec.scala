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

  test("a '?' inside the fragment is fragment content, not a query (SPA router URLs)") {
    assert(canon(
      "https://app.example.com/#/search?q=1",
      "https://app.example.com/",
      "https://e.com/p#frag?x=1",
      "https://e.com/p?a=1#frag?b=2") === Seq(
      Some("https://app.example.com"),
      Some("https://app.example.com"),
      Some("https://e.com/p"),
      Some("https://e.com/p?a=1")))
  }

  test("userinfo stays in the (lowercased) authority — dedup keys, not fetchable URLs") {
    assert(canon("https://User:Pw@e.com/x", "https://user:pw@e.com/x") ===
      Seq(Some("https://user:pw@e.com/x"), Some("https://user:pw@e.com/x")))
  }

  test("canonicalization is idempotent over randomized URL shapes") {
    // canonical(canonical(u)) must equal canonical(u): a canonical key
    // fed back through the normalizer (as re-crawled URLs are) must not
    // drift. Randomized over the cosmetic-variant space.
    val rnd = new scala.util.Random(13)
    val urls = (1 to 300).map { i =>
      val scheme = if (rnd.nextBoolean()) "https" else "http"
      val schemeR = if (rnd.nextBoolean()) scheme.toUpperCase else scheme
      val www = if (rnd.nextBoolean()) "www." else ""
      val host = s"${www}Host${rnd.nextInt(5)}.Example.com"
      val port = rnd.nextInt(4) match {
        case 0 => if (scheme == "http") ":80" else ":443"
        case 1 => ":8080"
        case _ => ""
      }
      val path = Seq.fill(rnd.nextInt(3))(s"p${rnd.nextInt(9)}")
        .mkString("/", "/", if (rnd.nextBoolean()) "/" else "")
      val params = rnd.shuffle(Seq("a=1", "b=2", "utm_source=x", "ref=y")
        .take(rnd.nextInt(5)))
      val q = if (params.isEmpty) "" else params.mkString("?", "&", "")
      val frag = if (rnd.nextBoolean()) "#sec" else ""
      (i.toLong, s"$schemeR://$host$port$path$q$frag")
    }.toDF("id", "url")
    val twice = urls.select(
        Urls.canonical(col("url")).as("c1"),
        Urls.canonical(Urls.canonical(col("url"))).as("c2"))
      .collect()
    twice.foreach { r =>
      assert(!r.isNullAt(0), "generated URLs are all well-formed")
      assert(r.getString(0) === r.getString(1), r.getString(0))
    }
  }

  test("non-http schemes and schemeless strings yield NULL") {
    assert(canon("ftp://e.com/f", "not a url 7", "mailto:x@e.com",
      "//protocol-relative.com/x") === Seq(None, None, None, None))
  }
}
