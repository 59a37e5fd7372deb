package graft

import graft.ops.Urls
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 part 1: IDN/punycode host folding in canonicalIdn.
  * Equivalence classes (Unicode / UPPERCASE Unicode / ACE spell the
  * same authority), idempotence over the fold, the ASCII fast path
  * staying bit-identical to plain canonical, port preservation, and
  * the rejected-IDN → NULL malformed bucket.
  */
class Round12aSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def canonIdn(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.canonicalIdn(col("u"))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq

  test("Unicode, uppercase-Unicode, and ACE spellings fold to one canonical") {
    val c = canonIdn(
      "https://münchen.de/p/1",
      "https://MÜNCHEN.DE/p/1",
      "https://www.münchen.de:443/p/1",
      "https://xn--mnchen-3ya.de/p/1")
    assert(c.distinct === Seq("https://xn--mnchen-3ya.de/p/1"))
  }

  test("the fold is idempotent: canonicalIdn of its own output is a fixpoint") {
    val one = canonIdn("https://bücher.example/a/?z=1&utm_source=x").head
    assert(one === "https://xn--bcher-kva.example/a?z=1")
    assert(canonIdn(one).head === one)
  }

  test("all-ASCII hosts take the codegen path and match plain canonical exactly") {
    val urls = Seq(
      "https://www.Plain.COM:443/a/b/?b=2&utm_source=m#f",
      "http://example.org:8080/x",
      "ftp://nope.example/x", // non-http(s): null in both
      "https://plain.com/p?a=1&a=0")
    val both = urls.toDF("u")
      .select(Urls.canonical(col("u")).as("c"), Urls.canonicalIdn(col("u")).as("ci"))
      .collect()
    both.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getString(0) === r.getString(1))
    }
  }

  test("a kept non-default port survives the fold on a Unicode host") {
    assert(canonIdn("https://日本.jp:8443/x").head ===
      "https://xn--wgv71a.jp:8443/x")
  }

  test("a host the IDNA encoder rejects lands in the malformed (NULL) bucket") {
    // an empty label (consecutive dots) is rejected by toASCII; the
    // non-ASCII char forces the fold path
    assert(canonIdn("https://bad..münchen.de/x").head === null)
  }
}
