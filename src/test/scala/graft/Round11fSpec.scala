package graft

import graft.ops.Urls
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 part 6: robots-style rule application + incremental
  * canonical-set maintenance.
  */
class Round11fSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rules = Seq(
    ("e.com", "/a", false),
    ("e.com", "/a/b", true),   // longest prefix re-allows
    ("e.com", "/t", true),     // exact-length tie: allow must win
    ("e.com", "/t", false),
    ("deny.com", "/", false)).toDF("host", "prefix", "allow")

  private def verdicts(urls: (Long, String)*): Seq[(Long, Option[String], Boolean)] =
    Urls.applyRules(urls.toDF("url_id", "url"), "url", rules)
      .collect().map(r => (r.getLong(0), Option(r.getString(2)),
        r.getBoolean(3))).toSeq.sortBy(_._1)

  test("longest prefix wins; allow wins exact-length ties; no rule = allow") {
    assert(verdicts(
      (1L, "https://e.com/a/x"),        // /a deny
      (2L, "https://e.com/a/b/c"),      // /a/b allow beats /a deny
      (3L, "https://e.com/t/x"),        // tie -> allow
      (4L, "https://e.com/free"),       // no matching rule
      (5L, "https://deny.com/anything"),
      (6L, "https://other.com/x")) === Seq(
      (1L, Some("/a"), false),
      (2L, Some("/a/b"), true),
      (3L, Some("/t"), true),
      (4L, None, true),
      (5L, Some("/"), false),
      (6L, None, true)))
  }

  test("rule matching is on the canonical host: case, www, and port collapse") {
    assert(verdicts(
      (1L, "HTTPS://WWW.E.COM:443/a/x"),
      (2L, "http://e.com:8080/a/x")) === Seq(
      (1L, Some("/a"), false),
      (2L, Some("/a"), false)))
  }

  test("applyRules preserves input cardinality exactly — duplicate rows stay duplicated") {
    val dup = Seq((1L, "https://e.com/a/x"), (1L, "https://e.com/a/x"),
      (2L, "https://other.com/y")).toDF("url_id", "url")
    val got = Urls.applyRules(dup, "url", rules).collect()
    assert(got.length === 3, "a pure projection must not collapse duplicates")
  }

  test("maintainCanonicalSet over any split equals the one-shot aggregate") {
    val urls = (1L to 40L).map(i =>
      (i, s"https://e.com/p/${i % 7}")).toDF("url_id", "url")
    val full = urls
      .select(col("url_id"), Urls.canonical(col("url")).as("canonical"))
      .groupBy("canonical")
      .agg(count(lit(1)).as("n_urls"), min(col("url_id")).as("keep_id"))
    for (m <- Seq(2L, 5L)) {
      val stored = urls.filter(col("url_id") % m =!= 0)
        .select(col("url_id"), Urls.canonical(col("url")).as("canonical"))
        .groupBy("canonical")
        .agg(count(lit(1)).as("n_urls"), min(col("url_id")).as("keep_id"))
      val got = Urls.maintainCanonicalSet(stored,
          urls.filter(col("url_id") % m === 0), "url", "url_id")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      val want = full.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === want, s"split mod $m")
    }
  }
}
