package graft

import graft.ops.{Profile, Search}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 part 2: inverted-index relevance search, column profiling,
  * corpus fingerprinting, snapshot diffing.
  */
class Round8bSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- invertedIndex / searchIndex ----

  test("invertedIndex: one row per (term, doc) with the term frequency") {
    val df = Seq((1L, "a b a"), (2L, "b b c"), (3L, "")).toDF("id", "text")
    val idx = Search.invertedIndex(df, "id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(idx === Map(("a", 1L) -> 2L, ("b", 1L) -> 1L,
      ("b", 2L) -> 2L, ("c", 2L) -> 1L))
  }

  test("searchDocs: rarer terms rank higher via rational idf; ties break by id") {
    // "rare" appears in 1 of 4 docs, "common" in all 4: one rare hit
    // must outscore one common hit (idf 4/1 vs 4/4)
    val df = Seq(
      (1L, "common x y"), (2L, "common rare y"),
      (3L, "common y z"), (4L, "common z z")).toDF("id", "text")
    val out = Search.searchDocs(df, "id", "text", Seq("rare", "common"), k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.head._1 === 2L && out.head._2 === 2L) // both terms hit
    // remaining three docs have identical tf vectors → id order
    assert(out.drop(1).map(_._1).toSeq === Seq(1L, 3L, 4L))
    // common-only score: (1/2.5) * (4/4) = 0.4 exactly
    assert(out(1)._3 === 0.4)
  }

  test("searchDocs: tf saturation — 10x repetition does not 10x the score") {
    val df = Seq((1L, Seq.fill(10)("t").mkString(" ")), (2L, "t once"))
      .toDF("id", "text")
    val out = Search.searchDocs(df, "id", "text", Seq("t"), k = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // tf=10 → 10/11.5 = 0.869565 vs tf=1 → 1/2.5 = 0.4 (idf = 1)
    assert(out(1L) > out(2L) && out(1L) < out(2L) * 2.5)
  }

  test("searchDocs: docs matching no term are absent; k caps the result") {
    val df = Seq((1L, "a b"), (2L, "c d"), (3L, "a a"), (4L, "a c"))
      .toDF("id", "text")
    val out = Search.searchDocs(df, "id", "text", Seq("a"), k = 2).collect()
    assert(out.length === 2)
    assert(out.map(_.getLong(0)).toSet === Set(3L, 1L)) // tf 2 then tf 1 (id tie-break vs 4)
  }

  test("searchIndex plan: postings filter is pushed, df/n sides broadcast") {
    val df = Seq((1L, "a b"), (2L, "b c")).toDF("id", "text")
    val plan = Search.searchDocs(df, "id", "text", Seq("b"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
  }

  // ---- positionalIndex / phraseSearch ----

  test("phraseSearch: counts adjacent occurrences only, in order") {
    val df = Seq(
      (1L, "x query join y query join"), // 2 matches
      (2L, "join query"),                // reversed — no match
      (3L, "query x join"),              // gap — no match
      (4L, "query join")                 // 1 match at pos 0
    ).toDF("id", "text")
    val idx = Search.positionalIndex(df, "id", "text")
    val out = Search.phraseSearch(idx, Seq("query", "join"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 2L, 1L), (4L, 1L, 0L)))
  }

  test("phraseSearch: three-token phrase requires full adjacency") {
    val df = Seq(
      (1L, "a b c d"), (2L, "a b x c"), (3L, "b c d a b c")).toDF("id", "text")
    val out = Search.phraseSearch(
      Search.positionalIndex(df, "id", "text"), Seq("a", "b", "c"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 3L -> 1L))
  }

  // ---- profile ----

  test("profile: nulls, distincts, numeric/string/timestamp min-max per column") {
    val df = Seq(
      (Some(1L), Some("b"), Some(2.5), Some(java.sql.Timestamp.valueOf("2024-01-02 03:04:05"))),
      (Some(3L), None, Some(1.5), None),
      (None, Some("a"), Some(2.5), Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))))
      .toDF("k", "s", "v", "ts")
    val out = Profile.profile(df, Seq("k", "s", "v", "ts"))
      .collect().map(r => r.getString(0) -> r).toMap
    val k = out("k")
    assert(k.getString(1) === "bigint" && k.getLong(2) === 3L &&
      k.getLong(3) === 1L && k.getLong(4) === 2L &&
      k.getDouble(5) === 1.0 && k.getDouble(6) === 3.0 && k.isNullAt(7))
    val s = out("s")
    assert(s.getLong(3) === 1L && s.getLong(4) === 2L &&
      s.isNullAt(5) && s.getString(7) === "a" && s.getString(8) === "b")
    val v = out("v")
    assert(v.getLong(3) === 0L && v.getLong(4) === 2L &&
      v.getDouble(5) === 1.5 && v.getDouble(6) === 2.5)
    val ts = out("ts")
    assert(ts.getLong(3) === 1L && ts.getLong(4) === 2L && ts.getDouble(5) > 0)
  }

  test("profileApprox: same counts, approximate distincts within rsd") {
    val df = spark.range(0, 10000).select(col("id"), (col("id") % 100).as("m"))
    val out = Profile.profileApprox(df, Seq("id", "m"), rsd = 0.05)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("id").getLong(3) === 0L)
    val ndM = out("m").getLong(4).toDouble
    assert(ndM > 80 && ndM < 120) // 100 ± rsd slack
    // single pass: no Expand in the plan (the exact profile has one)
    val approxPlan = Profile.profileApprox(df, Seq("id", "m"))
      .queryExecution.executedPlan.toString
    val exactPlan = Profile.profile(df, Seq("id", "m"))
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand") && exactPlan.contains("Expand"))
  }

  // ---- containmentSearch ----

  test("containmentSearch: supersets score 1.0, partial quotes score their coverage") {
    val df = Seq(
      (1L, "p q r s"),                 // the query itself: containment 1.0
      (2L, "x p q r s y z"),           // superset: all query grams present → 1.0
      (3L, "p q r junk junk"),         // carries 1 of 2 query 3-grams
      (4L, "no overlap here at all")).toDF("id", "text")
    val out = Search.containmentSearch(df, "id", "text", "p q r s", n = 3, k = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // query "p q r s" has 2 distinct 3-grams: "p q r", "q r s"
    assert(out(1L) === ((2L, 1.0)) && out(2L) === ((2L, 1.0)))
    assert(out(3L) === ((1L, 0.5)))
    assert(!out.contains(4L)) // zero overlap → absent
  }

  test("containmentSearch is asymmetric: a long superset still scores 1.0") {
    val quote = (1 to 10).map(i => s"t$i").mkString(" ")
    val container = s"head $quote tail more words beyond the quote"
    val df = Seq((1L, container), (2L, "unrelated text entirely")).toDF("id", "text")
    val out = Search.containmentSearch(df, "id", "text", quote, n = 3, k = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) === 1.0)
  }

  // ---- updateIndex ----

  test("updateIndex: upserts replace, deletes drop, untouched rows survive — equals rebuild") {
    val v1 = Seq((1L, "a b"), (2L, "b c"), (3L, "c d")).toDF("id", "text")
    val upserts = Seq((2L, "x y"), (4L, "a x")).toDF("id", "text") // edit 2, add 4
    val deletes = Seq(Tuple1(3L)).toDF("id")
    val got = Search.updateIndex(
      Search.invertedIndex(v1, "id", "text"), upserts, deletes, "id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val v2 = Seq((1L, "a b"), (2L, "x y"), (4L, "a x")).toDF("id", "text")
    val want = Search.invertedIndex(v2, "id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === want)
  }

  // ---- proximitySearch / searchSnippets ----

  test("proximitySearch: counts pairs within slop, either order") {
    val df = Seq(
      (1L, "a x b"),       // |1-3|=2 <= 2 → 1 pair
      (2L, "b a"),         // reversed, adjacent → 1 pair
      (3L, "a x y z b"),   // distance 4 > 2 → no pair
      (4L, "a b a")        // pairs: (1,2),(3,2) → 2 pairs
    ).toDF("id", "text")
    val out = Search.proximitySearch(
      Search.positionalIndex(df, "id", "text"), "a", "b", slop = 2, k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 4L -> 2L))
  }

  test("proximitySearch plan: doc-level equi-join, no nested-loop join") {
    val df = Seq((1L, "a b")).toDF("id", "text")
    val plan = Search.proximitySearch(
      Search.positionalIndex(df, "id", "text"), "a", "b", slop = 2, k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("searchSnippets: window clamps at doc edges, tf ranks") {
    val df = Seq(
      (1L, "hit a b c d e f g h i j"),          // hit at pos 0 → snippet = first 9
      (2L, "a b c d e hit f g h i j"),          // centered window
      (3L, "x y z"),                            // no hit → absent
      (4L, "hit hit")                           // tf 2 → ranks first
    ).toDF("id", "text")
    val out = Search.searchSnippets(df, "id", "text", "hit", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.map(_._1).toSeq === Seq(4L, 1L, 2L))
    assert(out.find(_._1 == 1L).get._4 === "hit a b c d e f g h")
    assert(out.find(_._1 == 2L).get._4 === "b c d e hit f g h i")
    assert(out.find(_._1 == 2L).get._3 === 5L) // 0-based first_pos
  }

  test("phraseSearch plan: postings intersection is an equi-join") {
    val df = Seq((1L, "a b")).toDF("id", "text")
    val plan = Search.phraseSearch(
      Search.positionalIndex(df, "id", "text"), Seq("a", "b"), k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  // ---- importanceWeights ----

  test("importanceWeights: target-vocabulary docs outscore background docs") {
    val target = (1L to 20L).map(i => (i, "alpha beta gamma alpha", "t"))
    val backgr = (21L to 60L).map(i => (i, "delta epsilon zeta delta", "b"))
    val probe = Seq((61L, "alpha beta", "b"), (62L, "delta epsilon", "b"),
      (63L, "", "b"))
    val df = (target ++ backgr ++ probe).toDF("id", "text", "src")
    val out = graft.ops.Sampling.importanceWeights(df, "id", "text",
        isTarget = col("src") === "t")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.size === 63)
    // target-vocab probe must outscore the background-vocab probe of
    // equal length; an empty doc scores 0
    assert(out(61L)._1 === 2L && out(62L)._1 === 2L)
    assert(out(61L)._2 > out(62L)._2)
    assert(out(63L) === ((0L, 0L)))
    // scores are exact integers: identical docs score identically
    assert((1L to 20L).map(out(_)._2).toSet.size === 1)
  }

  // ---- sourceCatalog ----

  test("sourceCatalog: one row per source; target source has the highest affinity") {
    val docs = ((1L to 30L).map(i => (i, "alpha beta gamma", "t")) ++
      (31L to 60L).map(i => (i, "delta epsilon zeta", "b")) ++
      Seq((61L, "", "empty"))).toDF("id", "text", "src")
    val out = graft.ops.Pipelines.sourceCatalog(docs, "id", "text", "src",
        isTarget = col("src") === "t")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    assert(out.keySet === Set("t", "b", "empty"))
    assert(out("t")._1 === 30L && out("t")._2 === 90L)
    assert(out("t")._3 > out("b")._3) // target vocab scores higher per token
    assert(out("empty")._3 === 0.0)   // zero-token source → affinity 0
  }

  // ---- corpusFingerprint / snapshotDiff ----

  test("corpusFingerprint: partitioning-invariant, content-sensitive") {
    val docs = (1L to 200L).map(i => (i, s"doc $i body", s"src${i % 3}"))
    val a = docs.toDF("id", "text", "src")
    val b = spark.createDataFrame(spark.sparkContext
      .parallelize(scala.util.Random.shuffle(docs), 7))
      .toDF("id", "text", "src")
    def fp(df: org.apache.spark.sql.DataFrame) =
      Profile.corpusFingerprint(df, "id", "text", "src")
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(fp(a) === fp(b)) // order/partitioning independent
    val mutated = a.withColumn("text",
      when(col("id") === 42L, lit("tampered")).otherwise(col("text")))
    val fa = fp(a); val fm = fp(mutated)
    assert(fa("src0") !== fm("src0")) // 42 % 3 = 0
    assert(fa("src1") === fm("src1") && fa("src2") === fm("src2"))
  }

  test("snapshotDiff: classifies added/removed/changed/unchanged") {
    val v1 = Seq((1L, "a", "s"), (2L, "b", "s"), (3L, "c", "s")).toDF("id", "text", "src")
    val v2 = Seq((1L, "a", "s"), (2L, "B2", "s"), (4L, "d", "s")).toDF("id", "text", "src")
    val out = Profile.snapshotDiff(v1, v2, "id", "text", "src")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out === Map("unchanged" -> 1L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }
}
