package graft

import graft.ops.{Dedup, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 part 3: line-level boilerplate removal, epoch shard
  * planning, per-source KL drift.
  */
class Round8cSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- lineDedup ----

  test("lineDedup: a line in >= minDocs docs is removed from EVERY doc") {
    val df = Seq(
      (1L, "nav bar\nunique alpha\nfooter"),
      (2L, "nav bar\nunique beta\nfooter"),
      (3L, "unique gamma")).toDF("id", "text")
    val out = Dedup.lineDedup(df, "id", "text", minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // no first occurrence survives: both docs lose nav bar AND footer
    assert(out(1L) === ((3L, 1L, "unique alpha")))
    assert(out(2L) === ((3L, 1L, "unique beta")))
    assert(out(3L) === ((1L, 1L, "unique gamma")))
  }

  test("lineDedup: blank/whitespace lines neither count nor pad; " +
      "all-boilerplate doc survives with empty clean_text") {
    val df = Seq(
      (1L, "dup\n\n   \ndup2"),
      (2L, "dup\ndup2"),
      (3L, " dup \nkeep me")).toDF("id", "text") // trims before matching
    val out = Dedup.lineDedup(df, "id", "text", minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((2L, 0L, "")))     // blanks dropped, both lines dup
    assert(out(2L) === ((2L, 0L, "")))
    assert(out(3L) === ((2L, 1L, "keep me")))
  }

  test("lineDedup: repeats WITHIN one doc are not boilerplate (distinct docs)") {
    val df = Seq(
      (1L, "echo\necho\necho"),
      (2L, "other")).toDF("id", "text")
    val out = Dedup.lineDedup(df, "id", "text", minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) === 3L) // countDistinct(doc)=1 < 2 → kept
  }

  // ---- epochShards ----

  test("epochShards: shards partition the corpus; pos is dense per shard") {
    val df = (0L until 100L).toDF("id")
    val out = Sampling.epochShards(df, "id", epoch = 1, nShards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.map(_._1).toSet === (0L until 100L).toSet) // every doc once
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (0L until rows.length).toSeq)
    }
  }

  test("epochShards: different epochs produce different orders; same epoch is stable") {
    val df = (0L until 200L).toDF("id")
    def plan(e: Int) = Sampling.epochShards(df, "id", e, 4)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val e1 = plan(1)
    assert(plan(1) === e1)       // deterministic
    assert(plan(2) !== e1)       // epoch changes the whole assignment
  }

  test("epochShards: growing the corpus never reorders surviving docs of a shard") {
    val small = (0L until 100L).toDF("id")
    val big = (0L until 150L).toDF("id")
    def order(df: org.apache.spark.sql.DataFrame) =
      Sampling.epochShards(df, "id", 7, 4).collect()
        .map(r => (r.getInt(1), r.getLong(2), r.getLong(0)))
        .groupBy(_._1).map { case (s, rows) =>
          s -> rows.sortBy(_._2).map(_._3).toSeq }
    val o1 = order(small)
    val o2 = order(big)
    o1.foreach { case (s, seq) =>
      // old docs appear in the same relative order within their shard
      assert(o2(s).filter(seq.contains) === seq)
    }
  }

  // ---- sourceDivergence ----

  test("sourceDivergence: identical sources have kl = 0; skewed source > 0") {
    val df = Seq(
      ("a", "x x y"), ("a", "x y y"),     // a: x=3,y=3
      ("b", "x x y"), ("b", "x y y"),     // b: identical distribution
      ("c", "z z z z z z")).toDF("source", "text")
    val out = TextAnalysis.sourceDivergence(df, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("a") === out("b"))
    assert(out("a") > 0.0)      // corpus blend includes c's z mass
    assert(out("c") > out("a")) // c is pure-z, farthest from the blend
  }

  test("sourceDivergence: single source means corpus = source, kl exactly 0 (not -0.0)") {
    val df = Seq(("a", "p q r"), ("a", "p p q")).toDF("source", "text")
    val row = TextAnalysis.sourceDivergence(df, "source", "text").collect().head
    assert(row.getLong(1) === 6L && row.getLong(2) === 3L)
    val kl = row.getDouble(3)
    assert(kl === 0.0 &&
      java.lang.Double.doubleToRawLongBits(kl) === 0L) // canonical +0.0
  }

  // ---- vocabCoverage ----

  test("vocabCoverage: exact curve on a known corpus; clamp at n_types") {
    // counts: a=4, b=2, c=1 → order a, b, c; total 7
    val df = Seq("a a b", "a a b c").toDF("text")
    val out = TextAnalysis.vocabCoverage(df, "text", Seq(1, 2, 10))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(out(0) === ((1L, 1L, 4L, math.rint(4.0 / 7 * 1e6) / 1e6)))
    assert(out(1) === ((2L, 2L, 6L, math.rint(6.0 / 7 * 1e6) / 1e6)))
    assert(out(2) === ((10L, 3L, 7L, 1.0))) // clamp: only 3 types exist
  }

  test("vocabCoverage: equal counts tie-break by word, so the cut is deterministic") {
    val df = Seq("z y x").toDF("text") // all counts 1 → order x, y, z
    val out = TextAnalysis.vocabCoverage(df, "text", Seq(2))
      .collect().head
    assert(out.getLong(2) === 2L) // covers x and y, never a z-dependent set
  }

  // ---- curriculumBuckets ----

  test("curriculumBuckets: per-source ascending-length quartiles, deterministic ties") {
    val df = Seq(
      (1L, "a", "s"), (2L, "a b", "s"), (3L, "a b c", "s"), (4L, "a b c d", "s"),
      (5L, "x", "t"), (6L, "x y", "t")).toDF("id", "text", "source")
    val out = Sampling.curriculumBuckets(df, "id", "text", "source", buckets = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L,
      5L -> 1L, 6L -> 2L)) // each source cut independently
  }

  // ---- updateFingerprint ----

  test("updateFingerprint: XOR self-inverse — applying a delta then its reverse is identity") {
    import graft.ops.Profile
    val v1 = Seq((1L, "a b", "s0"), (2L, "c d", "s0"), (3L, "e f", "s1"))
      .toDF("doc_id", "text", "source")
    val base = Profile.corpusFingerprint(v1, "doc_id", "text", "source")
    val rem = Seq((2L, "c d", "s0")).toDF("doc_id", "text", "source")
    val add = Seq((4L, "g h", "s2")).toDF("doc_id", "text", "source")
    val fwd = Profile.updateFingerprint(base, rem, add, "doc_id", "text", "source")
    // s2 appeared, s0 shrank
    val m = fwd.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(m("s0")._1 === 1L && m("s2")._1 === 1L && m("s1")._1 === 1L)
    // reverse the delta: must reproduce base exactly (including fp bits),
    // with s2 left as an empty tombstone row
    val back = Profile.updateFingerprint(fwd, add, rem, "doc_id", "text", "source")
    val b = back.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val want = base.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    want.foreach { case (g, t) => assert(b(g) === t, g) }
    assert(b("s2") === ((0L, 0L, 0L))) // emptied group: explicit zero row
  }

  // ---- sourceDedupImpact ----

  test("sourceDedupImpact: within vs cross partners classified per doc") {
    val df = Seq(
      (1L, "alpha beta gamma delta", "a"),   // dup of 2 (same source)
      (2L, "alpha beta gamma delta", "a"),
      (3L, "epsilon zeta eta theta", "a"),   // dup of 4 (cross source)
      (4L, "epsilon zeta eta theta", "b"),
      (5L, "unique text lives here", "b")).toDF("id", "text", "source")
    val out = Dedup.sourceDedupImpact(df, "id", "text", "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // a: 3 docs; 1,2 within-dups; 3 cross-dup
    assert(out("a") === ((3L, 3L, 2L, 1L)))
    // b: 2 docs; 4 cross-dup; 5 clean
    assert(out("b") === ((2L, 1L, 0L, 1L)))
  }

  // ---- clusterQuality ----

  test("clusterQuality: tight planted clusters give mean/min cos at the ceiling") {
    // two disjoint-support groups: ids 0-2 on axis 0, ids 3-5 on axis 1
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)), (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 1.0f, 0.0f)), (5L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("id", "v")
    val init = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))
    val out = graft.ops.Similarity.clusterQuality(emb, "id", "v",
        nClusters = 2, lloydIters = 2, init = Some(init))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(0) === ((3L, 1.0, 1.0)))
    assert(out(1) === ((3L, 1.0, 1.0)))
  }

  // ---- stripMarkup ----

  test("stripMarkup: drops script/style wholesale, strips tags, decodes entities") {
    val df = Seq(
      "<html><style>p{x}</style><body><h1>A &amp; B</h1>" +
        "<script>if (1 < 2) alert('x');</script><p>text&nbsp;here</p></body></html>")
      .toDF("text")
    val out = df.select(TextAnalysis.stripMarkup(col("text"))).head.getString(0)
    assert(out === "A & B text here") // script CONTENT gone, not just tags
  }

  test("stripMarkup: idempotent on plain text; &amp; decodes last (no double decode)") {
    val plain = Seq("already clean prose").toDF("text")
    assert(plain.select(TextAnalysis.stripMarkup(col("text"))).head.getString(0)
      === "already clean prose")
    // literal "&lt;" written as &amp;lt; must survive as "&lt;", not "<"
    val tricky = Seq("escape: &amp;lt;tag&amp;gt;").toDF("text")
    assert(tricky.select(TextAnalysis.stripMarkup(col("text"))).head.getString(0)
      === "escape: &lt;tag&gt;")
  }

  // ---- contaminationSpans ----

  test("contaminationSpans: overlapping and touching hits merge; gaps split") {
    // train gram set = 3-grams of "a b c d e" -> hits in eval docs
    val train = Seq((100L, "a b c d e")).toDF("id", "text")
    val eval = Seq(
      // positions 0..2 all hit (a b c, b c d, c d e) -> ONE span [0,5)
      (1L, "a b c d e"),
      // one hit at pos 2 (a b c); span [2,5) of length 3
      (2L, "x y a b c z w"),
      // two separated hits: pos 0 (a b c) and pos 7 (c d e) -> 2 spans
      (3L, "a b c q r s t c d e"),
      (4L, "nothing matches here at all")).toDF("id", "text")
    val out = Dedup.contaminationSpans(eval, train, "id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) === ((3L, 1L, 5L, 5L)))
    assert(out(2L) === ((1L, 1L, 3L, 3L)))
    assert(out(3L) === ((2L, 2L, 6L, 3L)))
    assert(out(4L) === ((0L, 0L, 0L, 0L))) // clean docs kept with zeros
  }

  test("contaminationSpans: touching windows (gap = n) merge into one span") {
    val train = Seq((100L, "a b c"), (101L, "x y z")).toDF("id", "text")
    // hits at pos 0 (a b c) and pos 3 (x y z): windows [0,3) and [3,6)
    // touch -> single span of length 6
    val eval = Seq((1L, "a b c x y z")).toDF("id", "text")
    val out = Dedup.contaminationSpans(eval, train, "id", "text", n = 3)
      .collect().head
    assert((out.getLong(1), out.getLong(2), out.getLong(3)) === ((2L, 1L, 6L)))
  }

  // ---- hybridSearch ----

  test("hybridSearch: RRF fuses both lists; single-list docs get one term") {
    val docs = Seq(
      (1L, "hit common"), (2L, "hit hit common"), (3L, "other words"))
      .toDF("id", "text")
    // vec space: id 2 is the query itself (cos 1), id 3 close, id 4 far
    val emb = Seq(
      (2L, Array(1.0f, 0.0f)), (3L, Array(0.9f, 0.1f)),
      (4L, Array(0.0f, 1.0f))).toDF("vid", "v")
    val out = graft.ops.Search.hybridSearch(
        docs, "id", "text", Seq("hit"), emb, "vid", "v",
        Array(1.0, 0.0), n = 10, k = 10)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), r.getDouble(3)))).toMap
    // text list: doc 2 (tf 2) rank 1, doc 1 rank 2; doc 3 absent
    // vec list: 2, 3, 4
    assert(out(2L) === ((Some(1L), Some(1L),
      math.rint((1.0 / 61 + 1.0 / 61) * 1e6) / 1e6)))
    assert(out(1L) === ((Some(2L), None,
      math.rint(1.0 / 62 * 1e6) / 1e6)))
    assert(out(3L)._1 === None) // text miss, vec rank 2
    assert(out(3L)._2 === Some(2L))
    assert(!out.contains(5L))
    // fused order puts the dual-list doc first
    assert(out(2L)._3 > out(1L)._3 && out(2L)._3 > out(3L)._3)
  }

  // ---- windowedTopK ----

  test("windowedTopK: k per window, count desc, ties break by event_type") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val df = Seq(
      (ts(1), "b"), (ts(2), "b"), (ts(3), "a"), (ts(4), "a"), (ts(5), "c"),
      (ts(59), "d")).toDF("ts", "event_type")
    val out = graft.streaming.Streams.windowedTopK(df, "1 hour", k = 2)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    // a and b both count 2 → a first by name; c (1) is cut at k=2
    assert(out.toSeq === Seq(("a", 2L, 1L), ("b", 2L, 2L)))
  }

  test("windowedTopK counts stage runs as a real stream; sink-side cut equals batch") {
    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val dir = java.nio.file.Files.createTempDirectory("grafttopk")
    events.write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(events.schema).parquet(s"$dir/in")
    val q = graft.streaming.Streams.windowedCounts(stream, "1 hour")
      .writeStream.outputMode("complete")
      .format("memory").queryName("topk_counts_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = graft.streaming.Streams
      .topKOverCounts(spark.table("topk_counts_out"), 3)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val want = graft.streaming.Streams.windowedTopK(events, "1 hour", 3)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want && want.nonEmpty)
  }

  test("sourceDivergence plan: corpus is scanned once (counts frame reused)") {
    val df = Seq(("a", "x y"), ("b", "y z")).toDF("source", "text")
    val plan = TextAnalysis.sourceDivergence(df, "source", "text")
      .queryExecution.optimizedPlan.toString
    // global/total frames must come from the persisted per-source counts
    // (InMemoryRelation), not re-derived corpus scans
    assert(plan.contains("InMemoryRelation"))
  }
}
