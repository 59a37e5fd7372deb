package graft

import graft.ops.{Behavior, Graphs, SeqData, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 part 8: fixed-point PageRank, degree histogram, source
  * n-gram diversity.
  */
class Round8hSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Brute-force fixed-point PageRank replay (same integer spec). */
  private def prModel(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val outdeg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => (rank(s) * 85L) / (100L * outdeg(s)) }.sum).toMap
      rank = nodes.map(n => n -> (150000L + in.getOrElse(n, 0L))).toMap
    }
    rank
  }

  test("pageRankFixedPoint matches the brute-force integer model") {
    // a star (hub 0 <-> leaves 1..5) plus a 3-cycle and a dangling sink
    val edges = (1L to 5L).flatMap(i => Seq((0L, i), (i, 0L))) ++
      Seq((10L, 11L), (11L, 12L), (12L, 10L), (12L, 13L))
    val got = Graphs.pageRankFixedPoint(edges.toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank")).toMap
    assert(got === prModel(edges, 3))
    // the hub outranks every leaf
    assert((1L to 5L).forall(i => got(0L) > got(i)))
  }

  test("pageRankFixedPoint: rank mass is bounded by initial mass") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val got = Graphs.pageRankFixedPoint(edges.toDF("src", "dst"), iters = 4)
      .collect().map(_.getAs[Long]("rank"))
    // closed cycle, deg 1 everywhere: mass only shrinks by truncation
    assert(got.sum <= 3000000L && got.sum > 2999900L)
    // symmetric cycle -> identical ranks
    assert(got.toSet.size === 1)
  }

  test("degreeHistogram: both sides bucketed correctly") {
    val edges = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L)).toDF("src", "dst")
    val got = Graphs.degreeHistogram(edges).collect()
      .map(r => (r.getAs[String]("side"), r.getAs[Long]("deg")) ->
        r.getAs[Long]("n_nodes")).toMap
    // out: node1 deg3, node2 deg1; in: node10 deg2, nodes 11/12 deg1
    assert(got === Map(("out", 3L) -> 1L, ("out", 1L) -> 1L,
      ("in", 2L) -> 1L, ("in", 1L) -> 2L))
  }

  test("bfsHops: multi-source min distance on a path graph") {
    // path 1-2-3-4-5 (directed both ways) with seeds {1, 5}, maxHops 3
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val seeds = Seq(1L, 5L).toDF("id")
    val got = Graphs.bfsHops(edges, seeds, maxHops = 3)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("hops")).toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 0))
  }

  test("bfsHops: maxHops truncates reach, unreached nodes absent") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val got = Graphs.bfsHops(edges, Seq(1L).toDF("id"), maxHops = 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("hops")).toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2)) // 4, 5 out of range
  }

  test("edgeNovelty: repeat edges stop counting as new") {
    def t(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 05:00:00")
    val ev = Seq(
      (1L, 10L, t(1)), (1L, 11L, t(1)),          // day1: 2 edges, both new
      (1L, 10L, t(2)), (2L, 10L, t(2)),          // day2: repeat + 1 new
      (1L, 10L, t(3))                            // day3: repeat only
    ).toDF("u", "item", "ts")
    val got = Graphs.edgeNovelty(ev, col("u"), col("item"),
        date_trunc("day", col("ts")))
      .collect().map(r => (r.getAs[java.sql.Timestamp]("bucket").toString.take(10),
        (r.getAs[Long]("n_edges"), r.getAs[Long]("n_new")))).toMap
    assert(got === Map("2024-01-01" -> ((2L, 2L)), "2024-01-02" -> ((2L, 1L)),
      "2024-01-03" -> ((1L, 0L))))
  }

  test("typeTransitions: per-user LEAD counts match hand computation") {
    val ev = Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "view"),
      (2L, 4L, "view"), (2L, 5L, "view"),
      (3L, 6L, "buy") // single event -> no transition
    ).map { case (u, t, ty) =>
      (u, java.sql.Timestamp.valueOf(s"2024-01-01 00:0$t:00"), t, ty)
    }.toDF("user_id", "ts", "event_id", "event_type")
    val got = Graphs.typeTransitions(ev, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getAs[String]("from_type"),
        r.getAs[String]("to_type")) -> r.getAs[Long]("n")).toMap
    assert(got === Map(("view", "click") -> 1L, ("click", "view") -> 1L,
      ("view", "view") -> 1L))
  }

  test("itemCooccurrence: support counts baskets, oversized baskets dropped") {
    def t(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    // user 1: basket {10,11} twice (hours 0,1); user 2: {10,11,12} once;
    // user 3: an oversized basket that must be dropped entirely
    val rows =
      Seq((1L, t(0), 10L), (1L, t(0), 11L), (1L, t(1), 10L), (1L, t(1), 11L),
        (2L, t(0), 10L), (2L, t(0), 11L), (2L, t(0), 12L)) ++
      (0L until 10L).map(i => (3L, t(0), 100L + i))
    val ev = rows.toDF("user_id", "ts", "item")
    val got = Graphs.itemCooccurrence(ev, "user_id",
        date_trunc("hour", col("ts")), col("item"),
        minSupport = 1, maxBasketSize = 5)
      .collect().map(r => (r.getAs[Long]("item_a"), r.getAs[Long]("item_b")) ->
        r.getAs[Long]("support")).toMap
    assert(got === Map((10L, 11L) -> 3L, (10L, 12L) -> 1L, (11L, 12L) -> 1L))
  }

  test("triangleCounts: each triangle counted once, per-node rollup") {
    // K4 on {1,2,3,4} (4 triangles, each node in 3) plus a pendant edge
    val edges = (for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)) :+ ((4L, 9L))
    val got = Graphs.triangleCounts(edges.toDF("item_a", "item_b"))
      .collect().map(r => r.getAs[Long]("item") -> r.getAs[Long]("n_triangles")).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("updateCooccurrence: incremental merge equals rebuild") {
    def t(d: Int, h: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    val rows = Seq(
      (1L, t(1, 0), 10L), (1L, t(1, 0), 11L),   // day1 basket {10,11}
      (2L, t(2, 3), 10L), (2L, t(2, 3), 12L),   // day2 basket {10,12}
      (1L, t(5, 1), 10L), (1L, t(5, 1), 11L),   // day5 repeat {10,11}
      (3L, t(6, 2), 11L), (3L, t(6, 2), 12L))   // day6 {11,12}
    val ev = rows.toDF("user_id", "ts", "item")
    val cut = lit("2024-01-04 00:00:00").cast("timestamp")
    def cooc(df: org.apache.spark.sql.DataFrame) =
      Graphs.itemCooccurrence(df, "user_id",
        date_trunc("hour", col("ts")), col("item"), minSupport = 1)
    val incr = Graphs.updateCooccurrence(cooc(ev.filter(col("ts") < cut)),
        ev.filter(col("ts") >= cut), "user_id",
        date_trunc("hour", col("ts")), col("item"))
      .collect().map(r => (r.getAs[Long]("item_a"), r.getAs[Long]("item_b")) ->
        r.getAs[Long]("support")).toMap
    val rebuild = cooc(ev)
      .collect().map(r => (r.getAs[Long]("item_a"), r.getAs[Long]("item_b")) ->
        r.getAs[Long]("support")).toMap
    assert(incr === rebuild)
    assert(incr === Map((10L, 11L) -> 2L, (10L, 12L) -> 1L, (11L, 12L) -> 1L))
  }

  test("recHitRate: hit and miss both scored, no test leakage into pairs") {
    def t(d: Int, h: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    // train: users 1..3 establish 10-11 (sup 2) and 10-12 (sup 1).
    // test: user 1 (history {10,11}) first sees 12 -> recommended via
    // 10-12 support => hit. user 2 (history {10,12}) first sees 99,
    // an item with no train pairs => miss.
    val rows = Seq(
      (1L, t(1, 0), 10L), (1L, t(1, 0), 11L),
      (3L, t(1, 5), 10L), (3L, t(1, 5), 11L),
      (2L, t(2, 0), 10L), (2L, t(2, 0), 12L),
      // test period
      (1L, t(20, 0), 12L), (2L, t(20, 1), 99L), (2L, t(21, 0), 11L))
    val ev = rows.zipWithIndex.map { case ((u, ts, i), e) => (u, ts, e.toLong, i) }
      .toDF("user_id", "ts", "event_id", "item")
    val out = Graphs.recHitRate(ev, "user_id", "ts", "event_id",
        col("item"), date_trunc("hour", col("ts")),
        lit("2024-01-10 00:00:00").cast("timestamp"), k = 2)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("heldout"), Option(r.getAs[Integer]("hit_rank")),
          r.getAs[Boolean]("hit")))).toMap
    assert(out(1L) === ((12L, Some(Integer.valueOf(1)), true)))
    // user 2's heldout is the FIRST unseen test item (99), not 11
    assert(out(2L)._1 === 99L && !out(2L)._3)
    // user 3 has no unseen test event -> not evaluated
    assert(!out.contains(3L))
  }

  test("lastTouchAttribution: latest in-window touch wins, stale ones don't") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-01 00:00:00"), 1L, "click", 0.0),
      (1L, t("2024-01-02 00:00:00"), 2L, "click", 0.0),   // latest touch
      (1L, t("2024-01-03 00:00:00"), 3L, "purchase", 9.5),// -> touch 2
      (2L, t("2024-01-01 00:00:00"), 4L, "click", 0.0),
      (2L, t("2024-01-20 00:00:00"), 5L, "purchase", 3.0),// touch expired
      (3L, t("2024-01-05 00:00:00"), 6L, "view", 0.0),
      (3L, t("2024-01-06 00:00:00"), 7L, "purchase", 1.0) // view ≠ touch
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = Behavior.lastTouchAttribution(ev, "user_id", "ts",
        "event_id", "event_type", "value", "click", "purchase")
      .collect().map(r => r.getAs[Long]("event_id") ->
        ((Option(r.getAs[java.lang.Long]("touch_event_id")),
          r.getAs[Boolean]("attributed")))).toMap
    assert(got(3L) === ((Some(java.lang.Long.valueOf(2L)), true)))
    assert(got(5L) === ((None, false)))
    assert(got(7L) === ((None, false)))
    assert(got.size === 3)
  }

  test("lastTouchAttribution: same-second touch is excluded (strict precede)") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-01 00:00:05"), 1L, "click", 0.0),
      (1L, t("2024-01-01 00:00:05"), 2L, "purchase", 1.0)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = Behavior.lastTouchAttribution(ev, "user_id", "ts",
      "event_id", "event_type", "value", "click", "purchase").collect()
    assert(got.length === 1 && !got.head.getAs[Boolean]("attributed"))
  }

  test("rfmSegments: buckets rank users by each metric independently") {
    def t(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    // user 1: recent + frequent + big spend; user 4: stale lone cheap
    val ev = Seq(
      (1L, t(20), 10.0), (1L, t(21), 10.0), (1L, t(22), 10.0), (1L, t(23), 10.0),
      (2L, t(10), 5.0), (2L, t(11), 5.0),
      (3L, t(5), 2.0), (3L, t(6), 2.0),
      (4L, t(1), 0.5)
    ).toDF("user_id", "ts", "value")
    val got = Behavior.rfmSegments(ev, "user_id", "ts", "value", buckets = 4)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Int]("r"), r.getAs[Int]("f"), r.getAs[Int]("m"),
          r.getAs[String]("segment"), r.getAs[Long]("cents")))).toMap
    assert(got(1L) === ((4, 4, 4, "4-4-4", 4000L)))
    assert(got(4L)._1 === 1 && got(4L)._2 === 1 && got(4L)._3 === 1)
    // f ties (users 2 and 3 both have 2 events) break by user id
    assert(got(2L)._2 === 2 && got(3L)._2 === 3)
  }

  test("seqExamples: session breaks, bounded history, first event skipped") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-01 00:00:00"), 1L, 10L),
      (1L, t("2024-01-01 00:05:00"), 2L, 11L),
      (1L, t("2024-01-01 00:10:00"), 3L, 12L),
      (1L, t("2024-01-01 02:00:00"), 4L, 13L), // > 30 min gap: new session
      (1L, t("2024-01-01 02:01:00"), 5L, 14L),
      (2L, t("2024-01-01 00:00:00"), 6L, 20L)  // lone event: no example
    ).toDF("user_id", "ts", "event_id", "item")
    val out = SeqData.seqExamples(ev, "user_id", "ts", "event_id",
        col("item"), gapSec = 1800, maxHistory = 2, negK = 2, nItems = 50)
      .orderBy(col("user_id"), col("session_id"), col("pos")).collect()
    val rows = out.map(r => (r.getAs[Long]("user_id"),
      r.getAs[Long]("session_id"), r.getAs[Int]("pos"),
      r.getAs[String]("history"), r.getAs[Long]("label")))
    assert(rows.toSeq === Seq(
      (1L, 1L, 2, "10", 11L),
      (1L, 1L, 3, "10,11", 12L),   // maxHistory 2 keeps both
      (1L, 2L, 2, "13", 14L)))     // session reset: history restarts
    // negatives: deterministic, in range, negK of them
    val negs = out.map(_.getAs[String]("negatives"))
    assert(negs.forall(_.split(",").map(_.toLong).forall(n => n >= 0 && n < 50)))
    assert(negs.forall(_.split(",").length === 2))
    val again = SeqData.seqExamples(ev, "user_id", "ts", "event_id",
        col("item"), gapSec = 1800, maxHistory = 2, negK = 2, nItems = 50)
      .orderBy(col("user_id"), col("session_id"), col("pos"))
      .collect().map(_.getAs[String]("negatives"))
    assert(again.toSeq === negs.toSeq)
  }

  test("seqExamples: history window truncates to maxHistory") {
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = (0 until 6).map(i => (1L, t(i), i.toLong, 100L + i))
      .toDF("user_id", "ts", "event_id", "item")
    val last = SeqData.seqExamples(ev, "user_id", "ts", "event_id",
        col("item"), maxHistory = 3, negK = 0)
      .orderBy(col("pos").desc).limit(1).collect().head
    assert(last.getAs[String]("history") === "102,103,104")
    assert(last.getAs[Long]("label") === 105L)
  }

  test("sourceDiversity: template source scores lower than diverse source") {
    val diverse = (0L until 20L).map(i =>
      (i, "a", s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i"))
    val template = (20L until 40L).map(i =>
      (i, "b", "same exact template text every single time here"))
    val df = (diverse ++ template).toDF("id", "src", "text")
    val out = TextAnalysis.sourceDiversity(df, "id", "src", "text")
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_grams"),
          r.getAs[Long]("n_distinct"), r.getAs[Double]("diversity")))).toMap
    assert(out("a")._1 === 20L && out("b")._1 === 20L)
    // a: 6 tokens -> 4 trigrams per doc; b: 8 tokens -> 6 trigrams
    assert(out("a")._2 === 80L && out("b")._2 === 120L)
    assert(out("a")._3 === 80L)  // all distinct
    assert(out("b")._3 === 6L)   // one template's trigrams
    assert(out("a")._4 === 1.0 && out("b")._4 === 0.05)
  }
}
