package graft

import graft.ops.{Graphs, TimeSeries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 part 2: link prediction + hub audit + rolling trend. */
class Round11bSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def edges(ps: (Long, Long)*) =
    ps.toDF("item_a", "item_b")

  test("linkPrediction: common-neighbor count ranks, existing edges excluded") {
    // path graph 1-2-3 plus 4 attached to 2: non-adjacent pairs through
    // center 2: (1,3) cn=1, (1,4) cn=1, (3,4) cn=1; through 1/3/4: none
    val got = Graphs.linkPrediction(
        edges((1L, 2L), (2L, 3L), (2L, 4L)), maxDeg = 64, k = 5)
      .orderBy("node", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // node 1 predicts 3 and 4 (cn 1 each, pa ties 1*... deg1=1,deg3=1,deg4=1
    // -> pa all 1, id tie-break), etc.
    assert(got === Seq(
      (1L, 3L, 1L), (1L, 4L, 1L),
      (3L, 1L, 1L), (3L, 4L, 1L),
      (4L, 1L, 1L), (4L, 3L, 1L)))
  }

  test("linkPrediction: cn=2 outranks cn=1; preferential attachment breaks cn ties") {
    // square 1-2-3-4-1: (1,3) share {2,4} cn=2; (2,4) share {1,3} cn=2.
    // add pendant 5-1: (5,2) and (5,4) share {1} cn=1; pa(5,2)=1*2=2 ...
    val e = edges((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 5L))
    val got = Graphs.linkPrediction(e, maxDeg = 64, k = 2)
      .orderBy("node", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val byNode = got.groupBy(_._1)
    // node 1's best is 3 (cn=2); node 5's candidates 2 and 4 tie on
    // cn=1 and pa=1*2, so the id tie-break puts 2 first
    assert(byNode(1L).head === (1L, 3L, 2L, 6L)) // pa = deg(1)*deg(3) = 3*2
    assert(byNode(5L).map(t => t._2) === Seq(2L, 4L))
  }

  test("linkPrediction: a hub above maxDeg stops mediating but stays predictable") {
    // star center 0 with leaves 1..5 (deg 5 > maxDeg 4): without the
    // cap every leaf pair is a candidate; with it, no wedges exist
    val star = (1L to 5L).map(l => (0L, l))
    assert(Graphs.linkPrediction(edges(star: _*), maxDeg = 4, k = 3)
      .count() === 0L)
    // add a low-degree second center linking 1 and 2: that wedge
    // survives — and the hub 0 itself gets predicted THROUGH the
    // low-degree centers 1 and 2 (both see {0, 9}), exactly the
    // "endpoints stay eligible" contract
    val got = Graphs.linkPrediction(
        edges(star :+ (1L, 9L) :+ (2L, 9L): _*), maxDeg = 4, k = 3)
      .select("node", "other").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got === Seq((0L, 9L), (1L, 2L), (2L, 1L), (9L, 0L)))
  }

  test("hubAudit counts dropped centers and the edges touching them") {
    val star = (1L to 5L).map(l => (0L, l))
    val r = Graphs.hubAudit(edges(star :+ (1L, 2L): _*), maxDeg = 4).head()
    assert(r.getLong(0) === 1L) // node 0
    assert(r.getLong(1) === 5L) // nodes 1..5 kept
    assert(r.getLong(2) === 5L) // the five star edges
  }

  test("rollingTrend: exact OLS slope over the trailing window; head rows have fewer obs") {
    // one key, counts 1,3,5 on days d..d+2: slope 2 exactly
    val base = 19000L * 86400L
    val ev = Seq.tabulate(9) { i => // day j gets j*2+1 events
      val day = i match { case x if x < 1 => 0; case x if x < 4 => 1; case _ => 2 }
      (s"e$i", "t", new java.sql.Timestamp((base + day * 86400L) * 1000L))
    }.toDF("event_id", "event_type", "ts")
    val got = TimeSeries.rollingTrend(ev, "ts", "event_type", window = 7)
      .orderBy("day_idx").collect()
    assert(got.map(_.getLong(3)).toSeq === Seq(1L, 2L, 3L)) // n_obs grows
    assert(got(0).isNullAt(4)) // single point: no slope
    assert(got(1).getDouble(4) === 2.0) // (1,3): slope 2
    assert(got(2).getDouble(4) === 2.0) // (1,3,5): exact OLS slope 2
    assert(got(2).getDouble(5) === 3.0) // mean level (1+3+5)/3
  }

  test("linkPrediction matches a brute-force reference on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      val n = 10 + rnd.nextInt(8)
      val es = (for {
        a <- 1 to n; b <- a + 1 to n if rnd.nextInt(4) == 0
      } yield (a.toLong, b.toLong)).toSeq
      if (es.nonEmpty) {
        val maxDeg = 2 + rnd.nextInt(4)
        val k = 1 + rnd.nextInt(3)
        val adj: Map[Long, Set[Long]] = {
          val m = scala.collection.mutable.Map[Long, Set[Long]]()
            .withDefaultValue(Set.empty)
          es.foreach { case (a, b) => m(a) += b; m(b) += a }
          m.toMap.withDefaultValue(Set.empty)
        }
        val deg = adj.map { case (v, s) => v -> s.size.toLong }
          .withDefaultValue(0L)
        val centers = adj.keySet.filter(v => deg(v) <= maxDeg)
        val nodes = adj.keySet
        val cand = for {
          u <- nodes.toSeq; v <- nodes.toSeq
          if u < v && !adj(u).contains(v)
          cn = (adj(u) & adj(v) & centers).size.toLong
          if cn > 0
        } yield (u, v, cn, deg(u) * deg(v))
        val expected = (cand ++ cand.map(c => (c._2, c._1, c._3, c._4)))
          .groupBy(_._1).toSeq.flatMap { case (node, cs) =>
            cs.map(c => (node, c._2, c._3, c._4))
              .sortBy(c => (-c._3, -c._4, c._2)).take(k)
              .zipWithIndex.map { case (c, i) => (c._1, c._2, c._3, c._4, i + 1) }
          }.sorted
        val got = Graphs.linkPrediction(es.toDF("item_a", "item_b"),
            maxDeg = maxDeg, k = k)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getInt(4))).toSeq.sorted
        assert(got === expected, s"trial=$trial maxDeg=$maxDeg k=$k")
      }
    }
  }

  test("rollingTrend matches a naive exact-OLS reference on random series") {
    val rnd = new scala.util.Random(7)
    val w = 4
    val rows = for {
      key <- Seq("a", "b", "c")
      day <- (0 until 15).filter(_ => rnd.nextInt(3) > 0) // gaps
    } yield (key, 19000L + day, 1 + rnd.nextInt(50))
    val ev = rows.flatMap { case (key, day, cnt) =>
      Seq.fill(cnt)((s"${key}_$day", key,
        new java.sql.Timestamp(day * 86400L * 1000L)))
    }.toDF("event_id", "event_type", "ts")
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (key, ks) =>
      val sorted = ks.sortBy(_._2)
      sorted.indices.map { i =>
        val win = sorted.slice(math.max(0, i - w + 1), i + 1)
        val cnt = win.size.toLong
        val sx = win.map(_._2).sum
        val sy = win.map(_._3.toLong).sum
        val sxy = win.map(r => r._2 * r._3).sum
        val sxx = win.map(r => r._2 * r._2).sum
        val den = cnt * sxx - sx * sx
        val slope = if (den > 0)
          Some(r6((cnt * sxy - sx * sy).toDouble / den.toDouble)) else None
        (key, sorted(i)._2, sorted(i)._3.toLong, cnt, slope,
          r6(sy.toDouble / cnt.toDouble))
      }
    }.sorted
    val got = TimeSeries.rollingTrend(ev, "ts", "event_type", window = w)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        r.getDouble(5))).toSeq.sorted
    assert(got === expected)
  }

  test("rollingTrend windows are key-partitioned (no global sort)") {
    val ev = Seq(("a", "x", new java.sql.Timestamp(0L)),
      ("b", "y", new java.sql.Timestamp(86400000L)))
      .toDF("event_id", "event_type", "ts")
    val plan = TimeSeries.rollingTrend(ev, "ts", "event_type", 7)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("windowspecdefinition(day_idx"))
    assert(plan.contains("windowspecdefinition(k"))
  }
}
