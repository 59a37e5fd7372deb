package graft

import graft.ops.{Behavior, TimeSeries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 part 5: funnel, EWMA anomaly bands, ACF. */
class Round10eSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("user_id", "es", "event_type")
      .select(col("user_id"), to_timestamp(from_unixtime(col("es"))).as("ts"),
        col("event_type"))

  test("funnelSteps: complete, partial, out-of-window, and out-of-order users") {
    val df = ev(
      // u1: full funnel in order, inside the window
      (1L, 100L, "a"), (1L, 200L, "b"), (1L, 300L, "c"),
      // u2: reaches b only (no c at all)
      (2L, 100L, "a"), (2L, 150L, "b"),
      // u3: c happens BEFORE b -> step c not reached
      (3L, 100L, "a"), (3L, 500L, "b"), (3L, 400L, "c"),
      // u4: b outside the 1000s window from a
      (4L, 100L, "a"), (4L, 2000L, "b"),
      // u5: never signs up -> not in the funnel at all
      (5L, 100L, "b"), (5L, 200L, "c"))
    val got = Behavior.funnelSteps(df, "user_id", "ts", "event_type",
        Seq("a", "b", "c"), windowSec = 1000L)
      .orderBy("step_idx").collect()
    assert(got.map(_.getLong(2)).toSeq === Seq(4L, 3L, 1L))
    // conv_prev: null, 3/4, 1/3
    assert(got(0).isNullAt(3))
    assert(got(1).getDouble(3) === 0.75)
    assert(got(2).getDouble(3) === 0.333333)
    // conv_first: 1, 3/4, 1/4
    assert(got(0).getDouble(4) === 1.0)
    assert(got(2).getDouble(4) === 0.25)
  }

  test("funnelSteps: a repeated later first-step event does not reopen the window") {
    // u1 signs up at 100 and again at 5000; b at 5100 is outside
    // 100+1000 -> not counted (the funnel anchors on the FIRST a)
    val df = ev((1L, 100L, "a"), (1L, 5000L, "a"), (1L, 5100L, "b"))
    val got = Behavior.funnelSteps(df, "user_id", "ts", "event_type",
        Seq("a", "b"), windowSec = 1000L)
      .orderBy("step_idx").collect()
    assert(got.map(_.getLong(2)).toSeq === Seq(1L, 0L))
  }

  private def series(key: String, counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (n, day) =>
      (0 until n).map(i => (1L, day * 86400L + i, key))
    }

  test("ewmaDaily: first-day baseline is null, constant series never flags") {
    val df = ev(series("x", Seq(4, 4, 4, 4)): _*)
    val got = TimeSeries.ewmaDaily(df, "ts", "event_type", lookback = 2)
      .orderBy("day_idx").collect()
    assert(got.length === 4)
    assert(got(0).isNullAt(4) && !got(0).getBoolean(5))
    got.foreach { r => assert(r.getDouble(3) === 4.0) }
    assert(got.drop(1).forall(r => r.getDouble(4) === 4.0))
    assert(got.forall(r => !r.getBoolean(5)))
  }

  test("ewmaDaily: a spike beyond the threshold flags; hand-checked weights") {
    // counts 2,2,8 with L=2, alpha=1/4: weights (16,12,9)
    // day3 ewma_prev = (16*2 + 12*2)/(16+12) = 2.0; |8-2|/2 = 3 > 1/2
    val df = ev(series("x", Seq(2, 2, 8)): _*)
    val got = TimeSeries.ewmaDaily(df, "ts", "event_type", lookback = 2)
      .orderBy("day_idx").collect()
    assert(got(2).getDouble(4) === 2.0)
    assert(got(2).getBoolean(5))
    // day3 ewma = (16*8 + 12*2 + 9*2)/37
    assert(got(2).getDouble(3) === math.rint((16 * 8 + 12 * 2 + 9 * 2) / 37.0 * 1e6) / 1e6)
  }

  test("acfDaily: alternating series has acf -1 at lag 1 and +1 at lag 2") {
    val df = ev(series("x", Seq(1, 5, 1, 5, 1, 5, 1, 5)): _*)
    val got = TimeSeries.acfDaily(df, "ts", "event_type", maxLag = 2)
      .orderBy("lag").collect()
    assert(got.map(_.getInt(1)).toSeq === Seq(1, 2))
    assert(got(0).getDouble(3) === -1.0)
    assert(got(1).getDouble(3) === 1.0)
    assert(got(0).getLong(2) === 7L && got(1).getLong(2) === 6L)
  }

  test("acfDaily: zero-variance series yields null acf, pairs still counted") {
    val df = ev(series("x", Seq(3, 3, 3, 3)): _*)
    val got = TimeSeries.acfDaily(df, "ts", "event_type", maxLag = 1).collect()
    assert(got.length === 1)
    assert(got(0).isNullAt(3) && got(0).getLong(2) === 3L)
  }

  test("ewmaDaily and acfDaily keep every window partitioned by the series key") {
    val df = ev((series("x", Seq(2, 3)) ++ series("y", Seq(4, 1))): _*)
    for (plan <- Seq(
        TimeSeries.ewmaDaily(df, "ts", "event_type", lookback = 3),
        TimeSeries.acfDaily(df, "ts", "event_type", maxLag = 2))) {
      val s = plan.queryExecution.optimizedPlan.toString
      assert(!s.contains("windowspecdefinition(day_idx"))
      plan.collect() // and they execute
    }
  }
}
