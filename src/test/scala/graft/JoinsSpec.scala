package graft

import graft.ops.Joins
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of and range join semantics against hand-computed answers and
  * the naive formulations.
  */
class JoinsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(min * 60000L)

  test("backward as-of join: latest prior row, inclusive ties, null when none") {
    val left = Seq(
      (1L, ts(10), 100L), (2L, ts(20), 100L), (3L, ts(5), 100L),
      (4L, ts(30), 200L)
    ).toDF("event_id", "t", "user")
    val right = Seq(
      (91L, ts(8), 100L), (92L, ts(20), 100L), // tie with event 2 → inclusive
      (93L, ts(40), 200L)                      // after event 4 → no match
    ).toDF("rid", "t", "user")
    val got = Joins.asofJoinBackward(left, right, "user", "t", Seq("rid"))
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(got.toSeq == Seq((1L, 91L), (2L, 92L), (3L, -1L), (4L, -1L)))
  }

  test("as-of join on events equals the per-row subquery model") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id"), col("ts"), col("user_id"))
    val got = Joins.asofJoinBackward(purchases, errors, "user_id", "ts", Seq("event_id"))
      .select("event_id", "asof_event_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // brute-force model on collected rows
    val ps = purchases.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val es = errors.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    ps.foreach { case (pid, pts, puser) =>
      val want = es.filter(e => e._3 == puser && !e._2.after(pts))
        .sortBy(e => (e._2.getTime, e._1)).lastOption.map(_._1).getOrElse(-1L)
      assert(got(pid) == want, s"purchase $pid")
    }
    assert(ps.nonEmpty && got.values.exists(_ != -1L))
  }

  test("binned range join equals the naive inequality join") {
    val points = (1 to 500).map(i => (i.toLong, i * 7.3 % 997)).toDF("pid", "p")
    val ranges = (1 to 50).map(i => (i.toLong, i * 13.1 % 500, i * 13.1 % 500 + 120.0))
      .toDF("rid", "lo", "hi")
    val naive = points.join(ranges, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val binned = Joins.pointInRangeJoin(points, ranges, "p", "lo", "hi", binWidth = 100)
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive && naive.nonEmpty)
  }

  test("binned range join plans an equi-join, not a nested loop") {
    val points = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("pid", "p")
    val ranges = Seq((1L, 10.0, 20.0)).toDF("rid", "lo", "hi")
    val plan = Joins.pointInRangeJoin(points, ranges, "p", "lo", "hi", 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("as-of join attaches the latest right row even when its payload is NULL") {
    val left = Seq((1L, ts(10), 100L)).toDF("event_id", "t", "user")
    val right = Seq(
      (Some(91L), ts(2), 100L), (Option.empty[Long], ts(8), 100L) // later row, null payload
    ).toDF("rid", "t", "user")
    val r = Joins.asofJoinBackward(left, right, "user", "t", Seq("rid"))
      .collect().head
    // latest right row (t=8) wins; its NULL payload must NOT be replaced
    // by the stale t=2 value
    assert(r.isNullAt(r.fieldIndex("asof_rid")))
  }
}
