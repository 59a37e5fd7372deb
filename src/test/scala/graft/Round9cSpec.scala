package graft

import graft.ops.{MasterData, Skew}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 part 3: CDC apply, PIT lookup, join-size audit. */
class Round9cSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("cdcApply: last writer wins, deletes drop, inserts land, silence keeps") {
    val snap = Seq((1L, "A"), (2L, "B"), (3L, "C"), (4L, "D"))
      .toDF("key", "attr")
    val log = Seq(
      (1L, "A2", 10L, "U"), (1L, "A1", 5L, "U"), // latest wins: A2
      (2L, null.asInstanceOf[String], 10L, "D"), // deleted
      (3L, "C1", 5L, "U"), (3L, null.asInstanceOf[String], 10L, "D"),
      (5L, "E", 1L, "I") // insert unknown key
    ).toDF("key", "attr", "seq", "op")
    val out = MasterData.cdcApply(snap, log).orderBy("key").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((1L, "A2"), (4L, "D"), (5L, "E")))
  }

  test("scd2Lookup: each fact joins the version valid at its ts") {
    val dim = Seq(
      (1L, "old", 0L, Some(100L), false),
      (1L, "new", 100L, None, true),
      (2L, "only", 50L, None, true)
    ).toDF("key", "attr", "valid_from", "valid_to", "is_current")
    val facts = Seq((1L, 99L), (1L, 100L), (2L, 10L), (9L, 10L))
      .toDF("key", "ts")
    val out = MasterData.scd2Lookup(facts, dim)
      .orderBy("key", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
    assert(out.toSeq === Seq(
      (1L, 99L, Some("old")),  // inside [0, 100)
      (1L, 100L, Some("new")), // boundary belongs to the new version
      (2L, 10L, None),         // before key 2's history begins
      (9L, 10L, None)))        // unknown key survives with NULL
  }

  test("joinSizeAudit: exact per-key output rows and shares, no join run") {
    val left = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")
    val right = Seq(1L, 1L, 2L, 4L).toDF("k")
    val out = Skew.joinSizeAudit(left, "k", right, "k", k = 10)
      .orderBy("rank").collect()
    // key 1: 3*2=6 rows, key 2: 1*1=1; total 7; key 3/4 unmatched
    assert(out.map(r => (r.getAs[Int]("rank"), r.getAs[Long]("key"),
      r.getAs[Long]("n_out"), r.getAs[Double]("share"))).toSeq ===
      Seq((1, 1L, 6L, math.rint(6.0 / 7.0 * 1e6) / 1e6),
        (2, 2L, 1L, math.rint(1.0 / 7.0 * 1e6) / 1e6)))
  }

  test("joinSizeAudit: top-k rank compiles to a TakeOrdered pushdown") {
    // the unpartitioned rank window is audit-whitelisted because
    // LimitPushDownThroughWindow turns filter(rank <= k) into a
    // distributed TakeOrderedAndProject(limit=k) BELOW the window, so
    // the final window runs on exactly k rows — assert it fires
    val df = Skew.joinSizeAudit(
      spark.range(1000).toDF("k"), "k",
      spark.range(1000).toDF("k"), "k", k = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject(limit=5"), plan)
  }
}
