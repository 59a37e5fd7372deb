package graft

import graft.ops.Behavior
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 part 21: bot flags, peak hours. */
class Round8uSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("botFlags: machine-gun user flagged fast+burst, human user clean") {
    val bot = (0 until 150).map(i =>
      (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        1704456000L + i))))
    val human = (0 until 10).map(i =>
      (2L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        1704456000L + i * 3600L))))
    val ev = (bot ++ human).toDF("user_id", "ts")
    val r = Behavior.botFlags(ev, "user_id", "ts").collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("user_id") === 1L)
    assert(r(0).getAs[Double]("median_gap_s") === 1.0)
    assert(r(0).getAs[Double]("fast_frac") === 1.0)
    assert(r(0).getAs[Long]("max_events_hour") === 150L)
    assert(r(0).getAs[String]("reason") === "fast+burst")
  }

  test("botFlags: burst without fast gaps gets the burst reason") {
    // 120 events in one hour but 30 s apart (not 'fast')
    val ev = (0 until 120).map(i =>
      (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        1704456000L + i * 30L)))).toDF("user_id", "ts")
    val r = Behavior.botFlags(ev, "user_id", "ts").collect()
    assert(r.length === 1)
    assert(r(0).getAs[String]("reason") === "burst")
  }

  test("peakHours: argmax with hour tie-break, exact share") {
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-01 $h%02d:$m%02d:00")
    val ev = Seq(("a", t(9, 0)), ("a", t(9, 30)), ("a", t(14, 0)),
      ("b", t(3, 0)), ("b", t(7, 0))).toDF("event_type", "ts")
    val r = Behavior.peakHours(ev, "event_type", "ts")
      .orderBy(col("event_type")).collect()
    assert(r(0).getAs[Long]("peak_hour") === 9L)
    assert(r(0).getAs[Double]("peak_share") === 0.666667)
    assert(r(1).getAs[Long]("peak_hour") === 3L) // tie 1-1 → lower hour
  }
}
