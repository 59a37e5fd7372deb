package graft

import graft.ops.{Behavior, Profile}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 part 1: cohort retention, winsorized stats, CUSUM. */
class Round9aSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("cohortRetention: matrix counts cohort actives by week offset") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-08 10:00:00"),
      (2L, "2024-01-02 09:00:00"),
      (3L, "2024-01-09 23:00:00")
    ).toDF("user_id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val out = Behavior.cohortRetention(ev, "user_id", "ts")
      .orderBy("cohort_wk", "week_offset").collect()
    val w0 = out.head.getAs[Long]("cohort_wk")
    assert(out.map(r => (r.getAs[Long]("cohort_wk") - w0,
      r.getAs[Long]("week_offset"), r.getAs[Long]("n_active"),
      r.getAs[Long]("cohort_size"), r.getAs[Double]("retention"))).toSeq ===
      Seq((0L, 0L, 2L, 2L, 1.0), (0L, 1L, 1L, 2L, 0.5),
        (1L, 0L, 1L, 1L, 1.0)))
  }

  test("cohortRetention: repeat events within a week count once") {
    val ev = Seq((1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 11:00:00"),
      (1L, "2024-01-03 10:00:00")).toDF("user_id", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Behavior.cohortRetention(ev, "user_id", "ts").collect()
    assert(out.length === 1 && out.head.getAs[Long]("n_active") === 1L)
  }

  test("winsorizedStats: rank-based global clip, per-group counts") {
    // cents sorted: 100, 200..1000, 10000; N=11, tailFrac=0.1 ->
    // k=ceil(1.1)=2 -> lo = 2nd smallest = 200, hi = 2nd largest = 1000
    val df = ((1 to 10).map(i => ("a", i.toDouble)) :+ ("b", 100.0))
      .toDF("g", "v")
    val out = Profile.winsorizedStats(df, "g", "v", tailFrac = 0.1)
      .orderBy("grp").collect()
    val a = out(0); val b = out(1)
    assert(a.getAs[Long]("lo_cents") === 200L)
    assert(a.getAs[Long]("hi_cents") === 1000L)
    assert(a.getAs[Long]("n_clip_lo") === 1L)
    assert(a.getAs[Long]("n_clip_hi") === 0L)
    assert(a.getAs[Long]("sum_cents_winsor") === 5600L) // 100->200
    assert(b.getAs[Long]("n_clip_hi") === 1L)
    assert(b.getAs[Long]("sum_cents_winsor") === 1000L) // 10000->1000
  }

  test("cusumChangepoint: closed prefix form equals the recursion") {
    // 4 days of 10 events then 4 days of 20: dev = n*8-120 = -40/+40
    val rows = for {
      d <- 0 until 8
      i <- 0 until (if (d < 4) 10 else 20)
    } yield (d.toLong * 10000 + i, s"2024-01-0${d + 1} 12:00:00")
    val ev = rows.toDF("event_id", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Behavior.cusumChangepoint(ev, "ts", alarmMeanDays = 1)
      .orderBy("day_idx").collect()
    assert(out.map(_.getAs[Long]("cusum_pos")).toSeq ===
      Seq(0L, 0L, 0L, 0L, 40L, 80L, 120L, 160L))
    assert(out.map(_.getAs[Long]("cusum_neg")).toSeq ===
      Seq(40L, 80L, 120L, 160L, 120L, 80L, 40L, 0L))
    // recursion replay: S+ = max(0, S+ + dev), S- = max(0, S- - dev)
    val devs = out.map(r => r.getAs[Long]("n") * 8 - 120)
    val sPos = devs.scanLeft(0L)((s, d) => math.max(0L, s + d)).tail
    val sNeg = devs.scanLeft(0L)((s, d) => math.max(0L, s - d)).tail
    assert(out.map(_.getAs[Long]("cusum_pos")).toSeq === sPos.toSeq)
    assert(out.map(_.getAs[Long]("cusum_neg")).toSeq === sNeg.toSeq)
    // h = 1 mean-day = 120 scaled units
    assert(out.map(_.getAs[Boolean]("alarm_pos")).toSeq ===
      Seq(false, false, false, false, false, false, false, true))
    assert(out.map(_.getAs[Boolean]("alarm_neg")).toSeq ===
      Seq(false, false, false, true, false, false, false, false))
  }
}
