package graft

import graft.ops.{Behavior, Profile}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 part 24: quantile rank, seasonal index. */
class Round8xSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("quantileRank: percent-rank over distinct values with ties") {
    val df = Seq(("a", 10L), ("a", 10L), ("a", 20L), ("a", 40L), ("a", 40L))
      .toDF("g", "x")
    val r = Profile.quantileRank(df, col("g"), col("x"))
      .orderBy(col("value_cents")).collect()
    // n=5 → denominator 4; below-counts 0, 2, 3
    assert(r.map(_.getAs[Double]("pct_rank")).toSeq ===
      Seq(0.0, 0.5, 0.75))
    assert(r.map(_.getAs[Long]("n")).toSeq === Seq(2L, 1L, 2L))
  }

  test("quantileRank: single-row group → NULL rank") {
    val df = Seq(("a", 7L)).toDF("g", "x")
    val r = Profile.quantileRank(df, col("g"), col("x")).head()
    assert(r.isNullAt(r.fieldIndex("pct_rank")))
  }

  test("seasonalIndex: hot weekday indexes above 1, partial weeks unbiased") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // 2024-01-01 Mon, -02 Tue, -08 Mon: type 'a' fires 4x on Mondays
    // (2 active Mondays → 2/day) and 1x on the single Tuesday (1/day);
    // overall 5 events over 3 active days
    val ev = Seq(t("2024-01-01 10:00:00"), t("2024-01-01 11:00:00"),
      t("2024-01-08 10:00:00"), t("2024-01-08 11:00:00"),
      t("2024-01-02 10:00:00")).map(("a", _)).toDF("event_type", "ts")
    val r = Behavior.seasonalIndex(ev, "event_type", "ts")
      .orderBy(col("dow")).collect()
    val mon = r.find(_.getAs[Long]("dow") == 2L).get
    val tue = r.find(_.getAs[Long]("dow") == 3L).get
    assert(mon.getAs[Long]("days_dow") === 2L)
    assert(mon.getAs[Double]("seasonal_index") === 1.2)  // (4/2)/(5/3)
    assert(tue.getAs[Double]("seasonal_index") === 0.6)  // (1/1)/(5/3)
  }
}
