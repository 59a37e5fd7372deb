package graft

import graft.ops.{Behavior, Graphs, Profile}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 part 12: calibration, association rules, Kaplan-Meier. */
class Round8lSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("calibration: hand case — two bins, exact integer-grid ECE") {
    // bin 9: scores 0.9/0.9 both positive → gap |1.8M − 2M| = 0.2M
    // bin 1: scores 0.1/0.1 one positive → gap |0.2M − 1M| = 0.8M
    // ECE = (0.2M + 0.8M) / (4 · 1M) = 0.25
    val df = Seq((0.9, true), (0.9, true), (0.1, false), (0.1, true))
      .toDF("s", "y")
    val r = Profile.calibration(df, col("s"), col("y"))
      .orderBy(col("bin")).collect()
    assert(r.map(_.getAs[Long]("bin")).toSeq === Seq(1L, 9L))
    assert(r(0).getAs[Double]("mean_pred") === 0.1)
    assert(r(0).getAs[Double]("frac_pos") === 0.5)
    assert(r(0).getAs[Long]("gap_micro") === 800000L)
    assert(r(1).getAs[Double]("frac_pos") === 1.0)
    assert(r.forall(_.getAs[Double]("ece") === 0.25))
  }

  test("calibration: score 1.0 lands in the top bin, not bin `bins`") {
    val df = Seq((1.0, true)).toDF("s", "y")
    val r = Profile.calibration(df, col("s"), col("y")).head()
    assert(r.getAs[Long]("bin") === 9L)
    assert(r.getAs[Double]("ece") === 0.0)
  }

  test("associationRules: hand baskets — confidence directional, lift symmetric") {
    val ev = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
      (3L, 2L), (3L, 3L)).toDF("u", "item")
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
    val r = Graphs.associationRules(ev, "u", date_trunc("hour", col("ts")),
        col("item"), minSupport = 2)
      .orderBy(col("antecedent"), col("consequent")).collect()
    // frequent pairs: (1,2) s=2, (2,3) s=2 → 4 directed rules
    assert(r.length === 4)
    val r12 = r.find(x => x.getAs[Long]("antecedent") == 1L &&
      x.getAs[Long]("consequent") == 2L).get
    assert(r12.getAs[Long]("support") === 2L)
    assert(r12.getAs[Double]("confidence") === 1.0)      // 2 / n(1)=2
    assert(r12.getAs[Double]("lift") === 1.0)            // 2·3/(2·3)
    assert(r12.getAs[Double]("leverage") === 0.0)
    val r21 = r.find(x => x.getAs[Long]("antecedent") == 2L &&
      x.getAs[Long]("consequent") == 1L).get
    assert(r21.getAs[Double]("confidence") === 0.666667) // 2 / n(2)=3
    assert(r21.getAs[Double]("lift") === 1.0)            // symmetric
  }

  test("kaplanMeier: hand case — censoring keeps the curve flat") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // obs end 01-11. C: t=0 churned; B: t=3 churned (end−last = 7);
    // A: t=10 censored (end−last = 0) → S(0)=2/3, S(3)=1/3, S(10)=1/3
    val ev = Seq(
      (1L, t("2024-01-01 08:00:00")), (1L, t("2024-01-11 09:00:00")),
      (2L, t("2024-01-01 10:00:00")), (2L, t("2024-01-04 11:00:00")),
      (3L, t("2024-01-01 12:00:00"))
    ).toDF("user_id", "ts")
    val r = Behavior.kaplanMeier(ev, "user_id", "ts", censorDays = 7)
      .orderBy(col("t")).collect()
    assert(r.map(_.getAs[Long]("t")).toSeq === Seq(0L, 3L, 10L))
    assert(r.map(_.getAs[Long]("n_risk")).toSeq === Seq(3L, 2L, 1L))
    assert(r.map(_.getAs[Long]("n_churn")).toSeq === Seq(1L, 1L, 0L))
    assert(r.map(_.getAs[Double]("survival")).toSeq ===
      Seq(0.666667, 0.333333, 0.333333))
  }
}
