package graft

import graft.ops.{Behavior, Profile, Sketches}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 part 9: count-min sketch, exact ROC-AUC, Cohen's kappa,
  * time-decayed value.
  */
class Round8iSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("countMin: every row's total equals n, estimates dominate truth") {
    val df = (1 to 300).map(i => i % 37).toDF("v") // skewed small key space
    val sk = Sketches.countMin(df, "v", depth = 3, widthHexChars = 1)
    // each depth row partitions the mass: per-d totals = 300
    val totals = sk.groupBy("d").agg(sum("cnt").as("t")).collect()
    assert(totals.length === 3 && totals.forall(_.getAs[Long]("t") === 300L))
    // CMS guarantee: est >= true for EVERY value, not just the top-N
    val audit = Sketches.countMinAudit(sk, df, "v",
      topN = 37, depth = 3, widthHexChars = 1)
    val rows = audit.collect()
    assert(rows.length === 37)
    assert(rows.forall(r => r.getAs[Long]("est_cnt") >= r.getAs[Long]("true_cnt")))
    assert(rows.forall(_.getAs[Long]("overestimate") >= 0L))
  }

  test("countMin: width-1 hex (16 buckets) forces visible collisions") {
    val df = (1 to 64).toDF("v") // 64 distinct into 16 buckets
    val audit = Sketches.countMinAudit(
      Sketches.countMin(df, "v", depth = 2, widthHexChars = 1),
      df, "v", topN = 64, depth = 2, widthHexChars = 1)
    assert(audit.filter(col("overestimate") > 0).count() > 0)
  }

  test("rocAuc: perfect separation → 1, reversed → 0, ties → 0.5 credit") {
    val perfect = Seq(("g", 1.0, false), ("g", 2.0, false),
      ("g", 3.0, true), ("g", 4.0, true)).toDF("src", "s", "y")
    def auc(df: org.apache.spark.sql.DataFrame): Double =
      Profile.rocAuc(df, col("src"), col("s"), col("y"))
        .head().getAs[Double]("auc")
    assert(auc(perfect) === 1.0)
    val reversed = Seq(("g", 1.0, true), ("g", 2.0, true),
      ("g", 3.0, false), ("g", 4.0, false)).toDF("src", "s", "y")
    assert(auc(reversed) === 0.0)
    // all scores equal: every pos/neg pair ties → AUC exactly 0.5
    val allTied = Seq(("g", 1.0, true), ("g", 1.0, false),
      ("g", 1.0, true), ("g", 1.0, false)).toDF("src", "s", "y")
    assert(auc(allTied) === 0.5)
    // hand case: scores 1,2,2,3 labels F,F,T,T → pairs: (2,1)win,(2,2)tie,
    // (3,1)win,(3,2)win → (3 + 0.5)/4 = 0.875
    val hand = Seq(("g", 1.0, false), ("g", 2.0, false),
      ("g", 2.0, true), ("g", 3.0, true)).toDF("src", "s", "y")
    assert(auc(hand) === 0.875)
  }

  test("rocAuc: groups are independent") {
    val df = Seq(("a", 1.0, false), ("a", 2.0, true),
      ("b", 1.0, true), ("b", 2.0, false)).toDF("src", "s", "y")
    val m = Profile.rocAuc(df, col("src"), col("s"), col("y"))
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Double]("auc")).toMap
    assert(m("a") === 1.0 && m("b") === 0.0)
  }

  test("raterAgreement: hand-computed confusion and kappa") {
    // 10 rows: 4 both-keep, 3 both-drop, 2 a-only, 1 b-only
    val rows = Seq.fill(4)((true, true)) ++ Seq.fill(3)((false, false)) ++
      Seq.fill(2)((true, false)) ++ Seq.fill(1)((false, true))
    val got = Profile.raterAgreement(rows.toDF("a", "b"), col("a"), col("b")).head()
    assert(got.getAs[Long]("n") === 10L)
    assert(got.getAs[Long]("n_both_keep") === 4L)
    assert(got.getAs[Long]("n_a_only") === 2L)
    assert(got.getAs[Long]("n_b_only") === 1L)
    assert(got.getAs[Long]("n_both_drop") === 3L)
    // po = 0.7; pa = 0.6, pb = 0.5 → pe = 0.3 + 0.2 = 0.5; kappa = 0.4
    assert(got.getAs[Double]("p_o") === 0.7)
    assert(got.getAs[Double]("p_e") === 0.5)
    assert(got.getAs[Double]("kappa") === 0.4)
  }

  test("raterAgreement: constant raters → kappa NULL, not a crash") {
    val got = Profile.raterAgreement(
      Seq((true, true), (true, true)).toDF("a", "b"), col("a"), col("b")).head()
    assert(got.getAs[Double]("p_e") === 1.0)
    assert(got.isNullAt(got.fieldIndex("kappa")))
  }

  test("decayedValue: bucketed half-life weights, exact division") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val asOf = t("2024-01-30 00:00:00")
    val ev = Seq(
      (1L, t("2024-01-30 00:00:00"), 1.00), // age 0d  → bucket 0 → w 128
      (1L, t("2024-01-25 00:00:00"), 1.00), // age 5d  → bucket 1 → w 64
      (1L, t("2024-01-10 00:00:00"), 2.00), // age 20d → bucket 5 → w 4
      (2L, t("2023-12-01 00:00:00"), 9.00)  // age 60d → bucket 15 → w 0
    ).toDF("user_id", "ts", "value")
    val got = Behavior.decayedValue(ev, "user_id", "ts", "value", lit(asOf),
        halfLifeDays = 4, maxHalfLives = 8)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("cents_total"),
          r.getAs[Double]("decayed_cents")))).toMap
    // user 1: (100*128 + 100*64 + 200*4) / 128 = 20000/128 = 156.25
    assert(got(1L) === ((3L, 400L, 156.25)))
    assert(got(2L) === ((1L, 900L, 0.0)))
  }
}
