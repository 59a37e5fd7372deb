package graft

import graft.ops.{Profile, Sampling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 part 15: exact apportionment, MAD outliers. */
class Round8oSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("tokenBudgetExact: targets sum to the budget exactly, ties break on source") {
    val docs = Seq(("a", "w w"), ("b", "w w w"), ("c", "w"))
      .toDF("source", "text")
    val r = Sampling.tokenBudgetExact(docs, "source", "text",
        weightExpr = lit(1L), budgetTokens = 10L)
      .orderBy(col("source")).collect()
    // 10·1 DIV 3 = 3 each, all remainders 1 → the single short token
    // goes to the lexicographically first source
    assert(r.map(_.getAs[Long]("base_tokens")).toSeq === Seq(3L, 3L, 3L))
    assert(r.map(_.getAs[Long]("extra")).toSeq === Seq(1L, 0L, 0L))
    assert(r.map(_.getAs[Long]("target_tokens")).sum === 10L)
  }

  test("tokenBudgetExact: proportional weights, still exact") {
    val docs = Seq(("a", "x"), ("b", "x"), ("c", "x"))
      .toDF("source", "text")
    val w = when(col("source") === "a", 5L)
      .when(col("source") === "b", 3L).otherwise(2L)
    val r = Sampling.tokenBudgetExact(docs, "source", "text", w, 101L)
      .collect().map(x => x.getAs[String]("source") ->
        x.getAs[Long]("target_tokens")).toMap
    // 101·5/10=50.5, 101·3/10=30.3, 101·2/10=20.2 → bases 50/30/20,
    // one short token → highest remainder (a: 5) takes it
    assert(r === Map("a" -> 51L, "b" -> 30L, "c" -> 20L))
    assert(r.values.sum === 101L)
  }

  test("tokenBudgetExact: zero weight total fails fast, not silent NULL targets") {
    // r9 regression (ADVICE r8): a fractional weightExpr truncated to 0
    // by the long cast used to yield NULL base/target_tokens silently,
    // violating the Σ target_tokens == budget contract
    val docs = Seq(("a", "x"), ("b", "x")).toDF("source", "text")
    val e = intercept[Exception] {
      Sampling.tokenBudgetExact(docs, "source", "text",
        weightExpr = lit(0.4), budgetTokens = 10L).collect()
    }
    assert(e.getMessage.contains("weight total must be positive"))
  }

  test("madOutliers: whale flagged, sigma not inflated") {
    val df = Seq(1L, 2L, 3L, 4L, 100L).map(("g", _)).toDF("g", "x")
    val r = Profile.madOutliers(df, col("g"), col("x")).head()
    assert(r.getAs[Double]("median_cents") === 3.0)
    assert(r.getAs[Double]("mad_cents") === 1.0)
    assert(r.getAs[Long]("n_outliers") === 1L)
    assert(r.getAs[Double]("outlier_rate") === 0.2)
  }

  test("madOutliers: even-n medians interpolate to exact halves") {
    val df = Seq(1L, 3L).map(("g", _)).toDF("g", "x")
    val r = Profile.madOutliers(df, col("g"), col("x")).head()
    assert(r.getAs[Double]("median_cents") === 2.0)
    assert(r.getAs[Double]("mad_cents") === 1.0)
    assert(r.getAs[Long]("n_outliers") === 0L)
  }
}
