package graft

import graft.ops.Profile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 part 16: expectations gate, Benford audit. */
class Round8pSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("expectations: every rule type counts its planted violations") {
    val df = Seq(
      (1L, Some(10L), "O"), (2L, Some(-5L), "F"),
      (3L, None: Option[Long], "O"), (3L, Some(7L), "X")
    ).toDF("k", "v", "st")
    val r = Profile.expectations(df,
        rowRules = Seq(
          ("not_null", "v", col("v").isNull),
          ("range", "v", col("v") < 0L),
          ("in_set", "st", !col("st").isin("O", "F"))),
        uniqueCols = Seq("k"))
      .collect().map(x => x.getAs[String]("rule") -> x).toMap
    assert(r("not_null").getAs[Long]("n_violations") === 1L)
    assert(r("range").getAs[Long]("n_violations") === 1L)
    assert(r("in_set").getAs[Long]("n_violations") === 1L)
    assert(r("unique").getAs[Long]("n_violations") === 1L) // k=3 twice
    assert(r.values.forall(_.getAs[Long]("n_checked") == 4L))
    assert(r.values.forall(!_.getAs[Boolean]("pass")))
  }

  test("benfordAudit: chi2 is the ordered fold of per-digit contributions") {
    val df = (1L to 9L).map(d => Tuple1(d.toDouble)).toDF("x")
    val r = Profile.benfordAudit(df, col("x")).orderBy(col("digit")).collect()
    assert(r.length === 9)
    assert(r.forall(_.getAs[Long]("n_obs") == 1L))
    // replay the exact fold host-side: same literals, same order
    val chi2 = Profile.benfordProbs.foldLeft(0.0) { case (acc, (_, p)) =>
      val e = 9.0 * p; acc + (1.0 - e) * (1.0 - e) / e
    }
    val expect = BigDecimal(chi2).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.forall(_.getAs[Double]("chi2") === expect))
  }

  test("benfordAudit: zero-count digits stay in the frame") {
    val df = Seq(100.0, 150.0, 900.0).map(Tuple1(_)).toDF("x")
    val r = Profile.benfordAudit(df, col("x")).collect()
    assert(r.length === 9)
    assert(r.count(_.getAs[Long]("n_obs") > 0) === 2) // digits 1 and 9
  }
}
