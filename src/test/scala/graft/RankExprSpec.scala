package graft

import graft.functions.RankExpressions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CutBucket (r16 optimization): the codegen'd binary-search bucket
  * assignment must be term-for-term identical to the interpreted HOF
  * fold it replaced — `aggregate(cuts, 0, (acc, c) => acc +
  * when(x > c, 1).otherwise(0))` coalesced to 0 — on every edge the
  * fold could see: nulls, NaN, duplicated cuts, values equal to a
  * cut, values outside the cut span, and the empty cut array.
  */
class RankExprSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def foldBucket(cuts: Seq[Double]) =
    coalesce(aggregate(typedlit(cuts), lit(0),
      (acc, c) => acc + when(col("x") > c, 1).otherwise(0)), lit(0))

  private val values: Seq[java.lang.Double] = Seq(
    -1e300, -5.0, -1.0, 0.0, 0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 7.25, 1e300,
    Double.NaN, null, Double.MinPositiveValue, -0.0
  ).map(v => if (v == null) null else java.lang.Double.valueOf(v.asInstanceOf[Double]))

  private lazy val df = values.zipWithIndex
    .map { case (v, i) => (i.toLong, v) }.toDF("id", "x")

  private def check(cuts: Seq[Double]): Unit = {
    val got = df.orderBy("id")
      .select(RankExpressions.cut_bucket(col("x").cast("double"), cuts))
      .collect().map(_.getInt(0)).toSeq
    val want = df.orderBy("id").select(foldBucket(cuts).cast("int"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == want, s"cuts=$cuts got=$got want=$want")
  }

  test("matches the HOF fold: distinct cuts") {
    check(Seq(0.0, 1.0, 2.0, 3.0))
  }

  test("matches the HOF fold: duplicated cuts (ties at every value)") {
    check(Seq(1.0, 1.0, 1.0, 2.0, 2.0))
  }

  test("matches the HOF fold: single cut and empty cuts") {
    check(Seq(0.5))
    check(Seq.empty)
  }

  test("matches the HOF fold: 63-cut grid (the orderStats shape)") {
    check((1 until 64).map(i => i.toDouble / 64 * 10 - 5))
  }

  test("null lands in bucket 0, NaN in the top bucket (Spark NaN order)") {
    val out = df.select(RankExpressions.cut_bucket(
      col("x").cast("double"), Seq(-1e301)).as("b"))
    assert(!out.schema("b").nullable)
    // every non-null value exceeds the single tiny cut; Spark orders
    // NaN above everything so it counts the cut too (fold parity is
    // asserted by the check() tests above)
    val rows = df.orderBy("id")
      .select(RankExpressions.cut_bucket(col("x").cast("double"), Seq(-1e301)))
      .collect().map(_.getInt(0)).toSeq
    val nullIdx = values.indexOf(null)
    assert(rows(nullIdx) == 0)
    assert(rows.zipWithIndex.forall { case (b, i) => i == nullIdx || b == 1 })
  }

  test("all_in_sorted_array matches forall/array_contains exactly") {
    val rows = Seq(
      (1L, Seq(2L, 5L, 9L), Seq(1L, 2L, 5L, 9L, 11L)),   // all present
      (2L, Seq(2L, 6L), Seq(1L, 2L, 5L)),                 // one missing
      (3L, Seq.empty[Long], Seq(1L, 2L)),                 // empty probes
      (4L, Seq(1L), Seq.empty[Long]),                     // empty set
      (5L, Seq(7L, 7L), Seq(7L)),                         // duplicate probes
      (6L, Seq(Long.MinValue, Long.MaxValue),
        Seq(Long.MinValue, 0L, Long.MaxValue))            // extremes
    ).toDF("id", "probes", "bits")
    val got = rows.orderBy("id")
      .select(RankExpressions.all_in_sorted_array(col("probes"), col("bits")))
      .collect().map(_.getBoolean(0)).toSeq
    val want = rows.orderBy("id")
      .select(forall(col("probes"), p => array_contains(col("bits"), p)))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got == want && got == Seq(true, false, true, false, true, true))
  }

  test("non-decreasing / NaN-free cut requirements enforced") {
    intercept[IllegalArgumentException] {
      RankExpressions.cut_bucket(col("x"), Seq(2.0, 1.0))
    }
    intercept[IllegalArgumentException] {
      RankExpressions.cut_bucket(col("x"), Seq(1.0, Double.NaN))
    }
  }
}
