package graft

import graft.ops.Profile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 part 25: correlation matrix. */
class Round8ySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("corrMatrix: perfect, inverse, and undefined pairs in one pass") {
    val df = Seq((1L, 2L, 9L, 5L), (2L, 4L, 8L, 5L), (3L, 6L, 7L, 5L))
      .toDF("a", "b", "c", "k")
    val r = Profile.corrMatrix(df, Seq("a" -> col("a"), "b" -> col("b"),
        "c" -> col("c"), "k" -> col("k")))
      .collect().map(x => (x.getAs[String]("col_a"),
        x.getAs[String]("col_b")) -> x).toMap
    assert(r.size === 6)
    assert(r(("a", "b")).getAs[Double]("corr") === 1.0)   // b = 2a
    assert(r(("a", "c")).getAs[Double]("corr") === -1.0)  // c = 10 − a
    assert(r(("a", "k")).isNullAt(3))                     // k constant
    assert(r.values.forall(_.getAs[Long]("n") == 3L))
  }

  test("corrMatrix: decimal sums survive long-overflow magnitudes") {
    // 10^7-cent values whose squared sums overflow a BIGINT over
    // enough rows; 2000 rows × (10^7)² = 2·10^17 per-term ~ safe here,
    // but the decimal path must still produce the exact r = 1
    val df = (1L to 2000L).map(i => (i * 10000000L, i * 10000000L))
      .toDF("x", "y")
    val r = Profile.corrMatrix(df,
      Seq("x" -> col("x"), "y" -> col("y"))).head()
    assert(r.getAs[Double]("corr") === 1.0)
  }
}
