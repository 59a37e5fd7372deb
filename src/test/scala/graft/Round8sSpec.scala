package graft

import graft.ops.Graphs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 part 19: item-item CF similarity, assortativity. */
class Round8sSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(rows: (Long, Long)*) =
    rows.toDF("u", "item")
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))

  test("itemSimilarity: cosine from exact counts, symmetric pairs") {
    // baskets: u1{1,2}, u2{1,2}, u3{1,3}, u4{1,3}: n(1)=4, n(2)=2, n(3)=2
    val df = ev((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L), (4L, 1L), (4L, 3L))
    val r = Graphs.itemSimilarity(df, "u", date_trunc("day", col("ts")),
        col("item"), minSupport = 2, topK = 5)
      .orderBy(col("item"), col("rank")).collect()
    val i1 = r.filter(_.getAs[Long]("item") == 1L)
    // sim(1,2) = sim(1,3) = 2/(√4·√2) ≈ 0.707107; tie → neighbor asc
    assert(i1.map(_.getAs[Long]("neighbor")).toSeq === Seq(2L, 3L))
    assert(i1.forall(_.getAs[Double]("sim") == 0.707107))
    val i2 = r.filter(_.getAs[Long]("item") == 2L)
    assert(i2.map(_.getAs[Long]("neighbor")).toSeq === Seq(1L))
  }

  test("degreeAssortativity: a perfect star is maximally disassortative") {
    // star 0-{1..5} plus an extra 1-2 edge so degrees vary on both ends
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L),
      (1L, 2L)).toDF("src", "dst")
    val r = Graphs.degreeAssortativity(edges).head()
    assert(r.getAs[Long]("n_edges") === 6L)
    assert(r.getAs[Double]("assortativity") < 0.0) // hubs link leaves
  }

  test("degreeAssortativity: degree-regular graph → NULL (undefined)") {
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val r = Graphs.degreeAssortativity(square).head()
    assert(r.isNullAt(r.fieldIndex("assortativity")))
  }
}
