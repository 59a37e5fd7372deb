package graft

import graft.functions.{Format, TopKAggregator}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TopK typed Aggregator and the reference-style text formatter. */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("top-k aggregator equals window row_number formulation") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val agg = orders.groupBy(col("o_orderpriority"))
      .agg(TopKAggregator.topK(3)(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")))
      .select(col("o_orderpriority"), (col("pos") + 1).as("rn"),
        col("col._2").as("o_orderkey"), col("col._1").as("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expected = orders.withColumn("rn", row_number().over(win))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(agg == expected && expected.size == 15)
  }

  test("top-k aggregator handles ties and small groups") {
    val df = Seq(("a", 5.0, 1L), ("a", 5.0, 2L), ("a", 3.0, 3L), ("b", 1.0, 4L))
      .toDF("g", "v", "id")
    val got = df.groupBy("g")
      .agg(TopKAggregator.topK(2)(col("v"), col("id")).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getDouble(0), x.getLong(1)))).toMap
    assert(got("a") == Seq((5.0, 1L), (5.0, 2L))) // tie → smaller id first
    assert(got("b") == Seq((1.0, 4L)))
  }

  test("reference text table format: fixed width, rule, NULL placeholder") {
    val df = Seq((Some(1L), "Ana"), (None, "a-very-long-name-that-exceeds-twenty-chars"))
      .toDF("id", "name")
    val out = Format.textTable(df)
    val lines = out.split("\n")
    assert(lines(0) == "id".padTo(20, ' ') + "name".padTo(20, ' '))
    assert(lines(1) == "-" * 40)
    assert(lines.exists(_.startsWith("NULL".padTo(20, ' '))))
    assert(lines.forall(_.length <= 40))
  }
}
