package graft

import graft.ops.MasterData
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 part 3: multi-change SCD2 merge. */
class Round10cSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dimSchema = StructType(Seq(
    StructField("key", LongType), StructField("attr", StringType),
    StructField("valid_from", LongType), StructField("valid_to", LongType),
    StructField("is_current", BooleanType)))

  private def dim(rows: Row*) = spark.createDataFrame(
    spark.sparkContext.parallelize(rows), dimSchema)

  private def run(d: org.apache.spark.sql.DataFrame,
      u: org.apache.spark.sql.DataFrame) =
    MasterData.scd2MergeMulti(d, u)
      .orderBy("key", "valid_from").collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[String]("attr"),
        r.getAs[Long]("valid_from"),
        Option(r.getAs[Any]("valid_to")).map(_.asInstanceOf[Long]),
        r.getAs[Boolean]("is_current"))).toSeq

  test("two successive changes emit the full chain (the scd2Merge contrast case)") {
    val d = dim(Row(1L, "A", 0L, null, true))
    val u = Seq((1L, "B", 100L), (1L, "C", 200L)).toDF("key", "attr", "eff")
    assert(run(d, u) === Seq(
      (1L, "A", 0L, Some(100L), false),
      (1L, "B", 100L, Some(200L), false),
      (1L, "C", 200L, None, true)))
    // scd2Merge's compacted contract keeps only the latest change
    val compacted = MasterData.scd2Merge(d, u)
      .orderBy("valid_from").collect().map(_.getAs[String]("attr")).toSeq
    assert(compacted === Seq("A", "C"))
  }

  test("equal-eff ties take the max attr; no-op and consecutive-dup changes collapse") {
    val d = dim(Row(1L, "A", 0L, null, true), Row(2L, "X", 0L, null, true))
    val u = Seq(
      (1L, "B", 100L), (1L, "D", 100L), // tie at 100 -> D
      (1L, "D", 150L),                  // consecutive dup -> collapses
      (2L, "X", 100L)                   // no-op change -> no version
    ).toDF("key", "attr", "eff")
    assert(run(d, u) === Seq(
      (1L, "A", 0L, Some(100L), false),
      (1L, "D", 100L, None, true),
      (2L, "X", 0L, None, true)))
  }

  test("a tie resolving back to the running tail attr collapses entirely") {
    val d = dim(Row(1L, "B", 0L, null, true))
    // sorted at eff 100: A then B; A appends, B replaces, B == tail B
    // of the remaining chain -> nothing appended
    val u = Seq((1L, "A", 100L), (1L, "B", 100L)).toDF("key", "attr", "eff")
    assert(run(d, u) === Seq((1L, "B", 0L, None, true)))
  }

  test("late arrivals drop for known keys; unknown keys chain from their first update") {
    val d = dim(Row(1L, "A", 100L, null, true),
      Row(1L, "Z", 0L, 100L, false)) // history row passes through
    val u = Seq(
      (1L, "L", 50L),   // late: eff <= valid_from
      (1L, "B", 200L),
      (5L, "N1", 500L), (5L, "N2", 1500L) // unknown key, two changes
    ).toDF("key", "attr", "eff")
    assert(run(d, u) === Seq(
      (1L, "Z", 0L, Some(100L), false),
      (1L, "A", 100L, Some(200L), false),
      (1L, "B", 200L, None, true),
      (5L, "N1", 500L, Some(1500L), false),
      (5L, "N2", 1500L, None, true)))
  }

  test("keys without updates pass through as single open rows") {
    val d = dim(Row(1L, "A", 0L, null, true), Row(2L, "B", 7L, null, true))
    val u = Seq((1L, "C", 100L)).toDF("key", "attr", "eff")
    assert(run(d, u) === Seq(
      (1L, "A", 0L, Some(100L), false),
      (1L, "C", 100L, None, true),
      (2L, "B", 7L, None, true)))
  }
}
