package graft

import graft.ops.MasterData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType, StringType, BooleanType}
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 part 2: entity resolution + SCD2 merge. */
class Round9bSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("linkagePairs: forward pass catches tail edits, reversed pass head edits") {
    val df = Seq(
      (1L, "alpha-bravo-charl"), (2L, "alpha-bravo-charz"), // tail edit
      (3L, "hotel-india-julie"), (4L, "zotel-india-julie"), // head edit
      (5L, "delta-delta-delta") // singleton
    ).toDF("id", "nm")
    val got = MasterData.linkagePairs(df, "id", "nm", prefixLen = 8,
        maxDist = 1, maxBlockDf = 100)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got === Set((1L, 2L), (3L, 4L)))
  }

  test("linkagePairs: oversized blocks are dropped by the DF cap") {
    val df = ((0L until 10L).map(i => (i, s"same-same-$i")) :+
      (100L, "other-one") :+ (101L, "other-onz")).toDF("id", "nm")
    // the 'same-sam' block has 10 > 4 members -> dropped; the pair in
    // the small block survives
    val got = MasterData.linkagePairs(df, "id", "nm", prefixLen = 8,
        maxDist = 1, maxBlockDf = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got === Set((100L, 101L)))
  }

  test("resolveEntities: transitive chain merges into one entity") {
    val df = Seq(
      (1L, "alpha-bravo-charl"), (2L, "alpha-bravo-charz"),
      (3L, "alpha-bravo-chazz"), // 2<->3 dist 1, 1<->3 dist 2
      (9L, "hotel-india-julie")
    ).toDF("id", "nm")
    val out = MasterData.resolveEntities(df, "id", "nm", prefixLen = 8,
        maxDist = 1, maxBlockDf = 100)
      .orderBy("id").collect()
    assert(out.map(r => (r.getAs[Long]("id"), r.getAs[Long]("entity_id"),
      r.getAs[Long]("n_members"), r.getAs[Boolean]("is_canonical"))).toSeq ===
      Seq((1L, 1L, 3L, true), (2L, 1L, 3L, false), (3L, 1L, 3L, false),
        (9L, 9L, 1L, true)))
  }

  test("scd2Merge: change closes+opens, no-op/late pass through, new key born, history kept") {
    val dimSchema = StructType(Seq(
      StructField("key", LongType), StructField("attr", StringType),
      StructField("valid_from", LongType), StructField("valid_to", LongType),
      StructField("is_current", BooleanType)))
    val dim = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "A", 0L, null, true),          // will change at 100
        Row(2L, "B", 0L, null, true),          // no-op update (same attr)
        Row(3L, "C", 0L, null, true),          // late update eff <= from
        Row(4L, "D", 0L, null, true),          // no update at all
        Row(1L, "Z", -50L, 0L, false))), dimSchema) // closed history row
    val upd = Seq(
      (1L, "A2", 100L), (1L, "A1", 50L), // latest-wins reduce: A2@100
      (2L, "B", 100L),
      (3L, "C2", 0L),
      (5L, "E", 100L) // unknown key
    ).toDF("key", "attr", "eff")
    val out = MasterData.scd2Merge(dim, upd)
      .orderBy("key", "valid_from").collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[String]("attr"),
        r.getAs[Long]("valid_from"),
        Option(r.getAs[Any]("valid_to")).map(_.asInstanceOf[Long]),
        r.getAs[Boolean]("is_current")))
    assert(out.toSeq === Seq(
      (1L, "Z", -50L, Some(0L), false),   // history passthrough
      (1L, "A", 0L, Some(100L), false),   // closed at eff
      (1L, "A2", 100L, None, true),       // new open row
      (2L, "B", 0L, None, true),          // no-op
      (3L, "C", 0L, None, true),          // late arrival ignored
      (4L, "D", 0L, None, true),          // untouched
      (5L, "E", 100L, None, true)))       // born open
  }
}
