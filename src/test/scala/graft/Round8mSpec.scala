package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 part 13: zone-map pruning, encoding advisor. */
class Round8mSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("zoneMapPrune: clustered layout prunes, scattered cannot") {
    val df = (0L until 64L).toDF("k")
    val r = Layout.zoneMapPrune(df, col("k"), nFiles = 4, nPreds = 4)
      .orderBy(col("layout"), col("pred")).collect()
    assert(r.length === 8)
    val clustered = r.filter(_.getAs[String]("layout") == "clustered")
    val scattered = r.filter(_.getAs[String]("layout") == "scattered")
    // value-range files align with the 4 predicate slices: 1 of 4 scanned
    assert(clustered.forall(_.getAs[Long]("files_scanned") == 1L))
    assert(clustered.forall(_.getAs[Double]("prune_pct") == 0.75))
    assert(clustered.forall(_.getAs[Long]("rows_scanned") == 16L))
    // round-robin files each span the whole key range: nothing prunes
    assert(scattered.forall(_.getAs[Long]("files_scanned") == 4L))
    assert(scattered.forall(_.getAs[Double]("prune_pct") == 0.0))
    assert(scattered.forall(_.getAs[Long]("rows_scanned") == 64L))
  }

  test("encodingPlan: run stitching across bucket boundaries is exact") {
    val df = (1L to 24L).map(k => (k, "x", if (k % 2 == 0) "a" else "b",
      k.toString)).toDF("k", "const", "alt", "uniq")
    val r = Layout.encodingPlan(df, col("k"), Seq("const", "alt", "uniq"),
        buckets = 4)
      .collect().map(x => x.getAs[String]("col_name") -> x).toMap
    // constant column: ONE run even though 4 buckets cut it
    assert(r("const").getAs[Long]("n_runs") === 1L)
    assert(r("const").getAs[String]("encoding") === "RLE_DICT")
    // alternating column: every row starts a run, no false boundary dedup
    assert(r("alt").getAs[Long]("n_runs") === 24L)
    assert(r("alt").getAs[String]("encoding") === "PLAIN")
    assert(r("uniq").getAs[Long]("n_distinct") === 24L)
    assert(r("uniq").getAs[String]("encoding") === "PLAIN")
  }

  test("encodingPlan: null runs merge null-safely across buckets") {
    val df = Seq((1L, "a"), (2L, null), (3L, null), (4L, "a"))
      .toDF("k", "c")
    val r = Layout.encodingPlan(df, col("k"), Seq("c"), buckets = 2).head()
    assert(r.getAs[Long]("n_null") === 2L)
    assert(r.getAs[Long]("n_runs") === 3L) // a | null,null | a
    assert(r.getAs[Long]("n_distinct") === 1L)
  }
}
