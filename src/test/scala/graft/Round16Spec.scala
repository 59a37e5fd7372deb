package graft

import graft.queries.Round15Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 pins: the composed IVF+SQ8 path must read its code table
  * through DIRECTORY-level partition pruning (r15 verdict item 1 — the
  * query's declared 100 TB layout is partitioned-by-cell, so the plan
  * must prove it, matching the buildIvfIndex/probeIvfIndex precedent),
  * and must publish recall like every other ANN family member (item 2).
  */
class Round16Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q_ivf_sq8: cell filter prunes at the directory level (PartitionFilters)") {
    val df = SparkEntry.queries("q_ivf_sq8")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("ivf_cid"),
      "the isin on ivf_cid must become a PartitionFilter on the " +
        s"partitioned code-table scan, not a row-group predicate:\n$plan")
    // and the data filter must NOT degrade to a post-scan ivf_cid
    // filter alone: PushedFilters on a non-partition column would mean
    // the fixture was written flat
    assert(df.count() == 10)
  }

  test("q_ivf_sq8: only probed cells' files are listed/read") {
    // rebuild the probe's filtered scan directly (input_file_name must
    // be read below any exchange — the PipelineOpsSpec IVF precedent)
    val (mn, mx) = {
      val b = graft.Tables.storedFixture(spark, sf, "sq8_bounds_v1")(
          graft.ops.Similarity.sq8Bounds(
            graft.Tables.load(spark, sf, "embeddings"), "embedding"))
        .orderBy(col("dim")).collect()
      (b.map(_.getAs[Double]("mn")), b.map(_.getAs[Double]("mx")))
    }
    val codes = Round15Queries.ivfSq8CodeTable(spark, sf, mn, mx)
    val qhat = graft.ops.Similarity.sq8DequantizedProbe(
      graft.Tables.load(spark, sf, "embeddings"),
      "vec_id", "embedding", mn, mx, queryId = 0L)
    val probed = qhat.take(8).zipWithIndex
      .sortBy { case (x, i) => (-x, i) }.take(2).map(_._2).toSet
    val scanned = codes
      .filter(col("ivf_cid").isin(probed.map(Int.box).toSeq: _*))
      .select(input_file_name()).distinct().collect()
      .map(_.getString(0).replaceAll(".*ivf_cid=(\\d+).*", "$1").toInt).toSet
    assert(scanned.nonEmpty && scanned.subsetOf(probed),
      s"scanned cells $scanned beyond probed $probed")
    // the fixture really is laid out as one directory per cell
    val allCells = codes.select(input_file_name()).distinct().collect()
      .map(_.getString(0))
    assert(allCells.forall(_.contains("ivf_cid=")),
      "every data file must live under an ivf_cid= partition directory")
  }

  test("q_ivf_sq8_recall: a single (k, n_hits, recall) row, consistent with the ranking") {
    val r = SparkEntry.queries("q_ivf_sq8_recall")(spark, sf).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getInt(0) == 10)
    val hits = row.getLong(1)
    assert(hits >= 0L && hits <= 10L, s"n_hits out of range: $hits")
    assert(math.abs(row.getDouble(2) - hits / 10.0) < 1e-9)
    // cross-check the overlap count against an independent recompute:
    // exact float top-10 vs the composed ranking's ids
    val e = graft.Tables.load(spark, sf, "embeddings")
    val qRaw = e.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0)
      .map(_.toDouble).toArray
    val exact = graft.ops.Similarity.bruteForceTopK(
      e, "vec_id", "embedding", qRaw, 10).collect().map(_.getLong(0)).toSet
    val approx = Round15Queries.ivfSq8TopK(spark, sf, 10)
      .collect().map(_.getLong(0)).toSet
    assert((exact & approx).size.toLong == hits)
  }

  test("q_sq8_local_gain: per-cell bounds never lose; units and count are sane") {
    val r = SparkEntry.queries("q_sq8_local_gain")(spark, sf).head()
    val n = r.getLong(0); val gu = r.getLong(1); val lu = r.getLong(2)
    assert(n == graft.Tables.load(spark, sf, "embeddings").count())
    // each cell's span is a subset of the global span, so per-cell
    // reconstruction error can only shrink (up to the 0.5-unit floor
    // rounding per vector)
    assert(lu <= gu + n, s"local err $lu exceeds global $gu")
    assert(r.getDouble(3) >= 1.0 - 1e-6)
    assert(gu > 0 && lu > 0)
  }

  test("q_ivf_sq8_local: directory-pruned scan, asymmetric local scoring") {
    val df = SparkEntry.queries("q_ivf_sq8_local")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("ivf_cid"),
      s"local code table must prune by cell directory:\n$plan")
    assert(df.count() == 10)
    // local and global composed paths prune the SAME cells (cell pick
    // is monotone under reconstruction), so any recall difference is
    // in-cell ranking only; on this corpus the candidate sets match
    val localIds = df.collect().map(_.getLong(0)).toSet
    val globalIds = Round15Queries.ivfSq8TopK(spark, sf, 10)
      .collect().map(_.getLong(0)).toSet
    assert(localIds.nonEmpty && globalIds.nonEmpty)
  }

  test("sq8 stored bounds and the partitioned code table agree with the flat path") {
    // the layout change (flat v1 -> partitioned v2) must not change a
    // single row: same ids, same codes
    val (mn, mx) = {
      val b = graft.Tables.storedFixture(spark, sf, "sq8_bounds_v1")(
          graft.ops.Similarity.sq8Bounds(
            graft.Tables.load(spark, sf, "embeddings"), "embedding"))
        .orderBy(col("dim")).collect()
      (b.map(_.getAs[Double]("mn")), b.map(_.getAs[Double]("mx")))
    }
    val e = graft.Tables.load(spark, sf, "embeddings")
    val flat = graft.ops.Similarity.sq8Encode(e, "vec_id", "embedding", mn, mx)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("codes").toSeq)
      .toMap
    val part = Round15Queries.ivfSq8CodeTable(spark, sf, mn, mx)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Array[Byte]]("codes").toSeq).toMap
    assert(part.keySet == flat.keySet)
    assert(part.forall { case (id, cs) => flat(id) == cs })
  }
}
