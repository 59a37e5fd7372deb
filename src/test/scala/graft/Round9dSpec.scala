package graft

import graft.ops.{Profile, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 part 4: incremental IVF maintenance and the approx-MAD
  * switch (r8 verdict items 6 and 7).
  */
class Round9dSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("graft_ivf_spec").toFile
    d.deleteOnExit(); d
  }

  private val centroids = Array(
    Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0),
    Array(0.0, 0.0, 1.0, 0.0), Array(0.0, 0.0, 0.0, 1.0))

  // vectors whose largest component pins the cell
  private def vec(cell: Int, id: Long): (Long, Array[Double]) =
    id -> Array.tabulate(4)(i => if (i == cell) 10.0 + id else 1.0)

  test("updateIvfIndex: batch lands where a rebuild-assign would; base files untouched") {
    val dir = new java.io.File(tmpDir(), "idx").toString
    val base = Seq(vec(0, 1L), vec(1, 2L), vec(2, 3L))
      .toDF("vec_id", "vq")
    Similarity.buildIvfIndex(base, "vec_id", "vq", dir,
      fixedCentroids = Some(centroids))

    def dataFiles(): Set[(String, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getAbsolutePath, f.length())).toSet
    }
    val baseFiles = dataFiles()

    val batch = Seq(vec(3, 4L), vec(0, 5L), vec(1, 2L) /* already indexed */)
      .toDF("vec_id", "vq")
    val n = Similarity.updateIvfIndex(spark, dir, batch, "vec_id", "vq")
    assert(n === 2) // the re-delivered id 2 is dropped by the anti-join

    // O(batch): every base data file is still there, byte-identical size
    assert(baseFiles.subsetOf(dataFiles()))

    // incremental ≡ rebuild-assign: the updated index holds exactly the
    // full corpus under the same frozen-centroid assignment
    val rebuilt = new java.io.File(tmpDir(), "rebuild").toString
    Similarity.buildIvfIndex(base.unionByName(batch).dropDuplicates("vec_id"),
      "vec_id", "vq", rebuilt, fixedCentroids = Some(centroids))
    val got = spark.read.parquet(dir)
      .select($"vec_id", $"ivf_cid".cast("int")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val want = spark.read.parquet(rebuilt)
      .select($"vec_id", $"ivf_cid".cast("int")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got === want)
    assert(got === Set((1L, 0), (2L, 1), (3L, 2), (4L, 3), (5L, 0)))

    // idempotence: a second delivery of the same batch appends nothing
    assert(Similarity.updateIvfIndex(spark, dir, batch, "vec_id", "vq") === 0)
    assert(dataFiles().count(_ => true) >= baseFiles.size)
  }

  test("axis-centroid assignment ties break to the smallest cell index") {
    val dir = new java.io.File(tmpDir(), "tie").toString
    // components 1 and 3 tie at 7.0 — struct-max over (sim, -idx) must
    // pick cell 1, as DuckDB's list_position(list_max) does
    val df = Seq((1L, Array(0.0, 7.0, 0.0, 7.0))).toDF("vec_id", "vq")
    Similarity.buildIvfIndex(df, "vec_id", "vq", dir,
      fixedCentroids = Some(centroids))
    val cid = spark.read.parquet(dir).select($"ivf_cid".cast("int"))
      .head().getInt(0)
    assert(cid === 1)
  }

  test("madOutliersApprox: rank bands hold and exact columns match the exact op") {
    // one group with a wide spread + planted outliers, one tight group
    val rows =
      (1 to 400).map(i => ("wide", (i * 7 % 101) * 100L)) ++
        Seq(("wide", 9000000L), ("wide", -9000000L)) ++
        (1 to 50).map(i => ("tight", 500L + (i % 3)))
    val df = rows.toDF("g", "cents")
    val out = Profile.madOutliersApprox(df, col("g"), col("cents"))
      .orderBy("g").collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Boolean]("med_rank_ok"), s"median band broken: $r")
      assert(r.getAs[Boolean]("mad_rank_ok"), s"mad band broken: $r")
    }
    // exact columns agree with the exact operator's frame
    val exact = Profile.madOutliers(df, col("g"), col("cents"))
      .orderBy("g").collect()
    assert(out.map(_.getAs[Long]("n")).toSeq ===
      exact.map(_.getAs[Long]("n")).toSeq)
    val sums = df.groupBy("g").agg(sum($"cents").as("s")).orderBy("g")
      .collect().map(_.getAs[Long]("s")).toSeq
    assert(out.map(_.getAs[Long]("sum_cents")).toSeq === sums)
  }

  test("madOutliersApprox: high accuracy reproduces the exact median and MAD") {
    val df = (1 to 99).map(i => ("g", i * 10L)).toDF("g", "cents")
    val r = Profile.madOutliersApprox(df, col("g"), col("cents"),
      accuracy = 100000).head()
    assert(r.getAs[Long]("approx_median_cents") === 500L)
    assert(r.getAs[Double]("approx_mad_cents") === 250.0)
    assert(r.getAs[Boolean]("med_rank_ok") && r.getAs[Boolean]("mad_rank_ok"))
  }
}
