package graft

import graft.ops.{Graphs, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 part 18: IVF probe sweep, k-core peeling. */
class Round8rSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("ivfProbeSweep: analytic recall curve on the planted geometry") {
    val K = 8
    val ids = (0L until 200L).toDF("id")
    val g = col("id") % K
    val d = ((col("id") % 5) + 1).cast("double") / 1024.0
    val v = array((0 until 64).map { dim =>
      when(g === dim, lit(1.0)).when(g === (dim - 8), d).otherwise(lit(0.0))
    }: _*)
    val centroids = (0 until K).map(gi =>
      Array.tabulate(64)(dd => if (dd == gi) 1.0 else 0.0)).toArray
    val query = Array.tabulate(64)(dd => if (dd <= 1) 1.0 else 0.0)
    val r = Similarity.ivfProbeSweep(ids.select(col("id"), v.as("v")),
        "id", "v", query, k = 10, centroids, probes = Seq(1, 2, 4, 8))
      .orderBy(col("n_probe")).collect()
    // true top-10 = the ten δ=1/1024 vectors of groups 0 and 1, five
    // per cell → half found at one probe, all from two
    assert(r.map(_.getAs[Double]("recall_at_10")).toSeq ===
      Seq(0.5, 1.0, 1.0, 1.0))
    assert(r.map(_.getAs[Long]("n_candidates")).toSeq ===
      Seq(25L, 50L, 100L, 200L))
  }

  test("kCore: tail pruned, triangle survives, fixpoint flagged") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val r = Graphs.kCore(edges, k = 2, rounds = 4)
      .orderBy(col("node")).collect()
    assert(r.map(_.getAs[Long]("node")).toSeq === Seq(1L, 2L, 3L))
    assert(r.map(_.getAs[Long]("degree")).toSeq === Seq(2L, 2L, 2L))
    assert(r.forall(_.getAs[Boolean]("converged")))
  }

  test("kCore: a chain peels to nothing under k=2") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val r = Graphs.kCore(edges, k = 2, rounds = 4).collect()
    assert(r.isEmpty)
  }
}
