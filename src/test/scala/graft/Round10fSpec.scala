package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 part 6: MMR diversity re-rank. */
class Round10fSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // candidates for one probe: rel is the cosine to an implied probe;
  // vectors drive the pairwise-diversity term
  private def cands(rows: (Long, Double, Array[Double])*) =
    rows.map { case (id, rel, v) => (0L, id, rel, v) }
      .toDF("probe_id", "vec_id", "rel", "v")

  test("mmr picks the diverse candidate over a near-duplicate of the leader") {
    // 1 and 2 are near-identical high-relevance hits; 3 is orthogonal
    // with lower relevance. Pure relevance ranks (1, 2); MMR at
    // lambda 0.7 penalizes 2 by (1-lambda)*sim(2,1) ~ 0.3 and picks 3.
    // scores at pick 2: c2 = 7*0.90 - 3*1.0 = 3.3 ; c3 = 7*0.60 - 0 = 4.2
    val df = cands(
      (1L, 0.91, Array(1.0, 0.0)),
      (2L, 0.90, Array(1.0, 1e-9)),
      (3L, 0.60, Array(0.0, 1.0)))
    val got = Similarity.mmrRerank(df, "probe_id", "vec_id", "rel", "v",
        k = 2, lambdaNum = 7, lambdaDen = 10)
      .orderBy("pos").collect()
    assert(got.map(r => (r.getInt(2), r.getLong(1))).toSeq ===
      Seq((1, 1L), (2, 3L)))
    assert(got(0).getDouble(3) === 0.91)
  }

  test("lambda = 1 degenerates to pure relevance order with id tie-break") {
    val df = cands(
      (5L, 0.80, Array(1.0, 0.0)),
      (2L, 0.80, Array(0.0, 1.0)),
      (9L, 0.95, Array(0.5, 0.5)))
    val got = Similarity.mmrRerank(df, "probe_id", "vec_id", "rel", "v",
        k = 3, lambdaNum = 1, lambdaDen = 1)
      .orderBy("pos").collect()
    assert(got.map(_.getLong(1)).toSeq === Seq(9L, 2L, 5L))
  }

  test("lambda = 0 ranks pick 1 by relevance, later picks purely by diversity") {
    // the r10 ADVICE defect: with lambdaNum = 0 the old round-1 score
    // was a constant (0*srel - penalty*0) and degenerated to min-id.
    // Contract now: pick 1 = max relevance; picks 2+ minimize the max
    // similarity to the selected set (ties on id).
    val df = cands(
      (1L, 0.95, Array(1.0, 0.0)),   // leader
      (2L, 0.90, Array(1.0, 1e-9)),  // near-dup of leader
      (3L, 0.10, Array(0.0, 1.0)))   // orthogonal, low relevance
    val got = Similarity.mmrRerank(df, "probe_id", "vec_id", "rel", "v",
        k = 2, lambdaNum = 0, lambdaDen = 1)
      .orderBy("pos").collect().map(_.getLong(1)).toSeq
    // NOT min-id twice: 1 (highest rel), then 3 (most diverse)
    assert(got === Seq(1L, 3L))
  }

  test("probes rerank independently; short candidate lists just stop early") {
    val df = Seq(
      (0L, 1L, 0.9, Array(1.0, 0.0)),
      (0L, 2L, 0.8, Array(0.0, 1.0)),
      (7L, 3L, 0.5, Array(1.0, 0.0))) // probe 7 has ONE candidate
      .toDF("probe_id", "vec_id", "rel", "v")
    val got = Similarity.mmrRerank(df, "probe_id", "vec_id", "rel", "v",
        k = 3, lambdaNum = 7, lambdaDen = 10)
      .orderBy("probe_id", "pos").collect()
    assert(got.map(r => (r.getLong(0), r.getInt(2), r.getLong(1))).toSeq ===
      Seq((0L, 1, 1L), (0L, 2, 2L), (7L, 1, 3L)))
  }

  test("every selection window is probe-partitioned") {
    val df = cands((1L, 0.9, Array(1.0, 0.0)), (2L, 0.5, Array(0.0, 1.0)))
    val plan = Similarity.mmrRerank(df, "probe_id", "vec_id", "rel", "v",
      k = 2).queryExecution.optimizedPlan.toString
    assert(!plan.contains("windowspecdefinition(vec_id")
      && !plan.contains("windowspecdefinition(_w"))
  }
}
