package graft.queries

import graft.Tables
import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 pack: the accuracy row for the composed IVF+SQ8 path
  * (r15 verdict item 2 — cell pruning CAN drop true neighbors, so the
  * composition must publish recall like every other ANN family member:
  * q_ann_recall, q_pq_recall, q_sq8_recall).
  */
object Round16Queries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- recall@10 of the pruned IVF+SQ8 ranking vs exact float ----
    "q_ivf_sq8_recall" -> ((s, dir) => {
      // exact side: brute-force float cosine against the RAW vec-0
      // probe (one scan + TakeOrdered, the q_sq8_recall shape);
      // approx side: the q_ivf_sq8 composition itself — top-2 of 8
      // coarse cells, int8 codes, fused dequantize+cosine. The
      // overlap count is the row; pruning losses (a true neighbor
      // living in a non-probed cell) show up here and nowhere else.
      val e = Tables.load(s, dir, "embeddings")
      val qRaw = e.filter(col("vec_id") === 0L)
        .select(col("embedding")).head().getSeq[Float](0)
        .map(_.toDouble).toArray
      val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding",
        qRaw, k = 10).select(col("vec_id"))
      val approx = Round15Queries.ivfSq8TopK(s, dir, k = 10)
        .select(col("vec_id"))
      exact.join(approx, Seq("vec_id"))
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(10).as("k"), col("n_hits"),
          round(col("n_hits").cast("double") / lit(10.0), 6).as("recall"))
    }))

  def oracles: Map[String, String] = Map(

    "q_ivf_sq8_recall" ->
      // approx = the q_ivf_sq8 oracle's pruned ranking (cell argmax of
      // the first 8 raw components, top-2 cells by the reconstructed
      // probe's leading components, SQ8-reconstructed cosine); exact =
      // raw float cosine vs the raw vec-0 probe. Both tie-break by
      // vec_id; the overlap count is the row.
      """WITH e AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         d AS (
           SELECT vec_id, r.dim, v[r.dim] AS x
           FROM e CROSS JOIN range(1, 65) r(dim)),
         b AS (SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM d GROUP BY dim),
         bb AS (SELECT list(mn ORDER BY dim) AS mns,
                       list(mx ORDER BY dim) AS mxs FROM b),
         rec AS (
           SELECT vec_id, list_transform(range(1, 65), i ->
             CASE WHEN mxs[i] > mns[i] THEN
               mns[i] + LEAST(GREATEST(FLOOR(
                 (v[i] - mns[i]) * 255.0 / (mxs[i] - mns[i]) + 0.5),
                 0), 255) * (mxs[i] - mns[i]) / 255.0
             ELSE mns[i] END) AS vhat
           FROM e CROSS JOIN bb),
         q AS (SELECT vhat AS qh FROM rec WHERE vec_id = 0),
         cid AS (
           SELECT vec_id,
             CAST(list_position(v8, list_max(v8)) - 1 AS INT) AS cell
           FROM (SELECT vec_id,
                   list_transform(range(1, 9), i -> v[i]) AS v8 FROM e)),
         probed AS (
           SELECT CAST(r.i - 1 AS INT) AS cell
           FROM range(1, 9) r(i) CROSS JOIN q
           ORDER BY qh[r.i] DESC, r.i LIMIT 2),
         approx AS (
           SELECT rec.vec_id
           FROM rec
           JOIN cid ON rec.vec_id = cid.vec_id
           JOIN probed ON cid.cell = probed.cell
           CROSS JOIN q
           ORDER BY list_cosine_similarity(vhat, qh) DESC, rec.vec_id
           LIMIT 10),
         qe AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         exact AS (SELECT vec_id FROM e CROSS JOIN qe
           ORDER BY list_cosine_similarity(v, qv) DESC, vec_id LIMIT 10)
         SELECT 10 AS k, CAST(COUNT(*) AS BIGINT) AS n_hits,
           ROUND(CAST(COUNT(*) AS DOUBLE) / 10.0, 6) AS recall
         FROM exact JOIN approx USING (vec_id)""")
}
