package graft.queries

import graft.Tables
import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 part 10: product quantization (Jégou et al., TPAMI 2011) —
  * the compressed-domain ANN path: deterministic sampled codebooks,
  * PQ encoding (64 doubles → 8 nibble codes), asymmetric-distance
  * top-k, and the recall audit against the exact ranking. Codebooks
  * are (md5(id), id)-sampled, so every stage — including the
  * approximate ranking — is engine-exact and recomputed end to end by
  * its DuckDB oracle.
  */
object Round8jQueries {

  private val M = 8  // subspaces (64 dims / 8 = 8 dims each)
  private val K = 16 // codewords per subspace (4-bit codes)

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  private def probe(s: SparkSession, dir: String): Array[Double] =
    emb(s, dir).filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray

  /** The q_ann_lsh planting: 9 exact copies of the probe vector at
    * off..off+8. Copies share the probe's per-subspace argmin codes,
    * so their ADC distance is Σ_j min_c dt[j][c] — the global minimum
    * by construction: planted-certainty for the approximate top-k.
    */
  private def withProbeCopies(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val off = e.agg(max(col("vec_id"))).head().getAs[Number](0).longValue + 1L
    val probeRow = e.filter(col("vec_id") === 0)
    e.unionByName((0 until 9).map(i =>
        probeRow.select((lit(off + i)).as("vec_id"), col("embedding"),
          col("label")))
      .reduce(_ unionByName _))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- PQ encoding: codes + quantization error ----
    "q_pq_encode" -> ((s, dir) => {
      val e = emb(s, dir)
      val cb = Similarity.pqCodebooks(e, "vec_id", "embedding", M, K)
      Similarity.pqEncode(e, "vec_id", "embedding", cb)
        .select(col("vec_id"),
          concat_ws("-", col("codes").cast("array<string>")).as("codes"),
          round(col("err"), 6).as("err"))
        .orderBy(col("vec_id"))
    }),

    // ---- asymmetric-distance top-k, planted-certainty form ----
    "q_pq_topk" -> ((s, dir) => {
      val corpus = withProbeCopies(s, dir)
      val cb = Similarity.pqCodebooks(corpus, "vec_id", "embedding", M, K)
      val enc = Similarity.pqEncode(corpus, "vec_id", "embedding", cb)
      Similarity.pqAdcTopK(enc, "vec_id", "codes", cb, probe(s, dir), topK = 10)
        .select(col("vec_id"), round(col("approx_dist"), 6).as("approx_dist"))
    }),

    // ---- recall@10 of ADC vs the exact squared-L2 ranking ----
    "q_pq_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val cb = Similarity.pqCodebooks(e, "vec_id", "embedding", M, K)
      Similarity.pqRecall(e, "vec_id", "embedding", cb, probe(s, dir), k = 10)
    }))

  /** Shared oracle fragment over a corpus CTE `v(vec_id, e)`: seeds
    * (16 codewords by (md5(id), id) order), per-(vec, subspace, code)
    * squared distances with ordered list_reduce sums (term-for-term
    * the Spark left fold), and the per-(vec, subspace) argmin.
    */
  private val pqSql: String =
    """js AS (SELECT UNNEST(range(0, 8)) AS j),
       seeds AS (SELECT e, rn - 1 AS code FROM (
           SELECT e, ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
           FROM v) WHERE rn <= 16),
       d0 AS (SELECT v.vec_id, js.j, s.code,
           list_reduce(list_transform(range(1, 9),
             i -> (v.e[js.j * 8 + i] - s.e[js.j * 8 + i]) *
                  (v.e[js.j * 8 + i] - s.e[js.j * 8 + i])),
             (a, b) -> a + b) AS dist
         FROM v CROSS JOIN seeds s CROSS JOIN js),
       best AS (SELECT vec_id, j, code, dist FROM (
           SELECT vec_id, j, code, dist,
             ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY dist, code) AS rn
           FROM d0) WHERE rn = 1)"""

  def oracles: Map[String, String] = Map(

    "q_pq_encode" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         $pqSql
         SELECT vec_id,
           array_to_string(list(code ORDER BY j), '-') AS codes,
           ROUND(list_reduce(list(dist ORDER BY j), (a, b) -> a + b), 6) AS err
         FROM best GROUP BY vec_id ORDER BY vec_id""",

    "q_pq_topk" ->
      s"""WITH v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         o AS (SELECT MAX(vec_id) + 1 AS off FROM v0),
         v AS (SELECT * FROM v0
           UNION ALL
           SELECT off + i, (SELECT e FROM v0 WHERE vec_id = 0)
           FROM o CROSS JOIN (SELECT UNNEST(range(0, 9)) AS i)),
         $pqSql,
         qd AS (SELECT j, code, dist FROM d0 WHERE vec_id = 0),
         adc AS (SELECT b.vec_id,
             list_reduce(list(qd.dist ORDER BY b.j), (a, b2) -> a + b2) AS ad
           FROM best b JOIN qd ON b.j = qd.j AND b.code = qd.code
           GROUP BY b.vec_id)
         SELECT vec_id, ROUND(ad, 6) AS approx_dist
         FROM adc ORDER BY ad, vec_id LIMIT 10""",

    "q_pq_recall" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         $pqSql,
         q AS (SELECT e AS qe FROM v WHERE vec_id = 0),
         exact AS (SELECT vec_id FROM (
             SELECT v.vec_id,
               list_reduce(list_transform(range(1, 65),
                 i -> (v.e[i] - q.qe[i]) * (v.e[i] - q.qe[i])),
                 (a, b) -> a + b) AS d
             FROM v CROSS JOIN q)
           ORDER BY d, vec_id LIMIT 10),
         qd AS (SELECT j, code, dist FROM d0 WHERE vec_id = 0),
         adc AS (SELECT vec_id FROM (
             SELECT b.vec_id,
               list_reduce(list(qd.dist ORDER BY b.j), (a, b2) -> a + b2) AS ad
             FROM best b JOIN qd ON b.j = qd.j AND b.code = qd.code
             GROUP BY b.vec_id)
           ORDER BY ad, vec_id LIMIT 10)
         SELECT 10 AS k, CAST(COUNT(*) AS BIGINT) AS n_hits,
           ROUND(CAST(COUNT(*) AS DOUBLE) / 10.0, 6) AS recall
         FROM exact JOIN adc USING (vec_id)""")
}
