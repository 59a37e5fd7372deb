package graft.queries

import graft.Tables
import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 pack: the exact-verified near-dedup operator as a
  * first-class driver row. `Dedup.lshVerifiedPairs` also runs inside
  * the corpus pipeline (q_pipeline_corpus), but this row checks the
  * operator's own output — the (id_a, id_b, jaccard) pair list —
  * against DuckDB's exact distinct-shingle Jaccard.
  */
object Round7Queries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- LSH-candidate + exact-Jaccard-verified near-dup pairs ----
    "q_dedup_verified" -> ((s, dir) => {
      // planted periodic pair per 20th doc ("p{id} q{id}" repeated 8×
      // and 9×): different strings, IDENTICAL distinct 3-gram shingle
      // sets → equal minhash signatures (every band matches, candidacy
      // certain) and true Jaccard exactly 1.0. Organic pairs with
      // J ≥ 0.9 are the real work — the threshold an engine must get
      // right on the J≈0.9 boundary pairs this corpus actually has.
      // A qualifying pair escapes band candidacy with
      // P ≤ (1−0.9⁴)¹⁶ ≈ 4e-8 (fixed seeds → deterministic; green at
      // sf0.001/0.01/0.1), so the oracle's all-pairs exact computation
      // reproduces the pair set identically.
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id").as("id"), col("text"))
      val off = docs.agg(max(col("id"))).head().getAs[Number](0).longValue + 1L
      val pat = concat(lit("p"), col("id").cast("string"),
        lit(" q"), col("id").cast("string"), lit(" "))
      val planted = docs.filter(col("id") % 20 === 0)
          .select((col("id") + off).as("id"), rtrim(repeat(pat, 8)).as("text"))
        .unionByName(docs.filter(col("id") % 20 === 0)
          .select((col("id") + 2 * off).as("id"), rtrim(repeat(pat, 9)).as("text")))
      Dedup.lshVerifiedPairs(docs.unionByName(planted), "id", "text",
          threshold = 0.9)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_dedup_verified" ->
      """WITH o AS (SELECT MAX(doc_id) + 1 AS off FROM documents),
         corpus AS (
           SELECT doc_id AS id, text FROM documents
           UNION ALL
           SELECT doc_id + off,
             rtrim(repeat('p' || CAST(doc_id AS VARCHAR) || ' q' || CAST(doc_id AS VARCHAR) || ' ', 8))
           FROM documents CROSS JOIN o WHERE doc_id % 20 = 0
           UNION ALL
           SELECT doc_id + 2 * off,
             rtrim(repeat('p' || CAST(doc_id AS VARCHAR) || ' q' || CAST(doc_id AS VARCHAR) || ' ', 9))
           FROM documents CROSS JOIN o WHERE doc_id % 20 = 0),
         toks AS (SELECT id, string_split_regex(LOWER(TRIM(text)), '\s+') AS t
                  FROM corpus),
         sh AS (
           SELECT id, UNNEST(list_distinct(list_transform(
             range(1, GREATEST(LEN(t) - 3, 0) + 2),
             i -> array_to_string(t[i:i+2], ' ')))) AS s
           FROM toks),
         sizes AS (SELECT id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
         co AS (
           SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS inter
           FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
           GROUP BY 1, 2)
         SELECT id_a, id_b,
           ROUND(CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE), 6)
             AS jaccard
         FROM co JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
         WHERE CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) >= 0.9
         ORDER BY id_a, id_b"""
  )
}
