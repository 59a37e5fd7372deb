package graft.queries

import graft.Tables
import graft.ops.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 part 1 (r10 verdict item 8): REAL multimodal header
  * parsing replacing the stub's hex digests for the header fields —
  * PNG/JPEG/WAV dimensions and audio parameters read by pure in-plan
  * byte arithmetic on the binary payload column (public format specs,
  * no codec, no UDF). The payloads carry genuine format headers
  * synthesized in-plan with every field a deterministic function of
  * the id, so the oracle predicts the PARSE result from the GENERATION
  * rule — if the byte walk misreads any offset, endianness, or marker
  * length, the hash check fails. Every 97th payload is corrupted;
  * those must come back `parse_ok = false` with null fields, never an
  * error (the no-crash contract for malformed media at scale).
  */
object Round11aQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_media_headers" -> ((s, dir) =>
      Multimodal.parseHeaders(
          Multimodal.syntheticMediaHeaders(
            Tables.load(s, dir, "documents"), "doc_id"),
          "payload")
        .select(col("media_id"), col("format"),
          col("width"), col("height"), col("channels"),
          col("sample_rate"), col("bit_depth"),
          col("format").isNotNull.as("parse_ok"))
        .orderBy(col("media_id"))))

  def oracles: Map[String, String] = Map(
    "q_media_headers" ->
      """SELECT doc_id AS media_id,
           CASE WHEN doc_id % 97 = 0 THEN NULL
                WHEN doc_id % 3 = 0 THEN 'png'
                WHEN doc_id % 3 = 1 THEN 'jpeg'
                ELSE 'wav' END AS format,
           CASE WHEN doc_id % 97 <> 0 AND doc_id % 3 IN (0, 1)
                THEN CAST((doc_id % 64) * 16 + 16 AS BIGINT) END AS width,
           CASE WHEN doc_id % 97 <> 0 AND doc_id % 3 IN (0, 1)
                THEN CAST((doc_id % 48) * 16 + 16 AS BIGINT) END AS height,
           CASE WHEN doc_id % 97 <> 0 AND doc_id % 3 = 2
                THEN CAST(doc_id % 2 + 1 AS BIGINT) END AS channels,
           CASE WHEN doc_id % 97 <> 0 AND doc_id % 3 = 2
                THEN CAST((doc_id % 5) * 8000 + 8000 AS BIGINT)
                END AS sample_rate,
           CASE WHEN doc_id % 97 <> 0 AND doc_id % 3 = 2
                THEN CAST((doc_id % 2 + 2) * 8 AS BIGINT) END AS bit_depth,
           doc_id % 97 <> 0 AS parse_ok
         FROM documents ORDER BY media_id""")
}
