package graft.queries

import graft.Tables
import graft.ops.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 part 1 (r10 verdict item 8), extended round 12 (r11
  * verdict item 3): REAL multimodal header parsing replacing the
  * stub's hex digests for the header fields — PNG/JPEG/WAV/GIF/WebP
  * dimensions and audio parameters read by pure in-plan byte
  * arithmetic on the binary payload column (public format specs, no
  * codec, no UDF). GIF and WebP complete the reference's own
  * image-extension surface (`insert.go:183-226` names `.gif`/`.webp`;
  * the reference data dir ships `1.webp`); the WebP payloads cycle all
  * three public bitstream variants (VP8 lossy, VP8L lossless, VP8X
  * extended) so each dim encoding is parsed. The payloads carry
  * genuine format headers synthesized in-plan with every field a
  * deterministic function of the id, so the oracle predicts the PARSE
  * result from the GENERATION rule — if the byte walk misreads any
  * offset, endianness, bit packing, or marker length, the hash check
  * fails. Every 97th payload is corrupted; those must come back
  * `parse_ok = false` with null fields, never an error (the no-crash
  * contract for malformed media at scale).
  */
object Round11aQueries {

  /** The media payload table as STORED state (r17, the q_entities /
    * DedupFixtures staging precedent): a real system stores media
    * BYTES — payloads are write-once ingest state, not something a
    * header-audit query synthesizes per run. The synthesis expressions
    * are the single largest expression trees in the suite (the
    * five-format byte-builder CASE), and carrying them in the timed
    * plan made q_media_headers ~90% driver-side planning (measured
    * 0.53 s gap vs 0.05 s of execution). The fixture is a
    * deterministic function of documents.doc_id; the oracle is
    * unchanged — it predicts the PARSE result from the generation
    * rule, so a misparse (or a stale fixture) still fails the hash.
    */
  private def mediaPayloads(s: SparkSession, dir: String): DataFrame =
    Tables.storedFixture(s, dir, "media_payloads_v1")(
      Multimodal.syntheticMediaHeaders(
        Tables.load(s, dir, "documents"), "doc_id"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_media_headers" -> ((s, dir) =>
      Multimodal.parseHeaders(mediaPayloads(s, dir), "payload")
        .select(col("media_id"), col("format"),
          col("width"), col("height"), col("channels"),
          col("sample_rate"), col("bit_depth"),
          col("has_alpha"), col("has_animation"),
          col("format").isNotNull.as("parse_ok"))
        .orderBy(col("media_id"))))

  def oracles: Map[String, String] = Map(
    "q_media_headers" ->
      """SELECT doc_id AS media_id,
           CASE WHEN doc_id % 97 = 0 THEN NULL
                WHEN doc_id % 5 = 0 THEN 'png'
                WHEN doc_id % 5 = 1 THEN 'jpeg'
                WHEN doc_id % 5 = 2 THEN 'wav'
                WHEN doc_id % 5 = 3 THEN 'gif'
                ELSE 'webp' END AS format,
           CASE WHEN doc_id % 97 <> 0 AND doc_id % 5 IN (0, 1, 3, 4)
                THEN CAST((doc_id % 64) * 16 + 16 AS BIGINT) END AS width,
           CASE WHEN doc_id % 97 <> 0 AND doc_id % 5 IN (0, 1, 3, 4)
                THEN CAST((doc_id % 48) * 16 + 16 AS BIGINT) END AS height,
           CASE WHEN doc_id % 97 <> 0 AND doc_id % 5 = 2
                THEN CAST(doc_id % 2 + 1 AS BIGINT) END AS channels,
           CASE WHEN doc_id % 97 <> 0 AND doc_id % 5 = 2
                THEN CAST((doc_id % 7) * 4000 + 8000 AS BIGINT)
                END AS sample_rate,
           CASE WHEN doc_id % 97 <> 0 AND doc_id % 5 = 2
                THEN CAST((doc_id % 2 + 2) * 8 AS BIGINT) END AS bit_depth,
           CASE WHEN doc_id % 97 <> 0 AND doc_id % 5 = 4 THEN
                CASE WHEN (doc_id // 5) % 3 = 0 THEN FALSE
                     ELSE doc_id % 2 = 0 END END AS has_alpha,
           CASE WHEN doc_id % 97 <> 0 AND doc_id % 5 = 4 THEN
                CASE WHEN (doc_id // 5) % 3 = 2 THEN doc_id % 3 = 0
                     ELSE FALSE END END AS has_animation,
           doc_id % 97 <> 0 AS parse_ok
         FROM documents ORDER BY media_id""")
}
