package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with a typed metadata struct, plus the decode / feature-extract /
  * resize / frame-sample plumbing a training pipeline needs.
  *
  * The actual codec calls are STUBBED (this container has no image or
  * audio libraries): `decodeStub` derives deterministic fake features
  * from the payload bytes. Everything around the stub — schema, batch
  * shape (per-partition iteration), partitioning, column pruning — is
  * real and tested; swapping the stub body for a JNI/library call is a
  * one-function change.
  *
  * Scale notes: payloads stay in the `binary` column (parquet keeps
  * them out of dictionary encoding); metadata lives in a separate
  * struct column so metadata-only queries never read payload bytes
  * (column pruning skips the binary chunk entirely).
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      format: String, width: Int, height: Int, duration_ms: Long)

  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      feature: Array[Float], thumb_bytes: Long, n_frames: Long,
      byte_wsum: Long)

  /** Synthesize a media table from any keyed table: payload = repeated
    * md5 bytes of the key (deterministic), metadata derived from it.
    * Stands in for a real ingest of image/audio files.
    */
  def syntheticMedia(df: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol).cast("long")
    df.select(
      id.as("media_id"),
      element_at(lit(Array("image", "audio", "video")), (id % 3 + 1).cast("int")).as("kind"),
      // 16 md5 bytes repeated (1 + id mod 8) times → 16..128-byte payloads
      expr("unhex(repeat(md5(cast(media_id as string)), cast(media_id % 8 + 1 as int)))").as("payload"),
      struct(
        element_at(lit(Array("png", "wav", "mp4")), (id % 3 + 1).cast("int")).as("format"),
        ((id % 64) * 16 + 16).cast("int").as("width"),
        ((id % 48) * 16 + 16).cast("int").as("height"),
        (id % 120 * 1000).as("duration_ms")).as("meta"))
  }

  /** Decode + feature-extract, batched per partition (the mapInPandas
    * batch shape, in Scala: one iterator per partition so a real
    * implementation can amortize codec/model setup across the batch).
    *
    * STUB: the `decodeOne` body fakes 8 float features from payload
    * bytes; a real build would decode the image/audio here.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup would open the codec/model ONCE here
      rows.map(decodeOne)
    }
  }

  private def decodeOne(m: MediaRow): MediaFeatures = {
    // --- STUB: deterministic fake decode -------------------------------
    // Real implementation: decode m.payload with an image/audio codec,
    // run the feature extractor. Deterministic fake: 8 features from a
    // rolling byte hash, so tests are exact and reproducible.
    var h = 1125899906842597L
    val feats = new Array[Float](8)
    var i = 0
    var wsum = 0L // position-weighted byte sum: exact-integer digest of
    // the decoded bytes, the cross-engine-checkable face of this stub
    // (sum_{i} (i+1)*byte_i; <= 128 bytes * 255 * 128 — no overflow)
    m.payload.foreach { b =>
      h = h * 31 + (b & 0xff)
      feats(i % 8) += ((h % 1000).toFloat / 1000.0f)
      wsum += (i + 1).toLong * (b & 0xff)
      i += 1
    }
    // -------------------------------------------------------------------
    MediaFeatures(m.media_id, m.kind, m.payload.length.toLong, feats,
      thumbnailStub(m.payload).length.toLong,
      sampleFramesStub(m.payload, 4).length.toLong, wsum)
  }

  /** Resize/thumbnail STUB: a real build re-encodes; the fake keeps the
    * first 16 payload bytes (shape-preserving: binary → smaller binary).
    */
  def thumbnailStub(payload: Array[Byte]): Array[Byte] =
    payload.take(16)

  /** Frame sampling STUB for video payloads: every k-th 16-byte block
    * stands in for every k-th frame.
    */
  def sampleFramesStub(payload: Array[Byte], everyK: Int): Seq[Array[Byte]] =
    payload.grouped(16).zipWithIndex.collect {
      case (frame, idx) if idx % everyK == 0 => frame
    }.toSeq

  /** Column-level helpers that don't touch payload bytes at all —
    * metadata-only queries prune the binary column from the scan.
    */
  def metadataOnly(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("kind"), col("meta.format"),
      col("meta.width"), col("meta.height"), col("meta.duration_ms"))

  /** Exact duplicate detection over opaque media payloads — the first
    * dedup pass of any image/audio corpus (the same asset re-scraped
    * under many ids). Groups by (md5(payload), byte length) and keeps
    * the smallest id; emits copy counts and the bytes reclaimed by
    * keeping one copy per group. The hash is computed in-plan from the
    * binary column (codegen'd md5), so at 100 TB this is one scan plus
    * a shuffle of 16-byte digests — payload bytes never shuffle.
    * Every output field is integer/deterministic; the oracle replays
    * the grouping arithmetic.
    */
  def payloadDedup(media: DataFrame, idCol: String,
      payloadCol: String): DataFrame =
    media.select(col(idCol).cast("long").as("_id"),
        md5(col(payloadCol)).as("_h"),
        length(col(payloadCol)).cast("long").as("_len"))
      .groupBy(col("_h"), col("_len"))
      .agg(min(col("_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"),
        col("_len").as("payload_bytes"),
        ((col("n_copies") - 1L) * col("_len")).as("reclaimed_bytes"))
}
