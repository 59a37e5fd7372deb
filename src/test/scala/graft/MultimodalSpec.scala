package graft

import graft.ops.Multimodal
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: schema, determinism, batch shape, and — the
  * scale-critical part — that metadata-only queries prune the binary
  * payload out of the parquet scan.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")

  test("synthetic media: deterministic payloads and metadata") {
    val m1 = Multimodal.syntheticMedia(docs, "doc_id").orderBy("media_id").limit(5).collect()
    val m2 = Multimodal.syntheticMedia(docs, "doc_id").orderBy("media_id").limit(5).collect()
    assert(m1.sameElements(m2))
    val r = m1.head
    assert(Set("image", "audio", "video").contains(r.getString(1)))
    val payload = r.getAs[Array[Byte]]("payload")
    assert(payload.length % 16 == 0 && payload.nonEmpty)
  }

  test("feature extraction: stub decode is deterministic, batch-shaped") {
    val media = Multimodal.syntheticMedia(docs, "doc_id")
      .select(col("media_id"), col("kind"), col("payload"), col("meta.format"),
        col("meta.width"), col("meta.height"), col("meta.duration_ms"))
      .as[Multimodal.MediaRow]
    val feats = Multimodal.extractFeatures(media).orderBy("media_id").limit(10).collect()
    assert(feats.length == 10)
    assert(feats.forall(_.feature.length == 8))
    assert(feats.forall(f => f.thumb_bytes == math.min(16, f.n_bytes)))
    // determinism
    val again = Multimodal.extractFeatures(media).orderBy("media_id").limit(10).collect()
    assert(feats.map(_.feature.toSeq).toSeq == again.map(_.feature.toSeq).toSeq)
  }

  test("stub decode's integer face matches an independent recomputation") {
    val media = Multimodal.syntheticMedia(docs, "doc_id")
      .select(col("media_id"), col("kind"), col("payload"), col("meta.format"),
        col("meta.width"), col("meta.height"), col("meta.duration_ms"))
      .as[Multimodal.MediaRow]
    val raw = media.orderBy("media_id").limit(10).collect()
    val feats = Multimodal.extractFeatures(media).orderBy("media_id").limit(10).collect()
    raw.zip(feats).foreach { case (m, f) =>
      val wsum = m.payload.zipWithIndex.map { case (b, i) =>
        (i + 1).toLong * (b & 0xff) }.sum
      assert(f.byte_wsum === wsum)
      // frames = 16-byte blocks sampled every 4th, starting at block 0
      assert(f.n_frames === (m.payload.length / 16 + 3) / 4)
    }
  }

  test("metadata-only query prunes the payload column from the parquet scan") {
    val dir = Files.createTempDirectory("graftmedia")
    Multimodal.syntheticMedia(docs, "doc_id").write.mode("overwrite").parquet(s"$dir/media")
    val onDisk = spark.read.parquet(s"$dir/media")
    val plan = Multimodal.metadataOnly(onDisk).queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("payload"), s"payload not pruned:\n$plan")
  }

  test("frame sampling stub picks every k-th block") {
    val payload = Array.tabulate(160)(_.toByte)
    val frames = Multimodal.sampleFramesStub(payload, everyK = 3)
    assert(frames.length == 4) // blocks 0,3,6,9 of 10
    assert(frames.head.toSeq == payload.take(16).toSeq)
  }
}
