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

  test("real decode: deterministic, batch-shaped, corrupted payloads flagged") {
    val media = Multimodal.decodableMedia(docs, "doc_id")
    val feats = Multimodal.extractFeatures(media).orderBy("media_id").limit(200).collect()
    assert(feats.length == 200)
    assert(feats.forall(_.feature.length == 8))
    feats.foreach { f =>
      assert(f.decode_ok === (f.media_id % 97 != 0),
        s"media ${f.media_id}: corruption flag")
    }
    val again = Multimodal.extractFeatures(media).orderBy("media_id").limit(200).collect()
    assert(feats.map(_.feature.toSeq).toSeq == again.map(_.feature.toSeq).toSeq)
  }

  test("decoded stats match the generation rule (pixels/samples, not bytes)") {
    val media = Multimodal.decodableMedia(docs, "doc_id")
    val feats = Multimodal.extractFeatures(media).orderBy("media_id")
      .filter(col("decode_ok")).limit(50).collect()
    feats.foreach { f =>
      val id = f.media_id
      val units: Seq[Long] =
        if (id % 2 == 0) {
          val w = id % 8 + 2; val h = id % 6 + 2
          (0L until w * h).map(k => (id + k) % 256)
        } else (0L until id % 50 + 10).map(k => (id * 31 + k * 7) % 65536 - 32768)
      assert(f.n_units === units.length.toLong, s"media $id n_units")
      assert(f.unit_sum === units.sum, s"media $id unit_sum")
      assert(f.unit_min === units.min, s"media $id unit_min")
      assert(f.unit_max === units.max, s"media $id unit_max")
      // floats derive from the same decoded units
      assert(f.feature(6) === units.length.toFloat)
      assert(f.feature(1) === units.min.toFloat)
      assert(f.feature(2) === units.max.toFloat)
    }
  }

  test("PNG decoder cross-checked against the JDK's independent ImageIO reader") {
    Seq(0L, 2L, 4L, 96L, 1234L, 99998L).foreach { id =>
      val payload = Multimodal.pngPayload(id)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      assert(img != null, s"ImageIO rejected pngPayload($id)")
      val w = img.getWidth; val h = img.getHeight
      assert(w == (id % 8 + 2).toInt && h == (id % 6 + 2).toInt)
      val viaImageIo = for (r <- 0 until h; c <- 0 until w)
        yield img.getRaster.getSample(c, r, 0)
      assert(Multimodal.decodePngGray(payload).toSeq === viaImageIo,
        s"pixel mismatch vs ImageIO for id $id")
    }
  }

  test("WAV decoder cross-checked against the JDK's independent AudioSystem reader") {
    Seq(1L, 3L, 97L, 555L, 99999L).foreach { id =>
      val payload = Multimodal.wavPayload(id)
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = in.getFormat
      assert(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1)
      assert(fmt.getSampleRate.toInt == (8000 + (id % 7) * 4000).toInt)
      val bytes = in.readAllBytes()
      val viaAudio = (0 until bytes.length / 2).map(i =>
        (((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)) << 16) >> 16)
      assert(Multimodal.decodeWavPcm16(payload).toSeq === viaAudio,
        s"sample mismatch vs AudioSystem for id $id")
    }
  }

  test("thumbnails: decode -> box-average -> re-encode -> re-decode round trip") {
    val media = Multimodal.decodableMedia(docs, "doc_id")
    val thumbs = Multimodal.thumbnails(media).orderBy("media_id")
      .limit(100).collect()
    thumbs.foreach { t =>
      val id = t.media_id
      if (id % 2 == 0 && id % 97 != 0) {
        assert(t.thumb_ok, s"media $id should thumbnail")
        val w = (id % 8 + 2).toInt; val h = (id % 6 + 2).toInt
        assert(t.src_w == w && t.src_h == h)
        assert(t.thumb_w == w / 2 && t.thumb_h == h / 2)
        assert(t.thumb_bytes == 68L + (h / 2) * (w / 2 + 1))
        // independent recomputation of the box average from the rule
        val tw = w / 2
        val tpx = (0 until tw * (h / 2)).map { k =>
          val r = k / tw; val c = k % tw
          def p(rr: Int, cc: Int) = ((id + rr * w + cc) % 256).toInt
          (p(2 * r, 2 * c) + p(2 * r, 2 * c + 1) +
            p(2 * r + 1, 2 * c) + p(2 * r + 1, 2 * c + 1)) / 4
        }
        assert(t.px_sum == tpx.map(_.toLong).sum, s"media $id px_sum")
        assert(t.px_min == tpx.min && t.px_max == tpx.max)
        // the re-encoded thumbnail is a REAL PNG: ImageIO reads it
        val enc = Multimodal.pngEncodeGray(tw, h / 2, tpx.toArray)
        assert(enc.length.toLong == t.thumb_bytes)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(enc))
        assert(img != null && img.getWidth == tw && img.getHeight == h / 2)
      } else {
        assert(!t.thumb_ok && t.px_sum == 0L, s"media $id must flag")
      }
    }
  }

  test("undecodable payloads (no known magic) flag instead of crashing") {
    val media = Multimodal.syntheticMedia(docs, "doc_id")
      .select(col("media_id"), col("kind"), col("payload"), col("meta.format"),
        col("meta.width"), col("meta.height"), col("meta.duration_ms"))
      .as[Multimodal.MediaRow]
    val feats = Multimodal.extractFeatures(media).limit(10).collect()
    assert(feats.forall(f => !f.decode_ok && f.n_units == 0L))
  }

  test("metadata-only query prunes the payload column from the parquet scan") {
    val dir = Files.createTempDirectory("graftmedia")
    Multimodal.syntheticMedia(docs, "doc_id").write.mode("overwrite").parquet(s"$dir/media")
    val onDisk = spark.read.parquet(s"$dir/media")
    val plan = Multimodal.metadataOnly(onDisk).queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("payload"), s"payload not pruned:\n$plan")
  }

}
