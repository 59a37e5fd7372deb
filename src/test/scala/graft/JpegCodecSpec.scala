package graft

import graft.ops.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The from-scratch baseline-grayscale JPEG codec (r13 verdict item 3)
  * against the JDK's INDEPENDENT ImageIO JPEG reader/writer — the
  * GifPropertySpec discipline: a merely self-consistent
  * encoder/decoder pair (symmetric Huffman or zigzag bug) fails here.
  * ImageIO comparisons allow max |diff| <= 1 per pixel: ISO/IEC
  * 10918-1 Annex A permits that much IDCT variance between conforming
  * decoders (ImageIO uses libjpeg's scaled-integer islow IDCT, ours is
  * the orthonormal separable double form). Block-constant images are
  * DC-only and must round-trip bit-exactly through OUR decoder — the
  * property the q_media_jpeg generation-rule oracle leans on.
  */
class JpegCodecSpec extends AnyFunSuite {

  // Raw raster samples, NOT getRGB: a grayscale JPEG decodes to
  // TYPE_BYTE_GRAY, whose getRGB applies the linear-gray -> sRGB gamma
  // conversion (observed |diff| up to 73 on mid-grays) — the raster
  // holds the actual decoded JPEG samples.
  private def imageIoDecode(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    assert(img != null, "ImageIO could not read the payload")
    val w = img.getWidth; val h = img.getHeight
    val r = img.getRaster
    val px = Array.tabulate(w * h)(k => r.getSample(k % w, k / w, 0))
    (w, h, px)
  }

  private def imageIoEncodeGray(w: Int, h: Int,
      px: Array[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    for (k <- px.indices) r.setSample(k % w, k / w, 0, px(k) & 0xff)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out),
      "ImageIO has no JPEG writer")
    out.toByteArray
  }

  private def maxAbsDiff(a: Array[Int], b: Array[Int]): Int =
    a.zip(b).map { case (x, y) => math.abs(x - y) }.max

  test("block-constant images round-trip bit-exactly (the oracle premise)") {
    for (id <- 0L to 40L) {
      val payload = Multimodal.jpegPayload(id)
      val bw = (id % 4 + 1).toInt; val bh = (id % 3 + 1).toInt
      val w = 8 * bw; val h = 8 * bh
      val expected = Array.tabulate(w * h) { k =>
        val bi = (k / w) / 8; val bj = (k % w) / 8
        ((id + 7 * bi + 13 * bj) % 256).toInt
      }
      val (dw, dh, px) = Multimodal.decodeJpegGrayDims(payload)
      assert(dw === w && dh === h, s"id $id dims")
      assert(px.sameElements(expected), s"id $id pixels not bit-exact")
      // the independent JDK reader agrees within the Annex A tolerance
      val (iw, ih, ipx) = imageIoDecode(payload)
      assert(iw === w && ih === h, s"id $id ImageIO dims")
      assert(maxAbsDiff(px, ipx) <= 1, s"id $id vs ImageIO")
    }
  }

  test("our decoder matches ImageIO within +/-1 on random non-constant images") {
    val rnd = new scala.util.Random(20260816L)
    for (i <- 0 until 20) {
      // odd dims exercise the 8x8 edge-replication padding + crop
      val w = rnd.nextInt(40) + 1
      val h = rnd.nextInt(40) + 1
      val px = Array.fill(w * h)(rnd.nextInt(256))
      val payload = Multimodal.jpegEncodeGray(w, h, px)
      val (dw, dh, got) = Multimodal.decodeJpegGrayDims(payload)
      assert(dw === w && dh === h, s"case $i dims")
      val (iw, ih, ipx) = imageIoDecode(payload)
      assert(iw === w && ih === h, s"case $i ImageIO dims")
      assert(maxAbsDiff(got, ipx) <= 1, s"case $i decode vs ImageIO")
      // the all-ones quant table loses only DCT rounding: both decoders
      // stay near the source pixels (a loose sanity bound, not a spec
      // guarantee — rounding the AC coefficients perturbs each pixel by
      // at most sum |round err * basis| < 64 * 0.5 * 0.25 = 8)
      assert(maxAbsDiff(got, px) <= 8, s"case $i decode vs source")
    }
  }

  test("our decoder reads ImageIO-ENCODED JPEGs (independent encoder, real quant tables)") {
    val rnd = new scala.util.Random(7L)
    for (i <- 0 until 12) {
      val w = rnd.nextInt(60) + 1
      val h = rnd.nextInt(60) + 1
      // smooth gradient + mild noise: a realistic compressible field
      val px = Array.tabulate(w * h) { k =>
        val r = k / w; val c = k % w
        math.min(255, math.max(0, 3 * r + 2 * c + rnd.nextInt(9) - 4))
      }
      val payload = imageIoEncodeGray(w, h, px)
      val (dw, dh, got) = Multimodal.decodeJpegGrayDims(payload)
      assert(dw === w && dh === h, s"case $i dims")
      // compare against ImageIO's OWN decode of its own encode: both
      // decoders see identical quantized coefficients, so only IDCT
      // variance separates them
      val (_, _, ipx) = imageIoDecode(payload)
      assert(maxAbsDiff(got, ipx) <= 1, s"case $i vs ImageIO round trip")
    }
  }

  private def imageIoEncodeGrayProgressive(w: Int, h: Int,
      px: Array[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    for (k <- px.indices) r.setSample(k % w, k / w, 0, px(k) & 0xff)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose(); ios.close()
    out.toByteArray
  }

  test("PROGRESSIVE encode of block-constant images decodes bit-exactly") {
    for (id <- 0L to 40L) {
      val payload = Multimodal.jpegProgPayload(id)
      assert(Multimodal.jpegIsProgressive(payload), s"id $id not SOF2")
      val bw = (id % 4 + 1).toInt; val bh = (id % 3 + 1).toInt
      val w = 8 * bw; val h = 8 * bh
      val expected = Array.tabulate(w * h) { k =>
        val bi = (k / w) / 8; val bj = (k % w) / 8
        ((id + 7 * bi + 13 * bj) % 256).toInt
      }
      val (dw, dh, px) = Multimodal.decodeJpegGrayDims(payload)
      assert(dw === w && dh === h, s"id $id dims")
      assert(px.sameElements(expected), s"id $id pixels not bit-exact")
      // the independent JDK reader decodes our progressive stream too
      val (iw, ih, ipx) = imageIoDecode(payload)
      assert(iw === w && ih === h, s"id $id ImageIO dims")
      assert(maxAbsDiff(px, ipx) <= 1, s"id $id vs ImageIO")
    }
  }

  test("PROGRESSIVE and baseline encodes of the same image decode IDENTICALLY") {
    // both pipelines carry the identical quantized coefficients (same
    // FDCT, all-ones quant), so after the multi-scan reassembly the
    // progressive decode must be BIT-identical to the baseline decode
    // — any error in band splitting, successive approximation, or EOB
    // runs shows as a pixel diff here
    val rnd = new scala.util.Random(160L)
    for (i <- 0 until 20) {
      val w = rnd.nextInt(40) + 1
      val h = rnd.nextInt(40) + 1
      val px = Array.fill(w * h)(rnd.nextInt(256))
      val prog = Multimodal.jpegEncodeGrayProgressive(w, h, px)
      val base = Multimodal.jpegEncodeGray(w, h, px)
      val (pw2, ph2, gotP) = Multimodal.decodeJpegGrayDims(prog)
      val (_, _, gotB) = Multimodal.decodeJpegGrayDims(base)
      assert(pw2 === w && ph2 === h, s"case $i dims")
      assert(gotP.sameElements(gotB), s"case $i progressive != baseline")
      val (_, _, ipx) = imageIoDecode(prog)
      assert(maxAbsDiff(gotP, ipx) <= 1, s"case $i vs ImageIO")
    }
  }

  test("our decoder reads ImageIO-encoded PROGRESSIVE JPEGs (real scan scripts incl. AC refinement)") {
    // the JDK writer's MODE_DEFAULT emits the classic libjpeg
    // progressive scan script — spectral selection bands AND
    // successive-approximation AC refinement scans with correction
    // bits, the hardest part of Annex G — so this is the independent
    // cross-check that the refinement walk is right, not just
    // self-consistent
    val rnd = new scala.util.Random(77L)
    for (i <- 0 until 12) {
      val w = rnd.nextInt(60) + 1
      val h = rnd.nextInt(60) + 1
      val px = Array.tabulate(w * h) { k =>
        val r = k / w; val c = k % w
        math.min(255, math.max(0, 3 * r + 2 * c + rnd.nextInt(9) - 4))
      }
      val payload = imageIoEncodeGrayProgressive(w, h, px)
      assert(Multimodal.jpegIsProgressive(payload),
        s"case $i: ImageIO did not emit SOF2")
      val (dw, dh, got) = Multimodal.decodeJpegGrayDims(payload)
      assert(dw === w && dh === h, s"case $i dims")
      val (_, _, ipx) = imageIoDecode(payload)
      assert(maxAbsDiff(got, ipx) <= 1, s"case $i vs ImageIO round trip")
    }
  }

  // byte offset just past the SOS header = start of entropy data
  private def sosEnd(p: Array[Byte]): Int = {
    val idx = sosIdx(p)
    val len = ((p(idx + 2) & 0xff) << 8) | (p(idx + 3) & 0xff)
    idx + 2 + len
  }

  private def sosIdx(p: Array[Byte]): Int = {
    val idx = p.sliding(2).indexWhere(s =>
      (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xda)
    assert(idx > 0, "SOS not found")
    idx
  }

  // entropy-coded bytes: SOS header end up to (not including) EOI
  private def entropyBytes(p: Array[Byte]): Array[Byte] =
    p.slice(sosEnd(p), p.length - 2)

  test("restart markers: interval-0 DRI segment is walked past without effect") {
    val px = Array.tabulate(64)(k => k * 3 % 256)
    val payload = Multimodal.jpegEncodeGray(8, 8, px)
    val dri = Array(0xff, 0xdd, 0x00, 0x04, 0x00, 0x00).map(_.toByte)
    val idx = sosIdx(payload)
    val spliced = payload.take(idx) ++ dri ++ payload.drop(idx)
    val (w, h, got) = Multimodal.decodeJpegGrayDims(spliced)
    assert(w === 8 && h === 8)
    assert(got.sameElements(Multimodal.decodeJpegGray(payload)))
  }

  test("restart markers: a real DRI=1 stream decodes, resetting DC prediction at RST0") {
    // hand-assembled two-block stream (r14 advice): each block's
    // entropy data comes from a FRESH single-block encode, so each is
    // coded against DC prediction 0 — exactly what a conforming
    // decoder reconstructs only if it resets the predictor at the
    // restart marker. Constant blocks are DC-only, so a predictor bug
    // shifts the second block's pixels and the bit-exact assert fails.
    val a = Multimodal.jpegEncodeGray(8, 8, Array.fill(64)(100))
    val b = Multimodal.jpegEncodeGray(8, 8, Array.fill(64)(200))
    val c = Multimodal.jpegEncodeGray(16, 8, Array.fill(128)(0))
    val header = c.take(sosEnd(c))
    val idx = sosIdx(header)
    val dri = Array(0xff, 0xdd, 0x00, 0x04, 0x00, 0x01).map(_.toByte)
    val rst0 = Array(0xff, 0xd0).map(_.toByte)
    val eoi = Array(0xff, 0xd9).map(_.toByte)
    val withDri = header.take(idx) ++ dri ++ header.drop(idx)
    val spliced = withDri ++ entropyBytes(a) ++ rst0 ++ entropyBytes(b) ++ eoi
    val (w, h, px) = Multimodal.decodeJpegGrayDims(spliced)
    assert(w === 16 && h === 8)
    val expected = Array.tabulate(128)(k => if (k % 16 < 8) 100 else 200)
    assert(px.sameElements(expected), "DC prediction not reset at RST0")
    // the independent JDK reader agrees the stream is conforming
    val (iw, ih, ipx) = imageIoDecode(spliced)
    assert(iw === 16 && ih === 8)
    assert(maxAbsDiff(px, ipx) <= 1)
    // the same stream MISSING its restart marker must flag, not
    // misdecode: the decoder expects RST0 after block 1 and finds
    // entropy bits instead
    val noRst = withDri ++ entropyBytes(a) ++ entropyBytes(b) ++ eoi
    intercept[IllegalArgumentException] {
      Multimodal.decodeJpegGrayDims(noRst)
    }
  }

  // ---- color path (r14 verdict item 6) ----

  // the decoder's exact JFIF inverse convert, reimplemented
  // independently for expected values
  private def yccToRgb(y: Int, cb0: Int, cr0: Int): Int = {
    val cb = cb0 - 128.0; val cr = cr0 - 128.0
    def c8(v: Double) = math.max(0, math.min(255, math.round(v).toInt))
    (c8(y + 1.402 * cr) << 16) | (c8(y - 0.344136 * cb -
      0.714136 * cr) << 8) | c8(y + 1.772 * cb)
  }

  test("block-constant YCbCr round-trips bit-exactly through the color pair (4:4:4 and 4:2:0)") {
    // 4:2:0: 32x16 = 2 MCUs; Y constant per 8x8 block, chroma plane
    // constant per (subsampled) 8x8 block = per MCU — all DC-only
    val w = 32; val h = 16
    def yOf(bi: Int, bj: Int) = 16 * (bi * 4 + bj) + 10
    val yPx = Array.tabulate(w * h)(k => yOf((k / w) / 8, (k % w) / 8))
    def cbOf(mj: Int) = 100 + 50 * mj
    def crOf(mj: Int) = 80 + 60 * mj
    val cb = Array.tabulate((w / 2) * (h / 2))(k => cbOf((k % (w / 2)) / 8))
    val cr = Array.tabulate((w / 2) * (h / 2))(k => crOf((k % (w / 2)) / 8))
    val p420 = Multimodal.jpegEncodeYcc(w, h, yPx, cb, cr, subsample = true)
    val (dw, dh, rgb) = Multimodal.decodeJpegRgbDims(p420)
    assert(dw === w && dh === h)
    val expected = Array.tabulate(w * h) { k =>
      val mj = (k % w) / 16
      yccToRgb(yOf((k / w) / 8, (k % w) / 8), cbOf(mj), crOf(mj))
    }
    assert(rgb.sameElements(expected), "4:2:0 not bit-exact")
    // 4:4:4: full-res chroma, constant per 8x8 block
    val cbF = Array.tabulate(w * h)(k => cbOf((k % w) / 16))
    val crF = Array.tabulate(w * h)(k => crOf((k % w) / 16))
    val p444 = Multimodal.jpegEncodeYcc(w, h, yPx, cbF, crF, subsample = false)
    val (_, _, rgb444) = Multimodal.decodeJpegRgbDims(p444)
    assert(rgb444.sameElements(expected), "4:4:4 not bit-exact")
    // a grayscale stream through the RGB entry point: R = G = B = Y
    val gray = Multimodal.jpegEncodeGray(8, 8, Array.fill(64)(77))
    val (_, _, grgb) = Multimodal.decodeJpegRgbDims(gray)
    assert(grgb.forall(_ == ((77 << 16) | (77 << 8) | 77)))
  }

  test("all four luma sampling shapes round-trip block-constant YCbCr") {
    // 4:4:4 (1,1), 4:2:2 (2,1), 4:4:0 (1,2), 4:2:0 (2,2) — the full
    // sampling surface the decoder claims; Y constant per 8x8 luma
    // block, chroma constant per 8x8 CHROMA block, all DC-only
    val w = 32; val h = 32
    def yOf(bi: Int, bj: Int) = 40 + 16 * ((bi + bj) % 6)
    val yPx = Array.tabulate(w * h)(k => yOf((k / w) / 8, (k % w) / 8))
    for ((hs, vs) <- Seq((1, 1), (2, 1), (1, 2), (2, 2))) {
      val cw = w / hs; val ch = h / vs
      def cbOf(ci: Int, cj: Int) = 60 + 20 * ((ci + 2 * cj) % 5)
      def crOf(ci: Int, cj: Int) = 70 + 15 * ((2 * ci + cj) % 7)
      val cb = Array.tabulate(cw * ch)(k => cbOf((k / cw) / 8, (k % cw) / 8))
      val cr = Array.tabulate(cw * ch)(k => crOf((k / cw) / 8, (k % cw) / 8))
      val p = Multimodal.jpegEncodeYccSampling(w, h, yPx, cb, cr, hs, vs)
      val (dw, dh, rgb) = Multimodal.decodeJpegRgbDims(p)
      assert(dw === w && dh === h, s"sampling ${hs}x$vs dims")
      val expected = Array.tabulate(w * h) { k =>
        val y = k / w; val x = k % w
        val ci = (y / vs) / 8; val cj = (x / hs) / 8
        yccToRgb(yOf(y / 8, x / 8), cbOf(ci, cj), crOf(ci, cj))
      }
      assert(rgb.sameElements(expected), s"sampling ${hs}x$vs not bit-exact")
    }
  }

  private def imageIoDecodeRgb(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    assert(img != null, "ImageIO could not read the payload")
    val w = img.getWidth; val h = img.getHeight
    val px = Array.tabulate(w * h)(k =>
      img.getRGB(k % w, k / w) & 0xffffff)
    (w, h, px)
  }

  private def maxChannelDiff(a: Array[Int], b: Array[Int]): Int =
    a.zip(b).map { case (x, y) =>
      math.max(math.abs(((x >>> 16) & 0xff) - ((y >>> 16) & 0xff)),
        math.max(math.abs(((x >>> 8) & 0xff) - ((y >>> 8) & 0xff)),
          math.abs((x & 0xff) - (y & 0xff))))
    }.max

  test("ImageIO reads our 4:4:4 color streams within conversion tolerance") {
    // each decoder applies its own IDCT (+/-1 per component, Annex A)
    // and its own YCbCr->RGB (libjpeg fixed-point vs our double,
    // +/-1): |dR| <= 1 + 1.402 + 1 and |dB| <= 1 + 1.772 + 1 — use 4
    val rnd = new scala.util.Random(77)
    val w = 24; val h = 16
    val rgb = Array.tabulate(w * h) { k =>
      (rnd.nextInt(256) << 16) | (rnd.nextInt(256) << 8) | rnd.nextInt(256)
    }
    val p = Multimodal.jpegEncodeColor(w, h, rgb, subsample = false)
    val (dw, dh, ours) = Multimodal.decodeJpegRgbDims(p)
    val (iw, ih, theirs) = imageIoDecodeRgb(p)
    assert(dw === iw && dh === ih && dw === w && dh === h)
    assert(maxChannelDiff(ours, theirs) <= 4,
      s"max channel diff ${maxChannelDiff(ours, theirs)}")
  }

  test("ImageIO reads our 4:2:0 streams (constant chroma, so upsamplers agree)") {
    // fancy (triangle) upsampling vs our replication only agree on
    // constant chroma — exactly the corpus discipline the driver rows
    // use; Y varies freely
    val rnd = new scala.util.Random(78)
    val w = 32; val h = 32
    val yPx = Array.tabulate(w * h)(_ => rnd.nextInt(256))
    val cb = Array.fill((w / 2) * (h / 2))(90)
    val cr = Array.fill((w / 2) * (h / 2))(170)
    val p = Multimodal.jpegEncodeYcc(w, h, yPx, cb, cr, subsample = true)
    val (dw, dh, ours) = Multimodal.decodeJpegRgbDims(p)
    val (iw, ih, theirs) = imageIoDecodeRgb(p)
    assert(dw === iw && dh === ih && dw === w && dh === h)
    assert(maxChannelDiff(ours, theirs) <= 4,
      s"max channel diff ${maxChannelDiff(ours, theirs)}")
  }

  test("our decoder reads ImageIO-ENCODED color JPEGs (4:2:0, two quant tables, four Huffman tables)") {
    // equal-channel RGB forward-converts to Cb = Cr = 128 (constant),
    // so libjpeg's default 4:2:0 subsampling and fancy upsampling are
    // the identity on chroma and the decoders stay comparable; the
    // stream still exercises real luma/chroma quant tables, the
    // chroma DC/AC Huffman pair, component ids, and the MCU walk
    val rnd = new scala.util.Random(79)
    val w = 40; val h = 24
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = math.min(255, math.max(0, 4 * x + 3 * y + rnd.nextInt(7) - 3))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out))
    val p = out.toByteArray
    val (dw, dh, ours) = Multimodal.decodeJpegRgbDims(p)
    val (iw, ih, theirs) = imageIoDecodeRgb(p)
    assert(dw === iw && dh === ih && dw === w && dh === h)
    assert(maxChannelDiff(ours, theirs) <= 4,
      s"max channel diff ${maxChannelDiff(ours, theirs)}")
  }

  test("parseHeaders reads the real encoder's JFIF framing (header path and codec agree)") {
    // the header-only path (q_media_headers) and the real codec must
    // agree on the format and dimensions of the SAME bytes — the
    // invariant that makes metadata-only pruning trustworthy
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions.col
    val media = graft.ops.Multimodal.decodableJpeg(
        spark.range(1L, 120L).toDF("doc_id"), "doc_id")
      .toDF()
      .filter(col("media_id") % 97 =!= 0) // corrupted rows flag elsewhere
      .select(col("media_id"), col("payload"),
        col("width").as("exp_w"), col("height").as("exp_h"))
    val mismatches = graft.ops.Multimodal.parseHeaders(media, "payload")
      .filter(col("format").isNull || col("format") =!= "jpeg" ||
        col("width") =!= col("exp_w") || col("height") =!= col("exp_h"))
      .count()
    assert(mismatches === 0L)
  }

  test("malformed payloads flag instead of crashing") {
    val good = Multimodal.jpegPayload(5L)
    // corrupted signature
    val c1 = good.clone(); c1(0) = 0x42
    intercept[Exception](Multimodal.decodeJpegGray(c1))
    // truncated entropy data
    val c2 = good.take(good.length - 6)
    intercept[Exception](Multimodal.decodeJpegGray(c2))
    // progressive SOF marker
    val c3 = good.clone()
    val sof = c3.sliding(2).indexWhere(s =>
      (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xc0)
    c3(sof + 1) = 0xc2.toByte
    intercept[Exception](Multimodal.decodeJpegGray(c3))
  }
}
