package graft

import graft.ops.Multimodal
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the GIF codec: over RANDOM dimensions, frame
  * counts, and pixel contents, (a) the from-scratch decoder inverts
  * the from-scratch encoder exactly, and (b) the JDK's independent
  * ImageIO GIF reader decodes the SAME payload to the SAME frames —
  * so an encoder/decoder pair that is merely self-consistent (a
  * symmetric off-by-one in the LZW width schedule would round-trip
  * fine) still fails against the external reference. Raw ScalaCheck
  * Gen with a fixed seed, as Round6PropertySpec.
  */
class GifPropertySpec extends AnyFunSuite {

  private val caseGen = for {
    w <- Gen.choose(1, 40)
    h <- Gen.choose(1, 40)
    nf <- Gen.choose(1, 6)
    // bias toward runs (compressible: deep dictionary chains, KwKwK)
    // and alternations (incompressible: fast width growth)
    style <- Gen.oneOf(0, 1, 2)
    base <- Gen.choose(0, 3)
  } yield (w, h, nf, style, base)

  private def framePixels(w: Int, h: Int, f: Int, style: Int,
      base: Int): Array[Int] = Array.tabulate(w * h) { k =>
    style match {
      case 0 => (base + f + k) % 4 // rotating gradient
      case 1 => (base + f + k / 7) % 4 // runs of 7
      case _ => if ((k ^ f) % 3 == 0) base else (base + k) % 4 // jumpy
    }
  }

  test("decode inverts encode AND matches ImageIO on random payloads") {
    (0 until 25).foldLeft(Seed(20260816L)) { (seed, i) =>
      val (w, h, nf, style, base) =
        caseGen.pureApply(Gen.Parameters.default, seed)
      val frames = (0 until nf).map(f => framePixels(w, h, f, style, base))
      val payload = Multimodal.gifEncodeAnimated(w, h, frames)
      // (a) our decoder inverts our encoder, palette-mapped to gray
      val (dw, dh, decoded) = Multimodal.decodeGifFramesGray(payload)
      assert(dw === w && dh === h, s"case $i dims")
      assert(decoded.size === nf, s"case $i frame count")
      decoded.zip(frames).zipWithIndex.foreach { case ((got, exp), f) =>
        assert(got.sameElements(exp.map(_ * 85)), s"case $i frame $f")
      }
      // (b) the independent JDK reader agrees pixel-for-pixel
      val it = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
      assert(it.hasNext, "JDK GIF reader missing")
      val reader = it.next()
      reader.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload)))
      assert(reader.getNumImages(true) === nf, s"case $i ImageIO count")
      (0 until nf).foreach { f =>
        val img = reader.read(f)
        for (r <- 0 until h; c <- 0 until w) {
          val gray = (img.getRGB(c, r) >> 16) & 0xff
          assert(gray === frames(f)(r * w + c) * 85,
            s"case $i frame $f pixel ($r,$c) vs ImageIO")
        }
      }
      reader.dispose()
      seed.next
    }
  }

  /** Greedy-LZW parse model (the parse every LZW encoder with a
    * 4096-entry dictionary and reset-on-full policy produces): returns
    * (mid-stream clears, peak code width). Independent of the codec's
    * bitstream layout — it asserts the test DATA forces the deep-
    * dictionary paths, so a future "simpler" pixel fill that stops
    * exercising them fails here rather than silently narrowing
    * coverage (r13 advice: the old `k * 2654435761L % 4` fill reduced
    * to `k % 4`, whose dictionary peaked at 696 entries — no 12-bit
    * codes, zero clears).
    */
  private def lzwParseStats(px: Array[Int], nSyms: Int): (Int, Int) = {
    var dict = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
    var next = nSyms + 2 // after clear + EOI codes
    var clears = 0
    var peakWidth = 0
    var cur = -1
    px.foreach { s =>
      if (cur < 0) cur = s
      else dict.get((cur, s)) match {
        case Some(code) => cur = code
        case None =>
          // emit `cur` at the current width, then add the new entry
          var width = 2
          while ((1 << width) < next + 1) width += 1
          peakWidth = math.max(peakWidth, width)
          dict((cur, s)) = next
          next += 1
          if (next >= 4096) { dict.clear(); next = nSyms + 2; clears += 1 }
          cur = s
      }
    }
    (clears, peakWidth)
  }

  test("large single frames force 12-bit codes and mid-stream clears, both validated externally") {
    // 300x200 = 60k seeded-random pixels: incompressible, so the
    // dictionary passes 4096 entries several times — the clear-reset
    // path is exercised repeatedly and ImageIO must still agree
    val w = 300; val h = 200
    val rnd = new scala.util.Random(1L)
    val px = Array.fill(w * h)(rnd.nextInt(4))
    // assert the premise, not just the round-trip: this data must
    // actually force 12-bit codes and >=2 mid-stream clears
    val (clears, peakWidth) = lzwParseStats(px, nSyms = 4)
    assert(clears >= 2, s"pixel fill no longer forces mid-stream clears (got $clears)")
    assert(peakWidth === 12, s"pixel fill no longer forces 12-bit codes (peak $peakWidth)")
    val payload = Multimodal.gifEncodeAnimated(w, h, Seq(px))
    val (_, _, decoded) = Multimodal.decodeGifFramesGray(payload)
    assert(decoded.head.sameElements(px.map(_ * 85)))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    assert(img != null && img.getWidth === w && img.getHeight === h)
    for (r <- 0 until h; c <- 0 until w) {
      assert(((img.getRGB(c, r) >> 16) & 0xff) === px(r * w + c) * 85,
        s"pixel ($r,$c) vs ImageIO")
    }
  }
}
