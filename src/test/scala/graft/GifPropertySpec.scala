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

  test("large single frames force 12-bit codes and mid-stream clears, both validated externally") {
    // 300x200 = 60k incompressible-ish pixels: the dictionary passes
    // 4096 entries several times, so the clear-reset path is exercised
    // repeatedly and ImageIO must still agree
    val w = 300; val h = 200
    val px = Array.tabulate(w * h)(k => (k * 2654435761L % 4).toInt)
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
