package graft

import graft.ops.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Hostile-input properties for the baseline-grayscale JPEG decoder
  * (r14 verdict item 4) — the GifPropertySpec discipline applied to
  * the newest codec: fuzzed markers, truncated segments, hostile SOF
  * dimensions (the GIF w*h pre-allocation lesson), short DQT/DHT
  * declared lengths, entropy truncation mid-block, restart-marker
  * abuse. The contract everywhere is flag-not-crash: hostile bytes
  * throw IllegalArgumentException (an Exception the dataset callers
  * catch into a flagged row), never an Error (OutOfMemoryError /
  * NegativeArraySizeException would kill an executor), and never
  * hang or allocate proportional to an unvalidated header field.
  */
class JpegHostileSpec extends AnyFunSuite {

  private def valid(): Array[Byte] =
    Multimodal.jpegEncodeGray(8, 8, Array.tabulate(64)(k => k * 3 % 256))

  private def markerIdx(p: Array[Byte], m: Int): Int = {
    val idx = p.sliding(2).indexWhere(s =>
      (s(0) & 0xff) == 0xff && (s(1) & 0xff) == m)
    assert(idx > 0, f"marker FF$m%02X not found")
    idx
  }

  private def flags(p: Array[Byte]): Boolean =
    try { Multimodal.decodeJpegGrayDims(p); false }
    catch { case _: IllegalArgumentException => true }

  test("hostile SOF dimensions flag before any pixel allocation (the GIF w*h lesson)") {
    // patch the real encoder's SOF to declare 65535 x 65535: w*h
    // overflows Int, and even representable huge dims must flag
    // BEFORE the decoder allocates w*h ints from a tiny payload
    val p = valid()
    val body = markerIdx(p, 0xc0) + 4
    for ((hh, ww) <- Seq((0xffff, 0xffff), (0x4000, 0x4000), (0xffff, 2))) {
      val q = p.clone()
      q(body + 1) = ((hh >>> 8) & 0xff).toByte; q(body + 2) = (hh & 0xff).toByte
      q(body + 3) = ((ww >>> 8) & 0xff).toByte; q(body + 4) = (ww & 0xff).toByte
      val t0 = System.nanoTime()
      assert(flags(q), s"$ww x $hh must flag")
      // flagging must happen at header-parse time, not after work
      // proportional to the declared area
      assert((System.nanoTime() - t0) < 1e9, s"$ww x $hh took too long")
    }
    // zero dimensions flag too (w*h = 0 would "fit" any bound)
    for ((hh, ww) <- Seq((0, 8), (8, 0))) {
      val q = p.clone()
      q(body + 1) = ((hh >>> 8) & 0xff).toByte; q(body + 2) = (hh & 0xff).toByte
      q(body + 3) = ((ww >>> 8) & 0xff).toByte; q(body + 4) = (ww & 0xff).toByte
      assert(flags(q), s"$ww x $hh must flag")
    }
  }

  test("truncation at every byte boundary flags or decodes, never crashes or hangs") {
    val p = valid()
    val full = Multimodal.decodeJpegGray(p)
    val sosIdx = markerIdx(p, 0xda)
    val len = ((p(sosIdx + 2) & 0xff) << 8) | (p(sosIdx + 3) & 0xff)
    val scan = sosIdx + 2 + len
    // every strict prefix: header truncation, segment truncation, and
    // entropy truncation mid-block are all covered by construction.
    // Prefixes ending before the entropy data MUST flag; entropy-region
    // prefixes either flag (bits lost mid-block) or — once every block
    // is present, e.g. only the EOI dropped — decode to the full image.
    for (n <- 0 until p.length) {
      val q = p.take(n)
      try {
        val (w, h, px) = Multimodal.decodeJpegGrayDims(q)
        assert(n > scan, s"prefix $n decoded before entropy data exists")
        assert(w === 8 && h === 8 && px.sameElements(full),
          s"prefix $n decoded to something else")
      } catch { case _: IllegalArgumentException => () }
    }
  }

  test("short declared DQT length must not read past the segment") {
    val p = valid()
    val idx = markerIdx(p, 0xdb)
    // declared length 3: one table-spec byte, then the 64 table bytes
    // would overrun into the next segment
    val q = p.clone()
    q(idx + 2) = 0; q(idx + 3) = 3
    assert(flags(q), "short DQT must flag")
  }

  test("short declared DHT length must not read past the segment") {
    val p = valid()
    val idx = markerIdx(p, 0xc4)
    val q = p.clone()
    // length 4: table-class byte + 2 of the 16 BITS bytes — the BITS
    // read alone would overrun
    q(idx + 2) = 0; q(idx + 3) = 4
    assert(flags(q), "short DHT must flag")
    // length covering BITS but not the declared symbol count
    val r = p.clone()
    r(idx + 2) = 0; r(idx + 3) = 19 // 2 + 1 + 16: zero room for symbols
    assert(flags(r), "DHT with symbols past segment must flag")
  }

  test("bad table ids flag instead of indexing out of bounds") {
    val p = valid()
    val sof = markerIdx(p, 0xc0) + 4
    val q = p.clone()
    q(sof + 8) = 0x07 // quant table id 7 (tables array has 4 slots)
    assert(flags(q), "quant id > 3 must flag")
    val sos = markerIdx(p, 0xda) + 4
    val r = p.clone()
    r(sos + 2) = 0xff.toByte // DC table 15 / AC table 15
    assert(flags(r), "Huffman table id > 3 must flag")
  }

  test("unsupported SOF variants and misplaced EOI flag cleanly") {
    val p = valid()
    val sofMarker = markerIdx(p, 0xc0)
    // SOF0 flipped to SOF2 routes to the REAL progressive decoder now,
    // which must still flag: the baseline SOS header (Ss=0, Se=63) is
    // not a valid progressive scan header
    val prog = p.clone(); prog(sofMarker + 1) = 0xc2.toByte
    assert(flags(prog), "baseline stream mislabeled SOF2 must flag")
    val lossless = p.clone(); lossless(sofMarker + 1) = 0xc3.toByte
    assert(flags(lossless), "lossless SOF must flag")
    // EOI spliced in before SOS
    val eoiEarly = p.take(sofMarker) ++
      Array(0xff.toByte, 0xd9.toByte) ++ p.drop(sofMarker)
    assert(flags(eoiEarly), "EOI before SOS must flag")
  }

  test("restart-marker abuse: unexpected RSTn mid-entropy flags") {
    // no DRI declared, but an unstuffed RST0 interrupts the entropy
    // data two bytes in — the bit reader sees a real marker where a
    // Huffman code is expected
    val p = valid()
    val sosIdx = markerIdx(p, 0xda)
    val len = ((p(sosIdx + 2) & 0xff) << 8) | (p(sosIdx + 3) & 0xff)
    val scan = sosIdx + 2 + len
    val q = p.take(scan + 1) ++ Array(0xff.toByte, 0xd0.toByte) ++ p.drop(scan + 1)
    assert(flags(q), "unexpected RST must flag")
  }

  test("single-byte fuzz over the whole payload: decode or flag, never crash/hang") {
    val p = valid()
    val rnd = new scala.util.Random(151)
    var flagged = 0
    for (_ <- 1 to 2000) {
      val q = p.clone()
      val at = rnd.nextInt(p.length)
      q(at) = (rnd.nextInt(256)).toByte
      // contract: IllegalArgumentException only — any Error or other
      // unexpected Throwable fails the suite; a successful decode of a
      // benignly-mutated stream is equally fine
      try { Multimodal.decodeJpegGrayDims(q); () }
      catch { case _: IllegalArgumentException => flagged += 1 }
    }
    info(s"flagged $flagged / 2000 single-byte mutations")
  }

  private def flagsRgb(p: Array[Byte]): Boolean =
    try { Multimodal.decodeJpegRgbDims(p); false }
    catch { case _: IllegalArgumentException => true }

  test("color streams: truncation sweep, sampling abuse, scan-order abuse all flag") {
    val p = Multimodal.jpegColorPayload(5L) // real 4:2:0 interleaved payload
    val full = Multimodal.decodeJpegRgbDims(p)._3
    val sosIdx = markerIdx(p, 0xda)
    val len = ((p(sosIdx + 2) & 0xff) << 8) | (p(sosIdx + 3) & 0xff)
    val scan = sosIdx + 2 + len
    for (n <- 0 until p.length) {
      try {
        val (w, h, rgb) = Multimodal.decodeJpegRgbDims(p.take(n))
        assert(n > scan, s"prefix $n decoded before entropy data exists")
        assert(rgb.sameElements(full), s"prefix $n decoded to something else")
        assert(w === 48 && h === 32) // id 5: mw = 3, mh = 2 MCUs
      } catch { case _: IllegalArgumentException => () }
    }
    // SOF body for 3 components: prec(0) h(1,2) w(3,4) nf(5) then
    // (id, hv, q) triples at 6..14
    val sof = markerIdx(p, 0xc0) + 4
    val lumaAbuse = p.clone(); lumaAbuse(sof + 7) = 0x31 // 3x1 luma
    assert(flagsRgb(lumaAbuse), "luma sampling 3x1 must flag")
    val chromaAbuse = p.clone(); chromaAbuse(sof + 10) = 0x21 // 2x1 chroma
    assert(flagsRgb(chromaAbuse), "subsampled chroma must flag")
    // SOS listing components out of frame order must flag, not decode
    // with swapped table/plane assignment
    val sos = sosIdx + 4
    val swapped = p.clone()
    swapped(sos + 1) = 3; swapped(sos + 5) = 1 // cs1 <-> cs3
    assert(flagsRgb(swapped), "scan order mismatch must flag")
    // single-byte fuzz over the color payload: decode or flag, never
    // crash or hang (the interleaved-MCU walk under mutation)
    val rnd = new scala.util.Random(153)
    var flagged = 0
    for (_ <- 1 to 1000) {
      val q = p.clone()
      q(rnd.nextInt(p.length)) = rnd.nextInt(256).toByte
      try { Multimodal.decodeJpegRgbDims(q); () }
      catch { case _: IllegalArgumentException => flagged += 1 }
    }
    info(s"flagged $flagged / 1000 color mutations")
  }

  test("PROGRESSIVE: truncation at every byte boundary flags or decodes, never crashes or hangs") {
    val p = Multimodal.jpegProgPayload(5L)
    val full = Multimodal.decodeJpegGray(p)
    for (n <- 0 until p.length) {
      val t0 = System.nanoTime()
      try Multimodal.decodeJpegGrayDims(p.take(n))
      catch { case _: IllegalArgumentException => () }
      assert((System.nanoTime() - t0) < 2e9, s"prefix $n hung")
    }
    assert(Multimodal.decodeJpegGray(p).sameElements(full))
  }

  test("PROGRESSIVE: single-byte fuzz — decode or flag, never crash/hang") {
    // the multi-scan walk adds surfaces a baseline stream lacks (scan
    // headers, EOB runs, refinement bits, the between-scan marker
    // resume) — fuzz them all
    val p = Multimodal.jpegProgPayload(17L)
    val rnd = new scala.util.Random(1602L)
    var flagged = 0
    for (_ <- 0 until 2000) {
      val q = p.clone()
      q(rnd.nextInt(q.length)) = rnd.nextInt(256).toByte
      val t0 = System.nanoTime()
      try Multimodal.decodeJpegGrayDims(q)
      catch { case _: IllegalArgumentException => flagged += 1 }
      assert((System.nanoTime() - t0) < 2e9, "mutation hung")
    }
    info(s"flagged $flagged / 2000 progressive mutations")
    assert(flagged > 0)
  }

  test("PROGRESSIVE: hostile scan headers flag cleanly") {
    val p = Multimodal.jpegProgPayload(3L)
    def sosOffsets(q: Array[Byte]): Seq[Int] = {
      val out = scala.collection.mutable.ArrayBuffer[Int]()
      var i = 0
      while (i + 1 < q.length) {
        if ((q(i) & 0xff) == 0xff && (q(i + 1) & 0xff) == 0xda) out += i
        i += 1
      }
      out.toSeq
    }
    val scans = sosOffsets(p)
    assert(scans.size == 3, s"expected 3 scans, found ${scans.size}")
    // DC scan with Se != 0
    locally {
      val q = p.clone(); q(scans(0) + 4 + 4) = 63.toByte // Se of scan 1
      assert(flags(q), "DC scan with Se=63 must flag")
    }
    // AC scan claiming Ss > Se
    locally {
      val q = p.clone(); q(scans(2) + 4 + 3) = 70.toByte // Ss of scan 3
      assert(flags(q), "Ss > 63 must flag")
    }
    // refinement jumping two bits (Ah must be Al+1)
    locally {
      val q = p.clone(); q(scans(1) + 4 + 5) = 0x30.toByte // Ah=3, Al=0
      assert(flags(q), "Ah != Al+1 must flag")
    }
    // frame-less scan: drop SOF2 entirely
    locally {
      val sof = markerIdx(p, 0xc2)
      val len = ((p(sof + 2) & 0xff) << 8) | (p(sof + 3) & 0xff)
      val q = p.take(sof) ++ p.drop(sof + 2 + len)
      assert(flags(q), "SOS before SOF2 must flag")
    }
    // hostile SOF2 dims: the JpegMaxPixels guard applies here too
    locally {
      val body = markerIdx(p, 0xc2) + 4
      val q = p.clone()
      q(body + 1) = 0xff.toByte; q(body + 2) = 0xff.toByte
      q(body + 3) = 0xff.toByte; q(body + 4) = 0xff.toByte
      val t0 = System.nanoTime()
      assert(flags(q), "65535x65535 SOF2 must flag")
      assert((System.nanoTime() - t0) < 1e9, "flag must precede allocation")
    }
  }

  test("random-garbage and random-marker-soup payloads flag") {
    val rnd = new scala.util.Random(152)
    for (i <- 1 to 300) {
      val n = 2 + rnd.nextInt(400)
      val q = new Array[Byte](n)
      rnd.nextBytes(q)
      // force a JPEG signature half the time so the marker walk runs
      if (i % 2 == 0 && n >= 4) {
        q(0) = 0xff.toByte; q(1) = 0xd8.toByte; q(2) = 0xff.toByte
      }
      try { Multimodal.decodeJpegGrayDims(q); () }
      catch { case _: IllegalArgumentException => () }
    }
  }
}
