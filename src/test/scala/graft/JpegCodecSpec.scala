package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{JpegCodec, PixelCodec}

/** The real baseline JPEG codec: block-constant encode→decode exactness
  * (the DCT-preserving planted shape), DC prediction across blocks,
  * totality on junk/truncation/progressive streams, the general AC path
  * against an independent reference IDCT, and the cross-codec contract
  * with the PNG pipeline.
  */
class JpegCodecSpec extends AnyFunSuite {

  /** Block-constant pattern: value of 8×8 block (bx,by) is a wrapping
    * mix, including <128 and ≥128 so DC diffs go both signs.
    */
  private def blockPattern(w: Int, h: Int): Array[Byte] = {
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(y * w + x) = (((x / 8) * 37 + (y / 8) * 101 + 3) % 256).toByte
        x += 1
      }
      y += 1
    }
    px
  }

  test("block-constant encode→decode is EXACT (DC-only blocks, flat quant)") {
    for ((w, h) <- Seq((8, 8), (16, 8), (144, 128), (64, 64))) {
      val px = blockPattern(w, h)
      val jpg = JpegCodec.encodeJpegBlockConstant(w, h, px)
      val d = JpegCodec.decodeJpeg(jpg).getOrElse(fail(s"decode failed ${w}x$h"))
      assert(d.width == w && d.height == h && d.channels == 1)
      assert(d.pixels.sameElements(px), s"pixel mismatch ${w}x$h")
    }
  }

  test("extreme values 0 and 255 survive the level-shift round trip") {
    val px = new Array[Byte](16 * 8)
    java.util.Arrays.fill(px, 0, 64, 0.toByte)
    // second block all 255
    var y = 0
    while (y < 8) { var x = 8; while (x < 16) { px(y * 16 + x) = 255.toByte; x += 1 }; y += 1 }
    val d = JpegCodec.decodeJpeg(JpegCodec.encodeJpegBlockConstant(16, 8, px)).get
    assert(d.pixels.sameElements(px))
  }

  test("decode is total on junk and truncation") {
    assert(JpegCodec.decodeJpeg(Array.emptyByteArray).isEmpty)
    assert(JpegCodec.decodeJpeg(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
    assert(JpegCodec.decodeJpeg(Array.fill[Byte](200)(0x33)).isEmpty)
    val good = JpegCodec.encodeJpegBlockConstant(16, 16, blockPattern(16, 16))
    for (n <- Seq(2, 20, 100, good.length / 2))
      assert(JpegCodec.decodeJpeg(good.take(n)).isEmpty, s"truncation at $n decoded")
  }

  test("progressive (SOF2) streams are rejected, not mis-decoded") {
    val good = JpegCodec.encodeJpegBlockConstant(16, 16, blockPattern(16, 16))
    // find the SOF0 marker and rewrite it to SOF2
    var i = 2
    var done = false
    val bad = good.clone()
    while (!done && i + 4 < bad.length) {
      if ((bad(i) & 0xff) == 0xff && (bad(i + 1) & 0xff) == 0xc0) {
        bad(i + 1) = 0xc2.toByte; done = true
      } else {
        val len = ((bad(i + 2) & 0xff) << 8) | (bad(i + 3) & 0xff)
        i += 2 + len
      }
    }
    assert(done)
    assert(JpegCodec.decodeJpeg(bad).isEmpty)
  }

  /** Independent reference 2D IDCT for the AC-path check. */
  private def refIdct(coef: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
            val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
            s += cu * cv * coef(v * 8 + u) *
              math.cos((2 * x + 1) * u * math.Pi / 16) *
              math.cos((2 * y + 1) * v * math.Pi / 16)
            u += 1
          }
          v += 1
        }
        val p = math.round(s / 4.0 + 128.0).toInt
        out(y * 8 + x) = math.max(0, math.min(255, p))
        x += 1
      }
      y += 1
    }
    out
  }

  test("general AC path: hand-built stream with an AC coefficient matches a reference IDCT") {
    // one 8x8 image; custom tiny Huffman tables:
    //  DC: 1 code of length 1 → symbol 0 (category 0, no bits)
    //  AC: 2 codes of length 2 → symbols 0x01 (run0/size1), 0x00 (EOB)
    val out = new java.io.ByteArrayOutputStream()
    def m(mk: Int): Unit = { out.write(0xff); out.write(mk) }
    def seg(mk: Int, p: Array[Int]): Unit = {
      m(mk); val len = p.length + 2
      out.write(len >> 8); out.write(len & 0xff); p.foreach(out.write)
    }
    m(0xd8)
    seg(0xdb, Array(0x00) ++ Array.fill(64)(1))
    seg(0xc0, Array(8, 0, 8, 0, 8, 1, 1, 0x11, 0))
    seg(0xc4, Array(0x00, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
    seg(0xc4, Array(0x10, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0x01, 0x00))
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0))
    // entropy bits: DC '0'; AC '00' + value bit '1' (coef +1 at zigzag 1);
    // EOB '01'; pad with 1s → 0 00 1 01 11 = 0x17
    out.write(0x17)
    m(0xd9)
    val d = JpegCodec.decodeJpeg(out.toByteArray).getOrElse(fail("AC stream failed"))
    val coef = new Array[Int](64)
    coef(1) = 1 // zigzag index 1 = natural (v=0, u=1)
    val expect = refIdct(coef)
    assert(d.pixels.map(_ & 0xff).sameElements(expect))
  }

  test("cross-codec contract: PNG and JPEG of the same block-constant content decode identically") {
    val (w, h) = (72, 64)
    val grey = blockPattern(w, h)
    val png = PixelCodec.encodePng(w, h, 1, grey)
    val jpg = JpegCodec.encodeJpegBlockConstant(w, h, grey)
    val dp = PixelCodec.decodePng(png).get
    val dj = JpegCodec.decodeJpeg(jpg).get
    assert(dp.pixels.sameElements(dj.pixels))
  }

  /** 8×8-block-constant planes for the color round trips: per-block
    * values derived from the block coordinates with different mixes per
    * plane so chroma genuinely varies (clamping fires on some blocks).
    */
  private def planes420(w: Int, h: Int): (Array[Byte], Array[Byte], Array[Byte]) = {
    val y = new Array[Byte](w * h)
    val cb = new Array[Byte](w / 2 * (h / 2))
    val cr = new Array[Byte](w / 2 * (h / 2))
    for (py <- 0 until h; px <- 0 until w)
      y(py * w + px) = (((py / 8) * 37 + (px / 8) * 59) % 256).toByte
    for (py <- 0 until h / 2; px <- 0 until w / 2) {
      // chroma blocks are 8x8 in the SUBSAMPLED plane (16x16 in luma px)
      cb(py * (w / 2) + px) = (((py / 8) * 71 + (px / 8) * 23 + 5) % 256).toByte
      cr(py * (w / 2) + px) = (((py / 8) * 13 + (px / 8) * 97 + 11) % 256).toByte
    }
    (y, cb, cr)
  }

  test("color 4:2:0 encode→decode is EXACT through upsample + fixed-point YCbCr→RGB") {
    val (w, h) = (48, 32)
    val (yP, cbP, crP) = planes420(w, h)
    val jpg = JpegCodec.encodeJpegColor(w, h, yP, cbP, crP, subsample420 = true)
    val d = JpegCodec.decodeJpeg(jpg).get
    assert(d.width == w && d.height == h && d.channels == 3)
    for (py <- 0 until h; px <- 0 until w) {
      val yy = yP(py * w + px) & 0xff
      val cb = cbP((py / 2) * (w / 2) + px / 2) & 0xff
      val cr = crP((py / 2) * (w / 2) + px / 2) & 0xff
      val (r, g, b) = JpegCodec.yccToRgb(yy, cb, cr)
      val o = (py * w + px) * 3
      assert((d.pixels(o) & 0xff) == r && (d.pixels(o + 1) & 0xff) == g &&
        (d.pixels(o + 2) & 0xff) == b, s"pixel ($px,$py)")
    }
  }

  test("color 4:4:4 encode→decode is EXACT (no subsampling, per-MCU 3 blocks)") {
    val (w, h) = (24, 16)
    val y = new Array[Byte](w * h)
    val cb = new Array[Byte](w * h)
    val cr = new Array[Byte](w * h)
    for (py <- 0 until h; px <- 0 until w) {
      y(py * w + px) = (((py / 8) * 41 + (px / 8) * 67) % 256).toByte
      cb(py * w + px) = (((py / 8) * 29 + (px / 8) * 83 + 7) % 256).toByte
      cr(py * w + px) = (((py / 8) * 89 + (px / 8) * 19 + 3) % 256).toByte
    }
    val jpg = JpegCodec.encodeJpegColor(w, h, y, cb, cr, subsample420 = false)
    val d = JpegCodec.decodeJpeg(jpg).get
    assert(d.width == w && d.height == h && d.channels == 3)
    for (py <- 0 until h; px <- 0 until w) {
      val (r, g, b) = JpegCodec.yccToRgb(
        y(py * w + px) & 0xff, cb(py * w + px) & 0xff, cr(py * w + px) & 0xff)
      val o = (py * w + px) * 3
      assert((d.pixels(o) & 0xff) == r && (d.pixels(o + 1) & 0xff) == g &&
        (d.pixels(o + 2) & 0xff) == b, s"pixel ($px,$py)")
    }
  }

  test("planted fixtures: PNG, color GIF and 4:2:0 color JPEG decode to identical RGB") {
    for (docId <- Seq(0L, 3L, 41L)) {
      val dp = PixelCodec.decodePng(ImageQueries.plantedPng(docId)).get
      val dg = graft.multimodal.GifCodec.decodeGif(ImageQueries.plantedGif(docId)).get
      val dj = JpegCodec.decodeJpeg(ImageQueries.plantedJpeg(docId)).get
      assert(dp.channels == 3 && dg.channels == 3 && dj.channels == 3)
      assert(dp.pixels.sameElements(dg.pixels), s"PNG vs GIF, doc $docId")
      assert(dp.pixels.sameElements(dj.pixels), s"PNG vs JPEG, doc $docId")
    }
  }

  test("yccToRgb pins the fixed-point constants: neutral chroma is identity, clamps saturate") {
    for (v <- Seq(0, 1, 127, 128, 254, 255))
      assert(JpegCodec.yccToRgb(v, 128, 128) == ((v, v, v)))
    assert(JpegCodec.yccToRgb(255, 128, 255) == ((255, 164, 255))) // R clamped high
    assert(JpegCodec.yccToRgb(0, 128, 255) == ((178, 0, 0)))       // G clamped low
    // spot value against the real-arithmetic form round(1.402*(cr-128))
    assert(JpegCodec.yccToRgb(100, 128, 200)._1 ==
      100 + math.round(1.402 * 72).toInt)
  }

  test("progressive planted fixture decodes pixel-identical to its baseline twin") {
    for (id <- Seq(0L, 7L, 42L, 123L)) {
      val base = JpegCodec.decodeJpeg(ImageQueries.plantedJpeg(id)).get
      val prog = ImageQueries.plantedJpegProgressive(id)
      assert(JpegCodec.jpegKind(prog) == "progressive")
      assert(JpegCodec.decodeJpeg(prog).isEmpty,
        "the baseline decoder must not accept a SOF2 stream")
      val d = JpegCodec.decodeJpegProgressive(prog).getOrElse(
        fail(s"progressive decode failed for doc $id"))
      assert(d.width == base.width && d.height == base.height &&
        d.channels == base.channels)
      assert(d.pixels.sameElements(base.pixels),
        s"progressive/baseline pixel divergence for doc $id")
    }
    // and the progressive decoder refuses baseline frames + the
    // malformed stub (SOF2 marker over a baseline-coded scan)
    assert(JpegCodec.decodeJpegProgressive(ImageQueries.plantedJpeg(1L)).isEmpty)
    val stub = ImageQueries.plantedProgressiveStub(1L)
    assert(JpegCodec.decodeJpeg(stub).isEmpty)
    assert(JpegCodec.decodeJpegProgressive(stub).isEmpty)
  }

  test("progressive successive approximation: hand-built stream with AC refinement on nonzero history") {
    // 8x8 single component; target coefficients (natural order):
    // DC = 6, c(1) = 5 (odd → needs the Al=0 correction bit on nonzero
    // history), c(16) = 1 (invisible at Al=1 → appears as a NEW nonzero
    // in the refinement scan after skipping one zero-history position)
    val out = new java.io.ByteArrayOutputStream()
    def m(mk: Int): Unit = { out.write(0xff); out.write(mk) }
    def seg(mk: Int, p: Array[Int]): Unit = {
      m(mk); val len = p.length + 2
      out.write(len >> 8); out.write(len & 0xff); p.foreach(out.write)
    }
    m(0xd8)
    seg(0xdb, Array(0x00) ++ Array.fill(64)(1))
    seg(0xc2, Array(8, 0, 8, 0, 8, 1, 1, 0x11, 0))
    // DC table: one 1-bit code → category 2
    seg(0xc4, Array(0x00, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2))
    // AC table: three 2-bit codes → 0x02 (r0 s2), 0x00 (EOB), 0x11 (r1 s1)
    seg(0xc4, Array(0x10, 0, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0x02, 0x00, 0x11))
    // scan 1: DC first, Al=1 — diff = 6>>1 = 3: cat-2 code '0' + bits '11'
    seg(0xda, Array(1, 1, 0x00, 0, 0, 0x01)); out.write(0x7f)
    // scan 2: DC refinement — one raw bit '0' (6 is even)
    seg(0xda, Array(1, 1, 0x00, 0, 0, 0x10)); out.write(0x7f)
    // scan 3: AC first, band 1..63, Al=1 — c(1)>>1 = 2: '00' + '10', EOB '01'
    seg(0xda, Array(1, 1, 0x00, 1, 63, 0x01)); out.write(0x27)
    // scan 4: AC refinement, Al=0 — 0x11 '10' + sign '1' (+1 at the
    // second zero-history slot) + correction '1' for c(1) (4→5), EOB '01'
    seg(0xda, Array(1, 1, 0x00, 1, 63, 0x10)); out.write(0xb7)
    m(0xd9)
    val d = JpegCodec.decodeJpegProgressive(out.toByteArray)
      .getOrElse(fail("progressive SA stream failed to decode"))
    val coef = new Array[Int](64)
    coef(0) = 6; coef(1) = 5; coef(16) = 1
    val expect = refIdct(coef)
    assert(d.pixels.map(_ & 0xff).sameElements(expect),
      s"got ${d.pixels.map(_ & 0xff).take(8).mkString(",")} " +
        s"want ${expect.take(8).mkString(",")}")
  }

  test("jpegKind: SOF census classifies baseline/progressive/garbage; SOF2 is quarantined") {
    val base = ImageQueries.plantedJpeg(42L)
    assert(JpegCodec.jpegKind(base) == "baseline")
    assert(JpegCodec.decodeJpeg(base).isDefined)

    val prog = ImageQueries.plantedProgressiveStub(42L)
    assert(JpegCodec.jpegKind(prog) == "progressive")
    // the baseline decoder must REFUSE a progressive frame, not
    // half-decode it — the quarantine census counts exactly this
    assert(JpegCodec.decodeJpeg(prog).isEmpty)
    // the rewrite touched only the frame marker
    assert(prog.length == base.length)
    assert(prog.zip(base).count { case (a, b) => a != b } == 1)

    assert(JpegCodec.jpegKind(Array[Byte](1, 2, 3, 4)) == "not_jpeg")
    assert(JpegCodec.jpegKind(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)) == "no_frame")
    // truncated mid-segment: malformed, not a crash
    assert(JpegCodec.jpegKind(base.take(6)) == "malformed" ||
      JpegCodec.jpegKind(base.take(6)) == "no_frame")
    // arithmetic-coded frame marker (SOF9)
    val arith = base.clone()
    arith(JpegCodec.sof0Offset(base) + 1) = 0xc9.toByte
    assert(JpegCodec.jpegKind(arith) == "arithmetic")
  }

  test("0xFF fill bytes before a marker are legal padding (T.81 B.1.1.2), not malformed") {
    // splice two fill bytes right after SOI: FF D8 FF FF FF <marker>...
    def padded(b: Array[Byte]): Array[Byte] =
      b.take(2) ++ Array(0xff.toByte, 0xff.toByte) ++ b.drop(2)

    val base = ImageQueries.plantedJpeg(42L)
    assert(JpegCodec.jpegKind(padded(base)) == "baseline")
    val d = JpegCodec.decodeJpeg(padded(base))
    assert(d.isDefined, "baseline decode rejected legal fill bytes")
    assert(d.get.pixels.sameElements(JpegCodec.decodeJpeg(base).get.pixels))

    val prog = ImageQueries.plantedJpegProgressive(42L)
    assert(JpegCodec.jpegKind(padded(prog)) == "progressive")
    val p = JpegCodec.decodeJpegProgressive(padded(prog))
    assert(p.isDefined, "progressive decode rejected legal fill bytes")
    assert(p.get.pixels.sameElements(JpegCodec.decodeJpegProgressive(prog).get.pixels))

    // sof0Offset walks past the padding too
    assert(JpegCodec.sof0Offset(padded(base)) == JpegCodec.sof0Offset(base) + 2)
  }
}
