package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Multimodal, PixelCodec}

/** The real PNG pixel codec: encode→decode identity (which exercises all
  * five filter types — the encoder cycles them by row), cross-check
  * against the header-only parser, box-resize exactness, luma fixed
  * point, and dHash band packing.
  */
class PixelCodecSpec extends AnyFunSuite {

  private def pattern(w: Int, h: Int, c: Int): Array[Byte] = {
    val px = new Array[Byte](w * h * c)
    var i = 0
    while (i < px.length) {
      // non-trivial, wraps, includes negative-byte values
      px(i) = ((i * 31 + (i / w) * 7 + 123) % 256).toByte
      i += 1
    }
    px
  }

  test("encode→decode identity, greyscale and RGB, heights spanning all 5 filters") {
    for ((w, h, c) <- Seq((17, 11, 1), (17, 11, 3), (5, 5, 1), (1, 7, 3), (9, 1, 1))) {
      val px = pattern(w, h, c)
      val png = PixelCodec.encodePng(w, h, c, px)
      val d = PixelCodec.decodePng(png).getOrElse(fail(s"decode failed ${w}x$h c=$c"))
      assert(d.width == w && d.height == h && d.channels == c)
      assert(d.pixels.sameElements(px), s"pixel mismatch ${w}x$h c=$c")
    }
  }

  test("encoded PNG parses under the header-only codec with matching dims") {
    val png = PixelCodec.encodePng(31, 13, 3, pattern(31, 13, 3))
    assert(Multimodal.HeaderCodec.decodePng(png).contains((31, 13, 3)))
  }

  test("decode is total on junk, truncation, and a headers-only container") {
    assert(PixelCodec.decodePng("not a png at all".getBytes).isEmpty)
    val png = PixelCodec.encodePng(8, 8, 1, pattern(8, 8, 1))
    assert(PixelCodec.decodePng(png.take(20)).isEmpty)
    assert(PixelCodec.decodePng(png.dropRight(30)).isEmpty) // truncated IDAT
    // pngWrap plants a valid signature+IHDR but NO pixel data: the header
    // codec reads it, the pixel codec must refuse it
    val headerOnly = Multimodal.pngWrap(10, 10, "payload".getBytes)
    assert(Multimodal.HeaderCodec.decodePng(headerOnly).contains((10, 10, 3)))
    assert(PixelCodec.decodePng(headerOnly).isEmpty)
  }

  test("box resize recovers cell values exactly on a cell-aligned image") {
    val (gw, gh, cw, ch) = (9, 8, 4, 4)
    val (w, h) = (gw * cw, gh * ch)
    val cell = (cx: Int, cy: Int) => (cx * 29 + cy * 17) % 256
    val px = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      px(y * w + x) = cell(x / cw, y / ch).toByte
    val grid = PixelCodec.resizeArea(px, w, h, gw, gh)
    for (cy <- 0 until gh; cx <- 0 until gw)
      assert(grid(cy * gw + cx) == cell(cx, cy).toDouble, s"cell ($cx,$cy)")
  }

  test("box resize on non-aligned dims averages the covered box") {
    // 3x2 -> 2x1: boxes are cols [0,1) and [1,3) x rows [0,2)
    val px = Array[Byte](10, 20, 30, 40, 50, 60)
    val g = PixelCodec.resizeArea(px, 3, 2, 2, 1)
    assert(g(0) == (10 + 40) / 2.0)
    assert(g(1) == (20 + 30 + 50 + 60) / 4.0)
  }

  test("luminance uses the (77,150,29)>>8 fixed-point form") {
    val px = Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0, 0, 0, 255.toByte, 100, 100, 100)
    val l = PixelCodec.luminance(px, 3)
    assert((l(0) & 0xff) == (77 * 255) >> 8)
    assert((l(1) & 0xff) == (150 * 255) >> 8)
    assert((l(2) & 0xff) == (29 * 255) >> 8)
    assert((l(3) & 0xff) == (77 * 100 + 150 * 100 + 29 * 100) >> 8)
  }

  test("dHash bands: known grid, bit positions, and hamming locality") {
    // strictly increasing rows -> every bit set: each band = 0xFFFF
    val inc = Array.tabulate(72)(i => (i % 9).toDouble)
    assert(PixelCodec.dhashBands(inc).forall(_ == 0xffffL))
    // strictly decreasing -> no bits
    val dec = Array.tabulate(72)(i => -(i % 9).toDouble)
    assert(PixelCodec.dhashBands(dec).forall(_ == 0L))
    // flip one comparison: row 3 (band 1, local row 1), col 5
    val one = dec.clone()
    one(3 * 9 + 6) = 100.0 // makes grid[3][5] < grid[3][6] true, [3][6] < [3][7] false
    val b = PixelCodec.dhashBands(one)
    assert(b(1) == (1L << (1 * 8 + 5)), s"band1=${b(1)}")
    assert(b(0) == 0 && b(2) == 0 && b(3) == 0)
  }

  test("planted image fixture: j=3 perturbs at most 2 dHash bits vs its group base") {
    def bandsOf(docId: Long): Array[Long] = {
      val png = plantedPngFor(docId)
      val d = PixelCodec.decodePng(png).get
      val luma = PixelCodec.luminance(d.pixels, d.channels)
      PixelCodec.dhashBands(PixelCodec.resizeArea(luma, d.width, d.height, 9, 8))
    }
    // reconstruct through ImageQueries' own cell formula via the public query
    for (g <- 0L until 6L) {
      val base = bandsOf(g * 4)
      assert(bandsOf(g * 4 + 1).sameElements(base))
      assert(bandsOf(g * 4 + 2).sameElements(base))
      val j3 = bandsOf(g * 4 + 3)
      val ham = base.zip(j3).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      assert(ham <= 2, s"group $g: hamming $ham")
    }
  }

  /** Local re-plant using the ImageQueries closed form (kept in lockstep
    * via the shared cellRgb).
    */
  private def plantedPngFor(docId: Long): Array[Byte] = {
    val (cw, ch, gw, gh) = (16, 16, 9, 8)
    val (w, h) = (gw * cw, gh * ch)
    val px = new Array[Byte](w * h * 3)
    for (cy <- 0 until gh; cx <- 0 until gw) {
      val (r, g, b) = ImageQueries.cellRgb(docId, cx, cy)
      for (y <- cy * ch until (cy + 1) * ch; x <- cx * cw until (cx + 1) * cw) {
        val i = (y * w + x) * 3
        px(i) = r.toByte; px(i + 1) = g.toByte; px(i + 2) = b.toByte
      }
    }
    PixelCodec.encodePng(w, h, 3, px)
  }
}
