package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{GifCodec, Multimodal, PixelCodec}

/** The real GIF LZW codec: encode→decode identity at sizes that exercise
  * code-width growth (9→12 bits) AND the 4096-entry table reset, the
  * KwKwK edge case, sub-block framing at the 255-byte boundary,
  * extension-block skipping, totality on junk/truncation, and the
  * cross-codec contract the `q_cross_codec_dups` oracle leans on (PNG
  * and GIF of the same content → identical dHash fingerprints).
  */
class GifCodecSpec extends AnyFunSuite {

  private def pattern(w: Int, h: Int): Array[Byte] = {
    val px = new Array[Byte](w * h)
    var i = 0
    while (i < px.length) {
      px(i) = ((i * 31 + (i / w) * 7 + 123) % 256).toByte
      i += 1
    }
    px
  }

  test("encode→decode identity, small image (single LZW table, no reset)") {
    for ((w, h) <- Seq((17, 11), (5, 5), (1, 7), (9, 1))) {
      val px = pattern(w, h)
      val gif = GifCodec.encodeGif(w, h, px)
      val d = GifCodec.decodeGif(gif).getOrElse(fail(s"decode failed ${w}x$h"))
      assert(d.width == w && d.height == h && d.channels == 1)
      assert(d.pixels.sameElements(px), s"pixel mismatch ${w}x$h")
    }
  }

  test("encode→decode identity at 144x128 — overflows the 4096-entry table, so the clear/reset path runs") {
    val (w, h) = (144, 128)
    val px = pattern(w, h)
    val gif = GifCodec.encodeGif(w, h, px)
    val d = GifCodec.decodeGif(gif).getOrElse(fail("decode failed"))
    assert(d.pixels.sameElements(px))
  }

  test("KwKwK edge case: runs of a repeated byte force codes one past the table") {
    // aaa... produces the classic cScSc sequence where the decoder must
    // synthesize the not-yet-defined code from prev + first(prev)
    for (n <- Seq(3, 10, 257, 1000)) {
      val px = Array.fill[Byte](n)(42)
      val d = GifCodec.decodeGif(GifCodec.encodeGif(n, 1, px))
        .getOrElse(fail(s"decode failed run n=$n"))
      assert(d.pixels.sameElements(px), s"run n=$n")
    }
  }

  test("constant and two-value images round-trip (degenerate dictionaries)") {
    val const = Array.fill[Byte](64 * 64)(0)
    assert(GifCodec.decodeGif(GifCodec.encodeGif(64, 64, const))
      .exists(_.pixels.sameElements(const)))
    val alt = Array.tabulate[Byte](64 * 64)(i => (i % 2).toByte)
    assert(GifCodec.decodeGif(GifCodec.encodeGif(64, 64, alt))
      .exists(_.pixels.sameElements(alt)))
  }

  test("encoded GIF parses under the header-only codec with matching dims") {
    val gif = GifCodec.encodeGif(31, 13, pattern(31, 13))
    assert(Multimodal.HeaderCodec.decodeGif(gif).contains((31, 13, 3)))
  }

  test("decode skips extension blocks before the image descriptor") {
    val gif = GifCodec.encodeGif(6, 4, pattern(6, 4))
    // splice a Graphic Control Extension (0x21 0xf9, 4-byte block) after
    // the global color table (13-byte header + 768-byte table)
    val cut = 13 + 768
    val ext = Array[Byte](0x21.toByte, 0xf9.toByte, 4, 0, 0, 0, 0, 0)
    val spliced = gif.take(cut) ++ ext ++ gif.drop(cut)
    val d = GifCodec.decodeGif(spliced).getOrElse(fail("decode with extension failed"))
    assert(d.pixels.sameElements(pattern(6, 4)))
  }

  test("decode is total on junk, truncation, and header-only prefixes") {
    assert(GifCodec.decodeGif(Array.emptyByteArray).isEmpty)
    assert(GifCodec.decodeGif("GIF89a".getBytes).isEmpty)
    assert(GifCodec.decodeGif(Array.fill[Byte](300)(0x55)).isEmpty)
    val good = GifCodec.encodeGif(20, 20, pattern(20, 20))
    for (n <- Seq(10, 13, 700, 790, good.length - 2))
      assert(GifCodec.decodeGif(good.take(n)).isEmpty, s"truncation at $n decoded")
    // flipping a byte inside the LZW stream must not return wrong pixels
    // silently decoded as success-with-garbage of a DIFFERENT length
    val corrupted = good.clone()
    corrupted(13 + 768 + 11 + 5) = (corrupted(13 + 768 + 11 + 5) ^ 0x7f).toByte
    GifCodec.decodeGif(corrupted) match {
      case None => () // detected
      case Some(d) => assert(d.pixels.length == 400) // or same-shape garbage
    }
  }

  test("cross-codec contract: PNG and GIF of the same content give identical dHash bands") {
    val (w, h) = (18, 16) // 9x8 grid of 2x2 cells
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      val v = ((i * 37 + 11) % 256).toByte
      rgb(3 * i) = v; rgb(3 * i + 1) = ((v + 40) % 256).toByte
      rgb(3 * i + 2) = ((v + 90) % 256).toByte
      i += 1
    }
    val png = PixelCodec.encodePng(w, h, 3, rgb)
    val gif = GifCodec.encodeGif(w, h, PixelCodec.luminance(rgb, 3))
    val dp = PixelCodec.decodePng(png).get
    val dg = GifCodec.decodeGif(gif).get
    val gp = PixelCodec.resizeArea(PixelCodec.luminance(dp.pixels, 3), w, h, 9, 8)
    val gg = PixelCodec.resizeArea(PixelCodec.luminance(dg.pixels, 1), w, h, 9, 8)
    assert(gp.sameElements(gg))
    assert(PixelCodec.dhashBands(gp).sameElements(PixelCodec.dhashBands(gg)))
  }

  test("indexed-color encode→decode is lossless RGB through the palette branch") {
    val (w, h) = (32, 24)
    // 12 distinct colors tiled in 8x8 cells — a genuine color map, with
    // non-grey triples so the decoder's RGB expansion branch runs
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val c = (y / 8) * 4 + (x / 8)
      val o = (y * w + x) * 3
      rgb(o) = (c * 19 % 256).toByte
      rgb(o + 1) = ((c * 43 + 7) % 256).toByte
      rgb(o + 2) = ((c * 71 + 13) % 256).toByte
    }
    val gif = GifCodec.encodeGifColor(w, h, rgb)
    val d = GifCodec.decodeGif(gif).get
    assert(d.width == w && d.height == h && d.channels == 3)
    assert(d.pixels.sameElements(rgb))
    // palette is genuinely small: 12 colors pad to a 16-entry table
    assert((gif(10) & 0x87) == 0x83, "global table flag / size bits")
  }

  test("indexed-color encoder rejects >256 distinct colors") {
    val (w, h) = (32, 32) // 1024 pixels, all distinct colors
    val rgb = new Array[Byte](w * h * 3)
    for (i <- 0 until w * h) {
      rgb(3 * i) = (i % 256).toByte
      rgb(3 * i + 1) = (i / 256).toByte
      rgb(3 * i + 2) = 1
    }
    intercept[IllegalArgumentException] {
      GifCodec.encodeGifColor(w, h, rgb)
    }
  }

  test("sub-block framing: LZW payloads longer than 255 bytes split and reassemble") {
    val px = pattern(100, 100) // ~10 KB of pixels → many sub-blocks
    val gif = GifCodec.encodeGif(100, 100, px)
    // count sub-blocks: walk from after the LZW min-code byte
    var i = 13 + 768 + 10 + 1
    var blocks = 0
    while ((gif(i) & 0xff) != 0) { blocks += 1; i += 1 + (gif(i) & 0xff) }
    assert(blocks > 1, s"expected multiple sub-blocks, got $blocks")
    assert(GifCodec.decodeGif(gif).exists(_.pixels.sameElements(px)))
  }
}
