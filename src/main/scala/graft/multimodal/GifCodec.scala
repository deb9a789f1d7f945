package graft.multimodal

/** REAL pixel-level GIF codec, pure JVM — the second fully-decoded image
  * container after PNG (`PixelCodec`). Encode writes a spec-valid GIF89a
  * (logical screen descriptor, 256-entry global color table, image
  * descriptor, genuine variable-width LZW with clear-code table resets,
  * 255-byte sub-block framing, trailer); decode walks the stream
  * (extension blocks skipped by sub-block framing), concatenates the
  * image sub-blocks and runs full GIF-LZW decompression — 9→12-bit code
  * growth, clear/EOI handling, the (prev + first-of-prev) edge case for
  * codes one past the table.
  *
  * Greyscale palette (entry i = (i,i,i)) so a decoded index IS its
  * luminance — the property the cross-codec consistency oracle leans on:
  * the same planted cell content stored as truecolor PNG (deflate) and
  * indexed GIF (LZW) must reconstruct identical dHash fingerprints
  * through two completely independent compression stacks.
  *
  * At 100 TB this is a map-side decode kernel like `PixelCodec`: bytes
  * in, pixels out, no shuffle, no driver round-trips.
  *
  * Reference semantics (metadata level): /root/reference has no image
  * ops; the GIF header fields mirror `Multimodal.HeaderCodec`'s
  * logical-screen parse (Multimodal.scala:116).
  */
object GifCodec {

  import PixelCodec.Decoded

  private def u8(b: Byte): Int = b & 0xff

  /** Variable-width LZW bit-packer, LSB-first per the GIF spec. */
  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nbits = 0
    def write(code: Int, width: Int): Unit = {
      acc |= (code.toLong & ((1L << width) - 1)) << nbits
      nbits += width
      while (nbits >= 8) {
        out.write((acc & 0xff).toInt)
        acc >>>= 8
        nbits -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (nbits > 0) { out.write((acc & 0xff).toInt); nbits = 0; acc = 0 }
      out.toByteArray
    }
  }

  /** GIF-LZW compress of 8-bit palette indices (min code size 8: clear =
    * 256, EOI = 257, first dynamic code 258, table capped at 4096 — on
    * overflow emit CLEAR and reset, so any image past ~4k distinct
    * phrases exercises the reset path for real).
    */
  private def lzwEncode(indices: Array[Byte]): Array[Byte] = {
    val minCode = 8
    val clear = 1 << minCode // 256
    val eoi = clear + 1
    val bw = new BitWriter
    // dictionary: phrase -> code; phrases keyed as (prefixCode << 8 | byte)
    var dict = new java.util.HashMap[Int, Integer](8192)
    var next = eoi + 1
    var width = minCode + 1
    bw.write(clear, width)
    var prev = -1 // current phrase's code
    var i = 0
    while (i < indices.length) {
      val k = u8(indices(i))
      if (prev < 0) prev = k
      else {
        val key = (prev << 8) | k
        val hit = dict.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          bw.write(prev, width)
          if (next < 4096) {
            dict.put(key, next)
            next += 1
            // the decoder learns each entry ONE code later than the
            // encoder defines it, so the encoder's width bump must lag
            // one add behind the decoder's `next == (1 << width)` rule:
            // strictly-greater, capped at 12 bits
            if (next > (1 << width) && width < 12) width += 1
          } else {
            bw.write(clear, width)
            dict = new java.util.HashMap[Int, Integer](8192)
            next = eoi + 1
            width = minCode + 1
          }
          prev = k
        }
      }
      i += 1
    }
    if (prev >= 0) bw.write(prev, width)
    bw.write(eoi, width)
    bw.finish()
  }

  /** GIF-LZW decompress; None on any malformed stream. */
  private def lzwDecode(data: Array[Byte], minCode: Int,
                        expected: Int): Option[Array[Byte]] = {
    if (minCode < 2 || minCode > 8) return None
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream(expected)
    // code -> phrase; roots are single bytes
    var suffix = new Array[Byte](4096)
    var prefixOf = new Array[Int](4096)
    var length = new Array[Int](4096)
    def reset(): Int = {
      var c = 0
      while (c < clear) { suffix(c) = c.toByte; prefixOf(c) = -1; length(c) = 1; c += 1 }
      eoi + 1
    }
    var next = reset()
    var width = minCode + 1
    var acc = 0L; var nbits = 0; var pos = 0
    var prev = -1
    val scratch = new Array[Byte](4096)
    def emit(code: Int): Int = { // returns first byte of the phrase
      var c = code; var n = 0
      while (c >= 0) { scratch(n) = suffix(c); c = prefixOf(c); n += 1 }
      var j = n - 1
      while (j >= 0) { out.write(u8(scratch(j))); j -= 1 }
      u8(scratch(n - 1))
    }
    while (pos < data.length || nbits >= width) {
      while (nbits < width && pos < data.length) {
        acc |= (data(pos).toLong & 0xff) << nbits
        nbits += 8; pos += 1
      }
      if (nbits < width) return None // truncated mid-code
      val code = (acc & ((1L << width) - 1)).toInt
      acc >>>= width; nbits -= width
      if (code == clear) {
        next = reset(); width = minCode + 1; prev = -1
      } else if (code == eoi) {
        return if (out.size == expected) Some(out.toByteArray) else None
      } else if (code < next) {
        val first = emit(code)
        if (prev >= 0 && next < 4096) {
          suffix(next) = first.toByte; prefixOf(next) = prev
          length(next) = length(prev) + 1
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      } else if (code == next && prev >= 0 && next < 4096) {
        // the KwKwK case: phrase = prev + first(prev)
        var c = prev
        while (prefixOf(c) >= 0) c = prefixOf(c)
        val first = u8(suffix(c))
        suffix(next) = first.toByte; prefixOf(next) = prev
        length(next) = length(prev) + 1
        next += 1
        emit(code)
        if (next == (1 << width) && width < 12) width += 1
        prev = code
      } else return None // code beyond table: corrupt
      if (out.size > expected) return None
    }
    None // ran out of input without EOI
  }

  /** Encode 8-bit single-channel pixels as a spec-valid GIF89a with a
    * greyscale global color table (palette[i] = (i,i,i)).
    */
  def encodeGif(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height,
      s"pixels=${pixels.length} != $width*$height")
    val out = new java.io.ByteArrayOutputStream(1024 + pixels.length)
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    // logical screen descriptor (little-endian w/h)
    out.write(width & 0xff); out.write((width >> 8) & 0xff)
    out.write(height & 0xff); out.write((height >> 8) & 0xff)
    out.write(0xf7) // global color table, 8 bits/channel, 256 entries
    out.write(0)    // background color index
    out.write(0)    // pixel aspect ratio
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    // image descriptor
    out.write(0x2c)
    out.write(0); out.write(0); out.write(0); out.write(0) // left, top
    out.write(width & 0xff); out.write((width >> 8) & 0xff)
    out.write(height & 0xff); out.write((height >> 8) & 0xff)
    out.write(0) // no local color table, not interlaced
    out.write(8) // LZW min code size
    val lzw = lzwEncode(pixels)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Encode RGB pixels as an INDEXED-color GIF89a: the palette is built
    * from the image's distinct RGB triples in first-appearance order
    * (require ≤ 256 — the format's hard cap), padded to the next
    * power-of-two table size. This is the path real color GIFs take
    * (color-mapped, not truecolor), and it drives the decoder's
    * arbitrary-palette branch — palette lookup expands back to exact
    * RGB, so the container is lossless for ≤256-color content and the
    * closed-form pixel oracles carry over unchanged.
    */
  def encodeGifColor(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3,
      s"rgb=${rgb.length} != $width*$height*3")
    val colorIdx = new java.util.HashMap[Int, Integer](512)
    val palette = new java.io.ByteArrayOutputStream(768)
    val indices = new Array[Byte](width * height)
    var i = 0
    while (i < width * height) {
      val key = (u8(rgb(3 * i)) << 16) | (u8(rgb(3 * i + 1)) << 8) | u8(rgb(3 * i + 2))
      var idx = colorIdx.get(key)
      if (idx == null) {
        require(colorIdx.size < 256, "more than 256 distinct colors")
        idx = colorIdx.size
        colorIdx.put(key, idx)
        palette.write(rgb(3 * i)); palette.write(rgb(3 * i + 1))
        palette.write(rgb(3 * i + 2))
      }
      indices(i) = idx.byteValue()
      i += 1
    }
    // palette size = next power of two >= max(2, nColors); min code size
    // must still make CLEAR/EOI representable, so LZW runs at 8 like the
    // grey path (legal: indices just never reach the padded tail)
    var bpp = 1
    while ((1 << bpp) < colorIdx.size) bpp += 1
    val tableSize = 1 << bpp

    val out = new java.io.ByteArrayOutputStream(1024 + indices.length)
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write(width & 0xff); out.write((width >> 8) & 0xff)
    out.write(height & 0xff); out.write((height >> 8) & 0xff)
    out.write(0xf0 | (bpp - 1)) // global color table, 2^bpp entries
    out.write(0); out.write(0)
    val pal = palette.toByteArray
    out.write(pal, 0, pal.length)
    var pad = pal.length / 3
    while (pad < tableSize) { out.write(0); out.write(0); out.write(0); pad += 1 }
    out.write(0x2c)
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(width & 0xff); out.write((width >> 8) & 0xff)
    out.write(height & 0xff); out.write((height >> 8) & 0xff)
    out.write(0)
    out.write(8) // LZW min code size (indices are 8-bit regardless of bpp)
    val lzw = lzwEncode(indices)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0)
    out.write(0x3b)
    out.toByteArray
  }

  /** Full GIF decode: header + logical screen, global color table,
    * extension blocks skipped by sub-block framing, first image
    * descriptor's LZW stream inflated, palette applied (greyscale
    * palettes collapse to 1 channel; arbitrary palettes expand to RGB).
    * Total: None on anything malformed or unsupported (interlaced,
    * local color tables).
    */
  def decodeGif(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes.length < 13) return None
    val hdr = new String(bytes, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    val sw = u8(bytes(6)) | (u8(bytes(7)) << 8)
    val sh = u8(bytes(8)) | (u8(bytes(9)) << 8)
    val packed = u8(bytes(10))
    var i = 13
    var palette: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (i + 3 * n > bytes.length) return None
      palette = java.util.Arrays.copyOfRange(bytes, i, i + 3 * n)
      i += 3 * n
    }
    while (i < bytes.length) {
      u8(bytes(i)) match {
        case 0x3b => return None // trailer before any image
        case 0x21 => // extension: label byte then sub-blocks
          i += 2
          while (i < bytes.length && u8(bytes(i)) != 0) i += 1 + u8(bytes(i))
          if (i >= bytes.length) return None
          i += 1 // terminator
        case 0x2c =>
          if (i + 10 > bytes.length) return None
          val iw = u8(bytes(i + 5)) | (u8(bytes(i + 6)) << 8)
          val ih = u8(bytes(i + 7)) | (u8(bytes(i + 8)) << 8)
          val ipacked = u8(bytes(i + 9))
          if ((ipacked & 0xc0) != 0) return None // local table / interlace
          if (palette == null || iw <= 0 || ih <= 0 || iw > sw || ih > sh)
            return None
          i += 10
          if (i >= bytes.length) return None
          val minCode = u8(bytes(i)); i += 1
          val lzw = new java.io.ByteArrayOutputStream()
          while (i < bytes.length && u8(bytes(i)) != 0) {
            val n = u8(bytes(i))
            if (i + 1 + n > bytes.length) return None
            lzw.write(bytes, i + 1, n)
            i += 1 + n
          }
          if (i >= bytes.length) return None
          val idx = lzwDecode(lzw.toByteArray, minCode, iw * ih)
            .getOrElse(return None)
          val nEntries = palette.length / 3
          var grey = true
          var p = 0
          while (grey && p < nEntries) {
            if (palette(3 * p) != palette(3 * p + 1) ||
                palette(3 * p) != palette(3 * p + 2)) grey = false
            p += 1
          }
          var k = 0
          while (k < idx.length) {
            if (u8(idx(k)) >= nEntries) return None
            k += 1
          }
          if (grey) {
            val px = new Array[Byte](idx.length)
            var j = 0
            while (j < idx.length) { px(j) = palette(3 * u8(idx(j))); j += 1 }
            return Some(Decoded(iw, ih, 1, px))
          } else {
            val px = new Array[Byte](idx.length * 3)
            var j = 0
            while (j < idx.length) {
              val e = 3 * u8(idx(j))
              px(3 * j) = palette(e); px(3 * j + 1) = palette(e + 1)
              px(3 * j + 2) = palette(e + 2)
              j += 1
            }
            return Some(Decoded(iw, ih, 3, px))
          }
        case _ => return None
      }
    }
    None
  }
}
