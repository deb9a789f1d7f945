package graft.multimodal

/** REAL baseline JPEG codec, pure JVM — the third fully-decoded image
  * container after PNG (`PixelCodec`) and GIF (`GifCodec`), and the one
  * that actually dominates web corpora. Decode is a general baseline
  * (SOF0) decoder, greyscale AND 3-component YCbCr color: marker walk,
  * DQT / DHT (canonical Huffman table reconstruction), SOF0, SOS,
  * entropy-coded segment with byte stuffing (0xFF 0x00) and restart
  * markers, interleaved MCU decode (per-component sampling factors —
  * 4:4:4 and the web-dominant 4:2:0 — with per-component DC predictors
  * and quant/Huffman table selection), Huffman DC-difference + AC
  * run-length/EOB decoding, dequantization, exact separable 2D IDCT in
  * double precision, level shift + clamp, chroma upsampling by sample
  * replication, and a FIXED-POINT integer YCbCr→RGB conversion
  * ([[yccToRgb]]) so the whole color chain stays closed-form
  * reproducible in integer SQL.
  *
  * JPEG is lossy, so bit-exact oracles need planted content the
  * transform preserves: an 8×8-aligned CELL-CONSTANT image has DC-only
  * blocks (all AC = 0 after the forward DCT), and with a flat
  * quantization table the decode chain reproduces the constants
  * EXACTLY — IDCT of a DC-only block is mathematically flat at DC/8,
  * which is integer for DC = 8·(v−128). The encoder below emits exactly
  * that stream (real Huffman DC categories + EOB per block); the
  * decoder is general (full AC path, exercised by unit tests with
  * hand-built AC-bearing streams).
  *
  * At 100 TB this is a map-side decode kernel like its siblings: bytes
  * in, pixels out, no shuffle, no driver round-trips.
  */
object JpegCodec {

  import PixelCodec.Decoded

  private def u8(b: Byte): Int = b & 0xff

  // ---------------------------------------------------------------- zigzag
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // ------------------------------------------------------------- Huffman
  /** Canonical Huffman table from the DHT wire form: counts[1..16] and
    * the symbol list. Decoding walks code-by-code (maxlen 16) with the
    * standard ranges; encoding uses the symbol→(code,len) map.
    */
  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    val (codeOf, lenOf) = {
      val co = new java.util.HashMap[Int, Int]()
      val lo = new java.util.HashMap[Int, Int]()
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        var i = 0
        while (i < counts(len - 1)) {
          co.put(symbols(k), code); lo.put(symbols(k), len)
          code += 1; k += 1; i += 1
        }
        code <<= 1
        len += 1
      }
      (co, lo)
    }
    // decode tables: for each length, first code and index of first symbol
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes at this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        if (counts(len - 1) == 0) { minCode(len) = 0; maxCode(len) = -1 }
        else {
          valPtr(len) = k
          minCode(len) = code
          code += counts(len - 1); k += counts(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
        len += 1
      }
    }
    def symbol(len: Int, code: Int): Int = symbols(valPtr(len) + code - minCode(len))
  }

  /** Standard JPEG Annex K luminance Huffman tables (public spec
    * constants) — used by the encoder; the decoder reads whatever DHT
    * the stream carries.
    */
  private val StdDcCounts =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val StdDcSymbols = (0 to 11).toArray
  private val StdAcCounts =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val StdAcSymbols = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  // -------------------------------------------------------------- encode
  private final class BitWriterMsb(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flushWithOnes(): Unit = {
      if (nbits > 0) {
        acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
        out.write(acc & 0xff)
        if ((acc & 0xff) == 0xff) out.write(0x00)
        acc = 0; nbits = 0
      }
    }
  }

  private def category(v: Int): Int = {
    var a = math.abs(v); var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** Encode 8-bit greyscale pixels whose content is constant within each
    * 8×8 block (the caller guarantees this; require() enforces it) as a
    * spec-valid baseline JFIF stream with a flat (all-ones) quantization
    * table and the Annex K Huffman tables. Each MCU is one DC difference
    * plus an EOB — a REAL entropy-coded segment any conforming decoder
    * reproduces exactly.
    */
  def encodeJpegBlockConstant(width: Int, height: Int,
                              pixels: Array[Byte]): Array[Byte] = {
    require(width % 8 == 0 && height % 8 == 0, s"${width}x$height not 8-aligned")
    require(pixels.length == width * height)
    val bw = width / 8; val bh = height / 8
    // verify block-constant and collect per-block values
    val blockVal = new Array[Int](bw * bh)
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        val v = u8(pixels((by * 8) * width + bx * 8))
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            require(u8(pixels((by * 8 + y) * width + bx * 8 + x)) == v,
              s"block ($bx,$by) not constant")
            x += 1
          }
          y += 1
        }
        blockVal(by * bw + bx) = v
        bx += 1
      }
      by += 1
    }

    val out = new java.io.ByteArrayOutputStream(1024 + bw * bh * 2)
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, payload: Array[Int]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      payload.foreach(out.write)
    }
    marker(0xd8) // SOI
    // APP0 / JFIF
    seg(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // DQT: table 0, 8-bit, flat ones
    seg(0xdb, Array(0x00) ++ Array.fill(64)(1))
    // SOF0: 8-bit, 1 component, no subsampling
    seg(0xc0, Array(8, (height >> 8) & 0xff, height & 0xff,
      (width >> 8) & 0xff, width & 0xff, 1, 1, 0x11, 0))
    // DHT: DC table 0 then AC table 0 (Annex K)
    seg(0xc4, Array(0x00) ++ StdDcCounts ++ StdDcSymbols)
    seg(0xc4, Array(0x10) ++ StdAcCounts ++ StdAcSymbols)
    // SOS
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0))

    val dc = new Huff(StdDcCounts, StdDcSymbols)
    val ac = new Huff(StdAcCounts, StdAcSymbols)
    val w = new BitWriterMsb(out)
    var pred = 0
    var i = 0
    while (i < blockVal.length) {
      val coeff = 8 * (blockVal(i) - 128) // forward DCT DC of a flat block
      val diff = coeff - pred
      pred = coeff
      val cat = category(diff)
      w.put(dc.codeOf.get(cat), dc.lenOf.get(cat))
      if (cat > 0) {
        val bits = if (diff >= 0) diff else diff + (1 << cat) - 1
        w.put(bits, cat)
      }
      // all AC zero → EOB
      w.put(ac.codeOf.get(0x00), ac.lenOf.get(0x00))
      i += 1
    }
    w.flushWithOnes()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Pinned integer YCbCr→RGB (JFIF/Rec.601 coefficients in 16-bit fixed
    * point, round-half-up via +32768 then arithmetic shift): the SAME
    * expression an integer-SQL oracle can replicate exactly —
    * `>>` is arithmetic (= floor division by 2^16) in Scala, Spark AND
    * DuckDB, unlike `//`/`%`, which truncate toward zero on negatives.
    * Coefficients: 1.402→91881, 0.344136→22554, 0.714136→46802,
    * 1.772→116130 (each round(c·65536), the libjpeg-style constants).
    */
  def yccToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    val cb1 = cb - 128; val cr1 = cr - 128
    def cl(v: Int): Int = math.max(0, math.min(255, v))
    (cl(y + ((91881 * cr1 + 32768) >> 16)),
     cl(y + ((-22554 * cb1 - 46802 * cr1 + 32768) >> 16)),
     cl(y + ((116130 * cb1 + 32768) >> 16)))
  }

  /** Encode a 3-component baseline YCbCr JPEG from block-constant planes
    * (the caller guarantees 8×8-constancy per plane; require() enforces
    * it — DC-only blocks + flat quantization keep the lossy format
    * bit-exact for the fixture, exactly like the greyscale twin). The
    * luma plane is full-resolution; the chroma planes are either
    * full-resolution (`subsample420 = false`, 4:4:4, sampling 0x11 for
    * every component) or quarter-resolution (`subsample420 = true`, the
    * web-dominant 4:2:0: luma sampling 0x22, chroma 0x11, MCU = 4 Y
    * blocks + Cb + Cr). All components share the flat quant table and
    * the Annex K Huffman tables (legal — SOS table selectors).
    */
  def encodeJpegColor(width: Int, height: Int,
                      yPlane: Array[Byte], cbPlane: Array[Byte],
                      crPlane: Array[Byte],
                      subsample420: Boolean = true): Array[Byte] = {
    val align = if (subsample420) 16 else 8
    require(width % align == 0 && height % align == 0,
      s"${width}x$height not $align-aligned")
    val cw = if (subsample420) width / 2 else width
    val ch = if (subsample420) height / 2 else height
    require(yPlane.length == width * height, "luma plane size")
    require(cbPlane.length == cw * ch && crPlane.length == cw * ch,
      "chroma plane size")

    // per-plane block-constant check + per-block values (row-major blocks)
    def blockVals(p: Array[Byte], w: Int, h: Int): Array[Int] = {
      val bw = w / 8; val bh = h / 8
      val out = new Array[Int](bw * bh)
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          val v = u8(p((by * 8) * w + bx * 8))
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              require(u8(p((by * 8 + y) * w + bx * 8 + x)) == v,
                s"block ($bx,$by) not constant")
              x += 1
            }
            y += 1
          }
          out(by * bw + bx) = v
          bx += 1
        }
        by += 1
      }
      out
    }
    val yv = blockVals(yPlane, width, height)
    val cbv = blockVals(cbPlane, cw, ch)
    val crv = blockVals(crPlane, cw, ch)

    val out = new java.io.ByteArrayOutputStream(1024 + yv.length * 4)
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, payload: Array[Int]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      payload.foreach(out.write)
    }
    marker(0xd8)
    seg(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xdb, Array(0x00) ++ Array.fill(64)(1)) // flat table 0
    val ySamp = if (subsample420) 0x22 else 0x11
    seg(0xc0, Array(8, (height >> 8) & 0xff, height & 0xff,
      (width >> 8) & 0xff, width & 0xff, 3,
      1, ySamp, 0, 2, 0x11, 0, 3, 0x11, 0))
    seg(0xc4, Array(0x00) ++ StdDcCounts ++ StdDcSymbols)
    seg(0xc4, Array(0x10) ++ StdAcCounts ++ StdAcSymbols)
    seg(0xda, Array(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0))

    val dc = new Huff(StdDcCounts, StdDcSymbols)
    val ac = new Huff(StdAcCounts, StdAcSymbols)
    val w = new BitWriterMsb(out)
    def putBlock(v: Int, pred: Int): Int = {
      val coeff = 8 * (v - 128)
      val diff = coeff - pred
      val cat = category(diff)
      w.put(dc.codeOf.get(cat), dc.lenOf.get(cat))
      if (cat > 0) {
        val bits = if (diff >= 0) diff else diff + (1 << cat) - 1
        w.put(bits, cat)
      }
      w.put(ac.codeOf.get(0x00), ac.lenOf.get(0x00)) // EOB
      coeff
    }
    val ybw = width / 8
    val cbw = cw / 8
    var predY = 0; var predCb = 0; var predCr = 0
    if (subsample420) {
      val mcusX = width / 16; val mcusY = height / 16
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          var by = 0
          while (by < 2) {
            var bx = 0
            while (bx < 2) {
              predY = putBlock(yv((my * 2 + by) * ybw + mx * 2 + bx), predY)
              bx += 1
            }
            by += 1
          }
          predCb = putBlock(cbv(my * cbw + mx), predCb)
          predCr = putBlock(crv(my * cbw + mx), predCr)
          mx += 1
        }
        my += 1
      }
    } else {
      val mcusX = width / 8; val mcusY = height / 8
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          predY = putBlock(yv(my * ybw + mx), predY)
          predCb = putBlock(cbv(my * cbw + mx), predCb)
          predCr = putBlock(crv(my * cbw + mx), predCr)
          mx += 1
        }
        my += 1
      }
    }
    w.flushWithOnes()
    marker(0xd9)
    out.toByteArray
  }

  /** Encode a 3-component PROGRESSIVE (SOF2) YCbCr JPEG from
    * block-constant planes — the same planted-content contract as
    * [[encodeJpegColor]], emitted as five REAL progressive scans that
    * exercise both progressive mechanisms:
    *   1. interleaved DC first pass at Al=1 (successive approximation:
    *      the stream carries coef >> 1 diffs; planted coefficients
    *      8·(v−128) are even, so the split is exact),
    *   2. DC refinement (Ah=1 → Al=0): one raw bit (the zero low bit)
    *      per block,
    *   3–5. per-component AC first pass over band 1..63 (spectral
    *      selection): all ACs are zero for block-constant content, so
    *      each scan is a pure EOBRUN run-length — coded with a custom
    *      15-symbol EOBn Huffman table (the Annex K baseline AC table
    *      has no EOBn>0 codes).
    * Decodes bit-exactly to the baseline encoding of the same planes.
    */
  def encodeJpegProgressiveColor(width: Int, height: Int,
      yPlane: Array[Byte], cbPlane: Array[Byte], crPlane: Array[Byte],
      subsample420: Boolean = true): Array[Byte] = {
    val align = if (subsample420) 16 else 8
    require(width % align == 0 && height % align == 0,
      s"${width}x$height not $align-aligned")
    val cw = if (subsample420) width / 2 else width
    val ch = if (subsample420) height / 2 else height
    require(yPlane.length == width * height, "luma plane size")
    require(cbPlane.length == cw * ch && crPlane.length == cw * ch,
      "chroma plane size")

    def blockVals(p: Array[Byte], w: Int, h: Int): Array[Int] = {
      val bwd = w / 8; val bh = h / 8
      val out = new Array[Int](bwd * bh)
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bwd) {
          val v = u8(p((by * 8) * w + bx * 8))
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              require(u8(p((by * 8 + y) * w + bx * 8 + x)) == v,
                s"block ($bx,$by) not constant")
              x += 1
            }
            y += 1
          }
          out(by * bwd + bx) = v
          bx += 1
        }
        by += 1
      }
      out
    }
    val yv = blockVals(yPlane, width, height)
    val cbv = blockVals(cbPlane, cw, ch)
    val crv = blockVals(crPlane, cw, ch)

    val out = new java.io.ByteArrayOutputStream(1024 + yv.length * 4)
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, payload: Array[Int]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      payload.foreach(out.write)
    }
    marker(0xd8)
    seg(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xdb, Array(0x00) ++ Array.fill(64)(1)) // flat table 0
    val ySamp = if (subsample420) 0x22 else 0x11
    seg(0xc2, Array(8, (height >> 8) & 0xff, height & 0xff,
      (width >> 8) & 0xff, width & 0xff, 3,
      1, ySamp, 0, 2, 0x11, 0, 3, 0x11, 0))
    seg(0xc4, Array(0x00) ++ StdDcCounts ++ StdDcSymbols)
    // AC table 1: the 15 EOBn symbols 0x00..0xE0 at 4 bits each (code
    // 1111 unused, per the canonical-table convention)
    val eobCounts = Array(0, 0, 0, 15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val eobSymbols = (0 to 14).map(_ << 4).toArray
    seg(0xc4, Array(0x11) ++ eobCounts ++ eobSymbols)
    val dc = new Huff(StdDcCounts, StdDcSymbols)
    val eob = new Huff(eobCounts, eobSymbols)

    // ---- scan 1: interleaved DC first, Ah=0, Al=1
    seg(0xda, Array(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x01))
    locally {
      val w = new BitWriterMsb(out)
      val preds = new Array[Int](3)
      def putDc(ci: Int, v: Int): Unit = {
        val c1 = (8 * (v - 128)) >> 1 // Al=1 split; even coefs → exact
        val diff = c1 - preds(ci)
        preds(ci) = c1
        val cat = category(diff)
        w.put(dc.codeOf.get(cat), dc.lenOf.get(cat))
        if (cat > 0)
          w.put(if (diff >= 0) diff else diff + (1 << cat) - 1, cat)
      }
      val ybw = width / 8; val cbw = cw / 8
      if (subsample420) {
        val mcusX = width / 16; val mcusY = height / 16
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            var by = 0
            while (by < 2) {
              var bx = 0
              while (bx < 2) {
                putDc(0, yv((my * 2 + by) * ybw + mx * 2 + bx)); bx += 1
              }
              by += 1
            }
            putDc(1, cbv(my * cbw + mx)); putDc(2, crv(my * cbw + mx))
            mx += 1
          }
          my += 1
        }
      } else {
        val mcusX = width / 8; val mcusY = height / 8
        var m = 0
        while (m < mcusX * mcusY) {
          putDc(0, yv(m)); putDc(1, cbv(m)); putDc(2, crv(m)); m += 1
        }
      }
      w.flushWithOnes()
    }

    // ---- scan 2: interleaved DC refinement, Ah=1, Al=0 — one raw zero
    // bit per block (the planted coefficients are even)
    seg(0xda, Array(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x10))
    locally {
      val w = new BitWriterMsb(out)
      val nBlocks = yv.length + cbv.length + crv.length
      var b = 0
      while (b < nBlocks) { w.put(0, 1); b += 1 }
      w.flushWithOnes()
    }

    // ---- scans 3–5: per-component AC first pass, band 1..63 — pure
    // EOBRUN (all ACs zero on block-constant content)
    def acScan(compId: Int, nBlocks: Int): Unit = {
      seg(0xda, Array(1, compId, 0x01, 1, 63, 0x00))
      val w = new BitWriterMsb(out)
      var n = nBlocks
      while (n > 0) {
        val run = math.min(n, 32767)
        var r = 0
        while ((1 << (r + 1)) <= run) r += 1 // r = floor(log2 run), ≤ 14
        w.put(eob.codeOf.get(r << 4), eob.lenOf.get(r << 4))
        if (r > 0) w.put(run - (1 << r), r)
        n -= run
      }
      w.flushWithOnes()
    }
    acScan(1, yv.length); acScan(2, cbv.length); acScan(3, crv.length)

    marker(0xd9)
    out.toByteArray
  }

  // -------------------------------------------------------------- decode
  private final class BitReaderMsb(data: Array[Byte]) {
    var pos = 0
    private var acc = 0
    private var nbits = 0
    var sawMarker = false
    /** next bit, honoring byte stuffing; -1 on end/marker */
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= data.length) return -1
        var b = u8(data(pos)); pos += 1
        if (b == 0xff) {
          if (pos >= data.length) return -1
          val m = u8(data(pos))
          if (m == 0x00) pos += 1 // stuffed
          else if (m >= 0xd0 && m <= 0xd7) { // RSTn: reset handled by caller
            sawMarker = true; pos -= 1; return -1
          } else { sawMarker = true; pos -= 1; return -1 }
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        val b = bit()
        if (b < 0) return Int.MinValue
        v = (v << 1) | b
        i += 1
      }
      v
    }
    def resetAtRst(): Boolean = {
      // skip to and consume an RSTn marker
      nbits = 0
      while (pos + 1 < data.length) {
        if (u8(data(pos)) == 0xff && u8(data(pos + 1)) >= 0xd0 &&
            u8(data(pos + 1)) <= 0xd7) {
          pos += 2; sawMarker = false; return true
        }
        pos += 1
      }
      false
    }
  }

  private def decodeHuffSymbol(br: BitReaderMsb, h: Huff): Int = {
    var code = 0
    var len = 0
    while (len < 16) {
      val b = br.bit()
      if (b < 0) return -1
      code = (code << 1) | b
      len += 1
      if (h.maxCode(len) >= 0 && code <= h.maxCode(len) && code >= h.minCode(len))
        return h.symbol(len, code)
    }
    -1
  }

  private def extend(v: Int, cat: Int): Int =
    if (cat == 0) 0
    else if (v < (1 << (cat - 1))) v - (1 << cat) + 1
    else v

  private val idctCos: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
        x += 1
      }
      u += 1
    }
    t
  }

  /** Exact separable 2D IDCT (double precision). DC-only blocks come out
    * mathematically flat at DC/8 — the property the closed-form oracle
    * uses.
    */
  private def idct8x8(coef: Array[Int], outBlock: Array[Int]): Unit = {
    // DC-only fast path (the standard libjpeg-style shortcut): when every
    // AC coefficient is zero the block is flat, and the value below
    // replays the general path's EXACT double operations for that case —
    // row pass: s = 0.0 + (C·dc)·cos0, tmp = s/2; column pass:
    // s = 0.0 + C·tmp·cos0, p = round(s/2 + 128) — so the output is
    // bit-identical, never approximated. Real-world JPEGs hit this on
    // smooth regions; the planted DC-only fixtures hit it on every block.
    var k = 1
    while (k < 64 && coef(k) == 0) k += 1
    if (k == 64) {
      val c = 0.70710678118654752440
      val tmp0 = (c * coef(0) * 1.0) / 2.0
      val p = math.round((c * tmp0 * 1.0) / 2.0 + 128.0).toInt
      java.util.Arrays.fill(outBlock, math.max(0, math.min(255, p)))
      return
    }
    val tmp = new Array[Double](64)
    // rows: for each row y of the coefficient block, 1D IDCT over u.
    // Zero coefficients are skipped: a `s += cu·0·cos` term adds ±0.0,
    // which cannot change the accumulated double (0.0 + ±0.0 = 0.0 and
    // x + ±0.0 = x for finite x), so the skip is bit-exact too.
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cf = coef(v * 8 + u)
          if (cf != 0) {
            val cu = if (u == 0) 0.70710678118654752440 else 1.0
            s += cu * cf * idctCos(u * 8 + x)
          }
          u += 1
        }
        tmp(v * 8 + x) = s / 2.0
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) {
          val t = tmp(vv * 8 + x)
          if (t != 0.0) {
            val cv = if (vv == 0) 0.70710678118654752440 else 1.0
            s += cv * t * idctCos(vv * 8 + y)
          }
          vv += 1
        }
        val p = math.round(s / 2.0 + 128.0).toInt
        outBlock(y * 8 + x) = math.max(0, math.min(255, p))
        x += 1
      }
      y += 1
    }
  }

  /** One scan component: id, sampling factors, quant table, Huffman
    * selectors (filled from SOS), decoded plane (MCU-padded).
    */
  private final class Comp(val id: Int, val h: Int, val v: Int, val tq: Int) {
    var dcId = 0; var acId = 0
    var planeW = 0; var planeH = 0
    var plane: Array[Byte] = null
    var pred = 0
  }

  /** Full PROGRESSIVE (SOF2) JPEG decode — spectral selection AND
    * successive approximation, per ITU-T T.81 §G: a coefficient memory
    * per component accumulates across scans (DC first/refine, per-band
    * AC first/refine with EOBRUN run-length coding), tables may be
    * redefined between scans, then one dequantize + IDCT + assembly
    * pass identical to the baseline path. Same frame constraints as the
    * baseline decoder (8-bit, 1 or 3 components, 4:4:4 or 4:2:0).
    * Total: None on anything malformed (wrong band limits, interleaved
    * AC scans, s>1 in refinement, coefficient overruns).
    */
  def decodeJpegProgressive(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes.length < 4 || u8(bytes(0)) != 0xff || u8(bytes(1)) != 0xd8)
      return None
    var i = 2
    var width = 0; var height = 0
    val qt = new Array[Array[Int]](4)
    val dcTables = new Array[Huff](4)
    val acTables = new Array[Huff](4)
    var comps: Array[Comp] = null
    // per-component coefficient memory, MCU-padded, natural order within
    // each 64-coef block
    var coefs: Array[Array[Int]] = null
    var bw: Array[Int] = null   // block columns (MCU-padded)
    var tbw: Array[Int] = null  // true block columns (ceil(compW/8))
    var tbh: Array[Int] = null  // true block rows
    var mcusX = 0; var mcusY = 0; var hmax = 0; var vmax = 0
    var restartInterval = 0
    var sawEoi = false

    while (!sawEoi) {
      if (i + 2 > bytes.length) return None
      if (u8(bytes(i)) != 0xff) return None
      // consume 0xFF fill bytes before the marker (T.81 B.1.1.2)
      while (i + 3 <= bytes.length && u8(bytes(i + 1)) == 0xff) i += 1
      if (i + 2 > bytes.length) return None
      val m = u8(bytes(i + 1))
      if (m == 0xd9) { sawEoi = true }
      else {
        if (i + 4 > bytes.length) return None
        val len = (u8(bytes(i + 2)) << 8) | u8(bytes(i + 3))
        if (len < 2 || i + 2 + len > bytes.length) return None
        val p = i + 4
        m match {
          case 0xdb =>
            var j = p
            while (j < i + 2 + len) {
              val pq = u8(bytes(j)) >> 4; val tq = u8(bytes(j)) & 0x0f
              if (pq != 0 || tq > 3) return None
              if (j + 65 > i + 2 + len) return None
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) { t(Zigzag(k)) = u8(bytes(j + 1 + k)); k += 1 }
              qt(tq) = t
              j += 65
            }
            i += 2 + len
          case 0xc4 =>
            var j = p
            while (j < i + 2 + len) {
              val tc = u8(bytes(j)) >> 4; val th = u8(bytes(j)) & 0x0f
              if (tc > 1 || th > 3) return None
              val counts = new Array[Int](16)
              var n = 0; var k = 0
              while (k < 16) { counts(k) = u8(bytes(j + 1 + k)); n += counts(k); k += 1 }
              if (j + 17 + n > i + 2 + len) return None
              val syms = new Array[Int](n)
              k = 0
              while (k < n) { syms(k) = u8(bytes(j + 17 + k)); k += 1 }
              val h = new Huff(counts, syms)
              if (tc == 0) dcTables(th) = h else acTables(th) = h
              j += 17 + n
            }
            i += 2 + len
          case 0xc2 =>
            if (u8(bytes(p)) != 8) return None
            height = (u8(bytes(p + 1)) << 8) | u8(bytes(p + 2))
            width = (u8(bytes(p + 3)) << 8) | u8(bytes(p + 4))
            val nc = u8(bytes(p + 5))
            if (nc != 1 && nc != 3) return None
            if (p + 6 + 3 * nc > i + 2 + len) return None
            comps = (0 until nc).map { c =>
              val samp = u8(bytes(p + 6 + 3 * c + 1))
              new Comp(u8(bytes(p + 6 + 3 * c)), samp >> 4, samp & 0x0f,
                u8(bytes(p + 6 + 3 * c + 2)))
            }.toArray
            if (nc == 1) {
              if (comps(0).h != 1 || comps(0).v != 1) return None
            } else {
              val (h0, v0) = (comps(0).h, comps(0).v)
              if (!((h0 == 1 && v0 == 1) || (h0 == 2 && v0 == 2))) return None
              if (comps(1).h != 1 || comps(1).v != 1 ||
                  comps(2).h != 1 || comps(2).v != 1) return None
            }
            if (width <= 0 || height <= 0) return None
            hmax = comps.map(_.h).max; vmax = comps.map(_.v).max
            mcusX = (width + 8 * hmax - 1) / (8 * hmax)
            mcusY = (height + 8 * vmax - 1) / (8 * vmax)
            bw = comps.map(c => mcusX * c.h)
            val bh = comps.map(c => mcusY * c.v)
            tbw = comps.map(c => ((width * c.h + hmax - 1) / hmax + 7) / 8)
            tbh = comps.map(c => ((height * c.v + vmax - 1) / vmax + 7) / 8)
            coefs = comps.indices.map(ci =>
              new Array[Int](bw(ci) * bh(ci) * 64)).toArray
            i += 2 + len
          case 0xc0 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
               0xcd | 0xce | 0xcf =>
            return None // not a progressive frame
          case 0xdd =>
            restartInterval = (u8(bytes(p)) << 8) | u8(bytes(p + 1))
            i += 2 + len
          case 0xda =>
            if (comps == null) return None
            val ns = u8(bytes(p))
            if (ns < 1 || ns > comps.length) return None
            if (p + 1 + 2 * ns + 3 > i + 2 + len) return None
            val scanComps = new Array[Int](ns)
            var c = 0
            while (c < ns) {
              val cid = u8(bytes(p + 1 + 2 * c))
              val sel = u8(bytes(p + 1 + 2 * c + 1))
              val ci = comps.indexWhere(_.id == cid)
              if (ci < 0) return None
              scanComps(c) = ci
              comps(ci).dcId = sel >> 4; comps(ci).acId = sel & 0x0f
              c += 1
            }
            val ss = u8(bytes(p + 1 + 2 * ns))
            val se = u8(bytes(p + 1 + 2 * ns + 1))
            val aa = u8(bytes(p + 1 + 2 * ns + 2))
            val ah = aa >> 4; val al = aa & 0x0f
            val dataStart = i + 2 + len
            val consumed = decodeProgressiveScan(bytes, dataStart, comps,
              scanComps, coefs, bw, tbw, tbh, mcusX, mcusY,
              dcTables, acTables, ss, se, ah, al, restartInterval)
            if (consumed < 0) return None
            // advance to the next true marker (skip entropy bytes,
            // stuffed FF00 and RSTn)
            var j = dataStart + consumed
            var next = -1
            while (next < 0 && j + 1 < bytes.length) {
              if (u8(bytes(j)) == 0xff) {
                val mm = u8(bytes(j + 1))
                if (mm == 0x00 || (mm >= 0xd0 && mm <= 0xd7)) j += 2
                else next = j
              } else j += 1
            }
            if (next < 0) return None
            i = next
          case _ =>
            i += 2 + len // APPn / COM: skip
        }
      }
    }
    if (comps == null) return None
    for (c <- comps) if (c.tq > 3 || qt(c.tq) == null) return None

    // dequantize + IDCT + assemble (same shape as the baseline tail)
    for (ci <- comps.indices) {
      val c = comps(ci)
      c.planeW = mcusX * c.h * 8
      c.planeH = mcusY * c.v * 8
      c.plane = new Array[Byte](c.planeW * c.planeH)
      val q = qt(c.tq)
      val cf = coefs(ci)
      val block = new Array[Int](64)
      val dq = new Array[Int](64)
      val bwc = bw(ci)
      val bhc = c.planeH / 8
      var by = 0
      while (by < bhc) {
        var bx = 0
        while (bx < bwc) {
          val base = (by * bwc + bx) * 64
          var k = 0
          while (k < 64) { dq(k) = cf(base + k) * q(k); k += 1 }
          idct8x8(dq, block)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              c.plane((by * 8 + y) * c.planeW + bx * 8 + x) =
                block(y * 8 + x).toByte
              x += 1
            }
            y += 1
          }
          bx += 1
        }
        by += 1
      }
    }
    assemblePlanes(width, height, comps, hmax, vmax)
  }

  /** One progressive scan's entropy-coded segment. Returns bytes
    * consumed from `dataStart`, or -1 on any malformation.
    */
  private def decodeProgressiveScan(bytes: Array[Byte], dataStart: Int,
      comps: Array[Comp], scanComps: Array[Int], coefs: Array[Array[Int]],
      bw: Array[Int], tbw: Array[Int], tbh: Array[Int],
      mcusX: Int, mcusY: Int,
      dcTables: Array[Huff], acTables: Array[Huff],
      ss: Int, se: Int, ah: Int, al: Int, restartInterval: Int): Int = {
    if (ss < 0 || se > 63 || ss > se) return -1
    if (ss == 0 && se != 0) return -1        // progressive DC band is exactly {0}
    if (ss > 0 && scanComps.length != 1) return -1 // AC scans are single-component
    val br = new BitReaderMsb(
      java.util.Arrays.copyOfRange(bytes, dataStart, bytes.length))
    var eobrun = 0
    val preds = new Array[Int](comps.length)

    def refineNonzeroRange(cf: Array[Int], base: Int, from: Int, to: Int,
                           p1: Int, m1: Int): Int = {
      // correction bits for already-nonzero coefficients in [from..to];
      // returns -1 on bit starvation, else `to + 1`
      var k = from
      while (k <= to) {
        val z = base + Zigzag(k)
        if (cf(z) != 0) {
          val b = br.bit()
          if (b < 0) return -1
          if (b == 1 && (cf(z) & p1) == 0)
            cf(z) += (if (cf(z) >= 0) p1 else m1)
        }
        k += 1
      }
      to + 1
    }

    def decodeDcBlock(ci: Int, by: Int, bx: Int): Boolean = {
      val cf = coefs(ci)
      val base = (by * bw(ci) + bx) * 64
      if (ah == 0) {
        val h = dcTables(comps(ci).dcId)
        if (h == null) return false
        val cat = decodeHuffSymbol(br, h)
        if (cat < 0 || cat > 11) return false
        val dv = if (cat == 0) 0 else {
          val r = br.receive(cat)
          if (r == Int.MinValue) return false
          extend(r, cat)
        }
        preds(ci) += dv
        cf(base) = preds(ci) << al
      } else {
        val b = br.bit()
        if (b < 0) return false
        if (b == 1) cf(base) |= 1 << al
      }
      true
    }

    def decodeAcBlock(ci: Int, by: Int, bx: Int): Boolean = {
      val cf = coefs(ci)
      val base = (by * bw(ci) + bx) * 64
      val h = acTables(comps(ci).acId)
      if (h == null) return false
      if (ah == 0) {
        // first pass for this band
        if (eobrun > 0) { eobrun -= 1; return true }
        var k = ss
        while (k <= se) {
          val rs = decodeHuffSymbol(br, h)
          if (rs < 0) return false
          val r = rs >> 4; val s = rs & 0x0f
          if (s == 0) {
            if (r != 15) {
              eobrun = 1 << r
              if (r > 0) {
                val b = br.receive(r)
                if (b == Int.MinValue) return false
                eobrun += b
              }
              eobrun -= 1 // this block is the first of the run
              return true
            }
            k += 16 // ZRL
          } else {
            k += r
            if (k > se) return false
            val b = br.receive(s)
            if (b == Int.MinValue) return false
            cf(base + Zigzag(k)) = extend(b, s) << al
            k += 1
          }
        }
        true
      } else {
        // refinement pass (T.81 §G.1.2.3 / libjpeg decode_mcu_AC_refine)
        val p1 = 1 << al; val m1 = -1 << al
        var k = ss
        if (eobrun == 0) {
          var done = false
          while (k <= se && !done) {
            val rs = decodeHuffSymbol(br, h)
            if (rs < 0) return false
            var r = rs >> 4; val s = rs & 0x0f
            var newnz = 0
            if (s == 0) {
              if (r != 15) {
                eobrun = 1 << r
                if (r > 0) {
                  val b = br.receive(r)
                  if (b == Int.MinValue) return false
                  eobrun += b
                }
                done = true // tail handled by the EOB logic below
              }
              // ZRL: r = 15 zero-history positions to skip
            } else {
              if (s != 1) return false
              val b = br.bit()
              if (b < 0) return false
              newnz = if (b == 1) p1 else m1
            }
            if (!done) {
              var placed = false
              while (k <= se && !placed) {
                val z = base + Zigzag(k)
                if (cf(z) != 0) {
                  val b = br.bit()
                  if (b < 0) return false
                  if (b == 1 && (cf(z) & p1) == 0)
                    cf(z) += (if (cf(z) >= 0) p1 else m1)
                  k += 1
                } else if (r == 0) {
                  placed = true // this zero-history slot takes newnz
                } else { r -= 1; k += 1 }
              }
              if (newnz != 0) {
                if (!placed) return false
                cf(base + Zigzag(k)) = newnz
              }
              if (placed) k += 1
            }
          }
        }
        if (eobrun > 0) {
          if (refineNonzeroRange(cf, base, k, se, p1, m1) < 0) return false
          eobrun -= 1
        }
        true
      }
    }

    var ok = true
    if (ss == 0) {
      // DC scan: interleaved MCU order for ns > 1, raster over the
      // component's true blocks for ns == 1
      if (scanComps.length > 1) {
        var mcu = 0
        val total = mcusX * mcusY
        while (mcu < total && ok) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            if (!br.resetAtRst()) return -1
            java.util.Arrays.fill(preds, 0); eobrun = 0
          }
          val my = mcu / mcusX; val mx = mcu % mcusX
          var c = 0
          while (c < scanComps.length && ok) {
            val ci = scanComps(c)
            val comp = comps(ci)
            var bv = 0
            while (bv < comp.v && ok) {
              var bhx = 0
              while (bhx < comp.h && ok) {
                ok = decodeDcBlock(ci, my * comp.v + bv, mx * comp.h + bhx)
                bhx += 1
              }
              bv += 1
            }
            c += 1
          }
          mcu += 1
        }
      } else {
        val ci = scanComps(0)
        var b = 0
        val total = tbw(ci) * tbh(ci)
        while (b < total && ok) {
          if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
            if (!br.resetAtRst()) return -1
            java.util.Arrays.fill(preds, 0); eobrun = 0
          }
          ok = decodeDcBlock(ci, b / tbw(ci), b % tbw(ci))
          b += 1
        }
      }
    } else {
      val ci = scanComps(0)
      var b = 0
      val total = tbw(ci) * tbh(ci)
      while (b < total && ok) {
        if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
          if (!br.resetAtRst()) return -1
          eobrun = 0
        }
        ok = decodeAcBlock(ci, b / tbw(ci), b % tbw(ci))
        b += 1
      }
    }
    if (!ok) return -1
    br.pos // bytes consumed (the reader stops AT a marker byte)
  }

  /** Shared plane-assembly tail (greyscale copy-out or chroma upsample +
    * fixed-point YCbCr→RGB) — identical for baseline and progressive.
    */
  private def assemblePlanes(width: Int, height: Int, comps: Array[Comp],
                             hmax: Int, vmax: Int): Option[Decoded] = {
    if (comps.length == 1) {
      val c = comps(0)
      val px = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        System.arraycopy(c.plane, y * c.planeW, px, y * width, width)
        y += 1
      }
      Some(Decoded(width, height, 1, px))
    } else {
      val cy = comps(0); val ccb = comps(1); val ccr = comps(2)
      val sx = if (hmax / ccb.h == 2) 1 else 0
      val sy = if (vmax / ccb.v == 2) 1 else 0
      val px = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yy = u8(cy.plane(y * cy.planeW + x))
          val cb = u8(ccb.plane((y >> sy) * ccb.planeW + (x >> sx)))
          val cr = u8(ccr.plane((y >> sy) * ccr.planeW + (x >> sx)))
          val (r, g, b) = yccToRgb(yy, cb, cr)
          val o = (y * width + x) * 3
          px(o) = r.toByte; px(o + 1) = g.toByte; px(o + 2) = b.toByte
          x += 1
        }
        y += 1
      }
      Some(Decoded(width, height, 3, px))
    }
  }

  /** Classify a JPEG stream by its frame (SOF) marker WITHOUT decoding —
    * the quarantine census for crawled corpora, where progressive
    * (SOF2) is a large share of web images and this decoder is baseline
    * (SOF0) only. A marker walk over length-prefixed segments up to the
    * first SOF; standalone markers (TEM, RSTn) are skipped. Returns one
    * of: `baseline`, `extended_sequential` (SOF1), `progressive`
    * (SOF2), `lossless` (SOF3), `arithmetic` (SOF9/10), `other_sof`,
    * `no_frame`, `malformed`, `not_jpeg` — so an undecodable image is
    * COUNTED by why, never silently dropped.
    */
  def jpegKind(bytes: Array[Byte]): String = {
    if (bytes.length < 4 || u8(bytes(0)) != 0xff || u8(bytes(1)) != 0xd8)
      return "not_jpeg"
    var i = 2
    while (i + 2 <= bytes.length) {
      if (u8(bytes(i)) != 0xff) return "malformed"
      val m = u8(bytes(i + 1))
      m match {
        case 0xff               => i += 1 // fill byte before marker (T.81 B.1.1.2)
        case 0xc0               => return "baseline"
        case 0xc1               => return "extended_sequential"
        case 0xc2               => return "progressive"
        case 0xc3               => return "lossless"
        case 0xc9 | 0xca        => return "arithmetic"
        case 0xc5 | 0xc6 | 0xc7 | 0xcb | 0xcd | 0xce | 0xcf =>
          return "other_sof"
        case 0xd9               => return "no_frame" // EOI before any SOF
        case 0x01               => i += 2            // TEM, standalone
        case r if r >= 0xd0 && r <= 0xd7 => i += 2   // RSTn, standalone
        case _ =>
          if (i + 4 > bytes.length) return "malformed"
          val len = (u8(bytes(i + 2)) << 8) | u8(bytes(i + 3))
          if (len < 2 || i + 2 + len > bytes.length) return "malformed"
          i += 2 + len
      }
    }
    "no_frame"
  }

  /** Byte offset of the first SOF0 marker (the 0xFF of the pair) via
    * the same segment walk — never fooled by 0xFFC0 inside a table
    * payload. -1 if absent.
    */
  private[graft] def sof0Offset(bytes: Array[Byte]): Int = {
    var i = 2
    while (i + 4 <= bytes.length) {
      if (u8(bytes(i)) != 0xff) return -1
      val m = u8(bytes(i + 1))
      if (m == 0xc0) return i
      if (m == 0xff) i += 1 // fill byte before marker (T.81 B.1.1.2)
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2
      else {
        val len = (u8(bytes(i + 2)) << 8) | u8(bytes(i + 3))
        if (len < 2 || i + 2 + len > bytes.length) return -1
        i += 2 + len
      }
    }
    -1
  }

  /** Full baseline JPEG decode: greyscale (1 component) or YCbCr color
    * (3 components, 4:4:4 or 4:2:0, chroma upsampled by replication,
    * [[yccToRgb]] fixed-point conversion). Total: None on anything
    * malformed or unsupported (progressive, 12-bit, arithmetic coding,
    * other sampling layouts).
    */
  def decodeJpeg(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes.length < 4 || u8(bytes(0)) != 0xff || u8(bytes(1)) != 0xd8)
      return None
    var i = 2
    var width = 0; var height = 0
    val qt = new Array[Array[Int]](4)
    val dcTables = new Array[Huff](4)
    val acTables = new Array[Huff](4)
    var comps: Array[Comp] = null
    var restartInterval = 0
    var sosAt = -1
    while (sosAt < 0) {
      if (i + 4 > bytes.length) return None
      if (u8(bytes(i)) != 0xff) return None
      // consume 0xFF fill bytes before the marker (T.81 B.1.1.2)
      while (i + 3 <= bytes.length && u8(bytes(i + 1)) == 0xff) i += 1
      if (i + 4 > bytes.length) return None
      val m = u8(bytes(i + 1))
      if (m == 0xd9) return None // EOI before SOS
      val len = (u8(bytes(i + 2)) << 8) | u8(bytes(i + 3))
      if (len < 2 || i + 2 + len > bytes.length) return None
      val p = i + 4
      m match {
        case 0xdb => // DQT (possibly several tables)
          var j = p
          while (j < i + 2 + len) {
            val pq = u8(bytes(j)) >> 4; val tq = u8(bytes(j)) & 0x0f
            if (pq != 0 || tq > 3) return None // 8-bit tables only
            if (j + 65 > i + 2 + len) return None
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) { t(Zigzag(k)) = u8(bytes(j + 1 + k)); k += 1 }
            qt(tq) = t
            j += 65
          }
        case 0xc4 => // DHT (possibly several tables)
          var j = p
          while (j < i + 2 + len) {
            val tc = u8(bytes(j)) >> 4; val th = u8(bytes(j)) & 0x0f
            if (tc > 1 || th > 3) return None
            val counts = new Array[Int](16)
            var n = 0
            var k = 0
            while (k < 16) { counts(k) = u8(bytes(j + 1 + k)); n += counts(k); k += 1 }
            if (j + 17 + n > i + 2 + len) return None
            val syms = new Array[Int](n)
            k = 0
            while (k < n) { syms(k) = u8(bytes(j + 17 + k)); k += 1 }
            val h = new Huff(counts, syms)
            if (tc == 0) dcTables(th) = h else acTables(th) = h
            j += 17 + n
          }
        case 0xc0 => // SOF0 baseline
          if (u8(bytes(p)) != 8) return None
          height = (u8(bytes(p + 1)) << 8) | u8(bytes(p + 2))
          width = (u8(bytes(p + 3)) << 8) | u8(bytes(p + 4))
          val nc = u8(bytes(p + 5))
          if (nc != 1 && nc != 3) return None
          if (p + 6 + 3 * nc > i + 2 + len) return None
          comps = (0 until nc).map { c =>
            val samp = u8(bytes(p + 6 + 3 * c + 1))
            new Comp(u8(bytes(p + 6 + 3 * c)), samp >> 4, samp & 0x0f,
              u8(bytes(p + 6 + 3 * c + 2)))
          }.toArray
          if (nc == 1) {
            if (comps(0).h != 1 || comps(0).v != 1) return None
          } else {
            // luma 1x1 (4:4:4) or 2x2 (4:2:0); chroma always 1x1
            val (h0, v0) = (comps(0).h, comps(0).v)
            if (!((h0 == 1 && v0 == 1) || (h0 == 2 && v0 == 2))) return None
            if (comps(1).h != 1 || comps(1).v != 1 ||
                comps(2).h != 1 || comps(2).v != 1) return None
          }
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
             0xcd | 0xce | 0xcf =>
          return None // non-baseline SOF
        case 0xdd => // DRI
          restartInterval = (u8(bytes(p)) << 8) | u8(bytes(p + 1))
        case 0xda => // SOS
          if (comps == null) return None
          val ns = u8(bytes(p))
          if (ns != comps.length) return None
          if (p + 1 + 2 * ns > i + 2 + len) return None
          var c = 0
          while (c < ns) {
            val cid = u8(bytes(p + 1 + 2 * c))
            val sel = u8(bytes(p + 1 + 2 * c + 1))
            val comp = comps.find(_.id == cid).getOrElse(return None)
            comp.dcId = sel >> 4; comp.acId = sel & 0x0f
            c += 1
          }
          sosAt = i + 2 + len
        case _ => () // APPn / COM / others: skip
      }
      i += 2 + len
    }
    if (width <= 0 || height <= 0) return None
    for (c <- comps) {
      if (c.tq > 3 || qt(c.tq) == null) return None
      if (dcTables(c.dcId) == null || acTables(c.acId) == null) return None
    }

    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    for (c <- comps) {
      c.planeW = mcusX * c.h * 8
      c.planeH = mcusY * c.v * 8
      c.plane = new Array[Byte](c.planeW * c.planeH)
    }
    val br = new BitReaderMsb(java.util.Arrays.copyOfRange(bytes, sosAt, bytes.length))
    val coef = new Array[Int](64)
    val block = new Array[Int](64)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.resetAtRst()) return None
        comps.foreach(_.pred = 0)
      }
      val my = mcu / mcusX; val mx = mcu % mcusX
      var ci = 0
      while (ci < comps.length) {
        val comp = comps(ci)
        val q = qt(comp.tq)
        val dcH = dcTables(comp.dcId); val acH = acTables(comp.acId)
        var bv = 0
        while (bv < comp.v) {
          var bhx = 0
          while (bhx < comp.h) {
            java.util.Arrays.fill(coef, 0)
            val cat = decodeHuffSymbol(br, dcH)
            if (cat < 0 || cat > 11) return None
            val dv = if (cat == 0) 0 else {
              val r = br.receive(cat)
              if (r == Int.MinValue) return None
              extend(r, cat)
            }
            comp.pred += dv
            coef(0) = comp.pred * q(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = decodeHuffSymbol(br, acH)
              if (rs < 0) return None
              val run = rs >> 4; val size = rs & 0x0f
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else eob = true
              } else {
                k += run
                if (k > 63) return None
                val r = br.receive(size)
                if (r == Int.MinValue) return None
                coef(Zigzag(k)) = extend(r, size) * q(Zigzag(k))
                k += 1
              }
            }
            idct8x8(coef, block)
            val py0 = (my * comp.v + bv) * 8
            val px0 = (mx * comp.h + bhx) * 8
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                comp.plane((py0 + y) * comp.planeW + px0 + x) =
                  block(y * 8 + x).toByte
                x += 1
              }
              y += 1
            }
            bhx += 1
          }
          bv += 1
        }
        ci += 1
      }
      mcu += 1
    }

    if (comps.length == 1) {
      val c = comps(0)
      val px = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        System.arraycopy(c.plane, y * c.planeW, px, y * width, width)
        y += 1
      }
      Some(Decoded(width, height, 1, px))
    } else {
      // chroma upsampling by sample replication (shift by the sampling
      // ratio — 0 for 4:4:4, 1 for 4:2:0), then fixed-point YCbCr→RGB
      val cy = comps(0); val ccb = comps(1); val ccr = comps(2)
      val sx = if (hmax / ccb.h == 2) 1 else 0
      val sy = if (vmax / ccb.v == 2) 1 else 0
      val px = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yy = u8(cy.plane(y * cy.planeW + x))
          val cb = u8(ccb.plane((y >> sy) * ccb.planeW + (x >> sx)))
          val cr = u8(ccr.plane((y >> sy) * ccr.planeW + (x >> sx)))
          val (r, g, b) = yccToRgb(yy, cb, cr)
          val o = (y * width + x) * 3
          px(o) = r.toByte; px(o + 1) = g.toByte; px(o + 2) = b.toByte
          x += 1
        }
        y += 1
      }
      Some(Decoded(width, height, 3, px))
    }
  }
}
