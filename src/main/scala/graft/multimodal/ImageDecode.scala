package graft.multimodal

/** Container-agnostic image decode: sniff the magic bytes and dispatch
  * to the real codec for that container (PNG → [[PixelCodec]],
  * GIF89a → [[GifCodec]], baseline JPEG → [[JpegCodec]]). This is the
  * entry point a mixed-format corpus uses — callers never branch on
  * container type, and the fingerprints that come out are
  * container-independent (pinned by `q_cross_codec_dups`), so one banded
  * join dedups across formats with no per-format special-casing.
  */
object ImageDecode {

  private val GridW = 9 // dHash grid: 9 columns × 8 rows
  private val GridH = 8

  /** Total over arbitrary bytes: None for junk, truncation, or a
    * container none of the codecs accept (each codec is itself total).
    */
  def decodeAny(bytes: Array[Byte]): Option[PixelCodec.Decoded] = {
    if (bytes == null || bytes.length < 4) return None
    val b0 = bytes(0) & 0xff; val b1 = bytes(1) & 0xff
    val b2 = bytes(2) & 0xff
    if (b0 == 0x89 && b1 == 'P' && b2 == 'N') PixelCodec.decodePng(bytes)
    else if (b0 == 'G' && b1 == 'I' && b2 == 'F') GifCodec.decodeGif(bytes)
    else if (b0 == 0xff && b1 == 0xd8) JpegCodec.decodeJpeg(bytes)
    else None
  }

  /** bytes → 4×16-bit banded dHash through whichever real codec the
    * container needs: decode → integer Rec.601 luma → exact box-average
    * to the 9×8 grid → banded gradient hash. Pure per-row compute (no
    * shuffle, no state) — safe inside a continuous query at any scale.
    */
  def fingerprint(bytes: Array[Byte]): Option[Array[Long]] =
    decodeAny(bytes).map { d =>
      val luma = PixelCodec.luminance(d.pixels, d.channels)
      val grid = PixelCodec.resizeArea(luma, d.width, d.height, GridW, GridH)
      PixelCodec.dhashBands(grid)
    }
}
