package graft.multimodal

import java.nio.charset.StandardCharsets

/** REAL sample-level WAV (RIFF/PCM) codec, pure JVM — extends the
  * multimodal tier from images (PixelCodec) to audio: encode writes a
  * spec-valid RIFF file (RIFF/WAVE header, 16-byte PCM fmt chunk, an
  * ancillary LIST chunk so decoders must actually walk the chunk list,
  * word-aligned data chunk, little-endian 16-bit samples); decode walks
  * the chunks, parses fmt, and materializes the PCM samples.
  *
  * Reference scope: the reference pipeline (bfr.py) has no audio path;
  * this implements the multimodal brief (binary columns + typed decode)
  * with the decode step REAL rather than stubbed, like the PNG tier.
  *
  * At 100 TB this is a map-side kernel: bytes in, samples out, no
  * shuffle, no driver round-trips.
  */
object WavCodec {

  /** `samples` are interleaved, normalized to 16-bit: 24/32-bit PCM is
    * arithmetic-shifted to its top 16 bits at decode (the standard
    * bit-depth reduction; a planted stream with zero low bytes
    * round-trips EXACTLY). `bits` preserves the container's declared
    * depth for metadata/census queries.
    */
  final case class DecodedWav(sampleRate: Int, channels: Int, bits: Int,
                              samples: Array[Short])

  private def u8(b: Byte): Int = b & 0xff

  private def le16(a: Array[Byte], i: Int): Int = u8(a(i)) | (u8(a(i + 1)) << 8)

  private def le32(a: Array[Byte], i: Int): Long =
    u8(a(i)).toLong | (u8(a(i + 1)).toLong << 8) |
      (u8(a(i + 2)).toLong << 16) | (u8(a(i + 3)).toLong << 24)

  private def tag(a: Array[Byte], i: Int): String =
    new String(a, i, 4, StandardCharsets.US_ASCII)

  private def writeLe16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }

  private def writeLe32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }

  private def writeTag(out: java.io.ByteArrayOutputStream, t: String): Unit =
    out.write(t.getBytes(StandardCharsets.US_ASCII), 0, 4)

  /** Encode 16-bit PCM mono/stereo as a spec-valid WAV. An ancillary LIST
    * (INFO) chunk is written BEFORE data so a decoder that assumes
    * "data starts at byte 44" reads garbage — the chunk walk is
    * exercised, not just assumed.
    */
  def encodeWav(sampleRate: Int, channels: Int,
                samples: Array[Short]): Array[Byte] = {
    require(channels == 1 || channels == 2, s"channels=$channels")
    require(samples.length % channels == 0)
    val dataBytes = samples.length * 2
    val info = "GRFT".getBytes(StandardCharsets.US_ASCII)
    // LIST chunk payload: "INFO" + one sub-chunk ISFT of 4 bytes
    val listPayload = 4 + 8 + info.length
    val riffSize = 4 + (8 + 16) + (8 + listPayload) + (8 + dataBytes)

    val out = new java.io.ByteArrayOutputStream(12 + riffSize)
    writeTag(out, "RIFF"); writeLe32(out, riffSize.toLong); writeTag(out, "WAVE")

    writeTag(out, "fmt "); writeLe32(out, 16L)
    writeLe16(out, 1) // PCM
    writeLe16(out, channels)
    writeLe32(out, sampleRate.toLong)
    writeLe32(out, sampleRate.toLong * channels * 2) // byte rate
    writeLe16(out, channels * 2) // block align
    writeLe16(out, 16) // bits per sample

    writeTag(out, "LIST"); writeLe32(out, listPayload.toLong)
    writeTag(out, "INFO"); writeTag(out, "ISFT")
    writeLe32(out, info.length.toLong); out.write(info, 0, info.length)

    writeTag(out, "data"); writeLe32(out, dataBytes.toLong)
    var i = 0
    while (i < samples.length) { writeLe16(out, samples(i) & 0xffff); i += 1 }
    out.toByteArray
  }

  /** Full WAV decode: RIFF/WAVE signature, chunk walk with word-alignment
    * padding, PCM fmt parse (16/24/32-bit integer PCM, 1..8 channels —
    * the crawled-audio spread; stereo and 24-bit are common in the
    * wild), data → interleaved 16-bit-normalized samples. Returns None
    * on anything malformed or unsupported (non-PCM codecs, float PCM,
    * 8-bit, a data chunk that is not a whole number of sample frames).
    */
  def decodeWav(bytes: Array[Byte]): Option[DecodedWav] = {
    if (bytes.length < 12 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE")
      return None
    var sampleRate = 0; var channels = 0; var bits = 0; var sawFmt = false
    var samples: Array[Short] = null
    var i = 12
    while (i + 8 <= bytes.length) {
      val t = tag(bytes, i)
      val len = le32(bytes, i + 4).toInt
      if (len < 0 || i + 8 + len > bytes.length) return None
      t match {
        case "fmt " =>
          if (len < 16) return None
          val fmt = le16(bytes, i + 8)
          channels = le16(bytes, i + 10)
          sampleRate = le32(bytes, i + 12).toInt
          bits = le16(bytes, i + 22)
          if (fmt != 1 || (bits != 16 && bits != 24 && bits != 32) ||
              channels < 1 || channels > 8)
            return None
          sawFmt = true
        case "data" =>
          if (!sawFmt) return None // fmt must precede data per spec use
          val bps = bits / 8
          if (len % (bps * channels) != 0) return None // partial frame
          val n = len / bps
          val s = new Array[Short](n)
          var k = 0
          bits match {
            case 16 =>
              while (k < n) { s(k) = le16(bytes, i + 8 + 2 * k).toShort; k += 1 }
            case 24 =>
              while (k < n) {
                val o = i + 8 + 3 * k
                // sign-extend 24 → 32, keep the top 16 bits
                val v = (u8(bytes(o)) | (u8(bytes(o + 1)) << 8) |
                  (u8(bytes(o + 2)) << 24 >> 8))
                s(k) = (v >> 8).toShort
                k += 1
              }
            case 32 =>
              while (k < n) {
                val v = le32(bytes, i + 8 + 4 * k).toInt
                s(k) = (v >> 16).toShort
                k += 1
              }
          }
          samples = s
        case _ => () // ancillary chunk (LIST, cue , ...): skip
      }
      i += 8 + len + (len & 1) // chunks are word-aligned; odd sizes pad
    }
    if (!sawFmt || samples == null || sampleRate <= 0) return None
    Some(DecodedWav(sampleRate, channels, bits, samples))
  }

  /** Interleaved → mono by per-frame channel mean (Int accumulate,
    * truncating division — deterministic, and exact when all channels
    * carry the same value, the planted-fixture case). Mono in = the
    * same array out, so every existing mono path is unchanged.
    */
  def downmixMono(d: DecodedWav): Array[Short] =
    if (d.channels == 1) d.samples
    else {
      val n = d.samples.length / d.channels
      val out = new Array[Short](n)
      var i = 0
      while (i < n) {
        var acc = 0
        var c = 0
        while (c < d.channels) { acc += d.samples(i * d.channels + c); c += 1 }
        out(i) = (acc / d.channels).toShort
        i += 1
      }
      out
    }

  /** General integer-PCM encoder for multi-depth fixtures: interleaved
    * `samples` (one Int per channel-sample, must fit `bits`), bits ∈
    * {16, 24, 32}. Same chunk layout as [[encodeWav]] (ancillary LIST
    * before data, so the chunk walk is always exercised).
    */
  def encodeWavPcm(sampleRate: Int, channels: Int, bits: Int,
                   samples: Array[Int]): Array[Byte] = {
    require(bits == 16 || bits == 24 || bits == 32, s"bits=$bits")
    require(channels >= 1 && channels <= 8, s"channels=$channels")
    require(samples.length % channels == 0)
    val bps = bits / 8
    val dataBytes = samples.length * bps
    val info = "GRFT".getBytes(StandardCharsets.US_ASCII)
    val listPayload = 4 + 8 + info.length
    val riffSize = 4 + (8 + 16) + (8 + listPayload) + (8 + dataBytes) + (dataBytes & 1)

    val out = new java.io.ByteArrayOutputStream(12 + riffSize)
    writeTag(out, "RIFF"); writeLe32(out, riffSize.toLong); writeTag(out, "WAVE")

    writeTag(out, "fmt "); writeLe32(out, 16L)
    writeLe16(out, 1) // PCM
    writeLe16(out, channels)
    writeLe32(out, sampleRate.toLong)
    writeLe32(out, sampleRate.toLong * channels * bps) // byte rate
    writeLe16(out, channels * bps) // block align
    writeLe16(out, bits)

    writeTag(out, "LIST"); writeLe32(out, listPayload.toLong)
    writeTag(out, "INFO"); writeTag(out, "ISFT")
    writeLe32(out, info.length.toLong); out.write(info, 0, info.length)

    writeTag(out, "data"); writeLe32(out, dataBytes.toLong)
    var i = 0
    while (i < samples.length) {
      val v = samples(i)
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      if (bps >= 3) out.write((v >> 16) & 0xff)
      if (bps == 4) out.write((v >> 24) & 0xff)
      i += 1
    }
    if ((dataBytes & 1) == 1) out.write(0) // word-align the chunk list
    out.toByteArray
  }

  /** Frame-segmented features over decoded samples: per-frame energy
    * (sum of squares, exact in Long), zero-crossing count WITHIN each
    * frame, global peak. Frame boundaries reset the ZCR predecessor so
    * the feature is per-frame local (standard frame analysis shape), and
    * exactly reproducible by a closed-form oracle.
    */
  final case class FrameFeatures(energies: Array[Long], zcr: Long, peak: Int,
                                 sumSq: Long)

  def frameFeatures(samples: Array[Short], frameLen: Int): FrameFeatures = {
    val nf = samples.length / frameLen
    val energies = new Array[Long](nf)
    var zcr = 0L; var peak = 0; var sumSq = 0L
    var f = 0
    while (f < nf) {
      var e = 0L
      var i = f * frameLen
      val end = (f + 1) * frameLen
      var prev = 0
      while (i < end) {
        val x = samples(i).toInt
        e += x.toLong * x
        val ax = math.abs(x)
        if (ax > peak) peak = ax
        if (i > f * frameLen && ((x < 0) != (prev < 0))) zcr += 1
        prev = x
        i += 1
      }
      energies(f) = e
      sumSq += e
      f += 1
    }
    FrameFeatures(energies, zcr, peak, sumSq)
  }

  /** 64-bit energy-difference fingerprint over 65 frame energies, split
    * into four 16-bit bands (chromaprint-style sign-of-delta, the exact
    * time-domain twin of PixelCodec.dhashBands): bit f set iff
    * energy(f) < energy(f+1); band = f / 16, in-band index = f % 16.
    */
  def energyFingerprint(energies: Array[Long]): Array[Long] = {
    require(energies.length == 65, s"frames=${energies.length}")
    val bands = new Array[Long](4)
    var f = 0
    while (f < 64) {
      if (energies(f) < energies(f + 1)) bands(f / 16) |= 1L << (f % 16)
      f += 1
    }
    bands
  }
}
