package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Mp4Codec, WavCodec}

/** Unit gate for the audio/video codec chains: WAV round-trip and frame
  * features against hand-computed closed forms; MP4 box walk against the
  * planted parameters; malformed-input rejection for both.
  */
class AvCodecSpec extends AnyFunSuite {

  test("WAV round-trips samples exactly through a real chunk walk") {
    val samples = Array.tabulate[Short](1024)(i => ((i * 37 - 500) % 30000).toShort)
    val wav = WavCodec.encodeWav(16000, 1, samples)
    val d = WavCodec.decodeWav(wav).get
    assert(d.sampleRate == 16000 && d.channels == 1)
    assert(d.samples.toSeq == samples.toSeq)
  }

  test("WAV decode skips the ancillary LIST chunk (data is NOT at byte 44)") {
    val wav = WavCodec.encodeWav(8000, 2, Array.tabulate[Short](64)(_.toShort))
    // byte 44 falls inside the LIST chunk, not data
    assert(new String(wav, 36, 4, java.nio.charset.StandardCharsets.US_ASCII) == "LIST")
    assert(WavCodec.decodeWav(wav).get.samples.length == 64)
  }

  test("WAV decode rejects malformed input") {
    assert(WavCodec.decodeWav(Array[Byte](1, 2, 3)).isEmpty)
    val wav = WavCodec.encodeWav(16000, 1, Array.tabulate[Short](16)(_.toShort))
    wav(9) = 'X'.toByte // corrupt WAVE tag
    assert(WavCodec.decodeWav(wav).isEmpty)
    assert(WavCodec.decodeWav(wav.take(30)).isEmpty) // truncated
  }

  test("WAV 24/32-bit PCM normalizes to the exact top-16 bits; stereo downmixes losslessly") {
    val mono = Array.tabulate[Short](512)(i => ((i * 91 - 7000) % 30000).toShort)
    // 24-bit with zero low byte: round-trips EXACTLY to the 16-bit values
    val s24 = mono.map(_.toInt << 8)
    val d24 = WavCodec.decodeWav(WavCodec.encodeWavPcm(16000, 1, 24, s24)).get
    assert(d24.bits == 24 && d24.channels == 1)
    assert(d24.samples.toSeq == mono.toSeq)
    // 24-bit with a NONZERO low byte: floor toward the top 16 (arithmetic shift)
    val noisy = WavCodec.decodeWav(WavCodec.encodeWavPcm(16000, 1, 24,
      Array((-5 << 8) | 0x7f, (5 << 8) | 0x7f))).get
    assert(noisy.samples.toSeq == Seq[Short](-5, 5))
    // 32-bit: top 16 bits survive
    val s32 = mono.map(_.toInt << 16)
    val d32 = WavCodec.decodeWav(WavCodec.encodeWavPcm(16000, 1, 32, s32)).get
    assert(d32.bits == 32 && d32.samples.toSeq == mono.toSeq)
    // stereo L = R: downmix is the identity content
    val st = new Array[Int](mono.length * 2)
    mono.indices.foreach { i => st(2 * i) = mono(i); st(2 * i + 1) = mono(i) }
    val dst = WavCodec.decodeWav(WavCodec.encodeWavPcm(16000, 2, 16, st)).get
    assert(dst.channels == 2 && dst.samples.length == mono.length * 2)
    assert(WavCodec.downmixMono(dst).toSeq == mono.toSeq)
    // quad with distinct channels: per-frame truncating mean
    val quad = WavCodec.decodeWav(WavCodec.encodeWavPcm(8000, 4, 16,
      Array(1, 2, 3, 5, -1, -2, -3, -5))).get
    assert(WavCodec.downmixMono(quad).toSeq == Seq[Short](2, -2))
    // a data chunk that is not a whole number of frames is malformed:
    // shrink the declared data length (offset 64: RIFF 12 + fmt 24 +
    // LIST 24 + "data" tag 4) from 12 to 11 bytes — a partial frame
    val odd = WavCodec.encodeWavPcm(8000, 2, 24, Array(1, 2, 3, 4))
    assert(WavCodec.decodeWav(odd).isDefined)
    assert(new String(odd, 60, 4, java.nio.charset.StandardCharsets.US_ASCII) == "data")
    val torn = odd.clone()
    torn(64) = 11
    assert(WavCodec.decodeWav(torn).isEmpty)
  }

  test("frame features match the closed form on a planted square wave") {
    // 2 frames x 8 samples: amp 100 period p=2, then amp 300 p=4
    val s = Array[Short](100, 100, -100, -100, 100, 100, -100, -100,
      300, 300, 300, 300, -300, -300, -300, -300)
    val ff = WavCodec.frameFeatures(s, 8)
    assert(ff.energies.toSeq == Seq(8L * 100 * 100, 8L * 300 * 300))
    assert(ff.peak == 300)
    assert(ff.zcr == 3 + 1) // floor(7/2) + floor(7/4)
    assert(ff.sumSq == ff.energies.sum)
  }

  test("energy fingerprint bands match a hand-built energy sequence") {
    val e = Array.tabulate[Long](65)(f => if (f % 2 == 0) 10L else 20L)
    // bit f set iff e(f) < e(f+1): true exactly at even f
    val bands = WavCodec.energyFingerprint(e)
    assert(bands.forall(_ == 0x5555L))
  }

  test("audio planted fixture: group of 4 is a near-dup clique, j=3 differs") {
    def bands(id: Long) = {
      val d = WavCodec.decodeWav(AudioQueries.plantedWav(id)).get
      WavCodec.energyFingerprint(WavCodec.frameFeatures(d.samples, 256).energies).toSeq
    }
    assert(bands(40) == bands(41) && bands(41) == bands(42))
    val h = bands(40).zip(bands(43))
      .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum
    assert(h >= 0 && h <= 2) // one perturbed frame flips at most 2 bits
  }

  test("MP4 decode recovers the planted two-track structure") {
    val mp4 = VideoQueries.plantedMp4(7)
    val d = Mp4Codec.decodeMp4(mp4).get
    assert(d.movTimescale == 1000 && d.movDuration == (750 + 7) * 40)
    assert(d.tracks.length == 2)
    val v = d.tracks.find(_.handler == "vide").get
    val a = d.tracks.find(_.handler == "soun").get
    assert(v.trackId == 1 && a.trackId == 2)
    assert(v.width == 256 + 3 * 128 && v.height == 144 + 3 * 72)
    assert(a.width == 0 && a.height == 0)
    assert(v.timescale == 90000 && a.timescale == 16000)
    assert(Mp4Codec.totalSamples(v.sttsEntries) == 757)
    assert(v.syncSamples.length == (757 + 24) / 25)
    assert(v.syncSamples.take(3).toSeq == Seq(1L, 26L, 51L))
  }

  test("MP4 pts reconstruction walks multi-entry stts tables") {
    val stts = Array((3L, 100L), (2L, 50L), (10L, 10L))
    assert(Mp4Codec.ptsOfSample(stts, 1) == 0)
    assert(Mp4Codec.ptsOfSample(stts, 4) == 300)
    assert(Mp4Codec.ptsOfSample(stts, 6) == 400)
    assert(Mp4Codec.ptsOfSample(stts, 8) == 420)
  }

  test("MP4 decode rejects malformed input") {
    assert(Mp4Codec.decodeMp4(Array[Byte](0, 0, 0, 1)).isEmpty)
    val mp4 = VideoQueries.plantedMp4(1)
    assert(Mp4Codec.decodeMp4(mp4.take(40)).isEmpty) // moov truncated away
  }

  test("MP4 sample extraction round-trips payloads across the chunk split") {
    val samples = IndexedSeq.tabulate(11)(n =>
      Array.tabulate[Byte](3 + n % 5)(i => (n * 31 + i).toByte))
    val mp4 = Mp4Codec.encodeMp4Samples(1000, 11 * 40, 90000, 3600,
      320, 180, 5, 16000, samples)
    val v = Mp4Codec.decodeMp4(mp4).get.tracks.find(_.handler == "vide").get
    assert(v.sampleSizes.toSeq == samples.map(_.length.toLong))
    assert(v.chunkOffsets.length == 2 && v.stscEntries.length == 2)
    // chunk 1 holds samples 1..5, chunk 2 holds 6..11 (with a gap between)
    for (n <- 1 to 11)
      assert(Mp4Codec.extractSample(mp4, v, n).get.toSeq ==
        samples(n - 1).toSeq, s"sample $n")
    assert(Mp4Codec.extractSample(mp4, v, 0).isEmpty)
    assert(Mp4Codec.extractSample(mp4, v, 12).isEmpty)
  }

  test("MP4 sampleRange walks multi-run stsc tables generically") {
    // 3 chunks: run 1 → 2 samples/chunk (chunks 1-2), run 2 → 3 samples
    // (chunk 3); sizes 10,20,30,40,50,60,70; offsets 100, 200, 300
    val t = Mp4Codec.Track(1, "vide", 90000, 0, 0, 0,
      Array.empty, Array.empty,
      sampleSizes = Array(10L, 20, 30, 40, 50, 60, 70),
      stscEntries = Array((1L, 2L), (3L, 3L)),
      chunkOffsets = Array(100L, 200L, 300L))
    assert(Mp4Codec.sampleRange(t, 1).get == ((100L, 10)))
    assert(Mp4Codec.sampleRange(t, 2).get == ((110L, 20)))
    assert(Mp4Codec.sampleRange(t, 3).get == ((200L, 30)))
    assert(Mp4Codec.sampleRange(t, 4).get == ((230L, 40)))
    assert(Mp4Codec.sampleRange(t, 5).get == ((300L, 50)))
    assert(Mp4Codec.sampleRange(t, 6).get == ((350L, 60)))
    assert(Mp4Codec.sampleRange(t, 7).get == ((410L, 70)))
    assert(Mp4Codec.sampleRange(t, 8).isEmpty)
  }

  test("video content fixture: stco offsets are absolute and keyframes planted") {
    val mp4 = VideoQueries.plantedContentMp4(12)
    val v = Mp4Codec.decodeMp4(mp4).get.tracks.find(_.handler == "vide").get
    assert(v.syncSamples.length == 65 + (12 / 4 % 4))
    // keyframe 0 = sample 1: payload bytes base..base+15
    val base = VideoQueries.kfBase(12, 0)
    assert(Mp4Codec.extractSample(mp4, v, 1).get.toSeq ==
      (0 until 16).map(i => (base + i).toByte))
    // a keyframe AFTER the chunk split extracts correctly too
    val lastKf = v.syncSamples.max
    val kLast = ((lastKf - 1) / 25).toInt
    val baseLast = VideoQueries.kfBase(12, kLast)
    assert(Mp4Codec.extractSample(mp4, v, lastKf).get.toSeq ==
      (0 until 16).map(i => (baseLast + i).toByte))
  }

  test("video planted fixture: group of 4 is a near-dup clique, j=3 differs") {
    def bands(id: Long): Seq[Long] = {
      val mp4 = VideoQueries.plantedContentMp4(id)
      val v = Mp4Codec.decodeMp4(mp4).get.tracks.find(_.handler == "vide").get
      val sigs = v.syncSamples.sorted.take(65).map(sn =>
        Mp4Codec.extractSample(mp4, v, sn).get
          .foldLeft(0L)((acc, b) => acc + (b & 0xff)))
      val out = new Array[Long](4)
      for (f <- 0 until 64 if sigs(f) < sigs(f + 1)) out(f / 16) |= 1L << (f % 16)
      out.toSeq
    }
    assert(bands(40) == bands(41) && bands(41) == bands(42))
    val h = bands(40).zip(bands(43))
      .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum
    assert(h >= 0 && h <= 2) // one perturbed keyframe flips at most 2 bits
  }

  test("scene fixture: keyframes are real PNGs, identical within a scene") {
    val mp4 = VideoQueries.plantedScenesMp4(5)
    val v = Mp4Codec.decodeMp4(mp4).get.tracks.find(_.handler == "vide").get
    val kfs = v.syncSamples.sorted.take(16)
    assert(kfs.length == 16)
    val pngs = kfs.map(sn => Mp4Codec.extractSample(mp4, v, sn).get)
    val decs = pngs.map(p => graft.multimodal.PixelCodec.decodePng(p).get)
    assert(decs.forall(d => d.width == 9 && d.height == 8 && d.channels == 1))
    // keyframe 0's pixels match the closed form
    for (y <- 0 until 8; x <- 0 until 9)
      assert((decs(0).pixels(y * 9 + x) & 0xff) ==
        VideoQueries.scenePixel(5, 0, x, y))
    // scenes of 4: keyframes 0-3 identical, 4 starts a new scene
    assert(pngs(1).toSeq == pngs(0).toSeq && pngs(3).toSeq == pngs(0).toSeq)
    assert(pngs(4).toSeq != pngs(3).toSeq)
    assert(decs(4).pixels.toSeq ==
      (for (y <- 0 until 8; x <- 0 until 9)
        yield VideoQueries.scenePixel(5, 1, x, y).toByte))
  }
}
