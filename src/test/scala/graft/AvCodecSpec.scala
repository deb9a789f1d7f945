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
}
