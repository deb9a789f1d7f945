package graft.multimodal

/** Container-sniffing TOTAL fingerprint kernels for the audio and video
  * tiers — the streaming-ingest counterpart of [[ImageDecode]]: bytes in,
  * a 4×16-bit banded fingerprint out, None for anything undecodable.
  * Pure per-row compute (no shuffle, no state), so the functions are
  * legal inside a continuous query at any scale; the batch tiers
  * (`AudioQueries` / `VideoQueries`) compute the SAME fingerprints
  * through the same codecs, so a streaming suppression decision and the
  * offline dedup pipeline always agree on what counts as a duplicate.
  */
object MediaDecode {

  /** Frame length the audio tier fingerprints at (256 samples/frame —
    * must match `AudioQueries.FrameLen` so streaming and batch
    * fingerprints are comparable).
    */
  val AudioFrameLen = 256

  /** Fingerprint spans this many leading frames/keyframes (bits = 64
    * deltas between 65 consecutive energies/signatures).
    */
  val FingerprintSpan = 65

  /** WAV/PCM bytes → chromaprint-style energy-delta fingerprint
    * (sign-of-delta over the first 65 frame energies, 4×16-bit bands).
    * None for junk, truncation, non-RIFF containers, or audio shorter
    * than the fingerprint span — too-short clips cannot be fingerprinted
    * and must be quarantined, never spuriously matched against each
    * other on zero-padded tails.
    */
  def audioFingerprint(bytes: Array[Byte]): Option[Array[Long]] = {
    if (bytes == null) return None
    WavCodec.decodeWav(bytes).flatMap { d =>
      // stereo/multi-channel first normalizes to mono (identity for the
      // mono corpus) so a stereo re-encode of the same content
      // fingerprints identically to its mono original
      val mono = WavCodec.downmixMono(d)
      if (mono.length < FingerprintSpan * AudioFrameLen) None
      else {
        val ff = WavCodec.frameFeatures(
          java.util.Arrays.copyOf(mono, FingerprintSpan * AudioFrameLen),
          AudioFrameLen)
        Some(WavCodec.energyFingerprint(ff.energies))
      }
    }
  }

  /** ISO-BMFF (MP4) bytes → keyframe-content fingerprint: the sync
    * samples' payload byte-sum signatures (extracted through the real
    * stsz/stsc/stco walk), sign-of-delta over the first 65, 4×16-bit
    * bands. None for junk, containers without a video track, missing
    * sample tables, or fewer than 65 keyframes.
    */
  def videoFingerprint(bytes: Array[Byte]): Option[Array[Long]] = {
    if (bytes == null) return None
    Mp4Codec.decodeMp4(bytes).flatMap { d =>
      d.tracks.find(_.handler == "vide") match {
        case Some(v) if v.syncSamples.length >= FingerprintSpan =>
          val sigs = new Array[Long](FingerprintSpan)
          val sync = v.syncSamples.sorted
          var k = 0
          while (k < FingerprintSpan) {
            Mp4Codec.extractSample(bytes, v, sync(k)) match {
              case Some(payload) =>
                var s = 0L
                var i = 0
                while (i < payload.length) { s += payload(i) & 0xff; i += 1 }
                sigs(k) = s
              case None => return None
            }
            k += 1
          }
          val bands = new Array[Long](4)
          var f = 0
          while (f < FingerprintSpan - 1) {
            if (sigs(f) < sigs(f + 1)) bands(f / 16) |= 1L << (f % 16)
            f += 1
          }
          Some(bands)
        case _ => None
      }
    }
  }
}
