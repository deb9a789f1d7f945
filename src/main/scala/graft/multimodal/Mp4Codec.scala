package graft.multimodal

import java.nio.charset.StandardCharsets

/** REAL ISO BMFF (MP4) box-structure codec, pure JVM — completes the
  * multimodal triad (PNG pixels, WAV samples, MP4 boxes): encode writes a
  * spec-valid box tree (ftyp, moov with mvhd / per-track tkhd-mdia-mdhd-
  * hdlr chains, a video stbl with stts + stss sample tables, ancillary
  * free/udta boxes, mdat); decode WALKS the nested tree — size-prefixed
  * boxes, container recursion, version/flags headers, 16.16 fixed-point,
  * sample-table expansion — with no fixed offsets assumed.
  *
  * Reference scope: the reference pipeline (bfr.py) has no video path;
  * this implements the multimodal brief (binary columns + typed decode)
  * with the container parse REAL; pixel-level frame decode of the video
  * essence is out of scope (mdat carries an opaque payload), the same
  * boundary commercial metadata pipelines draw.
  *
  * At 100 TB this is a map-side kernel: bytes in, track metadata and
  * keyframe timestamps out, no shuffle, no driver round-trips.
  */
object Mp4Codec {

  final case class Track(trackId: Long, handler: String, timescale: Long,
                         duration: Long, width: Int, height: Int,
                         sttsEntries: Array[(Long, Long)], // (count, delta)
                         syncSamples: Array[Long], // 1-based, empty if no stss
                         // sample-location tables (empty when the track has
                         // no stsz/stsc/stco — e.g. the metadata-only audio
                         // track): sizes per sample, (first_chunk,
                         // samples_per_chunk) runs, absolute chunk offsets
                         sampleSizes: Array[Long] = Array.empty,
                         stscEntries: Array[(Long, Long)] = Array.empty,
                         chunkOffsets: Array[Long] = Array.empty)

  final case class DecodedMp4(movTimescale: Long, movDuration: Long,
                              tracks: Array[Track])

  private def u8(b: Byte): Int = b & 0xff

  private def be16(a: Array[Byte], i: Int): Int = (u8(a(i)) << 8) | u8(a(i + 1))

  private def be32(a: Array[Byte], i: Int): Long =
    (u8(a(i)).toLong << 24) | (u8(a(i + 1)) << 16) | (u8(a(i + 2)) << 8) | u8(a(i + 3))

  private def tag(a: Array[Byte], i: Int): String =
    new String(a, i, 4, StandardCharsets.US_ASCII)

  // ---- encoder ----

  private def writeBe32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
    out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
  }

  private def writeBe16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >> 8) & 0xff); out.write(v & 0xff)
  }

  private def box(fourcc: String, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(8 + payload.length)
    writeBe32(out, 8L + payload.length)
    out.write(fourcc.getBytes(StandardCharsets.US_ASCII), 0, 4)
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  private def container(fourcc: String, children: Array[Byte]*): Array[Byte] =
    box(fourcc, children.reduce(_ ++ _))

  private def mvhd(timescale: Long, duration: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(100)
    writeBe32(out, 0) // version 0 + flags
    writeBe32(out, 0); writeBe32(out, 0) // creation, modification
    writeBe32(out, timescale); writeBe32(out, duration)
    writeBe32(out, 0x00010000L) // rate 1.0
    writeBe16(out, 0x0100) // volume 1.0
    out.write(new Array[Byte](10), 0, 10) // reserved
    identityMatrix(out)
    out.write(new Array[Byte](24), 0, 24) // pre_defined
    writeBe32(out, 3) // next_track_ID
    box("mvhd", out.toByteArray)
  }

  private def identityMatrix(out: java.io.ByteArrayOutputStream): Unit = {
    val m = Array(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
    m.foreach(writeBe32(out, _))
  }

  private def tkhd(trackId: Long, duration: Long, w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(92)
    writeBe32(out, 7) // version 0, flags: enabled | in_movie | in_preview
    writeBe32(out, 0); writeBe32(out, 0) // creation, modification
    writeBe32(out, trackId)
    writeBe32(out, 0) // reserved
    writeBe32(out, duration)
    out.write(new Array[Byte](8), 0, 8) // reserved
    writeBe16(out, 0); writeBe16(out, 0) // layer, alternate_group
    writeBe16(out, if (w == 0) 0x0100 else 0) // volume (audio) / 0 (video)
    writeBe16(out, 0) // reserved
    identityMatrix(out)
    writeBe32(out, w.toLong << 16); writeBe32(out, h.toLong << 16) // 16.16
    box("tkhd", out.toByteArray)
  }

  private def mdhd(timescale: Long, duration: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(32)
    writeBe32(out, 0)
    writeBe32(out, 0); writeBe32(out, 0)
    writeBe32(out, timescale); writeBe32(out, duration)
    writeBe16(out, 0x55c4) // language "und"
    writeBe16(out, 0)
    box("mdhd", out.toByteArray)
  }

  private def hdlr(handlerType: String, name: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(32)
    writeBe32(out, 0)
    writeBe32(out, 0) // pre_defined
    out.write(handlerType.getBytes(StandardCharsets.US_ASCII), 0, 4)
    out.write(new Array[Byte](12), 0, 12) // reserved
    val nb = name.getBytes(StandardCharsets.UTF_8)
    out.write(nb, 0, nb.length); out.write(0)
    box("hdlr", out.toByteArray)
  }

  private def stts(entries: Seq[(Long, Long)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(16 + entries.size * 8)
    writeBe32(out, 0)
    writeBe32(out, entries.size.toLong)
    entries.foreach { case (c, d) => writeBe32(out, c); writeBe32(out, d) }
    box("stts", out.toByteArray)
  }

  private def stss(samples: Seq[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(16 + samples.size * 4)
    writeBe32(out, 0)
    writeBe32(out, samples.size.toLong)
    samples.foreach(writeBe32(out, _))
    box("stss", out.toByteArray)
  }

  /** Non-uniform sample sizes: sample_size field 0, one entry per sample. */
  private def stsz(sizes: Seq[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(20 + sizes.size * 4)
    writeBe32(out, 0) // version + flags
    writeBe32(out, 0) // sample_size = 0 → per-sample entries follow
    writeBe32(out, sizes.size.toLong)
    sizes.foreach(writeBe32(out, _))
    box("stsz", out.toByteArray)
  }

  /** Sample-to-chunk runs: (first_chunk, samples_per_chunk) with
    * sample_description_index pinned to 1.
    */
  private def stsc(entries: Seq[(Long, Long)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(16 + entries.size * 12)
    writeBe32(out, 0)
    writeBe32(out, entries.size.toLong)
    entries.foreach { case (first, per) =>
      writeBe32(out, first); writeBe32(out, per); writeBe32(out, 1)
    }
    box("stsc", out.toByteArray)
  }

  /** 32-bit chunk offsets — ABSOLUTE file offsets, per the spec. */
  private def stco(offsets: Seq[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(16 + offsets.size * 4)
    writeBe32(out, 0)
    writeBe32(out, offsets.size.toLong)
    offsets.foreach(writeBe32(out, _))
    box("stco", out.toByteArray)
  }

  /** Encode a two-track (video + audio) movie with real sample tables.
    * `keyEvery` spaces sync samples (1-based: 1, 1+keyEvery, ...).
    */
  def encodeMp4(movTimescale: Long, movDurationTs: Long,
                videoTimescale: Long, frameDelta: Long, nFrames: Long,
                width: Int, height: Int, keyEvery: Int,
                audioTimescale: Long, mdatPayload: Array[Byte]): Array[Byte] = {
    val ftyp = box("ftyp",
      "isom".getBytes(StandardCharsets.US_ASCII) ++
        Array[Byte](0, 0, 2, 0) ++
        "isommp42".getBytes(StandardCharsets.US_ASCII))
    val videoDuration = nFrames * frameDelta
    val syncs = (1L to nFrames by keyEvery.toLong).toSeq
    val stbl = container("stbl", stts(Seq((nFrames, frameDelta))), stss(syncs))
    val minf = container("minf", stbl)
    val trakV = container("trak",
      tkhd(1, movDurationTs, width, height),
      container("mdia", mdhd(videoTimescale, videoDuration),
        hdlr("vide", "VideoHandler"), minf))
    val audioDuration = movDurationTs * audioTimescale / movTimescale
    val trakA = container("trak",
      tkhd(2, movDurationTs, 0, 0),
      container("mdia", mdhd(audioTimescale, audioDuration),
        hdlr("soun", "SoundHandler")))
    // udta between the traks and a free box after moov: the walk must
    // skip ancillary boxes at both nesting levels, not assume layout.
    val udta = box("udta", box("name", "graft".getBytes(StandardCharsets.UTF_8)))
    val moov = container("moov", mvhd(movTimescale, movDurationTs), trakV, udta, trakA)
    val free = box("free", new Array[Byte](4))
    val mdat = box("mdat", mdatPayload)
    ftyp ++ moov ++ free ++ mdat
  }

  /** Encode a movie whose video track carries REAL addressable sample
    * payloads: full stts/stss/stsz/stsc/stco chain, mdat split into TWO
    * chunks (an 8-byte gap between them) so decoding must walk the
    * sample-to-chunk runs — a single-chunk assumption reads garbage past
    * the first chunk. stco offsets are ABSOLUTE file offsets, so the
    * encode is two-pass: build moov with placeholder offsets, measure,
    * rebuild (the offset fields are fixed-width, so moov's length is
    * invariant under the patch).
    */
  def encodeMp4Samples(movTimescale: Long, movDurationTs: Long,
                       videoTimescale: Long, frameDelta: Long,
                       width: Int, height: Int, keyEvery: Int,
                       audioTimescale: Long,
                       samples: IndexedSeq[Array[Byte]]): Array[Byte] = {
    val ftyp = box("ftyp",
      "isom".getBytes(StandardCharsets.US_ASCII) ++
        Array[Byte](0, 0, 2, 0) ++
        "isommp42".getBytes(StandardCharsets.US_ASCII))
    val nFrames = samples.length.toLong
    val videoDuration = nFrames * frameDelta
    val syncs = (1L to nFrames by keyEvery.toLong).toSeq
    val sizes = samples.map(_.length.toLong)
    val c1 = samples.length / 2 // chunk 1 sample count (chunk 2 = rest)
    val gap = 8

    def moovAt(off1: Long, off2: Long): Array[Byte] = {
      val stbl = container("stbl",
        stts(Seq((nFrames, frameDelta))), stss(syncs), stsz(sizes),
        stsc(Seq((1L, c1.toLong), (2L, (samples.length - c1).toLong))),
        stco(Seq(off1, off2)))
      val trakV = container("trak",
        tkhd(1, movDurationTs, width, height),
        container("mdia", mdhd(videoTimescale, videoDuration),
          hdlr("vide", "VideoHandler"), container("minf", stbl)))
      val audioDuration = movDurationTs * audioTimescale / movTimescale
      val trakA = container("trak",
        tkhd(2, movDurationTs, 0, 0),
        container("mdia", mdhd(audioTimescale, audioDuration),
          hdlr("soun", "SoundHandler")))
      val udta = box("udta", box("name", "graft".getBytes(StandardCharsets.UTF_8)))
      container("moov", mvhd(movTimescale, movDurationTs), trakV, udta, trakA)
    }

    val free = box("free", new Array[Byte](4))
    val moovLen = moovAt(0, 0).length // pass 1: measure
    val chunk1Len = sizes.take(c1).sum
    val off1 = ftyp.length + moovLen + free.length + 8L
    val off2 = off1 + chunk1Len + gap
    val moov = moovAt(off1, off2) // pass 2: real offsets
    val payload = new java.io.ByteArrayOutputStream()
    samples.take(c1).foreach(s => payload.write(s, 0, s.length))
    payload.write(new Array[Byte](gap), 0, gap)
    samples.drop(c1).foreach(s => payload.write(s, 0, s.length))
    ftyp ++ moov ++ free ++ box("mdat", payload.toByteArray)
  }

  // ---- decoder ----

  /** Children of a container: sequence of (fourcc, payloadStart, payloadEnd). */
  private def children(a: Array[Byte], start: Int, end: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var i = start
    while (i + 8 <= end) {
      val size = be32(a, i)
      if (size < 8 || i + size > end) return out.result() // malformed tail: stop
      out += ((tag(a, i + 4), i + 8, i + size.toInt))
      i += size.toInt
    }
    out.result()
  }

  private def find(a: Array[Byte], boxes: Seq[(String, Int, Int)],
                   fourcc: String): Option[(Int, Int)] =
    boxes.collectFirst { case (t, s, e) if t == fourcc => (s, e) }

  /** Full structural decode: top-level walk → moov → mvhd + every trak's
    * tkhd/mdia/mdhd/hdlr and (when present) minf/stbl/stts/stss. Returns
    * None on anything malformed or on unsupported version-1 (64-bit)
    * boxes.
    */
  def decodeMp4(bytes: Array[Byte]): Option[DecodedMp4] = {
    val top = children(bytes, 0, bytes.length)
    if (!top.exists(_._1 == "ftyp")) return None
    val (moovS, moovE) = find(bytes, top, "moov").getOrElse(return None)
    val moovKids = children(bytes, moovS, moovE)
    val (mvhdS, mvhdE) = find(bytes, moovKids, "mvhd").getOrElse(return None)
    if (mvhdE - mvhdS < 100 || u8(bytes(mvhdS)) != 0) return None // version 0 only
    val movTimescale = be32(bytes, mvhdS + 12)
    val movDuration = be32(bytes, mvhdS + 16)

    val tracks = moovKids.filter(_._1 == "trak").map { case (_, ts, te) =>
      val kids = children(bytes, ts, te)
      val (tkS, tkE) = find(bytes, kids, "tkhd").getOrElse(return None)
      if (tkE - tkS < 84 || u8(bytes(tkS)) != 0) return None
      val trackId = be32(bytes, tkS + 12)
      val width = (be32(bytes, tkS + 76) >> 16).toInt
      val height = (be32(bytes, tkS + 80) >> 16).toInt
      val (mdS, mdE) = find(bytes, kids, "mdia").getOrElse(return None)
      val mdiaKids = children(bytes, mdS, mdE)
      val (mhS, mhE) = find(bytes, mdiaKids, "mdhd").getOrElse(return None)
      if (mhE - mhS < 24 || u8(bytes(mhS)) != 0) return None
      val timescale = be32(bytes, mhS + 12)
      val duration = be32(bytes, mhS + 16)
      val (hdS, hdE) = find(bytes, mdiaKids, "hdlr").getOrElse(return None)
      if (hdE - hdS < 12) return None
      val handler = tag(bytes, hdS + 8)

      var sttsEntries = Array.empty[(Long, Long)]
      var syncs = Array.empty[Long]
      var sizes = Array.empty[Long]
      var stscRuns = Array.empty[(Long, Long)]
      var chunkOffs = Array.empty[Long]
      for ((mnS, mnE) <- find(bytes, mdiaKids, "minf");
           (sbS, sbE) <- find(bytes, children(bytes, mnS, mnE), "stbl")) {
        val stblKids = children(bytes, sbS, sbE)
        find(bytes, stblKids, "stts").foreach { case (s, e) =>
          if (e - s >= 8) {
            val n = be32(bytes, s + 4).toInt
            if (e - s >= 8 + 8 * n)
              sttsEntries = Array.tabulate(n)(k =>
                (be32(bytes, s + 8 + 8 * k), be32(bytes, s + 12 + 8 * k)))
          }
        }
        find(bytes, stblKids, "stss").foreach { case (s, e) =>
          if (e - s >= 8) {
            val n = be32(bytes, s + 4).toInt
            if (e - s >= 8 + 4 * n)
              syncs = Array.tabulate(n)(k => be32(bytes, s + 8 + 4 * k))
          }
        }
        find(bytes, stblKids, "stsz").foreach { case (s, e) =>
          if (e - s >= 12) {
            val uniform = be32(bytes, s + 4)
            val n = be32(bytes, s + 8).toInt
            if (uniform != 0) sizes = Array.fill(n)(uniform)
            else if (e - s >= 12 + 4 * n)
              sizes = Array.tabulate(n)(k => be32(bytes, s + 12 + 4 * k))
          }
        }
        find(bytes, stblKids, "stsc").foreach { case (s, e) =>
          if (e - s >= 8) {
            val n = be32(bytes, s + 4).toInt
            if (e - s >= 8 + 12 * n)
              stscRuns = Array.tabulate(n)(k =>
                (be32(bytes, s + 8 + 12 * k), be32(bytes, s + 12 + 12 * k)))
          }
        }
        find(bytes, stblKids, "stco").foreach { case (s, e) =>
          if (e - s >= 8) {
            val n = be32(bytes, s + 4).toInt
            if (e - s >= 8 + 4 * n)
              chunkOffs = Array.tabulate(n)(k => be32(bytes, s + 8 + 4 * k))
          }
        }
      }
      Track(trackId, handler, timescale, duration, width, height,
        sttsEntries, syncs, sizes, stscRuns, chunkOffs)
    }.toArray
    Some(DecodedMp4(movTimescale, movDuration, tracks))
  }

  /** Presentation timestamp (in track timescale units) of 1-based sample
    * `n`, by walking the stts run-length entries — generic over
    * multi-entry tables, not just constant-rate.
    */
  def ptsOfSample(sttsEntries: Array[(Long, Long)], n: Long): Long = {
    var remaining = n - 1
    var pts = 0L
    var k = 0
    while (k < sttsEntries.length && remaining > 0) {
      val (count, delta) = sttsEntries(k)
      val take = math.min(count, remaining)
      pts += take * delta
      remaining -= take
      k += 1
    }
    pts
  }

  def totalSamples(sttsEntries: Array[(Long, Long)]): Long =
    sttsEntries.foldLeft(0L) { case (acc, (c, _)) => acc + c }

  /** Absolute file byte range of 1-based sample `n`, by the REAL
    * stsc/stco/stsz walk: stsc runs give each chunk's sample count
    * (run r applies from first_chunk(r) until first_chunk(r+1)), stco
    * gives each chunk's absolute start, and the sample's in-chunk offset
    * is the sum of the sizes of the preceding samples of THAT chunk.
    * Generic over multi-run tables — no single-chunk assumption.
    * Returns None when n is out of range or the tables are inconsistent.
    */
  def sampleRange(track: Track, n: Long): Option[(Long, Int)] = {
    val sizes = track.sampleSizes
    val runs = track.stscEntries
    val offs = track.chunkOffsets
    if (n < 1 || n > sizes.length || runs.isEmpty || offs.isEmpty) return None
    var chunk = 1 // 1-based chunk index
    var run = 0
    var firstSampleOfChunk = 1L // 1-based
    while (chunk <= offs.length) {
      if (run + 1 < runs.length && runs(run + 1)._1 == chunk) run += 1
      val perChunk = runs(run)._2
      if (n < firstSampleOfChunk + perChunk) {
        var off = offs(chunk - 1)
        var s = firstSampleOfChunk
        while (s < n) { off += sizes((s - 1).toInt); s += 1 }
        return Some((off, sizes((n - 1).toInt).toInt))
      }
      firstSampleOfChunk += perChunk
      chunk += 1
    }
    None
  }

  /** The payload bytes of 1-based sample `n`, sliced from the file via
    * [[sampleRange]] — the frame-extraction primitive of a video
    * pipeline (in production these bytes feed the essence decoder).
    */
  def extractSample(bytes: Array[Byte], track: Track, n: Long): Option[Array[Byte]] =
    sampleRange(track, n).flatMap { case (off, len) =>
      if (off < 0 || off + len > bytes.length) None
      else Some(java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + len))
    }
}
