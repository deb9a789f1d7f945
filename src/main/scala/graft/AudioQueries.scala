package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Queries.Q
import graft.multimodal.WavCodec

/** Audio tier over REAL sample-level WAV decode — the time-domain twin of
  * ImageQueries: every document plants a spec-valid RIFF/PCM file whose
  * SAMPLES are a closed-form function of doc_id, and the engine recovers
  * metadata, frame features, and a chromaprint-style fingerprint by
  * actually decoding — chunk walk → fmt parse → PCM-16 LE samples →
  * frame energies → sign-of-delta 64-bit banded fingerprint.
  *
  * The oracle never touches WAV bytes: it recomputes the planted frame
  * parameters and the feature arithmetic from `documents.doc_id` alone,
  * so any defect in the codec chain (chunk alignment, LIST skipping,
  * little-endian sample read, signed-16 reconstruction, frame energy,
  * ZCR segmentation, bit packing) lands hash-red.
  *
  * Planted structure per doc: 65 frames × 256 samples of a ±amp square
  * wave, amp and half-period closed-form in (doc_id/4, frame) — so
  *  - RMS is exact integer arithmetic until one final IEEE sqrt,
  *  - per-frame ZCR is floor(255/p),
  *  - frame energy is 256·amp² exactly (Long).
  * Docs in the same doc_id/4 group share all frame params; member j = 3
  * perturbs ONE frame's amplitude (≤ 2 fingerprint bits flip), so every
  * group is a 4-clique of near-duplicates at hamming ≤ 3 — fixed group
  * size regardless of corpus size, caught by a pigeonhole-complete
  * equi-join on 16-bit bands (4 bands cover hamming ≤ 3), never
  * all-pairs. Same banding scale story as the image and SimHash tiers:
  * at 100 TB the fingerprint pass is map-side (decode + hash per blob,
  * no shuffle) and the band join shuffles buckets of expected occupancy
  * corpus/65536 per band.
  */
object AudioQueries {

  private val Frames = 65
  private val FrameLen = 256
  private val SampleRate = 16000
  private val NumSamples = Frames * FrameLen // 16640 → duration 1040 ms

  /** Closed-form planted frame parameters; MUST stay in lockstep with
    * the SQL in the oracles below.
    *
    * The `(g * (f + 7)) % 977` mixing term decorrelates the amplitude
    * PATTERN across groups. Without it, amp(f+1) − amp(f) = 66 + 26·f is
    * independent of g except at mod-3000 wraps, so all groups share
    * nearly the same energy-delta fingerprint and groups with nearby
    * wrap phases land within hamming ≤ 3 — at sf1 (12.5k groups) that
    * made the near-dup graph dense enough to OOM connected components.
    * With the term each group's bits are pseudo-independent, cross-group
    * collisions are chance-level (~C(64,≤3)/2^16 per band pair), and the
    * planted groups stay exact 4-cliques at any corpus size.
    */
  private[graft] def frameParams(docId: Long, f: Int): (Int, Int) = {
    val g = docId / 4
    val base = ((g * 97 + f * 53 + f * f * 13 + ((g * (f + 7)) % 977) * 31) % 3000).toInt
    val amp = base + (if (docId % 4 == 3 && f == 10) 600 else 100)
    val p = (1 + (g * 31 + f * 7) % 8).toInt
    (amp, p)
  }

  /** The planted per-document sample stream (per-frame ±amp square wave
    * with half-period p samples) — shared by every container layout.
    */
  private[graft] def plantedSamples(docId: Long): Array[Short] = {
    val samples = new Array[Short](NumSamples)
    var f = 0
    while (f < Frames) {
      val (amp, p) = frameParams(docId, f)
      var i = 0
      while (i < FrameLen) {
        val sign = if ((i / p) % 2 == 0) 1 else -1
        samples(f * FrameLen + i) = (amp * sign).toShort
        i += 1
      }
      f += 1
    }
    samples
  }

  /** One real WAV per document: PCM-16 mono at 16 kHz. */
  private[graft] def plantedWav(docId: Long): Array[Byte] =
    WavCodec.encodeWav(SampleRate, 1, plantedSamples(docId))

  /** The SAME planted content in a layout chosen by doc_id % 3:
    * 0 → stereo 16-bit (L = R), 1 → mono 24-bit (low byte zero),
    * 2 → mono 16-bit — the crawled-audio format spread with a
    * closed-form decode.
    */
  private[graft] def plantedWavMixedFormat(docId: Long): Array[Byte] = {
    val mono = plantedSamples(docId)
    (docId % 3) match {
      case 0 =>
        val st = new Array[Int](mono.length * 2)
        var i = 0
        while (i < mono.length) {
          st(2 * i) = mono(i).toInt; st(2 * i + 1) = mono(i).toInt; i += 1
        }
        WavCodec.encodeWavPcm(SampleRate, 2, 16, st)
      case 1 =>
        val s24 = new Array[Int](mono.length)
        var i = 0
        while (i < mono.length) { s24(i) = mono(i).toInt << 8; i += 1 }
        WavCodec.encodeWavPcm(SampleRate, 1, 24, s24)
      case _ =>
        WavCodec.encodeWav(SampleRate, 1, mono)
    }
  }

  /** doc_id → decoded metadata + features + fingerprint bands via the
    * REAL codec chain. Map-side only: encode is the fixture, decode
    * onward is the production kernel. Memoized per (session, dir) with a
    * localCheckpoint — the four audio queries and the curation capstone
    * are stages over ONE decoded corpus, so the WAV encode+decode pass
    * runs once, exactly as a production pipeline would persist its
    * feature table (same pattern as the shingle/BFR artifacts).
    */
  private val featCache =
    new scala.collection.concurrent.TrieMap[(String, String), DataFrame]()

  private def audioFeatures(s: SparkSession, dir: String): DataFrame =
    featCache.getOrElseUpdate((s.sparkContext.applicationId, dir),
      audioFeaturesUncached(s, dir).localCheckpoint(true))

  /** Named thunks for Bench's separately-timed warmup pass (see
    * [[TextQueries.sharedArtifactWarmers]]).
    */
  private[graft] def sharedArtifactWarmers
      : Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "audio_features" ->
      ((s: SparkSession, d: String) => { audioFeatures(s, d); () }))

  private def audioFeaturesUncached(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Queries.fanOut(s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")), "doc_id").as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val wav = plantedWav(id)
          val d = WavCodec.decodeWav(wav).getOrElse(
            throw new IllegalStateException(s"undecodable planted WAV for doc $id"))
          val ff = WavCodec.frameFeatures(d.samples, FrameLen)
          val bands = WavCodec.energyFingerprint(ff.energies)
          val rmsMilli =
            math.floor(math.sqrt(ff.sumSq.toDouble / d.samples.length) * 1000.0).toLong
          (id, d.sampleRate.toLong, d.channels.toLong, d.samples.length.toLong,
            d.samples.length.toLong * 1000L / d.sampleRate,
            rmsMilli, ff.peak.toLong, ff.zcr,
            bands(0), bands(1), bands(2), bands(3))
        }
      }
      .toDF("doc_id", "sample_rate", "channels", "n_samples", "duration_ms",
        "rms_milli", "peak", "zcr", "b0", "b1", "b2", "b3")
  }

  /** The oracle's closed-form twin of the planted frame grid: one row per
    * (doc_id, f) with amp, half-period and exact frame energy. Shared by
    * all audio oracles.
    */
  private val framesSql: String =
    """frames AS (
      |  SELECT doc_id, f,
      |    ((doc_id // 4) * 97 + f * 53 + f * f * 13
      |      + (((doc_id // 4) * (f + 7)) % 977) * 31) % 3000
      |      + CASE WHEN doc_id % 4 = 3 AND f = 10 THEN 600 ELSE 100 END AS amp,
      |    1 + ((doc_id // 4) * 31 + f * 7) % 8 AS p
      |  FROM documents,
      |    (SELECT unnest(generate_series(0, 64)) AS f)),
      |energies AS (
      |  SELECT doc_id, f, amp, p, 256 * amp * amp AS e FROM frames)""".stripMargin

  private val bandsSql: String =
    """bits AS (
      |  SELECT a.doc_id, a.f // 16 AS band, a.f % 16 AS idx
      |  FROM energies a JOIN energies b
      |    ON a.doc_id = b.doc_id AND b.f = a.f + 1
      |  WHERE a.f < 64 AND a.e < b.e),
      |bands AS MATERIALIZED (
      |  SELECT d.doc_id,
      |    CAST(coalesce(sum(CASE WHEN band = 0 THEN 1 << idx END), 0) AS BIGINT) AS b0,
      |    CAST(coalesce(sum(CASE WHEN band = 1 THEN 1 << idx END), 0) AS BIGINT) AS b1,
      |    CAST(coalesce(sum(CASE WHEN band = 2 THEN 1 << idx END), 0) AS BIGINT) AS b2,
      |    CAST(coalesce(sum(CASE WHEN band = 3 THEN 1 << idx END), 0) AS BIGINT) AS b3
      |  FROM (SELECT DISTINCT doc_id FROM documents) d
      |  LEFT JOIN bits USING (doc_id) GROUP BY d.doc_id)""".stripMargin

  /** Container metadata through the full real decode chain. */
  val audioMeta = Q("q_audio_meta",
    (s, dir) => audioFeatures(s, dir)
      .select("doc_id", "sample_rate", "channels", "n_samples", "duration_ms"),
    Some("""SELECT doc_id,
           |  CAST(16000 AS BIGINT) AS sample_rate,
           |  CAST(1 AS BIGINT) AS channels,
           |  CAST(16640 AS BIGINT) AS n_samples,
           |  CAST(1040 AS BIGINT) AS duration_ms
           |FROM documents""".stripMargin))

  /** Frame-analysis features (RMS, peak, ZCR) from decoded samples. */
  val audioFeaturesQ = Q("q_audio_features",
    (s, dir) => audioFeatures(s, dir)
      .select("doc_id", "rms_milli", "peak", "zcr"),
    Some(s"""WITH $framesSql
            |SELECT doc_id,
            |  CAST(floor(sqrt(CAST(sum(e) AS DOUBLE) / 16640.0) * 1000.0) AS BIGINT)
            |    AS rms_milli,
            |  CAST(max(amp) AS BIGINT) AS peak,
            |  CAST(sum((256 - 1) // p) AS BIGINT) AS zcr
            |FROM energies GROUP BY doc_id""".stripMargin))

  /** Chromaprint-style energy-delta fingerprint, four 16-bit bands. */
  val audioFingerprint = Q("q_audio_fingerprint",
    (s, dir) => audioFeatures(s, dir).select("doc_id", "b0", "b1", "b2", "b3"),
    Some(s"""WITH $framesSql,
            |$bandsSql
            |SELECT doc_id, b0, b1, b2, b3 FROM bands""".stripMargin))

  /** Banded audio near-dup: equal-16-bit-band candidates → exact hamming
    * ≤ 3 verify (pigeonhole-complete). Never all-pairs.
    */
  val audioNearDup = Q("q_audio_near_dup",
    (s, dir) => {
      val f = audioFeatures(s, dir).select("doc_id", "b0", "b1", "b2", "b3")
      // single melt pass — see TextOps.meltBands
      val bands = graft.functions.TextOps.meltBands(f, "doc_id",
        (0 to 3).map(b => col(s"b$b")))
      // skew-guarded candidate generation in SALTED-COMPLETE mode:
      // the 16-bit band space saturates combinatorially as the corpus
      // grows (bucket-mates are then not near-dup families), so hot
      // buckets keep the COMPLETE pair relation via the block-grid
      // salted self-join — bounded per-task output, exact at every SF
      val cand = graft.functions.TextOps.candidatePairs(bands, "doc_id",
          hotComplete = true)
        .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"))
      val fa = f.select(col("doc_id").as("id_a"), col("b0").as("a0"),
        col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
      val fb = f.select(col("doc_id").as("id_b"), col("b0").as("c0"),
        col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
      cand.join(fa, "id_a").join(fb, "id_b")
        .select(col("id_a"), col("id_b"),
          (bit_count(expr("a0 ^ c0")) + bit_count(expr("a1 ^ c1")) +
            bit_count(expr("a2 ^ c2")) + bit_count(expr("a3 ^ c3")))
            .cast("long").as("hamming"))
        .filter(col("hamming") <= 3)
    },
    Some(s"""WITH $framesSql,
            |$bandsSql,
            |melted AS (
            |  SELECT doc_id, 0 AS band, b0 AS bv FROM bands
            |  UNION ALL SELECT doc_id, 1, b1 FROM bands
            |  UNION ALL SELECT doc_id, 2, b2 FROM bands
            |  UNION ALL SELECT doc_id, 3, b3 FROM bands),
            |cand AS (
            |  SELECT x.doc_id AS id_a, y.doc_id AS id_b
            |  FROM melted x JOIN melted y
            |    ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id)
            |-- verify BEFORE deduplicating: the DISTINCT hash table holds only
            |-- hamming<=3 survivors (~1e7 at 500k docs), never the ~1e9-row
            |-- raw candidate stream, which stays pipelined (sf10 OOM lesson)
            |SELECT DISTINCT id_a, id_b,
            |  CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
            |     + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS BIGINT)
            |    AS hamming
            |FROM cand JOIN bands a ON cand.id_a = a.doc_id
            |          JOIN bands b ON cand.id_b = b.doc_id
            |WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
            |    + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3"""
      .stripMargin))

  /** Audio dedup GROUPS: connected components over the verified banded
    * near-dup pairs — completes the per-modality near-dup → canonical-
    * group loop (text, embeddings, images, audio all share the same
    * HASH-to-MIN operator); oracle = the shared [[OracleCc]] pointer-
    * jump contraction over the same candidate/hamming CTE chain (the
    * recursive-closure form died on DuckDB resources at sf10 — the
    * exact failure mode the text tier's grouping oracles shed in r11).
    */
  val audioDedupGroups = Q("q_audio_dedup_groups",
    (s, dir) => graft.operators.ConnectedComponents
      .canonicalize(audioNearDup.fn(s, dir)
        .select(col("id_a").as("ida"), col("id_b").as("idb"))),
    Some(s"""WITH $framesSql,
            |$bandsSql,
            |melted AS (
            |  SELECT doc_id, 0 AS band, b0 AS bv FROM bands
            |  UNION ALL SELECT doc_id, 1, b1 FROM bands
            |  UNION ALL SELECT doc_id, 2, b2 FROM bands
            |  UNION ALL SELECT doc_id, 3, b3 FROM bands),
            |cand AS (
            |  SELECT x.doc_id AS id_a, y.doc_id AS id_b
            |  FROM melted x JOIN melted y
            |    ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id),
            |vp AS MATERIALIZED (
            |  -- verify BEFORE deduplicating (sf10 OOM lesson): only survivors
            |  -- enter the DISTINCT; the raw candidate stream stays pipelined.
            |  -- MATERIALIZED because the CC chain references the pair set
            |  -- twice (symmetrizing UNION) — a plain CTE would re-run the
            |  -- ~1e9-row candidate pipeline once per reference, concurrently
            |  SELECT DISTINCT id_a, id_b
            |  FROM cand JOIN bands a ON cand.id_a = a.doc_id
            |            JOIN bands b ON cand.id_b = b.doc_id
            |  WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
            |      + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3),
            |pairs AS (SELECT id_a AS doc_a, id_b AS doc_b FROM vp),
            |${OracleCc.canonFromPairs(OracleCc.TextRounds)}
            |SELECT doc_id, canonical_id FROM canon""".stripMargin),
    // Scaled-gate twin: consume the just-verified q_audio_near_dup dump
    // (survivor pairs) instead of re-deriving the band self-join — the
    // base oracle passed at sf10 only running SOLO at the 44.7 GiB cap
    // (r13 retry3); composed over the verified dump it fits the shared
    // batch with real headroom.
    scaleOracle = Some(
      s"""WITH pairs AS (
         |  SELECT id_a AS doc_a, id_b AS doc_b FROM dump_q_audio_near_dup),
         |${OracleCc.canonFromPairs(OracleCc.TextRounds)}
         |SELECT doc_id, canonical_id FROM canon""".stripMargin))

  /** Cross-modal curation capstone: the keep mask a multimodal corpus
    * pipeline applies before packing — a document survives iff it is not
    * the LATER member of any image near-dup pair, not the later member of
    * any audio near-dup pair, and passes the cheap text gate (≥ 5
    * tokens). Composes the independently-oracle-checked image and audio
    * near-dup fragments (both banded, never all-pairs) with two
    * existence joins; the oracle nests each modality's CTE chain in a
    * derived table so their internal names can't collide.
    */
  val multimodalCuration = Q("q_multimodal_curation",
    (s, dir) => {
      val imgDup = ImageQueries.imageNearDup.fn(s, dir)
        .select(col("id_b").as("doc_id")).distinct()
        .withColumn("img_dup", lit(1L))
      val audDup = audioNearDup.fn(s, dir)
        .select(col("id_b").as("doc_id")).distinct()
        .withColumn("audio_dup", lit(1L))
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
        .join(imgDup, Seq("doc_id"), "left")
        .join(audDup, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("img_dup"), lit(0L)).as("img_dup"),
          coalesce(col("audio_dup"), lit(0L)).as("audio_dup"),
          col("n_tokens"),
          when(coalesce(col("img_dup"), lit(0L)) === 0 &&
            coalesce(col("audio_dup"), lit(0L)) === 0 &&
            col("n_tokens") >= 5, lit(1L)).otherwise(lit(0L)).as("kept"))
    },
    Some(s"""WITH ipairs AS MATERIALIZED (
            |  SELECT id_b FROM (
            |    WITH ${ImageQueries.lumaCellsSql},
            |    melted AS (
            |      SELECT doc_id, 0 AS band, b0 AS bv FROM bands
            |      UNION ALL SELECT doc_id, 1, b1 FROM bands
            |      UNION ALL SELECT doc_id, 2, b2 FROM bands
            |      UNION ALL SELECT doc_id, 3, b3 FROM bands),
            |    cand AS (
            |      -- no pair-level DISTINCT: the final DISTINCT id_b dedups
            |      -- after the hamming filter, so the raw candidate stream
            |      -- stays pipelined (sf10 OOM lesson)
            |      SELECT x.doc_id AS id_a, y.doc_id AS id_b
            |      FROM melted x JOIN melted y
            |        ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id)
            |    SELECT DISTINCT cand.id_b
            |    FROM cand JOIN bands a ON cand.id_a = a.doc_id
            |              JOIN bands b ON cand.id_b = b.doc_id
            |    WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
            |        + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3) t),
            |apairs AS MATERIALIZED (
            |  SELECT id_b FROM (
            |    WITH $framesSql,
            |    $bandsSql,
            |    melted AS (
            |      SELECT doc_id, 0 AS band, b0 AS bv FROM bands
            |      UNION ALL SELECT doc_id, 1, b1 FROM bands
            |      UNION ALL SELECT doc_id, 2, b2 FROM bands
            |      UNION ALL SELECT doc_id, 3, b3 FROM bands),
            |    cand AS (
            |      -- no pair-level DISTINCT: the final DISTINCT id_b dedups
            |      -- after the hamming filter, so the raw candidate stream
            |      -- stays pipelined (sf10 OOM lesson)
            |      SELECT x.doc_id AS id_a, y.doc_id AS id_b
            |      FROM melted x JOIN melted y
            |        ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id)
            |    SELECT DISTINCT cand.id_b
            |    FROM cand JOIN bands a ON cand.id_a = a.doc_id
            |              JOIN bands b ON cand.id_b = b.doc_id
            |    WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
            |        + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3) t),
            |tok AS (
            |  SELECT doc_id,
            |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
            |      AS n_tokens
            |  FROM documents)
            |SELECT d.doc_id,
            |  CAST(CASE WHEN i.id_b IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
            |    AS img_dup,
            |  CAST(CASE WHEN a.id_b IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
            |    AS audio_dup,
            |  t.n_tokens,
            |  CAST(CASE WHEN i.id_b IS NULL AND a.id_b IS NULL
            |        AND t.n_tokens >= 5 THEN 1 ELSE 0 END AS BIGINT) AS kept
            |FROM documents d
            |JOIN tok t ON t.doc_id = d.doc_id
            |LEFT JOIN ipairs i ON i.id_b = d.doc_id
            |LEFT JOIN apairs a ON a.id_b = d.doc_id""".stripMargin),
    // Scaled-gate twin: both modalities' dup sets come from the
    // just-verified near-dup pair dumps — the base oracle re-derives
    // BOTH band self-joins inside one SQL and passed at sf10 only solo
    // at the 44.7 GiB cap (r13 retry3).
    scaleOracle = Some(
      """WITH ipairs AS (
        |  SELECT DISTINCT id_b FROM dump_q_image_near_dup),
        |apairs AS (
        |  SELECT DISTINCT id_b FROM dump_q_audio_near_dup),
        |tok AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents)
        |SELECT d.doc_id,
        |  CAST(CASE WHEN i.id_b IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
        |    AS img_dup,
        |  CAST(CASE WHEN a.id_b IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
        |    AS audio_dup,
        |  t.n_tokens,
        |  CAST(CASE WHEN i.id_b IS NULL AND a.id_b IS NULL
        |        AND t.n_tokens >= 5 THEN 1 ELSE 0 END AS BIGINT) AS kept
        |FROM documents d
        |JOIN tok t ON t.doc_id = d.doc_id
        |LEFT JOIN ipairs i ON i.id_b = d.doc_id
        |LEFT JOIN apairs a ON a.id_b = d.doc_id""".stripMargin))

  /** Cross-format PCM normalization: the same content through three
    * container layouts (stereo-16 with L = R, mono-24 with zero low
    * bytes, mono-16) must normalize to IDENTICAL frame features after
    * decode + downmix + depth reduction — the audio sibling of
    * q_cross_codec_dups. channels/bits report the container census
    * (what a crawl pipeline routes on); the feature columns are the
    * mono-16 closed forms, proving the normalization is lossless on
    * content the layouts can all carry.
    */
  val audioFormats = Q("q_audio_formats",
    (s, dir) => {
      import s.implicits._
      Queries.fanOut(s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id")), "doc_id").as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val wav = plantedWavMixedFormat(id)
            val d = WavCodec.decodeWav(wav).getOrElse(
              throw new IllegalStateException(s"undecodable planted WAV for doc $id"))
            val mono = WavCodec.downmixMono(d)
            val ff = WavCodec.frameFeatures(mono, FrameLen)
            val rmsMilli =
              math.floor(math.sqrt(ff.sumSq.toDouble / mono.length) * 1000.0).toLong
            (id, d.channels.toLong, d.bits.toLong, mono.length.toLong,
              rmsMilli, ff.peak.toLong, ff.zcr)
          }
        }
        .toDF("doc_id", "channels", "bits", "n_frames_mono",
          "rms_milli", "peak", "zcr")
    },
    Some(s"""WITH $framesSql
            |SELECT doc_id,
            |  CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS BIGINT) AS channels,
            |  CAST(CASE WHEN doc_id % 3 = 1 THEN 24 ELSE 16 END AS BIGINT) AS bits,
            |  CAST(16640 AS BIGINT) AS n_frames_mono,
            |  CAST(floor(sqrt(CAST(sum(e) AS DOUBLE) / 16640.0) * 1000.0) AS BIGINT)
            |    AS rms_milli,
            |  CAST(max(amp) AS BIGINT) AS peak,
            |  CAST(sum((256 - 1) // p) AS BIGINT) AS zcr
            |FROM energies GROUP BY doc_id""".stripMargin))

  def all: Seq[Q] = Seq(audioMeta, audioFeaturesQ, audioFingerprint,
    audioNearDup, audioDedupGroups, multimodalCuration, audioFormats)
}
