package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Queries.Q
import graft.multimodal.Mp4Codec

/** Video tier over REAL ISO-BMFF box parsing — third leg of the
  * multimodal triad (image pixels / audio samples / video containers):
  * every document plants a spec-valid two-track MP4 whose box contents
  * are a closed-form function of doc_id, and the engine recovers movie
  * metadata and keyframe timestamps by actually walking the nested box
  * tree — size-prefixed boxes, container recursion, version/flags
  * headers, 16.16 fixed-point track dimensions, stts run-length
  * expansion, stss sync-sample tables.
  *
  * The oracle never touches MP4 bytes: it recomputes the planted
  * parameters arithmetically from `documents.doc_id`, so any defect in
  * the box walk (ancillary udta/free skipping at either nesting level,
  * tkhd/mdhd field offsets, fixed-point shift, sample-table math) lands
  * hash-red.
  *
  * Scale shape: parsing is one map-side pass (bytes → metadata rows, no
  * shuffle); keyframe extraction fans out ≤ 70 rows per doc — bounded
  * fan-out, no join. At 100 TB both stay embarrassingly parallel.
  */
object VideoQueries {

  private val MovTimescale = 1000L
  private val VideoTimescale = 90000L
  private val FrameDelta = 3600L // 25 fps at 90 kHz
  private val KeyEvery = 25
  private val AudioTimescale = 16000L

  private def nFrames(docId: Long): Long = 750 + docId % 1000

  /** One real MP4 per document; mdat payload is deterministic filler. */
  private[graft] def plantedMp4(docId: Long): Array[Byte] = {
    val nf = nFrames(docId)
    val w = (256 + (docId % 4) * 128).toInt
    val h = (144 + (docId % 4) * 72).toInt
    val payload = Array.tabulate[Byte](16)(i => ((docId + i) % 251).toByte)
    Mp4Codec.encodeMp4(MovTimescale, nf * 40, VideoTimescale, FrameDelta,
      nf, w, h, KeyEvery, AudioTimescale, payload)
  }

  /** doc_id → decoded movie + video-track metadata via the REAL box walk.
    * Map-side only: encode is the fixture, decode onward is the
    * production kernel.
    */
  private def videoMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val mp4 = plantedMp4(id)
          val d = Mp4Codec.decodeMp4(mp4).getOrElse(
            throw new IllegalStateException(s"undecodable planted MP4 for doc $id"))
          val v = d.tracks.find(_.handler == "vide").getOrElse(
            throw new IllegalStateException(s"no video track in doc $id"))
          (id, d.movDuration * 1000L / d.movTimescale, d.tracks.length.toLong,
            v.width.toLong, v.height.toLong, v.timescale,
            Mp4Codec.totalSamples(v.sttsEntries), v.syncSamples.length.toLong)
        }
      }
      .toDF("doc_id", "duration_ms", "n_tracks", "video_w", "video_h",
        "video_timescale", "n_frames", "n_keyframes")
  }

  /** Movie + video-track metadata through the full real parse chain. */
  val videoMetaQ = Q("q_video_meta",
    (s, dir) => videoMeta(s, dir),
    Some("""SELECT doc_id,
           |  CAST((750 + doc_id % 1000) * 40 AS BIGINT) AS duration_ms,
           |  CAST(2 AS BIGINT) AS n_tracks,
           |  CAST(256 + (doc_id % 4) * 128 AS BIGINT) AS video_w,
           |  CAST(144 + (doc_id % 4) * 72 AS BIGINT) AS video_h,
           |  CAST(90000 AS BIGINT) AS video_timescale,
           |  CAST(750 + doc_id % 1000 AS BIGINT) AS n_frames,
           |  CAST((750 + doc_id % 1000 + 24) // 25 AS BIGINT) AS n_keyframes
           |FROM documents""".stripMargin))

  /** Keyframe sample numbers + presentation timestamps: stss entries
    * through generic stts run-length pts reconstruction — the
    * frame-sampling primitive of a video curation pipeline (sample the
    * keyframes, ship them to the image tier).
    */
  val videoKeyframes = Q("q_video_keyframes",
    (s, dir) => {
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.flatMap { id =>
            val d = Mp4Codec.decodeMp4(plantedMp4(id)).get
            val v = d.tracks.find(_.handler == "vide").get
            v.syncSamples.iterator.map { sn =>
              val pts = Mp4Codec.ptsOfSample(v.sttsEntries, sn)
              (id, sn, pts * 1000L / v.timescale)
            }
          }
        }
        .toDF("doc_id", "sample_number", "pts_ms")
    },
    Some("""WITH n AS (SELECT doc_id, 750 + doc_id % 1000 AS nf FROM documents)
           |SELECT doc_id,
           |  CAST(1 + 25 * k AS BIGINT) AS sample_number,
           |  CAST(1000 * k AS BIGINT) AS pts_ms
           |FROM n, (SELECT unnest(generate_series(0, 69)) AS k)
           |WHERE 1 + 25 * k <= nf""".stripMargin))

  def all: Seq[Q] = Seq(videoMetaQ, videoKeyframes)
}
