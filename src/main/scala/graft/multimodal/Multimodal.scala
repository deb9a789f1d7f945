package graft.multimodal

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video
  * travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract / resize / frame-sample run as per-partition batch
  * functions (the Scala analog of `mapInPandas`: one iterator per
  * partition, vectorizable batch shape, no per-row driver round-trips).
  *
  * The actual codec step is STUBBED — media libraries are not in this
  * container — behind [[StubCodec]], a clearly-marked deterministic fake
  * keyed on the content hash. The Spark-side plumbing (schema, binary
  * encoding, partitioning, batch iteration) is real and tested; swapping
  * in a real decoder replaces only the StubCodec internals.
  */
object Multimodal {

  /** One media object: opaque bytes + typed metadata. */
  final case class MediaRow(
      id: Long,
      modality: String,            // "image" | "audio" | "video"
      content: Array[Byte],
      meta: Map[String, String])

  final case class ImageFeatures(
      id: Long,
      width: Int,
      height: Int,
      channels: Int,
      n_bytes: Long,
      brightness: Double)          // fake feature from the stub decode

  final case class Frame(id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** STUB CODEC — deterministic fake decoder. Real image/audio libs are
    * environment-bound; every value here derives only from the content
    * hash so results are reproducible and oracle-friendly.
    */
  object StubCodec {
    private def digest(bytes: Array[Byte]): Array[Byte] =
      MessageDigest.getInstance("MD5").digest(bytes)

    /** Fake image decode → (width, height, channels). */
    def decodeImage(bytes: Array[Byte]): (Int, Int, Int) = {
      val h = digest(bytes)
      val w = (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % 1920
      val ht = (((h(2) & 0xff) << 8) | (h(3) & 0xff)) % 1080
      (w, ht, 3)
    }

    /** Fake brightness feature in [0, 1). */
    def brightness(bytes: Array[Byte]): Double =
      ((digest(bytes)(4) & 0xff).toDouble) / 256.0

    /** Fake resize: deterministic re-hash standing in for pixel work. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      digest(bytes ++ s"${w}x$h".getBytes(StandardCharsets.UTF_8))

    /** Fake video frame extraction: fixed-stride byte windows. */
    def sampleFrames(bytes: Array[Byte], everyN: Int): Seq[Array[Byte]] =
      bytes.grouped(math.max(1, everyN)).toSeq
  }

  /** Testdata adapter: treat document text bytes as opaque image blobs so
    * the binary plumbing runs against real parquet input.
    */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id").as("id"),
        lit("image").as("modality"),
        col("text").cast("binary").as("content"),
        map(lit("source"), col("source"), lit("lang"), col("lang")).as("meta"))
      .as[MediaRow]
  }

  /** Batched decode + feature extraction: one partition = one batch, the
    * decoder is invoked inside the executor iterator (mapInPandas shape).
    */
  def extractImageFeatures(ds: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { batch =>
      batch.map { row =>
        val (w, h, c) = StubCodec.decodeImage(row.content)
        ImageFeatures(row.id, w, h, c, row.content.length.toLong,
          StubCodec.brightness(row.content))
      }
    }
  }

  /** Batched resize: binary-in binary-out transform, same plumbing. */
  def resizeImages(ds: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(r =>
      r.copy(content = StubCodec.resize(r.content, w, h),
        meta = r.meta + ("resized" -> s"${w}x$h"))))
  }

  /** Frame sampling: one video row explodes to its sampled frames. */
  def sampleFrames(ds: Dataset[MediaRow], everyN: Int): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap { r =>
      StubCodec.sampleFrames(r.content, everyN).zipWithIndex.map {
        case (f, i) => Frame(r.id, i, f)
      }
    })
  }
}
