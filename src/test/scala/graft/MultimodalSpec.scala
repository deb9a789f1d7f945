package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{HeaderCodec, StubCodec}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  val sfDir = "/root/testdata/sf0.001"

  test("binary plumbing: documents -> media rows with opaque bytes + metadata") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val rows = media.limit(3).collect()
    assert(rows.forall(_.modality == "image"))
    assert(rows.forall(_.content.nonEmpty))
    assert(rows.forall(r => r.meta.contains("source") && r.meta.contains("lang")))
    assert(media.count() == 500)
  }

  test("batched stub decode is deterministic and preserves ids") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir).repartition(8)
    val f1 = Multimodal.extractImageFeatures(media).collect().sortBy(_.id)
    val f2 = Multimodal.extractImageFeatures(media).collect().sortBy(_.id)
    assert(f1.length == 500)
    assert(f1.map(_.id).toSeq == f2.map(_.id).toSeq)
    assert(f1.map(_.brightness).toSeq == f2.map(_.brightness).toSeq)
    assert(f1.forall(f => f.width >= 0 && f.width < 1920 && f.height < 1080 && f.channels == 3))
    assert(f1.forall(f => f.brightness >= 0.0 && f.brightness < 1.0))
  }

  test("resize rewrites content and stamps metadata") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir).limit(10)
    val resized = Multimodal.resizeImages(media, 224, 224).collect()
    assert(resized.forall(_.meta("resized") == "224x224"))
    val orig = media.collect().map(r => r.id -> r.content.toSeq).toMap
    assert(resized.forall(r => r.content.toSeq != orig(r.id)))
  }

  test("frame sampling explodes one row per frame with stable indices") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir).limit(5)
    val frames = Multimodal.sampleFrames(media, everyN = 32).collect()
    val byId = frames.groupBy(_.id)
    media.collect().foreach { r =>
      val expected = (r.content.length + 31) / 32
      assert(byId(r.id).length == expected)
      assert(byId(r.id).map(_.frame_idx).sorted.toSeq == (0 until expected))
    }
  }

  test("stub codec: same bytes same answer, different bytes different hash") {
    val a = "hello world".getBytes
    assert(StubCodec.decodeImage(a) == StubCodec.decodeImage(a.clone()))
    assert(!StubCodec.resize(a, 10, 10).sameElements(StubCodec.resize(a, 20, 20)))
  }

  test("header codec parses a real PNG IHDR (round-trip through pngWrap)") {
    val png = Multimodal.pngWrap(640, 480, "payload".getBytes)
    assert(HeaderCodec.decodeImage(png).contains((640, 480, 3)))
    // big dims exercise all four IHDR bytes
    assert(HeaderCodec.decodeImage(Multimodal.pngWrap(70000, 1, Array[Byte]()))
      .contains((70000, 1, 3)))
    // a corrupted signature must NOT parse
    val bad = png.clone(); bad(0) = 0x00
    assert(HeaderCodec.decodePng(bad).isEmpty)
  }

  test("header codec parses real JPEG SOF and GIF logical-screen bytes") {
    // minimal JFIF: SOI, APP0 (16 bytes), SOF0 with h=333 w=257 3 comps
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val jpeg = b(0xff, 0xd8) ++
      b(0xff, 0xe0, 0x00, 0x10) ++ Array.fill[Byte](14)(0) ++ // APP0 len 16
      b(0xff, 0xc0, 0x00, 0x11, 8, 0x01, 0x4d, 0x01, 0x01, 3) ++
      Array.fill[Byte](9)(0)
    assert(HeaderCodec.decodeJpeg(jpeg).contains((257, 333, 3)))
    // progressive JPEG: SOF2 marker, same layout
    val prog = jpeg.clone(); prog(21) = 0xc2.toByte
    assert(HeaderCodec.decodeJpeg(prog).contains((257, 333, 3)))
    // DHT (0xc4) must be skipped, not parsed as a frame header
    val withDht = b(0xff, 0xd8, 0xff, 0xc4, 0x00, 0x04, 0, 0) ++ jpeg.drop(2)
    assert(HeaderCodec.decodeJpeg(withDht).contains((257, 333, 3)))
    val gif = "GIF89a".getBytes("US-ASCII") ++ b(0x40, 0x01, 0xf0, 0x00) // 320x240 LE
    assert(HeaderCodec.decodeGif(gif).contains((320, 240, 3)))
    // raw text is no image: falls through to None (stub handles it)
    assert(HeaderCodec.decodeImage("not an image".getBytes).isEmpty)
    // legal 0xFF fill bytes before markers must be skipped, not parsed
    val filled = b(0xff, 0xd8, 0xff, 0xff, 0xff, 0xe0, 0x00, 0x10) ++
      Array.fill[Byte](14)(0) ++
      b(0xff, 0xff, 0xc0, 0x00, 0x11, 8, 0x01, 0x4d, 0x01, 0x01, 3) ++
      Array.fill[Byte](9)(0)
    assert(HeaderCodec.decodeJpeg(filled).contains((257, 333, 3)))
    // the walk stops at SOS/EOI instead of scanning entropy-coded data
    val truncated = b(0xff, 0xd8, 0xff, 0xda, 0x00, 0x04, 0, 0) ++
      Array.fill[Byte](32)(0x42)
    assert(HeaderCodec.decodeJpeg(truncated).isEmpty)
  }

  test("stub-oracled features path never header-parses text blobs") {
    val s = spark
    import s.implicits._
    // a TEXT document that legitimately starts with an ASCII image
    // signature — the GIF89a signature is plain text, so this happens
    // in real corpora ("GIF89a is a format...")
    val trap = "GIF89a is an image format from 1989 that supports animation"
    val media = Seq(
      Multimodal.MediaRow(1L, "image", trap.getBytes("UTF-8"), Map.empty))
      .toDS()
    // header-first parses it as a (garbage-dimension) GIF...
    assert(HeaderCodec.decodeImage(trap.getBytes("UTF-8")).nonEmpty)
    // ...so the stub-oracled query path must force stub-only decoding
    val stubOnly = Multimodal.extractImageFeatures(media, preferHeader = false)
      .collect().head
    val expected = StubCodec.decodeImage(trap.getBytes("UTF-8"))
    assert((stubOnly.width, stubOnly.height, stubOnly.channels) == expected)
  }

  test("planted-header media: engine recovers the real planted dimensions") {
    val media = Multimodal.mediaWithPlantedHeaders(spark, sfDir).repartition(8)
    val feats = Multimodal.extractImageFeatures(media).collect()
    assert(feats.length == 500)
    val expected = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("n_chars"), octet_length(col("text")).as("nb"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1) % 1920 + 1).toInt,
        (r.getLong(0) % 1080 + 1).toInt, 33L + r.getInt(2))).toMap
    feats.foreach { f =>
      val (w, h, nb) = expected(f.id)
      assert(f.width == w && f.height == h && f.channels == 3 && f.n_bytes == nb,
        s"id=${f.id}: got (${f.width},${f.height},${f.channels},${f.n_bytes}) want ($w,$h,3,$nb)")
    }
  }
}
