package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.StubCodec

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
}
