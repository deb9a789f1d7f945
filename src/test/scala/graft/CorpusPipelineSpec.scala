package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.app.CorpusPipelineApp

class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  test("pipeline dedupes exact and near duplicates and keeps canonicals") {
    import spark.implicits._
    // construct a corpus with known duplicates:
    //  - 0 and 1: byte-identical after normalization (case/punct differ)
    //  - 2 and 3: near-dups (one word changed in 30)
    //  - 4: unique long doc; 5: too short (quality-filtered)
    val base = (1 to 30).map(i => s"word$i").mkString(" ")
    val other = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val near = (1 to 30).map(i => if (i == 15) "changed" else s"alpha$i").mkString(" ")
    val docs = Seq(
      (0L, base, "en", "src", 1L),
      (1L, base.toUpperCase + "!!!", "en", "src", 1L),
      (2L, "the quick brown fox " + other, "en", "src", 1L),
      (3L, "the quick brown fox " + near, "en", "src", 1L),
      (4L, "el la de " + (100 to 140).map(i => s"uniq$i").mkString(" "), "es", "src", 1L),
      (5L, "too short", "en", "src", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val in = Files.createTempDirectory("corpus_in").toString + "/documents.parquet"
    val out = Files.createTempDirectory("corpus_out").toString + "/clean"
    docs.write.parquet(in)

    val st = CorpusPipelineApp.run(spark, in, out, jaccardThreshold = 0.7)
    assert(st.input == 6)
    assert(st.exactDups == 1, s"expected 1 exact dup, got $st")   // doc 1
    assert(st.nearDups == 1, s"expected 1 near dup, got $st")     // doc 3
    assert(st.lowQuality == 1, s"expected 1 low-quality, got $st") // doc 5
    assert(st.output == 3)

    val cleaned = spark.read.parquet(out)
    val ids = cleaned.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(0L, 2L, 4L), s"kept ${ids.toSeq}")
    val langs = cleaned.select("doc_id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(langs(4L) == "es", s"langid: $langs") // el/la/de markers
    assert(langs(2L) == "en")
  }
}
