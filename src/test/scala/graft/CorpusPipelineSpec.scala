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

  test("bloom decontamination: no false negatives, consistent FP accounting") {
    val df = TextQueries.bloomDecontaminate.fn(spark, "/root/testdata/sf0.001").cache()
    // the Bloom guarantee: a shingle present in the benchmark set can
    // never miss the filter — per doc, exact hits ⊆ bloom hits
    assert(df.filter(col("n_exact_hits") > col("n_bloom_hits")).count() == 0)
    // the reported FP gap is exactly bloom − exact
    assert(df.filter(
      col("n_false_pos") =!= col("n_bloom_hits") - col("n_exact_hits")).count() == 0)
    // and the filter is selective, not saturated: corpus-wide FP rate
    // stays well under coin-flip for m=4096/k=3 at this fill
    val fp = df.agg((sum("n_false_pos") / sum("n_shingles")).as("r"))
      .head().getDouble(0)
    assert(fp < 0.5, s"bloom FP rate $fp — filter saturated?")
    df.unpersist()
  }

  test("minhash-LSH recall evaluation: internally consistent, high-J pairs caught") {
    val rows = TextQueries.minhashRecall.fn(spark, "/root/testdata/sf0.001")
      .orderBy("threshold_pct").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (pct, nTrue, nDet, recall) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nDet <= nTrue, s"pct=$pct detected $nDet > true $nTrue")
      assert(recall == math.floor(1e6 * nDet.toDouble / nTrue).toLong,
        s"pct=$pct recall arithmetic off")
    }
    // ground truth shrinks as the bar rises
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getLong(1) >= hi.getLong(1), "n_true not monotone in threshold")
    case _ => ()
    }
    // 4 bands × 2 rows: P(detect | J=0.9) = 1-(1-0.81)^4 ≈ 0.9987 —
    // the measured recall at the 0.90 bar must be near-total
    val r90 = rows.find(_.getLong(0) == 90L)
    r90.foreach(r => assert(r.getLong(3) >= 900000L,
      s"recall@J≥0.9 = ${r.getLong(3)} — banding broken"))
  }
}
