package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Measured recall of the embedding near-dup tiers on PLANTED near-dups:
  * the banded form (4 bands × 8 planes, OR-of-ANDs) must catch what the
  * detection math promises (≈0.99 at the planted cos ≈0.993) and
  * strictly more than the single 8-bit bucket (≈0.74 per-band there).
  * Everything is deterministic — hash-derived jitter, exact-integer
  * hyperplanes — so the counts are stable run to run.
  */
class EmbeddingLshSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  test("semantic dedup marks planted same-cell duplicates, keeps the earliest") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    // synthetic embeddings table: 200 random unit vectors + 3 exact
    // copies of vector 0 (ids 500..502) and a copy of vector 7 (id 510)
    val rng = new scala.util.Random(5)
    def vec(): Seq[Float] = {
      val v = Array.fill(64)(rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val base = (0L until 200L).map(i => (i, vec(), i % 5))
    val dups = Seq(500L, 501L, 502L).map(i => (i, base(0)._2, 0L)) :+
      ((510L, base(7)._2, 2L))
    val dir = java.nio.file.Files.createTempDirectory("semdedup").toString
    (base ++ dups).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = MlQueries.semanticDedup.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact copies share the cell by construction (identical vectors);
    // the smallest id of each dup family is kept, the rest marked
    assert(got(0L) == 1L && got(500L) == 0L && got(501L) == 0L && got(502L) == 0L)
    assert(got(7L) == 1L && got(510L) == 0L)
    // random vectors at ~0 cosine are never marked
    assert((1L until 200L).filterNot(_ == 7L).forall(got(_) == 1L))
  }

  test("banded hyperplane LSH catches more planted near-dups than single-band") {
    val dir = Files.createTempDirectory("banded_lsh").toString
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 200)
      .select(col("vec_id"), col("embedding"), col("label"))
    // planted copy of each base vector: id + 10000, per-dim deterministic
    // jitter ±0.025 (|noise| ≈ 0.115 on unit vectors → cos ≈ 0.993)
    val jittered = base.select(
      (col("vec_id") + 10000).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        (x.cast("double") +
          (pmod((col("vec_id") * 64 + i) * 2654435761L, lit(1000)) - 500) / 500.0 * 0.025
        ).cast("float")).as("embedding"),
      col("label"))
    base.union(jittered).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    def plantedCaught(qname: String): Long =
      Queries.all.find(_.name == qname)
        .getOrElse(fail(s"query $qname not registered"))
        .fn(spark, dir)
        .filter(col("idb") === col("ida") + 10000).count()

    val banded = plantedCaught("q_embedding_near_dup_banded")
    val single = plantedCaught("q_embedding_near_dup_lsh")
    info(s"planted near-dups caught: banded=$banded/200, single-band=$single/200")
    // math: P(banded) = 1-(1-p^8)^4 ≈ 0.996, P(single) = p^8 ≈ 0.74 at
    // the planted angle — banded must be near-total and strictly ahead
    assert(banded >= 180, s"banded caught $banded of 200 planted")
    assert(banded > single, s"banded=$banded not ahead of single=$single")
  }

  test("census-driven band width: pick rule and B(w) table match the detection math") {
    // width pick: smallest w in 8..20 with n <= 2*2^w (expected bucket
    // occupancy <= 2), clamped to 20 (the sf10 vector step pushed the
    // old 8..16 ceiling back into saturation at 200k vectors: occupancy
    // 3.05 at w=16 vs 1.53 at the census pick w=17)
    assert(MlQueries.bandedPlanesFor(1L) == 8)
    assert(MlQueries.bandedPlanesFor(512L) == 8)
    assert(MlQueries.bandedPlanesFor(513L) == 9)
    assert(MlQueries.bandedPlanesFor(2000L) == 10)    // sf0.01
    assert(MlQueries.bandedPlanesFor(20000L) == 14)   // sf1
    assert(MlQueries.bandedPlanesFor(200000L) == 17)  // sf10 vector step
    assert(MlQueries.bandedPlanesFor(1L << 40) == 20) // clamp
    // B(w) table: each entry must be the MINIMAL band count holding
    // OR-of-ANDs detection at cos 0.95 at/above the 4×8 design point's
    // 0.89 (epsilon 5e-4 absorbs the w=16 boundary, where detection at
    // B=11 is 0.8900 to four places — exactly the transcendental-boundary
    // case the table exists to pin)
    val p = 1.0 - math.acos(0.95) / math.Pi
    def detect(w: Int, b: Int) = 1.0 - math.pow(1.0 - math.pow(p, w), b)
    (8 to 20).foreach { w =>
      val b = MlQueries.BandedBandsForWidth(w)
      assert(detect(w, b) >= 0.89 - 5e-4, s"w=$w B=$b detection ${detect(w, b)} < 0.89")
      assert(detect(w, b - 1) < 0.89 - 5e-4, s"w=$w B=$b not minimal")
    }
  }

  test("simhash census width: pick rule and 64-bit low-half compatibility") {
    // pick rule: W=32 holds exactly while expected 16-bit band-bucket
    // occupancy stays <= 2 (n <= 2*2^16), then doubles to 64
    assert(MlQueries.simhashBitsFor(1L) == 32)
    assert(MlQueries.simhashBitsFor(50000L) == 32)           // sf1 corpus
    assert(MlQueries.simhashBitsFor(MlQueries.SimhashWidthThreshold) == 32)
    assert(MlQueries.simhashBitsFor(MlQueries.SimhashWidthThreshold + 1) == 64)
    assert(MlQueries.simhashBitsFor(500000L) == 64)          // sf10 corpus
    // widening is backward-compatible: bits 0..31 of the 64-bit
    // fingerprint ARE the 32-bit fingerprint (high half hashes from
    // independent md5 bytes), so crossing the threshold never rewrites
    // the low-half fingerprints a narrower corpus would have produced
    val dir = "/root/testdata/sf0.001"
    val w32 = MlQueries.simhashDf(spark, dir, Some(32))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w64 = MlQueries.simhashDf(spark, dir, Some(64))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w32.nonEmpty && w64.keySet == w32.keySet)
    w32.foreach { case (id, s32) =>
      assert((w64(id) & 0xFFFFFFFFL) == s32,
        s"doc $id: 64-bit low half ${w64(id) & 0xFFFFFFFFL} != 32-bit $s32")
    }
    // and the high half is genuinely independent (not a copy / zero)
    assert(w64.exists { case (id, s64) => (s64 >>> 32) != (s64 & 0xFFFFFFFFL) })
    assert(w64.exists { case (_, s64) => (s64 >>> 32) != 0L })
  }

  test("census-driven IVF cell count: regime boundary, exact ceil, md5-rank seeding order") {
    // regime A (k=8 maximin) holds through every driver SF (sf1 = 20k);
    // regime B k = ceil(n / 1024) — 1024 is a power of two so n/1024.0
    // is exact in binary floating point and the engine's and DuckDB's
    // ceil agree at every count
    assert(MlQueries.ivfKFor(500L) == 8)      // sf0.01
    assert(MlQueries.ivfKFor(20000L) == 8)    // sf1
    assert(MlQueries.ivfKFor(32768L) == 8)    // boundary: last regime-A count
    assert(MlQueries.ivfKFor(32769L) == 33)   // first regime-B count
    assert(MlQueries.ivfKFor(200000L) == 196) // sf10 vector step
    assert(MlQueries.ivfKFor(1048576L) == 1024)
    // census-k CEILING: the center matrix stays a shippable literal at
    // ANY corpus size, and the old n/1024 ceil can no longer saturate
    // toInt past n ≈ 2^41
    assert(MlQueries.ivfKFor(4194304L) == 4096)      // exactly at the cap
    assert(MlQueries.ivfKFor(10000000000L) == 4096)  // 10^10 vectors
    assert(MlQueries.ivfKFor(Long.MaxValue) == 4096) // no overflow
    // md5Hex must agree with DuckDB's md5(CAST(id AS VARCHAR)) — pinned
    // vector plus the full rank order of ids 0..9, both verified against
    // DuckDB 1.0 (SELECT i FROM generate_series(0,9) t(i)
    //             ORDER BY md5(CAST(i AS VARCHAR)), i)
    assert(MlQueries.md5Hex("5") == "e4da3b7fbbce2345d7772b0674a318d5")
    val ranked = (0L to 9L).sortBy(i => (MlQueries.md5Hex(i.toString), i))
    assert(ranked == Seq(6L, 9L, 7L, 4L, 1L, 2L, 8L, 0L, 5L, 3L),
      s"md5 rank order drifted: $ranked")
  }

  test("regime-B census quantizer serves the live IVF queries end-to-end (33k corpus)") {
    val s = spark
    import s.implicits._
    // 33,000 > IvfScaleN = 32,768 → the census regime: k = ceil(33000/1024) = 33
    val n = 33000
    val rng = new scala.util.Random(11)
    val rows = (0 until n).map { i =>
      val v = Array.fill(64)(rng.nextGaussian().toFloat)
      (i.toLong, v.toSeq, (i % 7).toLong)
    }
    val dir = Files.createTempDirectory("graft_regimeb").toFile.getAbsolutePath
    rows.toDF("vec_id", "embedding", "label")
      .repartition(4).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // wipe any ivf-census-k33-* artifact left by a previous run so the
    // FIT path is actually exercised (not a getOrFit load), and the
    // artifact assertion below can only be satisfied by THIS run
    def censusArtifacts(): Seq[java.io.File] = {
      val root = new java.io.File(s"${sys.props("java.io.tmpdir")}/graft_models")
      Option(root.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq
        .filter(_.isDirectory)
        .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty[java.io.File]))
        .filter(_.getName.startsWith("ivf-census-k33-"))
    }
    censusArtifacts().foreach { f =>
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rm)
        x.delete(); ()
      }
      rm(f)
    }
    assert(censusArtifacts().isEmpty, "stale census artifacts survived cleanup")

    // the served IVF search must run through the census codebook and
    // still produce the contract shape: 5 queries × top-3
    val ivf = SparkEntry.queries("q_ann_ivf")(s, dir)
    assert(ivf.count() == 15, "q_ann_ivf must yield 5 queries x top-3")
    // the persisted artifact carries the census identity — a regime
    // change can never serve a stale codebook
    val stores = censusArtifacts().map(_.getName)
    assert(stores.exists(_.startsWith("ivf-census-k33-")),
      s"expected an ivf-census-k33-* artifact, saw: ${stores.mkString(",")}")
    // census single-band LSH width at 33k is 15 (2*2^15 >= 33000): near-
    // uniform gaussian sign patterns → candidates ~linear, query returns
    val lsh = SparkEntry.queries("q_embedding_lsh_pairs")(s, dir)
    assert(lsh.columns.toSeq == Seq("ida", "idb", "bucket"))
    assert(lsh.limit(1).collect().forall(_.getString(2).length == 15),
      "census width at 33k must be 15 planes")
  }

  test("bounded-sample quantizer fit: 70k corpus fits on the 65536-row md5 sample") {
    val s = spark
    import s.implicits._
    // 70,000 > IvfSampleN = 65,536 → the fit must run on the md5-ranked
    // bounded sample (selected distributed via TakeOrdered), never a
    // full-corpus collect; k = ceil(70000/1024) = 69
    val n = 70000
    val rng = new scala.util.Random(17)
    val rows = (0 until n).map { i =>
      (i.toLong, Array.fill(16)(rng.nextGaussian().toFloat).toSeq, (i % 5).toLong)
    }
    val dir = Files.createTempDirectory("graft_sample").toFile.getAbsolutePath
    rows.toDF("vec_id", "embedding", "label")
      .repartition(8).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val ivf = SparkEntry.queries("q_ann_ivf")(s, dir)
    assert(ivf.count() == 15, "q_ann_ivf must yield 5 queries x top-3")
    // the artifact name carries the sample knob: the truncating-sample
    // path was ACTUALLY taken (and can never serve a pre-knob codebook)
    val root = new java.io.File(s"${sys.props("java.io.tmpdir")}/graft_models")
    val stores = Option(root.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq
      .filter(_.isDirectory)
      .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty[java.io.File]))
      .map(_.getName)
    assert(stores.exists(a => a.startsWith("ivf-census-k69-") && a.contains("-s65536")),
      s"expected an ivf-census-k69-*-s65536 artifact, saw: ${stores.mkString(",")}")
    // every vector of the FULL corpus is still served (assignment is
    // corpus-wide even though the fit saw only the sample)
    val clusters = MlQueries.embeddingClusters.fn(s, dir).collect()
    assert(clusters.map(_.getLong(1)).sum == n.toLong,
      "served assignment must cover the full corpus, not just the sample")
  }

  test("embedding cluster profile: partition is total and arithmetic consistent") {
    val dir = "/root/testdata/sf0.001"
    val total = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val rows = MlQueries.embeddingClusters.fn(spark, dir).collect()
    assert(rows.length <= 8 && rows.nonEmpty)
    // every vector lands in exactly one cluster
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      val (n, sse, mean) = (r.getLong(1), r.getLong(2), r.getLong(4))
      assert(n > 0 && sse >= 0)
      assert(mean == math.floor(sse.toDouble / n).toLong,
        s"cluster ${r.getLong(0)}: mean dispersion arithmetic off")
    }
  }
}
