package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.bfr.BFR
import graft.eval.Nmi
import graft.kmeans.KMeans
import graft.sources.PointSource

class BfrSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get

  lazy val blobs = TestBlobs.generate(spark, n = 2000, k = 5, d = 4, outliers = 20)
    .cache()

  test("kmeans recovers blob clusters with NMI above the reference pass bar") {
    val inliers = blobs.filter(col("trueLabel") >= 0)
    val model = KMeans.fit(inliers.select("id", "features"), k = 5, iters = 5)
    assert(model.centers.length == 5)
    val pred = model.assign(inliers, "features").select(col("id"), col("label"))
    val nmi = Nmi.score(pred, blobs.select(col("id"), col("trueLabel")))
    // HW4.pdf §4.3: NMI > 0.8 pass bar; clean blobs should be ~1.0
    assert(nmi > 0.95, s"NMI $nmi below expected")
  }

  test("kmeans model assigns deterministically (argmin first-min tie-break)") {
    val inliers = blobs.filter(col("trueLabel") >= 0)
    val m1 = KMeans.fit(inliers.select("id", "features"), k = 5, iters = 5)
    val m2 = KMeans.fit(inliers.select("id", "features"), k = 5, iters = 5)
    assert(m1.centers.map(_.toSeq).toSeq == m2.centers.map(_.toSeq).toSeq)
  }

  test("bfr end-to-end on chunked blobs: coverage, stats invariants, NMI") {
    val nChunks = 4
    val chunks = (0 until nChunks).map(i =>
      blobs.filter(pmod(col("id"), lit(nChunks)) === i).select("id", "features"))
    val res = BFR.run(spark, chunks, BFR.Config(k = 5, rsClusterThreshold = 100))
    val total = 2020L
    val n = res.assignments.count()
    assert(n == total, s"expected $total assignments, got $n")
    assert(res.assignments.select("id").distinct().count() == total,
      "every point labeled exactly once")
    assert(res.stats.size == nChunks)
    val discards = res.stats.map(_.nof_point_discard)
    assert(discards.zip(discards.tail).forall { case (a, b) => a <= b },
      s"nof_point_discard not monotone: $discards")
    val nmi = Nmi.score(
      res.assignments,
      blobs.select(col("id"), col("trueLabel")))
    assert(nmi > 0.8, s"BFR NMI $nmi below pass bar")
  }

  test("local and distributed fit paths agree (same algorithm)") {
    val inliers = blobs.filter(col("trueLabel") >= 0).select("id", "features")
    val local = KMeans.fit(inliers, k = 5, iters = 5)
    val dist = KMeans.fit(inliers, k = 5, iters = 5, forceDistributed = true)
    local.centers.zip(dist.centers).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-9, s"center drift: $x vs $y")
      }
    }
  }

  test("multi-seed restart picks the lowest-inertia model (M3)") {
    val inliers = blobs.filter(col("trueLabel") >= 0).select("id", "features")
    val best = KMeans.fitMultiSeed(inliers, k = 5, numSeeds = 3, iters = 5)
    val single = KMeans.fit(inliers, k = 5, iters = 5)
    assert(best.inertia(inliers, "features") <= single.inertia(inliers, "features") + 1e-6)
  }

  test("rs hard cap bounds retained-set size on adversarial data") {
    // structureless embeddings: most points miss the DS threshold -> RS
    // would balloon; the cap must keep it bounded and still label all
    val points = PointSource.fromEmbeddings(spark, "/root/testdata/sf0.001")
    val chunks = (0 until 4).map(i => points.filter(pmod(col("id"), lit(4)) === i))
    val res = BFR.run(spark, chunks,
      BFR.Config(k = 10, rsClusterThreshold = 1000, rsHardCap = Some(60)))
    assert(res.assignments.count() == 500)
    assert(res.assignments.select("id").distinct().count() == 500)
    // every non-final round's retained count obeys the cap
    res.stats.dropRight(1).foreach(s =>
      assert(s.nof_point_retained <= 60, s"cap violated: $s"))
  }

  test("bfr on structureless embeddings terminates and labels every point") {
    val points = PointSource.fromEmbeddings(spark, "/root/testdata/sf0.001")
    val chunks = (0 until 4).map(i => points.filter(pmod(col("id"), lit(4)) === i))
    val res = BFR.run(spark, chunks, BFR.Config(k = 10, rsClusterThreshold = 50))
    assert(res.assignments.count() == 500)
    assert(res.assignments.select("id").distinct().count() == 500)
  }

  test("assignment sink mode: streamed JSONL blocks ≡ accumulated assignments") {
    val nChunks = 4
    val chunks = (0 until nChunks).map(i =>
      blobs.filter(pmod(col("id"), lit(nChunks)) === i).select("id", "features"))
    val cfg = BFR.Config(k = 5, rsClusterThreshold = 100)
    val acc = BFR.run(spark, chunks, cfg)
    val sinkDir = java.nio.file.Files.createTempDirectory("graft_bfr_sink")
      .toFile.getAbsolutePath
    val streamed = BFR.run(spark, chunks, cfg,
      assignSink = Some(d => d.write.mode("append").json(sinkDir)))
    // sink mode accumulates NOTHING on the driver...
    assert(streamed.assignments.count() == 0L,
      "sink mode must not also accumulate assignment state")
    // ...and the streamed blocks reassemble the exact same assignment map
    val a = acc.assignments.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = spark.read.json(sinkDir).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster").toInt).toMap
    assert(a == b, s"sink/accumulate divergence: ${(a.toSet diff b.toSet).take(5)}")
    assert(streamed.stats == acc.stats, "round stats must be sink-agnostic")
  }

  test("scale-probe smoke: round times and driver heap stay flat") {
    // miniature of app.BfrScaleBench's 10M-point run: 500 embeddings
    // replicated 100x = 50k points through 4 chunks; a compounding plan
    // or driver-held point state shows up as monotone per-round growth
    val r = graft.app.BfrScaleBench.run(
      spark, "/root/testdata/sf0.001/embeddings.parquet",
      copies = 100, nChunks = 4, k = 10)
    assert(r.points == 50000L)
    assert(r.rounds.size == 4)
    val secs = r.rounds.map(_.sec)
    // round 1 carries init (sample + 2 k-means fits); later rounds must
    // not grow past it, and the last round must not dominate the median
    val later = secs.drop(1)
    assert(later.max <= math.max(secs.head * 2, 10.0),
      s"per-round time grew: $secs")
    val heaps = r.rounds.map(_.heapMb)
    assert(heaps.last <= heaps.head * 3 + 512,
      s"driver heap grew round-over-round: $heaps")
  }
}
