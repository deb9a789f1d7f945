package graft.bfr

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.{ClusterSummary, RoundStats}
import graft.kmeans.KMeans
import graft.operators.SummaryAggregator

/** Bradley–Fayyad–Reina streaming clustering, re-expressed as Spark
  * dataflow. The reference (code/bfr.py:431-468) holds DS/CS/RS state on
  * the driver and loops one chunk per round; we keep the same round
  * structure (BFR is inherently order-dependent) but make every per-chunk
  * step a distributed plan:
  *
  *  - assignment = map-side expression against broadcast-small DS/CS
  *    summaries (K..5K rows of (center, std) — folded in as literals);
  *    the point side never shuffles (SURVEY.md §4.1);
  *  - summary construction = partial+final aggregation (SummaryAggregator);
  *  - RS is a Dataset, re-clustered into CS when it exceeds a threshold
  *    (reference M6, code/bfr.py:259-288 — defined but never called; we
  *    wire it live, fixing the dead-code path);
  *  - CS pairwise merge is a driver-side greedy loop over ≤5K summaries
  *    (code/bfr.py:290-320, with the center-vs-object bug fixed —
  *    code/bfr.py:304 passes SummarizedSet objects where vectors are
  *    expected);
  *  - assignments are accumulated as DataFrames (id, cluster), not a
  *    driver dict, so the output path scales with the data.
  *
  * Reference quirks deliberately fixed (SURVEY.md §7.2): the `if label:`
  * truthiness bug that sent points nearest cluster 0 to RS
  * (code/bfr.py:386) uses a proper null test here.
  */
object BFR {

  final case class Config(
      k: Int,
      alphaAssign: Double = 3.0,   // code/bfr.py:382 (α=3 default)
      alphaRs: Double = 4.0,       // code/bfr.py:326,339 (α=4)
      kmeansIters: Int = 5,        // code/bfr.py:87-90
      initSampleFraction: Double = 0.2, // code/bfr.py:396-398
      seedKMult: Int = 3,          // init clusters = 3K (code/bfr.py:400)
      csKMult: Int = 5,            // RS re-cluster into 5K (code/bfr.py:264)
      rsClusterThreshold: Int = 500, // re-cluster RS when it exceeds this
      /** Deterministic analog of the reference's random k-means start
        * (code/bfr.py:21 `random.randint`): the init-stage fits seed from
        * the (seedRank+1)-th smallest id instead of the first. Distinct
        * ranks give the independent restarts HW4 §4.3's best-of-5
        * protocol expects, reproducibly.
        */
      seedRank: Int = 0,
      /** Scale-safety valve (beyond the reference): if RS still exceeds
        * this after re-clustering, force-assign the overflow to the
        * nearest DS unconditionally (alpha = ∞) rather than letting
        * driver-adjacent state grow without bound on adversarial data.
        * None = reference-faithful unbounded RS.
        */
      rsHardCap: Option[Int] = None
  )

  final case class Result(
      assignments: DataFrame,       // (id: long, cluster: int), -1 = outlier
      stats: Seq[RoundStats],
      ds: IndexedSeq[ClusterSummary]
  )

  /** Nearest summary under `dist < alpha * sqrt(d)`: returns (labelCol,
    * keepCol). First minimum wins on ties (code/bfr.py:367-374 strict <).
    *
    * One fused kernel ([[graft.functions.NativeVectorExpressions
    * .NearestMahaExpr]]) with the summary matrices as reference objects:
    * bit-identical to the previous `array_min`/`array_position` over k
    * per-summary Mahalanobis literals, but O(1) plan size — the literal
    * form put ~k·2·d leaf nodes into every per-round plan, and Catalyst
    * re-analysis of those trees (2-3 fresh plans × ~6 actions per round)
    * was the BFR loop's dominant wall cost at bench scale.
    */
  private def nearestUnder(features: Column, summaries: IndexedSeq[ClusterSummary],
                           alpha: Double): (Column, Column) = {
    val d = summaries.head.d
    val packed = graft.functions.NativeVectorFunctions.nearestMahaNative(
      features, summaries.map(_.center).toArray, summaries.map(_.std).toArray,
      alpha * math.sqrt(d.toDouble))
    ((shiftright(packed, 1)).cast("int"), packed.bitwiseAND(1) === 1)
  }

  private[graft] def summariesByLabel(assigned: DataFrame, featCol: String): Map[Int, ClusterSummary] =
    assigned.groupBy(col("label"))
      .agg(SummaryAggregator.summarize(col(featCol)).as("s"))
      .collect()
      .map { row =>
        val s = row.getStruct(1)
        row.getInt(0) -> ClusterSummary(s.getLong(0), s.getSeq[Double](1).toArray, s.getSeq[Double](2).toArray)
      }.toMap

  /** Total within-cluster SSE of the discard-set summaries, driver-side
    * from the sufficient statistics alone: Σ_d (SUMSQ_d − SUM_d²/N) per
    * cluster — no data pass.
    */
  def totalSse(ds: Seq[ClusterSummary]): Double =
    ds.filter(_.n > 0).map { s =>
      var acc = 0.0
      var i = 0
      while (i < s.d) { acc += s.sumsq(i) - s.sum(i) * s.sum(i) / s.n; i += 1 }
      acc
    }.sum

  /** Mean within-cluster squared distance over the discard sets — the
    * best-of-N restart criterion (HW4 §4.3 grades the best of 5 runs).
    * Per-POINT, not total: restarts can discard different point counts,
    * and a run that routed more points to outliers would win a raw-SSE
    * comparison for the wrong reason.
    */
  def meanSse(ds: Seq[ClusterSummary]): Double = {
    val n = ds.map(_.n).sum
    if (n == 0) Double.MaxValue else totalSse(ds) / n
  }

  /** The deterministic init sample: the `sampleN` smallest-id points of
    * the chunk (code/bfr.py:396-398 takes the file-order prefix; ids are
    * the row's position, so the id prefix is the same set). Selecting the
    * sampleN-th smallest id first (map-side histogram passes,
    * [[graft.operators.Selection.kthSmallestLong]]) and filtering by it
    * avoids `orderBy(id).limit(sampleN)` — a TakeOrdered of 20% of the
    * chunk through one merge, the init-stage scale killer at 100 TB.
    * Ids are unique, so `id <= kth` is exactly the size-sampleN prefix.
    */
  private[graft] def initSample(chunk: DataFrame, sampleN: Int): DataFrame =
    initSampleWithThreshold(chunk, sampleN)._1

  /** Sample plus the kth-smallest-id threshold that defines it, so the
    * caller can take the complement as the map-side filter `id > kth`
    * instead of a chunk-scale anti-join (ids are unique: the two filters
    * partition the chunk exactly).
    */
  private[graft] def initSampleWithThreshold(
      chunk: DataFrame, sampleN: Int): (DataFrame, Long) = {
    val threshold = graft.operators.Selection.kthSmallestLong(chunk, "id", sampleN)
    (chunk.filter(col("id") <= threshold), threshold)
  }

  /** Run BFR over an ordered sequence of chunk DataFrames, each with
    * columns (id: long, features: array<double>). Mirrors
    * `Runner.run` (code/bfr.py:431-468).
    */
  def run(spark: SparkSession, chunks: Seq[DataFrame], cfg: Config,
          onRound: Int => Unit = _ => (),
          assignSink: Option[DataFrame => Unit] = None): Result = {
    require(chunks.nonEmpty, "BFR needs at least one chunk")
    // streaming-sink mode: every finalized assignment block is handed to
    // the sink the moment it exists and the driver accumulates NOTHING —
    // in local mode the default union+localCheckpoint path stores the
    // accumulated blocks in the block manager (the driver JVM's heap!),
    // which is exactly the state a 100M-point probe must NOT hold.
    // Result.assignments is the empty frame in sink mode.
    def appendAssign(a: DataFrame, delta: DataFrame): DataFrame =
      assignSink match {
        case Some(sink) => sink(delta); a
        case None       => unionAssign(a, delta)
      }

    var ds = IndexedSeq.empty[ClusterSummary]            // discard sets
    var cs = IndexedSeq.empty[ClusterSummary]            // compression sets
    var csMembers: DataFrame = emptyAssignments(spark, "cs_id") // (id, cs_id)
    var rs: DataFrame = null                             // retained points
    var assigned: DataFrame = emptyAssignments(spark, "cluster")
    val stats = scala.collection.mutable.ArrayBuffer[RoundStats]()
    var discardedSoFar = 0L
    // tagged per-round assignment frames, unpersisted once the round's
    // checkpoints have materialized from them (see tagAssign)
    val roundTags = scala.collection.mutable.ArrayBuffer[DataFrame]()

    // Loop shuffle width from the first chunk's census (opt guide §2.2 —
    // fewer, larger partitions): every per-round aggregation/checkpoint
    // here is over O(chunk) rows, and at the bench scale the session's
    // 32-partition shuffles turned each of the ~6 actions/round into a
    // fixed-cost micro-stage storm. Width tracks the data (64k rows per
    // partition, capped at defaultParallelism), restored in the finally.
    val prevShufflePartitions = spark.conf.get("spark.sql.shuffle.partitions")
    var widthSet = false
    var prevAqe: Option[String] = None

    val nRounds = chunks.size
    // label every action (opt guide §1.5) so job-level profiles attribute
    // the loop's cost to its steps
    def step(round: Int, name: String): Unit =
      spark.sparkContext.setJobDescription(s"bfr r$round $name")
    try {
    for ((chunkRaw, idx) <- chunks.zipWithIndex) {
      val round = idx + 1
      step(round, "chunk")
      val chunk = chunkRaw.select(col("id").cast("long").as("id"), col("features"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // round 1 needs the count for the init-sample sizing (and sets the
      // loop width); later rounds skip the job — their first action over
      // the persisted chunk materializes the cache just the same
      val chunkN = if (round == 1) chunk.count() else -1L

      if (round == 1) {
        val width = math.max(1L, math.min(
          spark.sparkContext.defaultParallelism.toLong, chunkN / 65536 + 1)).toInt
        spark.conf.set("spark.sql.shuffle.partitions", width)
        widthSet = true
        // On a bounded chunk the loop's shuffles are single-digit-task
        // stages; AQE's per-shuffle re-planning then splits every action
        // into 2-3 driver-latency-priced jobs for zero benefit (the loop
        // has no skewed or size-misestimated join — label aggregations
        // and explicit broadcasts only). Data-adaptive: corpus-scale
        // chunks keep the session's AQE.
        if (chunkN <= (1L << 20)) {
          prevAqe = Some(spark.conf.get("spark.sql.adaptive.enabled"))
          spark.conf.set("spark.sql.adaptive.enabled", "false")
        }
      }

      if (round == 1) {
        step(round, "init")
        // --- init (M4, code/bfr.py:393-429) ---
        val n = chunkN
        val sampleN = math.ceil(cfg.initSampleFraction * n).toInt
        val (sample0, kth) = initSampleWithThreshold(chunk, sampleN)
        val sample = sample0.persist(StorageLevel.MEMORY_AND_DISK)
        // cluster sample into 3K; singleton labels -> RS (A7 + P3)
        val coarse = KMeans.fit(sample, math.min(cfg.seedKMult * cfg.k, sampleN),
          cfg.kmeansIters, firstSeedRank = cfg.seedRank)
        val coarseAssigned = coarse.assign(sample, "features")
          .persist(StorageLevel.MEMORY_AND_DISK)
        // ONE label-histogram collect replaces the previous singleton
        // subquery + two broadcast joins + a separate inlier count: the
        // histogram is ≤ 3K rows by construction (labels of a 3K-means),
        // so the singleton-label list rides back as a map-side isin()
        // literal and the inlier count is its complement sum — same row
        // sets, three fewer jobs in the init stage
        val labelHist = coarseAssigned.groupBy(col("label")).count().collect()
        val singletonLabels = labelHist.filter(_.getLong(1) == 1L).map(_.getInt(0))
        val nInliers0 = labelHist.filter(_.getLong(1) > 1L).map(_.getLong(1)).sum
        val isSingleton: Column =
          if (singletonLabels.isEmpty) lit(false)
          else col("label").isin(singletonLabels.toIndexedSeq: _*)
        val rsInit0 = coarseAssigned.filter(isSingleton)
          .select("id", "features")
        val inliers0 = coarseAssigned.filter(!isSingleton)
          .select("id", "features")
          .persist(StorageLevel.MEMORY_AND_DISK)
        // degenerate guard: if outlier removal left fewer than K points
        // (tiny samples), keep the whole sample as inliers
        val (inliers, rsInit, nInliers) =
          if (nInliers0 < cfg.k)
            (sample.select("id", "features").persist(StorageLevel.MEMORY_AND_DISK),
              sample.select("id", "features").limit(0), sampleN.toLong)
          else (inliers0, rsInit0, nInliers0)
        // re-cluster inliers into K -> DS; the shape is already known
        // (inlier count from the histogram, d from the coarse model), so
        // the fit's probe job is skipped
        val fine = KMeans.fit(inliers, cfg.k, cfg.kmeansIters,
          firstSeedRank = cfg.seedRank,
          knownShape = Some((nInliers, coarse.d)))
        val fineAssigned = fine.assign(inliers, "features")
          .persist(StorageLevel.MEMORY_AND_DISK)
        val byLabel = summariesByLabel(fineAssigned, "features")
        // drop empty clusters instead of padding with zero summaries: a
        // zero summary has NaN center and all-zero std, which makes its
        // Mahalanobis distance 0.0 to EVERY point — a phantom cluster
        // that would absorb the rest of the stream. Cluster ids are the
        // (compacted) ds indices.
        val present = (0 until cfg.k).filter(byLabel.contains)
        val relabel = present.zipWithIndex.toMap
        ds = present.map(byLabel).toIndexedSeq
        val relabelExpr = map(relabel.toSeq.flatMap { case (o, n2) => Seq(lit(o), lit(n2)) }: _*)
        assigned = appendAssign(assigned,
          fineAssigned.select(col("id"),
            element_at(relabelExpr, col("label")).cast("int").as("cluster")))
        discardedSoFar += byLabel.values.map(_.n).sum // sample inliers
        rs = rsInit
        // rest of chunk 1 through the normal DS/RS path (code/bfr.py:429):
        // the exact complement of the `id <= kth` sample, as a map-side
        // filter — not an anti-join, which would shuffle the whole chunk
        val rest = chunk.filter(col("id") > kth)
        val (tg2, a2, r2) = tagAssign(rest, ds, cfg.alphaAssign)
        if (tg2 != null) roundTags += tg2
        assigned = appendAssign(assigned, a2.select("id", "cluster"))
        // A4: assigned points fold into their DS summaries (the reference
        // updates per point at code/bfr.py:389; we fold the chunk's delta);
        // the same aggregation yields the discarded-count delta
        step(round, "absorb-rest")
        val (ds2, n2) = absorbCounted(ds,
          a2.select(col("cluster").as("label"), col("features")))
        ds = ds2; discardedSoFar += n2
        rs = rs.union(r2)
        sample.unpersist(false); coarseAssigned.unpersist(false)
        inliers0.unpersist(false); inliers.unpersist(false); fineAssigned.unpersist(false)
      } else {
        // --- per-chunk step (M5, code/bfr.py:382-391) ---
        val (tg, a, r) = tagAssign(chunk, ds, cfg.alphaAssign)
        if (tg != null) roundTags += tg
        assigned = appendAssign(assigned, a.select("id", "cluster"))
        step(round, "absorb")
        val (dsN, nA) = absorbCounted(ds,
          a.select(col("cluster").as("label"), col("features")))
        ds = dsN; discardedSoFar += nA
        rs = rs.union(r)
      }

      // localCheckpoint truncates the round-over-round lineage — the plan
      // otherwise compounds each round (embedded center literals included)
      // until even stringifying it OOMs the driver. LAZY + count(): one
      // job materializes the checkpoint AND yields the census the
      // RS-management steps below need (the eager form paid a separate
      // job, and the RS side of the tagged pass re-ran the distance
      // kernel before tagAssign cached it)
      step(round, "rs-checkpoint")
      rs = rs.localCheckpoint(false)
      var rsCount = rs.count()

      // --- RS -> CS re-clustering (M6, code/bfr.py:259-288) ---
      if (rsCount > cfg.rsClusterThreshold) {
        step(round, "rs-recluster")
        val kCs = math.min(cfg.csKMult * cfg.k, (rsCount / 2).toInt max 1)
        val model = KMeans.fit(rs, kCs, cfg.kmeansIters)
        val rsAssigned = model.assign(rs, "features").persist(StorageLevel.MEMORY_AND_DISK)
        val singles = rsAssigned.groupBy(col("label")).count()
          .filter(col("count") === 1).select("label")
        val newRs = rsAssigned.join(broadcast(singles), Seq("label"), "left_semi")
          .select("id", "features")
        val toCs = rsAssigned.join(broadcast(singles), Seq("label"), "left_anti")
          .persist(StorageLevel.MEMORY_AND_DISK)
        val base = cs.size
        val byLabel = summariesByLabel(toCs, "features")
        val labels = byLabel.keys.toSeq.sorted
        val labelToCs = labels.zipWithIndex.map { case (l, i) => (l, base + i) }.toMap
        cs = cs ++ labels.map(byLabel)
        val mapExpr = map(labelToCs.toSeq.flatMap { case (l, c) => Seq(lit(l), lit(c)) }: _*)
        csMembers = csMembers.union(
          toCs.select(col("id"), element_at(mapExpr, col("label")).cast("int").as("cs_id")))
        rs = newRs.localCheckpoint(true)
        rsCount = rs.count()
        rsAssigned.unpersist(false); toCs.unpersist(false)
        // --- CS pairwise merge (M7, code/bfr.py:290-320, bug fixed) ---
        val (mergedCs, remap) = mergeCs(cs)
        if (remap.nonEmpty) {
          cs = mergedCs
          val remapExpr = map(remap.toSeq.flatMap { case (o, n2) => Seq(lit(o), lit(n2)) }: _*)
          csMembers = csMembers.select(col("id"),
            coalesce(element_at(remapExpr, col("cs_id")), col("cs_id")).cast("int").as("cs_id"))
        }
      }

      // --- RS hard cap (engine extension): force-spill overflow to DS ---
      for (cap <- cfg.rsHardCap if rsCount > cap && ds.nonEmpty) {
        // smallest-id prefix via threshold selection — same shape as the
        // init sample; the overflow can be a large fraction of RS, so no
        // TakeOrdered funnel here either
        val overflow = rs.filter(col("id") <=
            graft.operators.Selection.kthSmallestLong(rs, "id", rsCount - cap))
          .localCheckpoint(true)
        val (a, _) = assignToDsWithFeatures(overflow, ds, Double.MaxValue)
        val (dsN, nA) = absorbCounted(ds,
          a.select(col("cluster").as("label"), col("features")))
        ds = dsN; discardedSoFar += nA
        assigned = appendAssign(assigned, a.select("id", "cluster"))
        rs = rs.join(overflow.select("id"), Seq("id"), "left_anti").localCheckpoint(true)
        rsCount = rs.count()
      }

      // --- mid-stream RS -> DS spill (M8, code/bfr.py:322-334), not last round ---
      if (round < nRounds && rsCount > 0) {
        step(round, "rs-spill")
        val (tg, a, r) = tagAssign(rs, ds, cfg.alphaRs)
        if (tg != null) roundTags += tg
        // α=4 spill merges matched points into DS summaries (code/bfr.py:331-333)
        val (dsN, nA) = absorbCounted(ds,
          a.select(col("cluster").as("label"), col("features")))
        ds = dsN; discardedSoFar += nA
        assigned = appendAssign(assigned, a.select("id", "cluster"))
        rs = r.localCheckpoint(false)
        rsCount = rs.count() // == rsCount - nA; materializes the checkpoint
      }

      // --- finalize on the last round (M9, code/bfr.py:336-355) ---
      var retained = 0L
      if (round == nRounds) { step(round, "finalize")
        if (rsCount > 0) {
          val (tg, a, r) = tagAssign(rs, ds, cfg.alphaRs)
          if (tg != null) roundTags += tg
          val (dsN, aCount) = absorbCounted(ds,
            a.select(col("cluster").as("label"), col("features")))
          ds = dsN
          assigned = appendAssign(assigned, a.select("id", "cluster"))
          discardedSoFar += aCount
          retained = rsCount - aCount
          assigned = appendAssign(assigned,
            r.select(col("id"), lit(-1).cast("int").as("cluster")))
          rs = r
        }
        // force-merge every CS into its nearest DS (α=10^18, code/bfr.py:350)
        if (cs.nonEmpty) {
          val csToDs = cs.zipWithIndex.map { case (c, i) =>
            val dists = ds.map(s => s.mahalanobis(c.center))
            val best = dists.zipWithIndex.minBy(_._1)._2
            i -> best
          }.toMap
          ds = ds.zipWithIndex.map { case (s, di) =>
            csToDs.filter(_._2 == di).keys.foldLeft(s)((acc, ci) => acc.merge(cs(ci)))
          }
          val csMap = map(csToDs.toSeq.flatMap { case (c, d0) => Seq(lit(c), lit(d0)) }: _*)
          assigned = appendAssign(assigned,
            csMembers.select(col("id"), element_at(csMap, col("cs_id")).cast("int").as("cluster")))
          discardedSoFar += csMembers.count()
          cs = IndexedSeq.empty
          csMembers = emptyAssignments(spark, "cs_id") // merged -> now discard
        }
      }

      // incremental accounting: each round counts only its delta batches,
      // never the accumulated assignments (an O(rounds^2) rescan at scale)
      step(round, "assigned-checkpoint")
      if (assignSink.isEmpty) assigned = assigned.localCheckpoint(true)
      // checkpoint+count the CS membership only when CS state exists —
      // on clean data this skips two jobs per round
      val csPoints = if (cs.isEmpty && stats.forall(_.nof_point_compression == 0)) 0L
      else {
        csMembers = csMembers.localCheckpoint(true)
        csMembers.count()
      }
      stats += RoundStats(round, ds.size, discardedSoFar, cs.size, csPoints,
        if (round == nRounds) retained else rsCount)
      chunk.unpersist(false)
      // every checkpoint/sink that reads the round's tagged frames has
      // materialized above; drop the caches before the next chunk
      roundTags.foreach(_.unpersist(false))
      roundTags.clear()
      onRound(round) // instrumentation hook (scale probes time/heap here)
    }
    } finally {
      if (widthSet)
        spark.conf.set("spark.sql.shuffle.partitions", prevShufflePartitions)
      prevAqe.foreach(spark.conf.set("spark.sql.adaptive.enabled", _))
    }

    Result(assigned, stats.toSeq, ds)
  }

  /** One persisted distance pass per assignment step: tag every point
    * with (cluster, keep) and derive the assigned / leftover sides as
    * filters over the SAME cached frame, so the absorb aggregation, the
    * RS checkpoint and the assignment delta all read one cache instead
    * of each re-running the Mahalanobis kernel (previously two full
    * kernel passes per chunk per round). The caller owns the cache:
    * unpersist after the round's checkpoints materialize (roundTags).
    * Returns (tagged-or-null, assigned(id,cluster,features),
    * leftover(id,features)).
    */
  private def tagAssign(points: DataFrame, ds: IndexedSeq[ClusterSummary],
                        alpha: Double): (DataFrame, DataFrame, DataFrame) = {
    if (ds.isEmpty)
      return (null,
        emptyAssignments(points.sparkSession, "cluster")
          .withColumn("features", lit(null).cast("array<double>")),
        points.select("id", "features"))
    val (label, keep) = nearestUnder(col("features"), ds, alpha)
    val tagged = points
      .select(col("id"), label.cast("int").as("cluster"),
        coalesce(keep, lit(false)).as("__keep"), col("features"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    (tagged,
      tagged.filter(col("__keep")).select(col("id"), col("cluster"), col("features")),
      tagged.filter(!col("__keep")).select("id", "features"))
  }

  /** J2/M5: nearest DS summary under α√d; returns (assigned(id,cluster),
    * leftover(id,features)).
    */
  def assignToDs(points: DataFrame, ds: IndexedSeq[ClusterSummary], alpha: Double): (DataFrame, DataFrame) = {
    val (a, r) = assignToDsWithFeatures(points, ds, alpha)
    (a.select("id", "cluster"), r)
  }

  /** assignToDs keeping the features on the assigned side — callers that
    * fold the matches into summaries (A4) read them directly instead of
    * re-joining the chunk on id (which would shuffle both sides once per
    * round).
    */
  def assignToDsWithFeatures(points: DataFrame, ds: IndexedSeq[ClusterSummary],
                             alpha: Double): (DataFrame, DataFrame) = {
    if (ds.isEmpty)
      return (emptyAssignments(points.sparkSession, "cluster")
        .withColumn("features", lit(null).cast("array<double>")),
        points.select("id", "features"))
    val (label, keep) = nearestUnder(col("features"), ds, alpha)
    // NULL keep (e.g. a dimension-mismatched vector -> NULL distance)
    // must route to RS, not silently satisfy neither filter
    val tagged = points.withColumn("__label", label)
      .withColumn("__keep", coalesce(keep, lit(false)))
    val a = tagged.filter(col("__keep"))
      .select(col("id"), col("__label").cast("int").as("cluster"), col("features"))
    val r = tagged.filter(!col("__keep")).select("id", "features")
    (a, r)
  }

  /** Fold newly matched points into their DS summaries (A4). */
  private[graft] def absorb(ds: IndexedSeq[ClusterSummary], labeled: DataFrame): IndexedSeq[ClusterSummary] =
    absorbCounted(ds, labeled)._1

  /** absorb + the number of points folded in, read off the same
    * aggregation (Σ delta.n) — callers needing the count save one job.
    */
  private[graft] def absorbCounted(ds: IndexedSeq[ClusterSummary],
                                   labeled: DataFrame): (IndexedSeq[ClusterSummary], Long) = {
    val deltas = summariesByLabel(labeled, "features")
    (ds.zipWithIndex.map { case (s, i) => deltas.get(i).map(s.merge).getOrElse(s) },
      deltas.values.map(_.n).sum)
  }

  /** Greedy CS pairwise merge: any pair with center-to-summary Mahalanobis
    * < 3√d merges (code/bfr.py:290-320; the reference's version compares
    * objects, not centers — fixed here). Returns (new summaries, old-index
    * → new-index remap for indices that changed).
    */
  def mergeCs(cs: IndexedSeq[ClusterSummary]): (IndexedSeq[ClusterSummary], Map[Int, Int]) = {
    if (cs.size < 2) return (cs, Map.empty)
    val d = cs.head.d
    val thr = 3.0 * math.sqrt(d.toDouble)
    val parent = Array.tabulate(cs.size)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    val work = scala.collection.mutable.ArrayBuffer(cs: _*)
    var merged = true
    while (merged) {
      merged = false
      var i = 0
      while (i < work.size && !merged) {
        var j = i + 1
        while (j < work.size && !merged) {
          val ri = find(i); val rj = find(j)
          if (ri != rj && work(ri).n > 0 && work(rj).n > 0 &&
              work(ri).mahalanobis(work(rj).center) < thr) {
            work(ri) = work(ri).merge(work(rj))
            work(rj) = ClusterSummary.zero(d)
            parent(rj) = ri
            merged = true
          }
          j += 1
        }
        i += 1
      }
    }
    val roots = (0 until cs.size).map(find)
    val alive = roots.distinct.sorted
    val newIdx = alive.zipWithIndex.toMap
    val out = alive.map(work(_)).toIndexedSeq
    val remap = (0 until cs.size).map(i => i -> newIdx(roots(i))).filter(p => p._1 != p._2).toMap
    (out, remap)
  }

  private def unionAssign(a: DataFrame, b: DataFrame): DataFrame = a.union(b)

  private def emptyAssignments(spark: SparkSession, valueCol: String): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("id", LongType), StructField(valueCol, IntegerType))))
  }

}
