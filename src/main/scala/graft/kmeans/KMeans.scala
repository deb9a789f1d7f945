package graft.kmeans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.ClusterSummary
import graft.functions.VectorFunctions._
import graft.operators.SummaryAggregator

/** Distributed, deterministic K-Means: farthest-first (maximin) seeding +
  * fixed-iteration Lloyd, re-expressing the reference's `HCluster`
  * (seeding code/bfr.py:18-40; Lloyd code/bfr.py:60-90 — 5 iterations, no
  * convergence test, empty clusters keep their old center,
  * code/bfr.py:46-58).
  *
  * Execution shape: the model side (K centers) is always a broadcast-sized
  * literal folded into the assignment expression, so assignment is
  * map-side only — the point side never shuffles. The update step is a
  * partial+final aggregation over K groups (SummaryAggregator). Per Lloyd
  * iteration exactly one job runs, collecting K summaries to the driver.
  *
  * Determinism: the first seed is the minimum-id point (the reference uses
  * `random.randint`, code/bfr.py:21 — we pin it for reproducible tests);
  * ties in argmin/argmax break toward the lower index / lower id,
  * matching the reference's strict `<` first-minimum scan
  * (code/bfr.py:73-76).
  */
object KMeans {

  final case class Model(centers: Array[Array[Double]]) {
    def k: Int = centers.length
    def d: Int = centers.headOption.map(_.length).getOrElse(0)

    /** Literal array<array<double>> of the centers. */
    private def centersLit: Column = array(centers.map(c => lit(c)): _*)

    /** Squared distance of `features` to each center, as array<double>. */
    def distances(features: Column): Column =
      transform(centersLit, c => sqDist(features, c))

    /** Argmin label (first minimum wins — ties to the lowest cluster id). */
    def labelFor(features: Column): Column = {
      val dists = distances(features)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }

    /** Append `label` (and optionally `dist2`, the squared distance to the
      * chosen center) to `df`.
      */
    def assign(df: DataFrame, featCol: String, withDist: Boolean = false): DataFrame = {
      val dists = distances(col(featCol))
      val out = df.withColumn("label",
        (array_position(dists, array_min(dists)) - 1).cast("int"))
      if (withDist) out.withColumn("dist2", array_min(dists)) else out
    }

    /** Inertia / SSE: Σ min-squared-distance (code/test_sklearn.py:50-56). */
    def inertia(df: DataFrame, featCol: String): Double =
      df.select(sum(array_min(distances(col(featCol)))).as("sse"))
        .head().getDouble(0)
  }

  /** Multi-seed restart (M3, code/test_sklearn.py:114-129): run
    * seed+Lloyd `numSeeds` times from distinct deterministic starting
    * points (the s-th smallest id seeds restart s) and keep the model
    * with the lowest inertia.
    */
  def fitMultiSeed(points: DataFrame, k: Int, numSeeds: Int, iters: Int = 5,
                   featCol: String = "features", idCol: String = "id"): Model = {
    val cached = points.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val models = (0 until numSeeds).map { s =>
        val m = fit(cached, k, iters, featCol, idCol, firstSeedRank = s)
        m -> m.inertia(cached, featCol)
      }
      models.minBy(_._2)._1
    } finally cached.unpersist(false)
  }

  /** Farthest-first (maximin) seeding, distributed: maintain per-point
    * min-squared-distance to the chosen seeds and pick the argmax each
    * round. K driver actions over a cached projection of the sample.
    * `firstSeedRank` picks the (rank+1)-th smallest id as the first seed
    * (deterministic analog of the reference's random start,
    * code/bfr.py:21).
    */
  def seed(points: DataFrame, k: Int, featCol: String, idCol: String,
           firstSeedRank: Int = 0): Array[Array[Double]] = {
    val proj = points.select(col(idCol).cast("long").as("__id"), col(featCol).as("__f"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val first = proj.orderBy(col("__id")).select("__f")
        .limit(firstSeedRank + 1).collect().last
        .getSeq[Double](0).toArray
      val seeds = scala.collection.mutable.ArrayBuffer[Array[Double]](first)
      var minD = proj.withColumn("__mind", sqDist(col("__f"), lit(first)))
        .persist(StorageLevel.MEMORY_AND_DISK)
      var i = 1
      while (i < k) {
        // argmax of min-distance; ties break to the lowest id for determinism
        val next = minD.orderBy(col("__mind").desc, col("__id"))
          .select("__f").head().getSeq[Double](0).toArray
        seeds += next
        val upd = minD.withColumn("__mind",
          least(col("__mind"), sqDist(col("__f"), lit(next))))
          .persist(StorageLevel.MEMORY_AND_DISK)
        upd.count()
        minD.unpersist(false)
        minD = upd
        i += 1
      }
      minD.unpersist(false)
      seeds.toArray
    } finally proj.unpersist(false)
  }

  /** Fixed-iteration Lloyd. Empty clusters keep their previous center
    * (code/bfr.py:52-57).
    */
  def fit(points: DataFrame, k: Int, iters: Int = 5,
          featCol: String = "features", idCol: String = "id",
          firstSeedRank: Int = 0): Model = {
    val cached = points.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val n = cached.count()
      require(n > 0, "KMeans.fit on empty input")
      val kEff = math.min(k.toLong, n).toInt
      var centers = seed(cached, kEff, featCol, idCol, firstSeedRank)
      var it = 0
      while (it < iters) {
        val model = Model(centers)
        val sums = model.assign(cached, featCol)
          .groupBy(col("label"))
          .agg(SummaryAggregator.summarize(col(featCol)).as("s"))
          .collect()
        val next = centers.clone()
        sums.foreach { row =>
          val label = row.getInt(0)
          val s = row.getStruct(1)
          val n = s.getLong(0)
          if (n > 0) {
            val sum = s.getSeq[Double](1).toArray
            next(label) = sum.map(_ / n)
          }
        }
        centers = next
        it += 1
      }
      Model(centers)
    } finally cached.unpersist(false)
  }

  /** Cluster and return per-cluster sufficient statistics keyed by label. */
  def summaries(points: DataFrame, model: Model, featCol: String = "features"): Map[Int, ClusterSummary] =
    model.assign(points, featCol)
      .groupBy(col("label"))
      .agg(SummaryAggregator.summarize(col(featCol)).as("s"))
      .collect()
      .map { row =>
        val s = row.getStruct(1)
        row.getInt(0) -> ClusterSummary(s.getLong(0), s.getSeq[Double](1).toArray, s.getSeq[Double](2).toArray)
      }.toMap
}
