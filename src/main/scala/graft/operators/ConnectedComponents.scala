package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components — the dedup clustering stage: near-dup candidate
  * PAIRS (from MinHash-LSH / SimHash / embedding buckets) become dedup
  * GROUPS, each keyed by its minimum member id (the canonical document).
  *
  * Algorithm: HASH-to-MIN (Rastogi et al., "Finding Connected Components
  * in Map-Reduce in Logarithmic Rounds", ICDE 2013). Each node keeps a
  * cluster C(v), initially {v} ∪ N(v); every round each cluster sends its
  * min to all members and all members to its min. Converges in O(log d)
  * rounds — plain min-label propagation is O(d), and real near-dup graphs
  * DO produce long sparse chains (a cos-threshold component measured
  * diameter ≈ 64 at sf0.1, i.e. 65 propagation rounds vs 10 here).
  *
  * Distributed shape: each round is one min-aggregate + one equi-join +
  * one distinct on the cluster-membership list, lineage cut by an eager
  * localCheckpoint. Intermediate state is bounded by Σ|component| + edge
  * list (the hub row fan-in at the component's min node is exactly the
  * output size). Termination is certified, not assumed: the loop exits
  * only when every edge's endpoints carry the same label — labels are
  * reachable mins, so label-equality across all edges proves every label
  * IS its component minimum (the min node labels itself, and the label is
  * constant on the component).
  *
  * Partition-sizing contract for dense-graph callers (same as
  * `TextOps.jaccardOverPairs`): the per-round join fans out
  * deg(v)·|cluster(v)| rows per vertex, so on clique-heavy graphs AQE's
  * input-byte coalescing re-merges partitions whose joined OUTPUT is a
  * multi-minute straggler task (measured 70-83 s at the 100× probe with
  * coalescing on vs 8-16 s off). Size partitions moderately on expected
  * output rows and park `spark.sql.adaptive.coalescePartitions.enabled`
  * around the call — `app.TextScaleBench.run` carries the measured
  * sweep.
  */
object ConnectedComponents {

  /** @param edges (src, dst) undirected pairs
    * @return (id, component) — component = min id reachable
    */
  /** Edge count below which the loop certifies EVERY round instead of
    * waiting for the label-sum quiescence heuristic. On bounded graphs
    * the round cost is pure job latency, and the heuristic needs two
    * extra rounds (one to repeat the sum, one certify) after convergence
    * — certify-per-round exits the planted bench graphs after round 1.
    * On corpus-scale graphs the certify join (2 × edges⋈labels) per
    * round would dominate, so past this bound the cheap sum heuristic
    * keeps gating it. Either mode exits ONLY through certify(), so the
    * result is identical — this is a latency/throughput switch, not a
    * semantics switch.
    */
  private val EagerCertifyEdges = 4L << 20

  /** Target rows per shuffle partition inside the CC loop (guide §2.2:
    * fewer, larger reduce partitions). Every round runs 3-4 shuffles
    * over O(Σ|component| + edges) rows; sizing the loop's shuffle width
    * from the EDGE count instead of the session default turns the
    * dozens of 32-partition micro-stages a bounded bench graph produces
    * (measured: the fixed per-stage cost made q_audio/video_dedup_groups
    * SLOWER at 32 cores than at 8 in round 14) into single-task stages,
    * while a corpus-scale graph still gets full cluster width.
    */
  private val RowsPerPartition = 64L << 10

  def run(edges: DataFrame, maxIter: Int = 100): DataFrame = {
    // materialize the (possibly expensive) pair pipeline ONCE before
    // symmetrizing — union's two branches would otherwise each re-run it
    val e = edges.toDF("src", "dst")
      .select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint(true)
    // symmetrize map-side from the checkpointed edge list; self-loops are
    // harmless. No second checkpoint: re-deriving the union per consumer
    // is two scans of a checkpointed RDD (no shuffle), cheaper than the
    // extra eager-checkpoint job it replaced.
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))

    // a clean corpus produces zero candidate pairs — short-circuit before
    // the loop (labelSum's global sum() is NULL on an empty label table);
    // the count doubles as the eager-certify census and the loop's
    // shuffle-width census
    val nEdges = e.count()
    if (nEdges == 0)
      return sym.select(col("src").as("id"), col("dst").as("component"))
    val eagerCertify = nEdges <= EagerCertifyEdges

    val spark = e.sparkSession
    val defaultPar = spark.sparkContext.defaultParallelism.toLong
    val loopPartitions =
      math.max(1L, math.min(defaultPar, nEdges / RowsPerPartition + 1)).toInt
    val prevShufflePartitions = spark.conf.get("spark.sql.shuffle.partitions")
    // On a bounded graph, AQE's per-shuffle re-planning splits every
    // round's action into several driver-latency-priced jobs for zero
    // benefit (single-digit-task stages, no size-misestimated join).
    // Data-adaptive like the width: corpus-scale graphs keep session AQE.
    val pauseAqe = nEdges <= (1L << 20)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")

    def labelsOf(state: DataFrame): DataFrame =
      state.groupBy(col("v")).agg(min(col("u")).as("component"))

    // heuristic quiescence trigger, NOT the exit condition: hash-to-min
    // does not keep v ∈ C(v), so a node's min can transiently rise and the
    // sum can fluctuate — an unchanged sum merely schedules the edge-scale
    // certify() below, which is the only thing that ends the loop
    def labelSum(state: DataFrame): Long =
      labelsOf(state).agg(sum(col("component"))).head().getLong(0)

    // exit is only legal when both endpoints of every edge agree — this
    // CERTIFIES the labelling (see scaladoc): silent wrong answers are
    // worse than failures, a component split across labels would make
    // dedup keep multiple "canonicals". A quiescent round that fails
    // certification (possible mid-convergence: state still moving while
    // labels pause) just keeps iterating.
    def certify(lbl: DataFrame): Boolean = sym
      .join(lbl.select(col("v").as("src"), col("component").as("la")), Seq("src"))
      .join(lbl.select(col("v").as("dst"), col("component").as("lb")), Seq("dst"))
      .filter(col("la") =!= col("lb"))
      .isEmpty

    // the width bound and the loop run under one try/finally so the
    // session conf is restored on every exit path; plans built inside
    // capture the bounded width at their own execution
    spark.conf.set("spark.sql.shuffle.partitions", loopPartitions)
    if (pauseAqe) spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // cluster membership (v, u): u ∈ C(v); init C(v) = {v} ∪ N(v).
      // Loop checkpoints are LAZY: the round's certify / labelSum action
      // materializes the round's state and cuts lineage in the same job —
      // the eager form paid one extra job per round just to checkpoint.
      var c = sym.select(col("src").as("v"), col("dst").as("u"))
        .union(sym.select(col("src").as("v"), col("src").as("u")))
        .distinct()
        .localCheckpoint(false)

      var prevSum = Option.empty[Long]
      var iter = 0
      var certified = false
      while (!certified && iter < maxIter) {
        val withMin = c.join(labelsOf(c).withColumnRenamed("component", "m"), Seq("v"))
        c = withMin.select(col("u").as("v"), col("m").as("u"))
          .union(withMin.select(col("m").as("v"), col("u")))
          .distinct()
          .localCheckpoint(false)
        if (eagerCertify) certified = certify(labelsOf(c))
        else {
          val s = labelSum(c)
          if (prevSum.contains(s)) certified = certify(labelsOf(c))
          prevSum = Some(s)
        }
        iter += 1
      }
      require(certified,
        s"connected components did not converge in $maxIter iterations")
      // materialize the certified labels BEFORE the width is restored, so
      // the consumer reads a checkpointed single-shuffle result instead of
      // re-running the final aggregation at session width
      labelsOf(c).select(col("v").as("id"), col("component"))
        .localCheckpoint(true)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShufflePartitions)
      if (pauseAqe) spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  /** Dedup grouping: pairs → (id, canonical_id); singletons (docs in no
    * pair) are absent, i.e. their canonical is themselves.
    */
  def canonicalize(pairs: DataFrame): DataFrame =
    run(pairs).select(col("id").as("doc_id"), col("component").as("canonical_id"))
}
