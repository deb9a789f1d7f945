package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the dedup
  * clustering stage: near-dup candidate PAIRS (from MinHash-LSH / SimHash
  * / embedding buckets) become dedup GROUPS, each keyed by its minimum
  * member id (the canonical document).
  *
  * Distributed shape: each iteration is one join + one min-aggregate on
  * the edge list (both sides partitioned by the join key); lineage is cut
  * per iteration with an eager localCheckpoint. Converges in O(diameter)
  * iterations — near-dup clusters are small and dense, so typically 2-3.
  */
object ConnectedComponents {

  /** @param edges (src, dst) undirected pairs
    * @return (id, component) — component = min id reachable
    */
  def run(edges: DataFrame, maxIter: Int = 100): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.toDF("src", "dst")
      .select(col("src").cast("long"), col("dst").cast("long"))
    // symmetrize once; self-loops are harmless
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)

    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)

    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // candidate label for each node: min over neighbours' labels and
      // own. The own-label branch carries the previous label in a second
      // column (null on neighbour rows, so min() recovers it exactly —
      // each id has one own row), which folds the convergence check into
      // the same join+aggregate: `changed` is a plain filter-count over
      // the checkpointed result, not a second join against the old labels.
      val viaNeighbour = sym
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .select(col("src").as("id"), col("component"),
          lit(null).cast("long").as("own"))
      val own = labels.select(col("id"), col("component"),
        col("component").as("own"))
      val next = viaNeighbour.union(own)
        .groupBy(col("id")).agg(min(col("component")).as("component"),
          min(col("own")).as("own"))
        .localCheckpoint(true)
      // labels only shrink, so changed ⇔ component < previous label
      changed = next.filter(col("component") < col("own")).count()
      labels = next.select(col("id"), col("component"))
      iter += 1
    }
    // silent wrong answers are worse than failures: a component split
    // across labels would make dedup keep multiple "canonicals"
    require(changed == 0,
      s"connected components did not converge in $maxIter iterations")
    labels
  }

  /** Dedup grouping: pairs → (id, canonical_id); singletons (docs in no
    * pair) are absent, i.e. their canonical is themselves.
    */
  def canonicalize(pairs: DataFrame): DataFrame =
    run(pairs).select(col("id").as("doc_id"), col("component").as("canonical_id"))
}
