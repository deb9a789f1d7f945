package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental near-dedup — the daily crawl-merge path. A production
  * 100 TB pipeline does NOT re-run connected components over the whole
  * corpus when a new crawl lands; it persists two artifacts per corpus —
  * the canonical mapping (doc_id → canonical_id) and the LSH band table —
  * and folds each new batch into them:
  *
  *   1. the EXISTING mapping collapses to star edges (member → canonical):
  *      one edge per already-grouped doc, reconstructing yesterday's
  *      components in a single CC round;
  *   2. the NEW batch's band rows join the merged band table, emitting
  *      only bucket collisions that TOUCH the batch (new×new and
  *      new×existing) — the base×base collisions are already encoded in
  *      the stars, so the delta graph is |canon| + |delta collisions|
  *      edges, not the corpus-quadratic candidate set;
  *   3. connected components run on that delta graph only.
  *
  * The result is provably identical to a full recompute: every full-corpus
  * collision pair {u,v} is either base×base (u,v connected through their
  * shared star) or touches the batch (emitted in step 2), and every delta
  * edge is a subset of the full collision graph — so the components, and
  * hence the min-id canonicals, coincide. `q_dedup_incremental` pins this
  * equivalence against the SAME DuckDB transitive-closure oracle as the
  * full-recompute `q_dedup_groups`.
  *
  * Scale shape: the band join carries the same skew guard as
  * [[graft.functions.TextOps.candidatePairs]] — bucket sizes are counted
  * on the merged band table, and oversized buckets (degenerate
  * empty/boilerplate shingles) emit hub stars instead of fanning the
  * batch row out to every bucket-mate. All corpus-scale joins are pinned
  * SHUFFLE_MERGE: both inputs are typically persisted/checkpointed
  * artifacts whose static size stats are guesses (the defect class the
  * 100× probe caught in pairOverlap).
  */
object IncrementalDedup {

  /** Fold a new batch into an existing canonical mapping.
    *
    * @param existingCanon (doc_id, canonical_id) — yesterday's mapping
    *                      (docs in no group may be absent or self-mapped)
    * @param newBands      LSH band rows (idCol, band, bucket) of the batch
    * @param allBands      band rows of the MERGED corpus (existing ∪ new)
    * @return (doc_id, canonical_id) for every doc in any group of the
    *         merged corpus — identical to a full recompute
    */
  def mergeBatch(existingCanon: DataFrame, newBands: DataFrame,
                 allBands: DataFrame, idCol: String,
                 hotThreshold: Int = graft.functions.TextOps.hotBucketThreshold)
      : DataFrame = {
    val stars = existingCanon
      .filter(col("doc_id") =!= col("canonical_id"))
      .select(col("doc_id").as("src"), col("canonical_id").as("dst"))

    // same skew guard as candidatePairs, on the MERGED bucket census
    // (the census definition is SHARED — TextOps.bucketCensus — so the
    // incremental ≡ full-recompute equivalence cannot drift): a batch
    // doc landing in a degenerate bucket must not fan out to every
    // member. Hot buckets connect all their members to the bucket hub
    // (component-preserving, linear); base-only hub edges are redundant
    // with the stars but harmless to CC.
    val sizes = graft.functions.TextOps.bucketCensus(allBands, idCol)
    val sizedNew = newBands.join(sizes.hint("shuffle_merge"), Seq("band", "bucket"))
    val coldNew = sizedNew.filter(col("__n") <= hotThreshold)
      .select(col("band"), col("bucket"), col(idCol))
    val coldPairs = coldNew.as("l")
      .join(allBands.hint("shuffle_merge").as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket")
          && col(s"l.$idCol") =!= col(s"r.$idCol"))
      .select(least(col(s"l.$idCol"), col(s"r.$idCol")).as("src"),
        greatest(col(s"l.$idCol"), col(s"r.$idCol")).as("dst"))
    val hotStars = allBands.join(sizes.hint("shuffle_merge"), Seq("band", "bucket"))
      .filter(col("__n") > hotThreshold && col(idCol) =!= col("__hub"))
      .select(col("__hub").as("src"), col(idCol).as("dst"))

    ConnectedComponents.run(stars.union(coldPairs).union(hotStars).distinct())
      .select(col("id").as("doc_id"), col("component").as("canonical_id"))
  }
}
