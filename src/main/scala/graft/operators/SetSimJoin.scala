package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact Jaccard-threshold set-similarity self-join (AllPairs/PPJoin
  * family) — lossless, unlike the MinHash tier's probabilistic recall:
  * tokens are ordered rarest-first by global frequency and two sets with
  * Jaccard ≥ t must share a token within each other's first
  * |x| − ⌈t·|x|⌉ + 1 rarest tokens (pigeonhole), so candidates come from
  * an equi-join on PREFIX tokens only. Prefixes are the rarest tokens,
  * so bucket fan-in is small by construction — the frequency ordering IS
  * the skew guard.
  *
  * The VERIFY stage adapts to the vocabulary, because the two regimes
  * fail differently:
  *  - large sparse vocabulary (the 100 TB crawl case): the prefix filter
  *    prunes hard, candidates are few — verify by sorted-array
  *    intersection over the candidate pairs;
  *  - small dense vocabulary (≤ 64·`maskWords` distinct tokens): the
  *    prefix filter degenerates (every doc shares rare tokens) and the
  *    candidate set approaches all-pairs — exactly then, every token set
  *    fits a fixed-width BITMASK of vocabulary ranks, so the verify is
  *    popcount(maskA & maskB) over longs instead of shipping token
  *    arrays through the merge join (measured 46 s → array payloads were
  *    the entire cost at sf0.1's 31-word corpus).
  * Both paths produce identical exact results (equivalence unit-tested;
  * the dense path is what the DuckDB oracle gate exercises).
  */
object SetSimJoin {

  /** Widest vocabulary-frequency table still shipped as a broadcast:
    * ~2²² (w, f) rows ≈ tens of MB serialized. Above it — the 100 TB
    * crawl regime, where |vocab| is billions — the frequency join runs
    * as a plain shuffle equi-join instead: `dw` and `freq` are both
    * keyed on `w`, so the join is already co-partitioned after one
    * hash exchange, and a billion-row broadcast would OOM the driver
    * long before the prefix filter gets to prune anything.
    */
  val BroadcastVocabMax: Long = graft.Census.BroadcastVocabMax

  /** @param tokens (id, token) distinct pairs
    * @return (doc_a, doc_b, ni, jacc_micro) for all pairs with
    *         exact Jaccard ≥ t
    */
  /** @param aBound when set, emit ONLY pairs whose smaller id
    *   (`doc_a`) is below the bound — the bounded-stratum build: the
    *   doc_a side of the pair join is restricted BEFORE pairing, so
    *   candidate volume is O(bound × n) instead of O(n²) while the
    *   frequency census, rarest-first ordering and verify stay
    *   corpus-wide (results ≡ `selfJoin(...).filter(doc_a < bound)`,
    *   unit-tested). This is how a row-level certification stratum is
    *   carved out of a relation whose FULL materialization is
    *   quadratic by declared semantics — filtering a materialized
    *   full relation instead would rebuild exactly the blow-up the
    *   stratum exists to avoid (caught live at the 500k-doc gate:
    *   ~2e10-row checkpoint, 52 GB of block-manager spill before the
    *   kill).
    */
  def selfJoin(tokens: DataFrame, idCol: String, tokCol: String,
               t: Double, maskWords: Int = 64,
               broadcastVocabMax: Long = BroadcastVocabMax,
               aBound: Option[Long] = None): DataFrame = {
    val dw = tokens.select(col(idCol).as("doc_id"), col(tokCol).as("w"))
    val freq = dw.groupBy(col("w")).agg(count(lit(1)).as("f"))
    val vocabN = freq.count() // bounded driver-side scalar, like kth-select
    // census-gated shipping strategy for the frequency table (results
    // identical either way — only the physical join changes)
    def withFreq(d: DataFrame): DataFrame =
      if (vocabN <= broadcastVocabMax) d.join(broadcast(freq), Seq("w"))
      else d.join(freq.hint("shuffle_hash"), Seq("w"))

    // rarest-first order key packed into a sortable string, so the
    // per-doc ordering is a document-local array sort — no window
    val ordered = withFreq(dw)
      .select(col("doc_id"),
        concat(lpad(col("f").cast("string"), 9, "0"), lit(":"), col("w")).as("k"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("k"))).as("toks"))
      .select(col("doc_id"), transform(col("toks"),
        k => substring_index(k, ":", -1)).as("toks"))
      .localCheckpoint(true)

    val sized = ordered.select(col("doc_id"), col("toks"),
      size(col("toks")).as("n"),
      (size(col("toks")) - ceil(size(col("toks")) * t) + 1).cast("int").as("plen"))
    val prefix = sized.select(col("doc_id"),
      explode(slice(col("toks"), lit(1), col("plen"))).as("w"))

    val verified =
      if (vocabN <= 64L * maskWords) {
        // dense path: per-doc fixed-width rank bitmask rides ON the
        // prefix rows, so pairing computes popcount(maskA & maskB)
        // per candidate ROW and one (doc_a, doc_b) aggregate collapses
        // duplicate prefix collisions — no candidate distinct, no
        // pair-level mask lookups (both were the measured cost: token
        // arrays / extra merge joins on the near-all-pairs candidate
        // set this regime produces)
        val k = ((vocabN + 63) / 64).toInt
        val ranked = freq
          .withColumn("r", (row_number().over(
            Window.orderBy(col("f"), col("w"))) - 1).cast("int"))
          .select(col("w"), col("r"))
        val masks = dw.join(broadcast(ranked), Seq("w"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n"),
            array((0 until k).map(i =>
              coalesce(bit_or(when(floor(col("r") / 64) === i,
                expr("shiftleft(1L, r % 64)"))), lit(0L))): _*)
              .as("mask"))
          .select(col("doc_id"), col("n"), col("mask"))
        // prefix rows carry the shared token's RANK so pair dedup is the
        // classic leftmost-match filter — a pair sharing m prefix tokens
        // appears m times in the join, and exactly one row has NO
        // shared token of smaller rank: popcount(ma & mb & bitsBelow(r))
        // == 0. A per-row codegen predicate, replacing a near-all-pairs
        // groupBy that measured 26 of the 30 s at sf0.1's dense corpus.
        val pm = prefix.join(broadcast(ranked), Seq("w"))
          .join(masks, Seq("doc_id")).localCheckpoint(true)
        val ni = (0 until k).map(i =>
          bit_count(element_at(col("ma"), i + 1)
            .bitwiseAND(element_at(col("mb"), i + 1))).cast("long"))
          .reduce(_ + _)
        // low (r % 64) bits of word i: ~(-1L << s), NOT (1L << s) - 1 —
        // at s = 63 the latter is Long.MinValue - 1, an ANSI-mode
        // ARITHMETIC_OVERFLOW. Latent until the vocabulary's rank space
        // crosses 64 (first hit: the 100× corpus's copymark tokens
        // pushed the dense vocab from 31 to 130).
        def bitsBelow(i: Int): Column =
          when(lit(i) < floor(col("r") / 64), lit(-1L))
            .when(lit(i) === floor(col("r") / 64),
              expr("~shiftleft(-1L, r % 64)"))
            .otherwise(lit(0L))
        val sharedBelow = (0 until k).map(i =>
          bit_count(element_at(col("ma"), i + 1)
            .bitwiseAND(element_at(col("mb"), i + 1))
            .bitwiseAND(bitsBelow(i))).cast("long"))
          .reduce(_ + _)
        val pmA = aBound.map(b => pm.filter(col("doc_id") < b)).getOrElse(pm)
        pmA.select(col("doc_id").as("doc_a"), col("n").as("na"),
            col("mask").as("ma"), col("w"), col("r")).hint("shuffle_merge")
          .join(pm.select(col("doc_id").as("doc_b"), col("n").as("nb"),
            col("mask").as("mb"), col("w")).hint("shuffle_merge"), Seq("w"))
          .filter(col("doc_a") < col("doc_b"))
          .filter(sharedBelow === 0L)
          .select(col("doc_a"), col("doc_b"), ni.as("ni"),
            col("na").cast("long").as("na"), col("nb").cast("long").as("nb"))
      } else {
        // sparse path: the prefix filter prunes hard here, so the
        // candidate set is small — distinct it, then verify by
        // sorted-array intersection
        val prefA = aBound.map(b => prefix.filter(col("doc_id") < b)).getOrElse(prefix)
        val cand = prefA.select(col("doc_id").as("doc_a"), col("w"))
          .hint("shuffle_merge")
          .join(prefix.select(col("doc_id").as("doc_b"), col("w"))
            .hint("shuffle_merge"), Seq("w"))
          .filter(col("doc_a") < col("doc_b"))
          .select(col("doc_a"), col("doc_b")).distinct()
        cand
          .join(ordered.select(col("doc_id").as("doc_a"), col("toks").as("ta"))
            .hint("shuffle_merge"), Seq("doc_a"))
          .join(ordered.select(col("doc_id").as("doc_b"), col("toks").as("tb"))
            .hint("shuffle_merge"), Seq("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            size(array_intersect(col("ta"), col("tb"))).cast("long").as("ni"),
            size(col("ta")).cast("long").as("na"),
            size(col("tb")).cast("long").as("nb"))
      }

    verified
      .withColumn("jacc_micro",
        floor(lit(1e6) * col("ni") / (col("na") + col("nb") - col("ni")))
          .cast("long"))
      .filter(col("ni").cast("double") >= lit(t) * (col("na") + col("nb") - col("ni")))
      .select(col("doc_a"), col("doc_b"), col("ni"), col("jacc_micro"))
  }
}
