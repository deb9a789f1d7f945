package graft

/** THE corpus-census knob table — every regime constant and pick rule
  * that adapts an operator's shape to the corpus size, defined ONCE and
  * read by both the engine paths and the DuckDB oracle emitters (which
  * inline these values into generated SQL, so an engine/oracle split is
  * structurally impossible).
  *
  * Why these exist at all — the repeated scale lesson (rounds 10–11,
  * once per tier): any operator that is "bounded per bucket/cell/band"
  * is only bounded if the bucket space grows with the corpus. A fixed
  * fingerprint width, cell count, or sample size makes occupancy grow
  * linearly with n and every "bounded" consumer quadratic. So each knob
  * is a function of an integer corpus census (a count both engines
  * compute identically), with three shared design rules:
  *
  *  1. **Powers of two only.** Thresholds and divisors are powers of
  *     two so `n / 2^j` is exact in binary floating point — the
  *     engine's and DuckDB's `ceil`/comparison agree for every count
  *     up to 2^53.
  *  2. **md5-derived selection, never strides.** Whenever a knob picks
  *     ROWS (sample members, seeds, salts), the pick is ranked by
  *     `md5(id-as-decimal-string)` — structured generators (strides,
  *     modulos) alias against structured ids; hit three separate times
  *     (LSH hyperplane lattice, banded widths, hot-bucket salts).
  *  3. **Regime-gated.** Below the threshold the legacy shape is served
  *     bit-identically (every certified SF stays green); the scale
  *     shape only engages above it.
  */
object Census {

  // -------------------------------------------------------------------
  // IVF coarse quantizer (MlQueries.ivfModel + IvfOracle)
  // -------------------------------------------------------------------

  /** Last corpus count served by the legacy k=8 maximin fit. */
  val IvfScaleN = 32768L

  /** Cell count of the legacy (n ≤ IvfScaleN) maximin fit. Single
    * source of truth: [[ivfKFor]], the MlQueries fit, the artifact
    * name, and the oracle's kregCte all reference this value — changing
    * it changes all four in lockstep.
    */
  val IvfLegacyK = 8

  /** Target mean cell occupancy in the census regime: k = ceil(n/1024)
    * keeps within-cell pairwise work (SemDeDup, self-kNN, probe
    * candidates) bounded as the corpus grows.
    */
  val IvfTargetCell = 1024L

  /** Census-k ceiling: the center matrix is a literal shipped to every
    * task (4096 × 64d ≈ 2 MB — always shippable); past the cap,
    * occupancy growth is absorbed by hot-cell splitting and the nprobe
    * dial, and `toInt` can never saturate.
    */
  val IvfKMax = 4096

  /** Driver-held training-sample bound for the quantizer fit: above
    * this count the fit sees only the `IvfSampleN` rows with the
    * smallest (md5(id), id), selected distributed via TakeOrdered —
    * driver bytes capped regardless of corpus size.
    */
  val IvfSampleN = 65536L

  /** Served cell count for a corpus of `n` vectors. */
  def ivfKFor(n: Long): Int =
    if (n <= IvfScaleN) IvfLegacyK
    else math.min(math.ceil(n.toDouble / IvfTargetCell.toDouble).toLong,
      IvfKMax.toLong).toInt

  // -------------------------------------------------------------------
  // Hyperplane (embedding) LSH — single-band and banded tiers
  // -------------------------------------------------------------------

  /** Single/banded hyperplane widths considered, narrowest first. */
  val BandedWidthRange: Range = 8 to 20

  /** Target mean bucket occupancy: width w serves while n ≤ 2·2^w. */
  val BandedTargetOcc = 2L

  /** Band count per width for the banded near-dup tier — grows with
    * width to hold the detection probability at the design point.
    */
  val BandedBandsForWidth: Map[Int, Int] =
    Map(8 -> 4, 9 -> 5, 10 -> 6, 11 -> 6, 12 -> 7, 13 -> 8, 14 -> 9,
      15 -> 10, 16 -> 11, 17 -> 13, 18 -> 14, 19 -> 16, 20 -> 18)

  /** Hyperplane count (bucket-key width) for a corpus of `n` vectors. */
  def bandedPlanesFor(n: Long): Int =
    BandedWidthRange.find(w => n <= (BandedTargetOcc << w))
      .getOrElse(BandedWidthRange.last)

  // -------------------------------------------------------------------
  // SimHash fingerprint width (TextQueries tier)
  // -------------------------------------------------------------------

  /** Last corpus count served by the 32-bit fingerprint: the hamming≤1
    * pairing buckets on 2^(W/2)-value half-bands, so W=32 saturates
    * past ~2·2^16 docs; W=64 holds occupancy ≤ 2 to ~8.6e9 docs. Bits
    * 0..31 are unchanged across the switch, so sub-threshold output is
    * bit-identical.
    */
  val SimhashWidthThreshold = 2L << 16

  /** Fingerprint width in bits for a corpus of `n` documents. */
  def simhashBitsFor(n: Long): Int =
    if (n <= SimhashWidthThreshold) 32 else 64

  // -------------------------------------------------------------------
  // MinHash-LSH recall evaluation (TextQueries.minhashRecall)
  // -------------------------------------------------------------------

  /** Largest corpus whose recall ground truth is the FULL exact
    * co-shingle pair relation. Shingles are copy-invariant under the
    * key-offset corpus scaling, so that relation grows ~copies² (hit
    * disk-full live at the 500k-doc r12 gate); above this count the
    * ground truth is restricted to pairs whose SMALLER member falls in
    * the md5-ranked stratum below — an unbiased exact-on-a-stratum
    * measurement of the same recall dial, certifiable at every SF.
    * sf1's 50k docs stay below the switch, so the standing sf ≤ 1
    * certifications are output-identical.
    */
  val RecallFullN = 1L << 16

  /** Stratum selectivity above [[RecallFullN]]: a pair enters the
    * ground truth iff its smaller doc_id's md5 bucket (first 4 hex
    * chars mod this) is 0 — the same deterministic hash-sample idiom as
    * q_hash_sample, never stride/modulo on raw ids.
    */
  val RecallStratumMod = 64

  // -------------------------------------------------------------------
  // Hot-bucket and broadcast guards (TextOps / SetSimJoin)
  // -------------------------------------------------------------------

  /** Bucket population above which MinHash-LSH candidate generation
    * switches the bucket to the salted block-grid (`hotComplete`) —
    * bounds the per-task pair fan-out a hub bucket would otherwise
    * produce while still emitting every declared pair.
    */
  val HotBucketThreshold = 256

  /** Widest vocabulary-frequency table still shipped as a broadcast in
    * SetSimJoin (~2²² (w,f) rows ≈ tens of MB). Above it — the crawl
    * regime where |vocab| is billions — the frequency join runs as a
    * plain shuffle equi-join on the already-co-keyed token column.
    */
  val BroadcastVocabMax = 1L << 22
}
