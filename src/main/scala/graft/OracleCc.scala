package graft

/** Shared DuckDB-oracle emitters for connected-components grouping:
  * UNROLLED min-label rounds over a CONTRACTING edge set, replacing the
  * classic `reach` transitive-closure recursive CTE wherever the pair
  * graph can grow components whose closure is quadratic (Σ n_c² result
  * rows — the sf1 embedding graph's 18,990-vertex component made the
  * closure oracle unfinishable, and the sf10 text corpus's copies-sized
  * cliques have the same shape: 100-member groups → 10k closure rows
  * each).
  *
  * WHY CONTRACTION (the sf10 lesson, round 11): the previous emitter ran
  * every round as one |edges|-sized three-way join. Each round's result
  * is tiny (one label per vertex), but DuckDB pins per-round pipeline
  * buffers of a materialized-CTE chain until the QUERY ends — measured
  * ~4 GB per 65M-edge round, so 24 unrolled rounds leaked ~100 GB and
  * the five text-tier grouping oracles OOM'd at sf10 (500k docs, 32.7M
  * pairs) even though any SINGLE round fit in 40 GB. The fix is the same
  * one the distributed engine uses: after seeding each vertex with
  * min(self, neighbours), CONTRACT — replace the edge set by its image
  * under the current labels, dropping loops. Cliques (the shape
  * copies-multiplied corpora actually produce) collapse to a point after
  * the seed round, so only THREE pipelines ever touch the full edge set
  * (symmetrize, seed, first contraction) and every later round runs on
  * the shrunken quotient graph. A dropped (loop) edge can never
  * reappear: once both endpoints share a label they share it forever
  * (labels only merge), so the quotient image stays exact.
  *
  * Each round keeps the pointer-jump term (lbl ← lbl(lbl(v)) composed
  * with the neighbour min) — on adversarially-ordered chains plain
  * propagation is diameter-bound, the jump restores O(log) once label
  * paths form; on the contracted graph the jump join is label-table
  * sized, i.e. negligible.
  *
  * MATERIALIZED is load-bearing: DuckDB inlines plain CTEs PER
  * REFERENCE, and each round references its predecessor several times —
  * an un-materialized unroll re-expands the whole upstream chain
  * exponentially (observed as "Too many open files" from the same
  * parquet scan planned 3^16 times).
  *
  * CERTIFIED TERMINATION, not just stability: the final contracted edge
  * set `cc_e{n}` is exactly the image of the ORIGINAL edge set under the
  * final labels, minus loops. If it is empty, every edge's endpoints
  * share a label — which proves each label is its component min (labels
  * are always component-member ids, the min vertex keeps its own id, and
  * a connected component whose labels are edge-wise equal is
  * label-constant). If it is NOT empty, the oracle raises
  * `error('…under-unrolled…')` naming the real cause instead of reading
  * as a generic engine-CC mismatch — identical in spirit to the engine's
  * `ConnectedComponents.certify()` exit condition.
  */
private[graft] object OracleCc {

  /** The contraction round chain over a CTE `edges($src, $dst)` that
    * must already be SYMMETRIZED (both directions present). Emits:
    *   cc_c0      — seed labels: lbl(v) = min(v, neighbours)
    *   cc_e0      — original edges contracted by cc_c0, loops dropped
    *   per round t = 1..n:
    *     cc_s$t   — seed on the contracted graph
    *     cc_j$t   — one pointer jump through cc_s$t
    *     cc_c$t   — full label map composed with this round's merges
    *     cc_e$t   — edge set contracted again, loops dropped
    * Final labels live in cc_c$n(v, lbl); convergence ⇔ cc_e$n empty.
    */
  def rounds(n: Int, src: String, dst: String): String = {
    val seed =
      s"""cc_c0 AS MATERIALIZED (
         |  SELECT $src AS v, least($src, min($dst)) AS lbl
         |  FROM edges GROUP BY $src),
         |cc_e0 AS MATERIALIZED (
         |  SELECT DISTINCT a.lbl AS s, b.lbl AS d
         |  FROM edges e
         |  JOIN cc_c0 a ON a.v = e.$src
         |  JOIN cc_c0 b ON b.v = e.$dst
         |  WHERE a.lbl <> b.lbl)""".stripMargin
    val steps = (1 to n).map { t =>
      s"""cc_s$t AS MATERIALIZED (
         |  SELECT s AS v, least(s, min(d)) AS lbl FROM cc_e${t - 1} GROUP BY s),
         |cc_j$t AS MATERIALIZED (
         |  SELECT a.v, least(a.lbl, coalesce(b.lbl, a.lbl)) AS lbl
         |  FROM cc_s$t a LEFT JOIN cc_s$t b ON b.v = a.lbl),
         |cc_c$t AS MATERIALIZED (
         |  SELECT c.v, coalesce(j.lbl, c.lbl) AS lbl
         |  FROM cc_c${t - 1} c LEFT JOIN cc_j$t j ON j.v = c.lbl),
         |cc_e$t AS MATERIALIZED (
         |  SELECT DISTINCT coalesce(ja.lbl, e.s) AS s, coalesce(jb.lbl, e.d) AS d
         |  FROM cc_e${t - 1} e
         |  LEFT JOIN cc_j$t ja ON ja.v = e.s
         |  LEFT JOIN cc_j$t jb ON jb.v = e.d
         |  WHERE coalesce(ja.lbl, e.s) <> coalesce(jb.lbl, e.d))""".stripMargin
    }
    (seed +: steps).mkString(",\n")
  }

  /** Convergence guard: the final contracted edge set must be empty —
    * i.e. every original edge's endpoints share a label. */
  def guard(n: Int): String =
    s"""cc_guard AS MATERIALIZED (
       |  SELECT count(*) AS changed FROM cc_e$n)""".stripMargin

  private def labelExpr(n: Int): String =
    s"""CASE WHEN (SELECT changed FROM cc_guard) = 0 THEN lbl
       |       ELSE CAST(error('pointer-jump CC oracle under-unrolled: contracted edges remain at round $n — raise the round budget') AS BIGINT)
       |  END""".stripMargin

  /** Final SELECT form (rounds + guard must precede it): one row per
    * grouped vertex, component-min label, loud on non-convergence.
    * `error()` is only evaluated on the non-converged branch (CASE
    * short-circuits it).
    */
  def guardedSelect(n: Int, idCol: String): String =
    s"""${guard(n)}
       |SELECT v AS $idCol,
       |  ${labelExpr(n)} AS canonical_id
       |FROM cc_c$n""".stripMargin

  /** The whole chain as CTEs ending in `canon(doc_id, canonical_id)` —
    * drop-in for oracles that previously built `canon` from a recursive
    * closure and keep consuming it downstream. Expects a CTE
    * `pairs(doc_a, doc_b)`; emits the symmetrized `edges` itself.
    */
  def canonFromPairs(n: Int): String =
    s"""edges AS MATERIALIZED (
       |  SELECT doc_a AS s, doc_b AS d FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |${rounds(n, "s", "d")},
       |${guard(n)},
       |canon AS (
       |  SELECT v AS doc_id,
       |    ${labelExpr(n)} AS canonical_id
       |  FROM cc_c$n)""".stripMargin

  /** Round budget for the TEXT tier's grouping oracles. With
    * contraction, rounds bound the label-node count of any surviving
    * component by at least halving per round once cliques collapse at
    * the seed; 24 covers quotient chains no text corpus has shown (the
    * adversarial 42-round propagation case was the PRE-contraction
    * recurrence on the sf0.1 embedding graph), and the guard turns any
    * future excess into a named error rather than a hash mismatch.
    */
  val TextRounds = 24
}
