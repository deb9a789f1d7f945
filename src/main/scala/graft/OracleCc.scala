package graft

/** Shared DuckDB-oracle emitters for connected-components grouping:
  * UNROLLED pointer-jumping min-label rounds, replacing the classic
  * `reach` transitive-closure recursive CTE wherever the pair graph can
  * grow components whose closure is quadratic (Σ n_c² result rows —
  * the sf1 embedding graph's 18,990-vertex component made the closure
  * oracle unfinishable, and the sf10 text corpus's copies-sized cliques
  * have the same shape: 100-member groups → 10k closure rows each).
  * Each unrolled round is ONE |edges|-sized join:
  * lbl'(v) = min(lbl(lbl(v)), min over neighbours' lbl) — convergence
  * O(log n) in component size once label paths form.
  *
  * MATERIALIZED is load-bearing: DuckDB inlines plain CTEs PER
  * REFERENCE, and each round references its predecessor three times —
  * an un-materialized unroll re-expands the whole upstream chain
  * 3^rounds times (observed as "Too many open files" from the same
  * parquet scan planned 3^16 times).
  *
  * A non-converged unroll can only DIFFER from the engine's fixpoint CC
  * labels (labels are monotone decreasing, bounded below by the
  * component min), so under-unrolling could never silently pass — but
  * the emitted guard makes it LOUD: if any label still changed between
  * the last two rounds, the oracle raises `error('…under-unrolled…')`
  * naming the real cause instead of reading as a generic engine-CC
  * mismatch.
  */
private[graft] object OracleCc {

  /** The l0..lN round chain over a CTE `edges(src, dst)` that must
    * already be SYMMETRIZED (both directions present). l0 seeds each
    * vertex with min(self, neighbours); round t jumps through the
    * predecessor labels.
    */
  def rounds(n: Int, src: String, dst: String): String = {
    val l0 =
      s"l0 AS MATERIALIZED (SELECT $src AS v, least($src, min($dst)) AS lbl FROM edges GROUP BY $src)"
    val steps = (1 to n).map { t =>
      s"""l$t AS MATERIALIZED (
         |  SELECT e.$src AS v, least(min(lp.lbl), min(lu.lbl)) AS lbl
         |  FROM edges e
         |  JOIN l${t - 1} lu ON lu.v = e.$dst
         |  JOIN l${t - 1} lv ON lv.v = e.$src
         |  JOIN l${t - 1} lp ON lp.v = lv.lbl
         |  GROUP BY e.$src)""".stripMargin
    }
    (l0 +: steps).mkString(",\n")
  }

  /** Convergence guard: counts labels still changing between the last
    * two rounds. */
  def guard(n: Int): String =
    s"""cc_guard AS MATERIALIZED (
       |  SELECT count(*) AS changed
       |  FROM l$n a JOIN l${n - 1} b ON a.v = b.v
       |  WHERE a.lbl <> b.lbl)""".stripMargin

  private def labelExpr(n: Int): String =
    s"""CASE WHEN (SELECT changed FROM cc_guard) = 0 THEN lbl
       |       ELSE CAST(error('pointer-jump CC oracle under-unrolled: labels still changing at round $n — raise the round budget') AS BIGINT)
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
       |FROM l$n""".stripMargin

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
       |  FROM l$n)""".stripMargin

  /** Round budget for the TEXT tier's grouping oracles. Components here
    * are near-dup families: copies-sized cliques under the scale-up
    * generator (l0-convergent — every member adjoins the min) plus small
    * organic chains; 24 pointer-jump rounds covers a chain diameter no
    * text corpus has shown (the adversarial 42-round case was the sf0.1
    * EMBEDDING graph's 548-vertex chain, which keeps its own 64-round
    * budget in MlQueries), and the guard turns any future excess into a
    * named error rather than a hash mismatch.
    */
  val TextRounds = 24
}
