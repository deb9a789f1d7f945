package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kmeans.{BalancedIvf, KMeans}

/** Unit gate for the skew-aware IVF codebook balancer. */
class BalancedIvfSpec extends AnyFunSuite {

  private def occupancy(rows: Array[Array[Double]],
                        centers: Array[Array[Double]]): Map[Int, Int] = {
    def sq(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    rows.map { r =>
      centers.zipWithIndex.minBy { case (c, j) => (sq(r, c), j) }._2
    }.groupBy(identity).map { case (k, v) => k -> v.length }
  }

  // deterministic skewed fixture: 700 points in a tight blob, 300 spread
  private def skewedRows: Array[Array[Double]] = {
    def h(i: Int, j: Int): Double = (((i * 2654435761L + j * 40503L) >>> 16) %
      1000L).toDouble / 1000.0
    val blob = Array.tabulate(700)(i => Array(h(i, 0) * 0.05, h(i, 1) * 0.05))
    val spread = Array.tabulate(300)(i =>
      Array(2.0 + h(i + 700, 0) * 8.0, 2.0 + h(i + 700, 1) * 8.0))
    blob ++ spread
  }

  test("splitting bounds hot-cell occupancy at the cap") {
    val rows = skewedRows
    val base = KMeans.fitLocal(rows, k = 8, iters = 5, firstSeedRank = 0)
    val occ0 = occupancy(rows, base.centers)
    val r = BalancedIvf.splitHotCells(rows, base.centers,
      capFactor = 1.5, maxCenters = 64)
    assert(r.splits > 0, s"expected splits on a skewed fixture, occ0=$occ0")
    val occ1 = occupancy(rows, r.centers)
    assert(occ1.values.max <= r.capUsed,
      s"cap=${r.capUsed} but occupancy=${occ1.values.max}")
    // all points still covered, center count within budget
    assert(occ1.values.sum == rows.length)
    assert(r.centers.length <= 64 && r.centers.length > base.centers.length)
  }

  test("median-cut init splits a blob-heavy cell instead of peeling outliers") {
    // one dominant blob (moderate internal spread) + a sparse halo: under
    // maximin-seeded 2-means the second seed lands on a halo outlier and
    // each split peels ~1 point (observed live: a 2000-member cell kept
    // 1722 members after the full split budget); median-cut init halves
    // the blob, so a small budget reaches the cap
    def h(i: Int, j: Int): Double = (((i * 2654435761L + j * 40503L) >>> 16) %
      1000L).toDouble / 1000.0
    val blob = Array.tabulate(900)(i => Array(h(i, 0) * 2.0, h(i, 1) * 2.0))
    val halo = Array.tabulate(100)(i =>
      Array(20.0 + h(i + 900, 0) * 40.0, 20.0 + h(i + 900, 1) * 40.0))
    val rows = blob ++ halo
    val base = KMeans.fitLocal(rows, k = 4, iters = 5, firstSeedRank = 0)
    val r = BalancedIvf.splitHotCells(rows, base.centers,
      capFactor = 2.0, maxCenters = 4 + 8)
    val occ = occupancy(rows, r.centers)
    assert(occ.values.max <= r.capUsed,
      s"cap=${r.capUsed} but max occupancy=${occ.values.max} " +
        s"(splits=${r.splits}, occ=$occ)")
    assert(occ.values.sum == rows.length)
  }

  test("balancing is deterministic") {
    val rows = skewedRows
    val base = KMeans.fitLocal(rows, k = 4, iters = 5, firstSeedRank = 0)
    val a = BalancedIvf.splitHotCells(rows, base.centers, 2.0, 32)
    val b = BalancedIvf.splitHotCells(rows, base.centers, 2.0, 32)
    assert(a.centers.map(_.toSeq).toSeq == b.centers.map(_.toSeq).toSeq)
    assert(a.splits == b.splits)
  }

  test("identical points freeze instead of looping or burning the budget") {
    val rows = Array.fill(100)(Array(1.0, 2.0))
    val centers = Array(Array(1.0, 2.0), Array(50.0, 50.0))
    val r = BalancedIvf.splitHotCells(rows, centers, 1.0, maxCenters = 16)
    assert(r.splits == 0)
    assert(r.centers.length == 2)
    assert(r.centers.map(_.toSeq).toSeq == centers.map(_.toSeq).toSeq)
  }

  test("already-balanced codebook is returned unchanged") {
    val rows = Array.tabulate(100)(i => Array(i.toDouble, 0.0))
    val base = KMeans.fitLocal(rows, k = 4, iters = 5, firstSeedRank = 0)
    val occ = occupancy(rows, base.centers)
    val cf = 4.0 // cap = 100 — nothing exceeds it
    val r = BalancedIvf.splitHotCells(rows, base.centers, cf, 32)
    assert(r.splits == 0)
    assert(r.centers.map(_.toSeq).toSeq == base.centers.map(_.toSeq).toSeq)
    assert(occ.values.sum == 100)
  }
}
