package graft.kmeans

/** Skew-aware IVF codebook balancing — the round-9 vector probe's "next
  * pressure point": on clustered data a plain k-means coarse quantizer
  * leaves hot cells ~10× average occupancy, so probe-time candidate
  * volume (and the per-cell posting-list size a 100 TB layout would
  * bucket by) is skewed by the same factor.
  *
  * Fix: recursively SPLIT oversized cells. On the fit sample (the same
  * sample the quantizer trains on — driver-held model state), any cell
  * whose occupancy exceeds `capFactor ×` the original average is replaced
  * by the two children of a deterministic local 2-means over its members
  * (Lloyd refined from the robust MEDIAN-CUT init — see
  * [[medianCutInit]]; maximin init degenerates to one-outlier-per-split
  * peeling on blob-heavy cells); repeat (always splitting the
  * currently-largest oversized cell) until balanced or the center budget
  * is reached. Only the split cell's members are reassigned per step, so
  * the loop is O(splits · cellN · d) after one initial full assignment.
  *
  * The output is just a LARGER center list — the map-side argmin
  * assignment kernel, the probe-order computation, and the banded search
  * machinery are unchanged. Correctness is invariant by construction
  * (cells partition the space by nearest-center; splitting refines the
  * partition), only the occupancy distribution changes.
  */
object BalancedIvf {

  final case class SplitResult(centers: Array[Array[Double]], splits: Int,
                               capUsed: Long)

  private def sq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
    s
  }

  private def argMin(row: Array[Double],
                     centers: scala.collection.mutable.ArrayBuffer[Array[Double]],
                     among: Array[Int]): Int = {
    var bi = among(0); var bd = Double.MaxValue
    var j = 0
    while (j < among.length) {
      val c = among(j)
      val dd = sq(row, centers(c))
      if (dd < bd) { bd = dd; bi = c } // strict < = first-min wins
      j += 1
    }
    bi
  }

  /** Median-cut 2-means init for a cell split: rank the members along
    * the max-spread dimension (score n·Σx² − (Σx)², strict-> argmax ties
    * to the lowest dim; rank ties to the lower position = lower id) and
    * seed Lloyd with the means of the two rank halves. Both seeds are
    * INTERIOR and each starts with ~half the members — unlike maximin,
    * whose farthest-point second seed degenerates to peeling one outlier
    * per split on blob-heavy hot cells (observed: a 2000-member cell
    * kept 1722 members after the full 8-split budget under maximin;
    * under median-cut init the same cell balances to ~cap).
    */
  private def medianCutInit(sub: Array[Array[Double]]): Array[Array[Double]] = {
    val n = sub.length
    val d = sub(0).length
    var bestDim = 0; var bestV = Double.NegativeInfinity
    var j = 0
    while (j < d) {
      var s = 0.0; var ss = 0.0; var i = 0
      while (i < n) { val x = sub(i)(j); s += x; ss += x * x; i += 1 }
      val v = n * ss - s * s
      if (v > bestV) { bestV = v; bestDim = j } // strict > = lowest dim ties
      j += 1
    }
    val dim = bestDim
    val order = sub.indices.sortBy(i => (sub(i)(dim), i)).toArray
    val half = n / 2
    val mean = Array.fill(2)(new Array[Double](d))
    var i = 0
    while (i < n) {
      val side = if (i < half) 0 else 1
      val row = sub(order(i))
      var x = 0
      while (x < d) { mean(side)(x) += row(x); x += 1 }
      i += 1
    }
    var x = 0
    while (x < d) {
      mean(0)(x) /= half.max(1)
      mean(1)(x) /= (n - half)
      x += 1
    }
    mean
  }

  /** Balance `centers0` over the id-ordered sample `rows`. `capFactor` is
    * relative to the ORIGINAL average occupancy (rows / centers0.length);
    * `maxCenters` bounds codebook growth (splitting stops there even if
    * some cell is still above cap — reported via the occupancy the caller
    * can recheck).
    */
  def splitHotCells(rows: Array[Array[Double]],
                    centers0: Array[Array[Double]],
                    capFactor: Double = 2.0,
                    maxCenters: Int): SplitResult = {
    require(rows.nonEmpty && centers0.nonEmpty)
    val cap = math.max(1L, math.ceil(capFactor * rows.length.toDouble /
      centers0.length).toLong)
    val centers = scala.collection.mutable.ArrayBuffer(centers0.map(_.clone()): _*)

    // initial full assignment (first-min ties, matching the argmin kernel)
    val label = new Array[Int](rows.length)
    val all = Array.tabulate(centers.length)(identity)
    var i = 0
    while (i < rows.length) { label(i) = argMin(rows(i), centers, all); i += 1 }
    val members = scala.collection.mutable.Map[Int, scala.collection.mutable.ArrayBuffer[Int]]()
    i = 0
    while (i < rows.length) {
      members.getOrElseUpdate(label(i), scala.collection.mutable.ArrayBuffer()) += i
      i += 1
    }

    var splits = 0
    var continue = true
    // cells whose members are (near-)identical can't be split — freeze
    // them instead of burning the center budget on empty children
    val frozen = scala.collection.mutable.Set[Int]()
    while (continue && centers.length < maxCenters) {
      // largest oversized cell; ties to the lowest cell id (determinism)
      val over = members.iterator
        .filter { case (c, m) => m.length > cap && !frozen(c) }
      if (over.isEmpty) continue = false
      else {
        val (cell, mem) = members.iterator
          .filter { case (c, m) => m.length > cap && !frozen(c) }
          .maxBy { case (c, m) => (m.length.toLong, -c.toLong) }
        // deterministic 2-means over the members (id-ordered rows),
        // Lloyd-refined from the robust median-cut init
        val sub = mem.sortInPlace().map(rows(_)).toArray
        val twoMeans = KMeans.fitLocal(sub, k = 2, iters = 5, firstSeedRank = 0,
          initCenters = medianCutInit(sub))
        val childA = twoMeans.centers(0)
        val childB = twoMeans.centers(1)
        val newId = centers.length
        val keep = centers(cell)
        centers(cell) = childA
        centers += childB
        // reassign ONLY the split cell's members between the two children
        val memA = scala.collection.mutable.ArrayBuffer[Int]()
        val memB = scala.collection.mutable.ArrayBuffer[Int]()
        val pair = Array(cell, newId)
        mem.foreach { ri =>
          val a = argMin(rows(ri), centers, pair)
          if (a == cell) memA += ri else memB += ri
        }
        if (memA.isEmpty || memB.isEmpty) { // degenerate: revert + freeze
          centers.remove(newId)
          centers(cell) = keep
          frozen += cell
        } else {
          members(cell) = memA
          members(newId) = memB
          splits += 1
        }
      }
    }
    SplitResult(centers.map(_.clone()).toArray, splits, cap)
  }
}
