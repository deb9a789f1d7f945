package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.ClusterSummary

/** Monoid laws and closed-form checks for the BFR sufficient statistics
  * (FIXTURES.md §4; reference semantics code/bfr.py:142-188). Seeded
  * random trials stand in for property tests (scalatestplus is not in
  * the offline cache).
  */
class SummarySpec extends AnyFunSuite {

  val dim = 4
  val rnd = new scala.util.Random(7L)

  def vec(): Array[Double] = Array.fill(dim)(rnd.nextDouble() * 200.0 - 100.0)
  def summary(): ClusterSummary =
    (0 until (1 + rnd.nextInt(50))).foldLeft(ClusterSummary.zero(dim))((s, _) => s.add(vec()))

  def approxEq(a: Array[Double], b: Array[Double], tol: Double = 1e-9): Boolean =
    a.length == b.length && a.zip(b).forall { case (x, y) => math.abs(x - y) <= tol * (1 + math.abs(x)) }

  test("merge is associative") {
    for (_ <- 1 to 100) {
      val (a, b, c) = (summary(), summary(), summary())
      val l = a.merge(b).merge(c)
      val r = a.merge(b.merge(c))
      assert(l.n == r.n && approxEq(l.sum, r.sum) && approxEq(l.sumsq, r.sumsq))
    }
  }

  test("merge is commutative") {
    for (_ <- 1 to 100) {
      val (a, b) = (summary(), summary())
      val l = a.merge(b); val r = b.merge(a)
      assert(l.n == r.n && approxEq(l.sum, r.sum) && approxEq(l.sumsq, r.sumsq))
    }
  }

  test("zero is identity") {
    for (_ <- 1 to 100) {
      val a = summary()
      val l = a.merge(ClusterSummary.zero(dim))
      val r = ClusterSummary.zero(dim).merge(a)
      assert(l.n == a.n && approxEq(l.sum, a.sum))
      assert(r.n == a.n && approxEq(r.sum, a.sum))
    }
  }

  test("add matches ofPoint merge") {
    for (_ <- 1 to 100) {
      val (s, p) = (summary(), vec())
      val viaAdd = s.add(p)
      val viaMerge = s.merge(ClusterSummary.ofPoint(p))
      assert(viaAdd.n == viaMerge.n && approxEq(viaAdd.sum, viaMerge.sum)
        && approxEq(viaAdd.sumsq, viaMerge.sumsq))
    }
  }

  test("center and std match closed form (code/bfr.py:156-160)") {
    for (_ <- 1 to 50) {
      val pts = Seq.fill(20)(vec())
      val s = pts.foldLeft(ClusterSummary.zero(dim))((acc, p) => acc.add(p))
      val n = pts.size.toDouble
      val mean = (0 until dim).map(i => pts.map(_(i)).sum / n)
      val variance = (0 until dim).map(i => pts.map(p => math.pow(p(i) - mean(i), 2)).sum / n)
      assert(approxEq(s.center, mean.toArray, 1e-8))
      assert(approxEq(s.std, variance.map(math.sqrt).toArray, 1e-6))
    }
  }

  test("mahalanobis skips zero-std dimensions (code/bfr.py:124-125)") {
    // all points identical in dim 0 -> std(0)=0 -> dim 0 contributes nothing
    val pts = Seq(Array(5.0, 1.0), Array(5.0, 3.0), Array(5.0, 5.0))
    val s = pts.foldLeft(ClusterSummary.zero(2))((acc, p) => acc.add(p))
    val d = s.mahalanobis(Array(999.0, 3.0))
    assert(d == 0.0, s"zero-std dim should be skipped and dim-1 diff is 0: got $d")
  }
}
