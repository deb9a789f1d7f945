package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{HeavyHitters, MgSketch}

/** Misra–Gries sketch laws, exercised WITHOUT Spark so every
  * partitioning/merge order can be forced: the deterministic guarantee
  * `true − N/(cap+1) ≤ est ≤ true` must hold for every item under any
  * split of the stream and any merge tree — that is exactly what makes
  * the aggregator legal as a partial+final Spark aggregate (and as
  * incremental streaming state).
  */
class HeavyHittersSpec extends AnyFunSuite {

  private def runPartitioned(
      items: Seq[String], cap: Int, parts: Int, rng: Random): MgSketch = {
    val agg = new HeavyHitters(cap)
    val buckets = Array.fill(parts)(Vector.newBuilder[String])
    items.foreach(w => buckets(rng.nextInt(parts)) += w)
    val partials = buckets.toIndexedSeq
      .map(_.result().foldLeft(agg.zero)(agg.reduce))
    // random merge tree
    var queue = rng.shuffle(partials)
    while (queue.size > 1) {
      val merged = agg.merge(queue(0), queue(1))
      queue = rng.shuffle(queue.drop(2) :+ merged)
    }
    queue.head
  }

  test("MG bound holds for every item under random splits and merge orders") {
    val rng = new Random(7)
    for (trial <- 0 until 30) {
      // zipf-ish: item i drawn with weight 1/(i+1)
      val vocabN = 5 + rng.nextInt(40)
      val n = 200 + rng.nextInt(2000)
      val weights = Array.tabulate(vocabN)(i => 1.0 / (i + 1))
      val cum = weights.scanLeft(0.0)(_ + _).tail
      val total = cum.last
      val stream = Seq.fill(n) {
        val u = rng.nextDouble() * total
        s"w${cum.indexWhere(u <= _)}"
      }
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cap = 1 + rng.nextInt(vocabN + 5)
      val sk = runPartitioned(stream, cap, 1 + rng.nextInt(8), rng)
      assert(sk.n == n, s"trial $trial: stream length ${sk.n} != $n")
      assert(sk.items.size <= cap, s"trial $trial: ${sk.items.size} > cap $cap")
      val slack = n.toDouble / (cap + 1)
      (exact.keySet ++ sk.items.keySet).foreach { w =>
        val t = exact.getOrElse(w, 0L)
        val e = sk.items.getOrElse(w, 0L)
        assert(e <= t, s"trial $trial cap $cap: overcount $w est=$e true=$t")
        assert(t - e <= slack,
          s"trial $trial cap $cap: undercount $w est=$e true=$t slack=$slack")
      }
    }
  }

  test("MG is exact when capacity covers the vocabulary") {
    val rng = new Random(11)
    val stream = Seq.fill(3000)(s"w${rng.nextInt(20)}")
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sk = runPartitioned(stream, cap = 20, parts = 6, rng)
    assert(sk.items == exact)
  }
}
