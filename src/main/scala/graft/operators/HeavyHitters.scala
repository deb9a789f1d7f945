package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitters sketch as a mergeable typed Aggregator —
  * the fixed-size scale path for "top words over 100 TB of text": the
  * exact `q_topk_by_count`/`q_zipf_rank` path shuffles the full
  * vocabulary; this sketch shuffles AT MOST `capacity` counters per
  * partition regardless of corpus size, and Catalyst plans it
  * partial+final like any aggregate (HashAggregate → Exchange of one
  * k-entry map per partition → merge).
  *
  * Deterministic guarantee (holds under ANY partitioning/merge order,
  * which is what the oracle-checked bound query pins): for every item,
  * `true_count − N/(capacity+1) ≤ estimate ≤ true_count` where N is the
  * stream length. Decrement steps: a miss on a full buffer decrements
  * every counter by 1 (classic MG); merging sums counters then subtracts
  * the (capacity+1)-th largest and drops non-positives (the mergeable-
  * summaries construction of Agarwal et al., PODS'12), which preserves
  * the same error bound additively.
  *
  * The raw estimates are merge-order-dependent (like the HLL/KLL
  * sketches, `q_approx_distinct`/`q_approx_quantiles`), so the
  * driver-visible surface is the bound query `q_heavy_hitters_bound` —
  * all-ones booleans that a broken sketch flips red.
  */
final case class MgSketch(items: Map[String, Long], n: Long)

class HeavyHitters(capacity: Int) extends Aggregator[String, MgSketch, MgSketch] {
  require(capacity > 0)

  override def zero: MgSketch = MgSketch(Map.empty, 0L)

  override def reduce(b: MgSketch, w: String): MgSketch = {
    val m = b.items
    val next =
      if (m.contains(w)) m.updated(w, m(w) + 1L)
      else if (m.size < capacity) m.updated(w, 1L)
      // full miss: the classic decrement-all (the new item's implicit 1
      // cancels with the global −1, so it is simply not inserted)
      else m.iterator.collect { case (k, c) if c > 1L => k -> (c - 1L) }.toMap
    MgSketch(next, b.n + 1L)
  }

  override def merge(b1: MgSketch, b2: MgSketch): MgSketch = {
    if (b1.items.isEmpty) return MgSketch(b2.items, b1.n + b2.n)
    if (b2.items.isEmpty) return MgSketch(b1.items, b1.n + b2.n)
    var m = b1.items
    b2.items.foreach { case (k, c) => m = m.updated(k, m.getOrElse(k, 0L) + c) }
    if (m.size > capacity) {
      // subtract the (capacity+1)-th largest count, drop non-positives —
      // at most `capacity` survivors by construction
      val d = m.valuesIterator.toArray.sorted(Ordering[Long].reverse)(capacity)
      m = m.iterator.collect { case (k, c) if c > d => k -> (c - d) }.toMap
    }
    MgSketch(m, b1.n + b2.n)
  }

  override def finish(r: MgSketch): MgSketch = r

  override def bufferEncoder: Encoder[MgSketch] = Encoders.product[MgSketch]
  override def outputEncoder: Encoder[MgSketch] = Encoders.product[MgSketch]
}

object HeavyHitters {
  /** Untyped aggregate: one MgSketch struct row (`items` map + `n`). */
  def sketch(item: Column, capacity: Int): Column =
    udaf(new HeavyHitters(capacity)).apply(item)
}
