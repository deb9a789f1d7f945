package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Normalized mutual information of two labelings, the reference's
  * evaluation metric (get_nmi.py:22-47, delegated there to sklearn;
  * arithmetic-mean normalization, matching sklearn's default).
  *
  * Distributed shape: one inner equi-join on point id + one groupBy over
  * the (pred, truth) contingency table; the table itself (≤ Kp·Kt cells)
  * is collected and the entropy arithmetic runs on the driver.
  */
object Nmi {

  /** pred: (id, cluster); truth: (id, label). Label columns may be any
    * type — compared by string value.
    */
  def score(pred: DataFrame, truth: DataFrame): Double = {
    val p = pred.select(col(pred.columns(0)).cast("long").as("id"),
      col(pred.columns(1)).cast("string").as("yp"))
    val t = truth.select(col(truth.columns(0)).cast("long").as("id"),
      col(truth.columns(1)).cast("string").as("yt"))
    val cont = p.join(t, Seq("id")).groupBy("yp", "yt").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    if (cont.isEmpty) return 0.0
    val n = cont.map(_._2).sum.toDouble
    val byP = cont.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val byT = cont.groupBy(_._1._2).view.mapValues(_.map(_._2).sum).toMap
    def h(counts: Iterable[Long]): Double =
      -counts.filter(_ > 0).map { c => val q = c / n; q * math.log(q) }.sum
    val hp = h(byP.values)
    val ht = h(byT.values)
    val mi = cont.map { case ((a, b), c) =>
      if (c == 0) 0.0
      else (c / n) * math.log(c * n / (byP(a).toDouble * byT(b).toDouble))
    }.sum
    val denom = (hp + ht) / 2.0
    if (denom == 0.0) { if (mi == 0.0) 1.0 else 0.0 } else math.max(0.0, mi / denom)
  }
}
