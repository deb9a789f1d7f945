package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the OLAP surface — cross-checks the oracle
  * suite with relationships the hash compare can't express (subtotal
  * consistency, set-partition laws, frame edge cases, sketch accuracy).
  */
class OlapQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("rollup: subtotals fold upward consistently") {
    val rows = run("q_rollup").collect()
    val total = rows.filter(_.getAs[Long]("gid") == 3L)
    assert(total.length == 1)
    val detail = rows.filter(_.getAs[Long]("gid") == 0L).map(_.getAs[Long]("cnt")).sum
    val byStatus = rows.filter(_.getAs[Long]("gid") == 1L).map(_.getAs[Long]("cnt")).sum
    assert(detail == total.head.getAs[Long]("cnt"))
    assert(byStatus == total.head.getAs[Long]("cnt"))
  }

  test("cube: contains all four grouping combinations") {
    val gids = run("q_cube").collect().map(_.getAs[Long]("gid")).toSet
    assert(gids == Set(0L, 1L, 2L, 3L))
  }

  test("grouping sets: exactly the two requested sets, no grand total") {
    val gids = run("q_grouping_sets").collect().map(_.getAs[Long]("gid")).toSet
    assert(gids == Set(1L, 2L))
  }

  test("pivot row sums equal per-user event counts") {
    val pivoted = run("q_pivot")
    val sumCols = pivoted.columns.filter(_.startsWith("n_"))
      .map(c => col(c)).reduce(_ + _)
    val viaPivot = pivoted.select(col("user_id"), sumCols.as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = Queries.events(spark, sf).groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaPivot == direct)
  }

  test("full outer join covers the union of both key sets") {
    val keys = run("q_full_outer_join").select("key")
      .collect().map(_.getLong(0)).toSet
    val userIds = Queries.events(spark, sf).select("user_id")
      .distinct().collect().map(_.getLong(0)).toSet
    val custkeys = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    assert(keys == (userIds ++ custkeys))
  }

  test("intersect + except partition the orders key set") {
    val inter = run("q_intersect").collect().map(_.getLong(0)).toSet
    val exc = run("q_except").collect().map(_.getLong(0)).toSet
    val all = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    assert((inter & exc).isEmpty)
    assert((inter ++ exc) == all)
  }

  test("argmax_by: the chosen orderkey is from the latest date") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    run("q_argmax_by").collect().foreach { r =>
      assert(orders(r.getAs[Long]("latest_orderkey")) == r.getAs[String]("latest_date"))
    }
  }

  test("moving average: a 1-row frame equals the row's own value") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val oneOrder = orders.groupBy("o_custkey").count().filter(col("count") === 1)
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    if (oneOrder.nonEmpty) {
      val vals = orders.filter(col("o_custkey").isInCollection(oneOrder))
        .select(col("o_custkey"), round(col("o_totalprice"), 4).as("p"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      run("q_moving_avg").filter(col("o_custkey").isInCollection(oneOrder))
        .collect().foreach { r =>
          assert(math.abs(r.getAs[Double]("ma3") - vals(r.getAs[Long]("o_custkey"))) < 1e-9)
        }
    }
  }

  test("ntile quartiles are 1..4 and sized within one of each other") {
    val byNation = run("q_ntile").collect()
      .groupBy(_.getAs[Number]("c_nationkey").longValue)
    byNation.foreach { case (_, rows) =>
      val sizes = rows.groupBy(_.getAs[Long]("quartile")).map(_._2.length)
      if (rows.length >= 4) {
        assert(sizes.max - sizes.min <= 1)
      }
    }
  }

  test("hash sample is a deterministic subset") {
    val a = run("q_hash_sample").collect().map(_.getLong(0)).sorted
    val b = run("q_hash_sample").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b) && a.nonEmpty)
    val all = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(a.length < all)
  }

  test("approx distinct is within 5% of exact") {
    // not driver-registered (sketch encodings are engine-specific); the
    // library surface is exercised here and bounded by the oracle twin
    val approx = OlapQueries.approxDistinct.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Queries.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(1L, (n * 0.05).toLong),
        s"$k: approx=${approx(k)} exact=$n")
    }
  }

  test("approx quantiles sketch: one row per type, p50 <= p90") {
    // raw sketch surface (not driver-registered); rank-error envelope is
    // oracle-pinned by q_approx_quantiles_bound
    val rows = OlapQueries.approxQuantiles.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("p50_approx") <= r.getAs[Double]("p90_approx"))
    }
  }

  test("interval join: every row satisfies the range predicate") {
    val n = run("q_interval_join").count()
    val direct = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >= col("o_orderdate")
        && col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .select("o_orderkey").distinct().count()
    assert(n == direct && n > 0)
  }
}
