package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PartitionedSink

/** Runtime pruning — the two mechanisms that decide whether a selective
  * dim filter reaches a 100 TB fact scan at execution time:
  *
  *  - dynamic partition pruning: a filter on the dimension side becomes a
  *    runtime PartitionFilter on the hive-partitioned fact side (whole
  *    directories skipped, no footer reads);
  *  - runtime bloom-filter join pruning: a semi-join filter built from
  *    the selective side is pushed into the large side's scan before the
  *    shuffle, cutting shuffle volume for non-broadcast joins.
  *
  * Both are free capabilities of declarative plans — these pins make sure
  * the engine's layouts (PartitionedSink) and join shapes keep them
  * reachable.
  */
class PruningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dpp").toFile.getAbsolutePath
    val fact = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    PartitionedSink.writePartitioned(fact, "o_orderstatus", dir)
    // the dim must be scan-backed: a filter over an in-memory
    // LocalRelation is constant-folded away, leaving no selective
    // predicate for the DPP rule to find
    val dimDir = Files.createTempDirectory("graft_dpp_dim").toFile.getAbsolutePath
    Seq(("O", "open"), ("F", "finished"), ("P", "pending"))
      .toDF("status", "status_name")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val j = spark.read.parquet(dir)
      .join(dim.filter(col("status_name") === "open"),
        col("o_orderstatus") === col("status"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"expected a runtime partition-pruning filter on the fact scan:\n${plan.take(2000)}")
    val open = j.count()
    val expected = fact.filter(col("o_orderstatus") === "O").count()
    assert(open == expected && open > 0)
  }

  test("runtime bloom filter: selective side prunes the big side's shuffle") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force the non-broadcast join shape the bloom filter exists for
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      val or = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(or, col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
        s"expected a runtime bloom filter on the lineitem side:\n${plan.take(2000)}")
      assert(j.count() > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
