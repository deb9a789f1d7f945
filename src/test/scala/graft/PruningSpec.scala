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

  test("AQE splits a skewed partition inside a pinned shuffle-merge join") {
    // the pairOverlap/candidatePairs joins are pinned SHUFFLE_MERGE for
    // size-safety; their skew story is "AQE splits hot keys at runtime".
    // This pin proves the mechanism actually fires in a hinted SMJ: one
    // key holding ~2M rows against a tiny median must come back from
    // execution as a skew-handled join, not one straggler task.
    val spark0 = spark
    import spark0.implicits._
    val prev = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512k")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // ~2M rows on key 0, 1..99 tiny; right side 100 keys
      val left = spark.range(2000000)
        .select(when(col("id") % 20 === 0, col("id") % 100).otherwise(0L).as("k"),
          col("id").as("v"))
      val right = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("w"))
      val j = left.hint("shuffle_merge").join(right.hint("shuffle_merge"), Seq("k"))
      // execute THIS dataframe's QueryExecution (count() would plan its
      // own) so the adaptive plan below is the final, executed one
      assert(j.queryExecution.toRdd.count() == 2000000L)
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"expected a skew-split sort-merge join in the adaptive plan:\n${p.take(2500)}")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
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
