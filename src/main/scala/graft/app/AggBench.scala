package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.SummaryAggregator
import graft.sources.PointSource

/** Micro-bench for the summary aggregation hot path: N/SUM/SUMSQ over a
  * chunked point dataset grouped into K labels.
  * runMain graft.app.AggBench <chunkDir> <k>
  */
object AggBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/bfr_big2")
    val k = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val points = PointSource.readDataset(spark, dir).reduce(_ union _)
      .withColumn("label", pmod(col("id"), lit(k)).cast("int"))
      .persist()
    val n = points.count()
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      val r = points.groupBy(col("label"))
        .agg(SummaryAggregator.summarize(col("features")).as("s"))
        .collect()
      println(f"[aggbench] round=$round n=$n groups=${r.length} took=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
