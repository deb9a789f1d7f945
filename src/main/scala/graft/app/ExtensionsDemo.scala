package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.kmeans.MLlibKMeans
import graft.plans.GraftExtensions
import graft.sources.PointSource

/** Usage demo for the Catalyst integration: installs the optimizer rule
  * + SQL functions on a session, shows the HOF→kernel rewrite in the
  * physical plan, calls the kernels from SQL, and fits the MLlib-backed
  * k-means. `runMain graft.app.ExtensionsDemo [sfDir]`.
  */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-extensions-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    GraftExtensions.install(spark)

    val e = PointSource.fromEmbeddings(spark, sfDir)
    val hof = e.select(VectorFunctions.dot(col("features"), col("features")).as("d"))
    println("rewrite-active: " +
      hof.queryExecution.executedPlan.toString.contains("dot_native"))

    e.createOrReplaceTempView("emb")
    val avg = spark.sql(
      "SELECT round(avg(dot_native(features, features)), 3) AS avg_sq_norm FROM emb")
      .head().getDouble(0)
    println(s"sql-avg-sq-norm: $avg")

    val m = MLlibKMeans.fit(e, k = 10, iters = 3)
    println(s"mllib-model: k=${m.k} d=${m.d}")
    spark.stop()
  }
}
