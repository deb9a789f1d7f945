package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the executed plan of selected queries (all, or
  * those named in args) so shuffle/broadcast/codegen/pushdown shape can be
  * reviewed. Usage: runMain graft.Explain [sfDir] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "4")
      // same session TZ as Bench/Verify/tests — plans over the events
      // table must not interpret ts in host-local time here
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Queries.all
      .filter(q => names.isEmpty || names.contains(q.name))
      .foreach { q =>
        try {
          val plan = q.fn(spark, sfDir).queryExecution.executedPlan.toString
          println(s"===== ${q.name} =====")
          println(plan)
        } catch { case e: Throwable =>
          println(s"===== ${q.name} ===== FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
