package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the executed plan of selected queries (all, or
  * those named in args) so shuffle/broadcast/codegen/pushdown shape can be
  * reviewed. Usage: runMain graft.Explain [sfDir] [queryName...]
  *
  * With PLANS_DIR set, additionally writes each query's
  * `explain("formatted")` output to $PLANS_DIR/<name>$PLANS_SUFFIX.txt
  * (suffix defaults to empty) — the optimization rounds' before/after
  * plan artifacts under plans/rNN/.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSet
    val plansDir = sys.env.get("PLANS_DIR")
    val suffix = sys.env.getOrElse("PLANS_SUFFIX", "")
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
    plansDir.foreach(d => new java.io.File(d).mkdirs())
    Queries.all
      .filter(q => names.isEmpty || names.contains(q.name))
      .foreach { q =>
        try {
          val df = q.fn(spark, sfDir)
          plansDir match {
            case Some(d) =>
              val formatted = df.queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode)
              val w = new java.io.PrintWriter(s"$d/${q.name}$suffix.txt")
              try w.println(formatted) finally w.close()
              println(s"wrote $d/${q.name}$suffix.txt")
            case None =>
              println(s"===== ${q.name} =====")
              println(df.queryExecution.executedPlan.toString)
          }
        } catch { case e: Throwable =>
          println(s"===== ${q.name} ===== FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
