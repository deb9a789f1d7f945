package graft.app

import org.apache.spark.sql.SparkSession

/** Measurement-only harness for optimization work (guide §1.1): runs the
  * named queries N times each inside ONE warmed session and prints the
  * per-query min/median, which resolves ~0.1 s effects that the
  * single-shot Bench cannot on a noisy box. NOT part of the bench
  * contract — graft.Bench remains the driver's single-shot instrument;
  * this main exists so before/after claims in OPTIMIZATION_r15.md come
  * from min-of-N within-session pairs instead of cross-run noise.
  *
  * Usage: runMain graft.app.PerfProbe <repeats> <query...>
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as Bench).
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PerfProbe <repeats> <query...>")
    val reps = args.head.toInt
    val names = args.tail.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-perf-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-probe-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val known = graft.Queries.all.map(q => q.name -> q).toMap
    val qs = names.map(n => known.getOrElse(n, sys.error(s"unknown query $n")))

    // same one-off warmups as Bench so first-touch costs don't pollute rep 1
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").write
        .format("noop").mode("overwrite").save()
    }
    (graft.TextQueries.sharedArtifactWarmers ++ graft.MlQueries.sharedArtifactWarmers ++
      graft.AudioQueries.sharedArtifactWarmers ++ graft.ImageQueries.sharedArtifactWarmers ++
      graft.VideoQueries.sharedArtifactWarmers).foreach { case (_, f) =>
      try f(spark, sfDir) catch { case _: Throwable => () }
    }

    val out = new StringBuilder
    qs.foreach { q =>
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[probe] ${q.name} failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = ts(ts.length / 2)
      out.append(f"PROBE ${q.name} min=${ts.head}%.3f med=$med%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}\n")
    }
    print(out.toString)
    spark.stop()
  }
}
