package graft.app

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Measurement-only: time one named warmer (or query) and report how many
  * Spark jobs/stages/tasks it launched — the fixed-cost census behind the
  * per-round fusion work. Usage: runMain graft.app.JobCountProbe <warmer|query>
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-job-count-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-probe-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicLong(0L)
    val verbose = sys.env.get("JOBPROBE_VERBOSE").contains("1")
    val t0all = System.nanoTime()
    spark.sparkContext.addSparkListener(new SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("?")))
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, site) = starts.getOrDefault(e.jobId, (0L, "?"))
        if (verbose)
          println(f"JOB ${e.jobId}%3d at=${(t0 - t0all) / 1e9}%7.2f run=${(System.nanoTime() - t0) / 1e9}%6.3f  $site")
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks.toLong)
      }
    })

    val warmers = (graft.TextQueries.sharedArtifactWarmers ++
      graft.MlQueries.sharedArtifactWarmers ++
      graft.AudioQueries.sharedArtifactWarmers ++
      graft.ImageQueries.sharedArtifactWarmers ++
      graft.VideoQueries.sharedArtifactWarmers).toMap
    val queries = graft.Queries.all.map(q => q.name -> q).toMap

    val t0 = System.nanoTime()
    warmers.get(name) match {
      case Some(f) => f(spark, sfDir)
      case None => queries(name).fn(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"JOBPROBE $name sec=$sec%.3f jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
    spark.stop()
  }
}
