package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Scale probe for [[TextOps.candidatePairs]]' SALTED-COMPLETE hot-bucket
  * mode — the mechanism the sf1 oracle gate forced in (fixed-width
  * fingerprint band spaces saturate, bucket-mates stop being near-dup
  * families, and hub stars drop verified pairs; see the Scaladoc on
  * `candidatePairs`).
  *
  * Plants ONE pathologically hot bucket of `n` members (the saturated-
  * keyspace worst case: every member shares the band bucket, so the
  * declared pair relation is the full n(n−1)/2) plus a spread of normal
  * buckets, then measures the complete relation three ways:
  *
  *   - `unguarded`: the plain bucket self-join — ONE shuffle key owns
  *     all n(n−1)/2 output rows; its single task is the stage, which is
  *     exactly the shape that stalls a 1000-executor cluster (999 cores
  *     idle behind one straggler).
  *   - `salted`: `hotComplete = true` — g = ceil(n/256) hash blocks,
  *     each unordered block pair its own shuffle key with ~256² output
  *     rows; same relation, bounded tasks.
  *   - `star`: the text-tier mode, for contrast — linear but NOT the
  *     complete relation (n−1 pairs).
  *
  * Equality of the unguarded and salted relations is proven without
  * materializing either: count + an order-insensitive checksum
  * (bit_xor of xxhash64(doc_a, doc_b) — overflow-free under ANSI, and
  * both relations are distinct pair sets so cancellation cannot hide a
  * difference the count would not already catch) must match exactly.
  * Per-mode wall seconds and the longest single task (the
  * cluster-behavior predictor) print as one JSON line.
  *
  * Usage: runMain graft.app.HotBucketBench [n] [normalBuckets]
  */
object HotBucketBench {

  final case class ModeStats(pairs: Long, checksum: Long, seconds: Double,
                             maxTaskS: Double, tasks: Long)

  private def measure(spark: SparkSession, pairs: DataFrame): ModeStats = {
    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0)
    val nTasks = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        nTasks.incrementAndGet()
        val d = t.taskInfo.duration
        var cur = maxTaskMs.get()
        while (d > cur && !maxTaskMs.compareAndSet(cur, d)) cur = maxTaskMs.get()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val t0 = System.nanoTime()
      val row = pairs
        .agg(count(lit(1)).as("n"),
          bit_xor(xxhash64(col("doc_a"), col("doc_b"))).as("chk"))
        .collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      // drain the async listener bus so the snapshot sees every task
      try {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        bus.getClass.getMethod("waitUntilEmpty", classOf[Long])
          .invoke(bus, java.lang.Long.valueOf(10000L))
      } catch { case scala.util.control.NonFatal(_) => () }
      ModeStats(row.getLong(0), row.getLong(1),
        math.rint(sec * 10) / 10, maxTaskMs.get() / 1000.0, nTasks.get())
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(20000)
    val normalBuckets = args.lift(1).map(_.toInt).getOrElse(1000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-hot-bucket-bench")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // one saturated bucket of n members + normalBuckets cold buckets of
    // 8 (the organic background the census must leave on the fast path)
    val hot = spark.range(n).select(col("id").as("doc_id"),
      lit(0).as("band"), lit("hot").as("bucket"))
    val cold = spark.range(normalBuckets.toLong * 8).select(
      (col("id") + 1000000L).as("doc_id"), lit(0).as("band"),
      concat(lit("c"), (col("id") % normalBuckets)).as("bucket"))
    val bands = hot.unionByName(cold).repartition(32).localCheckpoint(true)

    // The round-9 sizing lesson applies to BOTH complete modes: the pair
    // stage fans out ~n²/2 OUTPUT rows from a tiny input, which neither
    // static input-byte sizing nor AQE coalescing can see — size the
    // stage's shuffle partitions on expected output (~500k rows/task)
    // and park coalescing for it. The salted mode needs the spread to
    // matter: 3,160 block-pair keys into 32 partitions still stacks
    // ~6M rows per task; into an output-sized partition count each task
    // carries a handful of ~65k-row block pairs.
    val outParts = math.min(1024L,
      math.max(32L, n.toLong * n / 2 / 500000L)).toInt
    def sized[T](body: => T): T = {
      val parts0 = spark.conf.get("spark.sql.shuffle.partitions")
      val coalesce0 = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
      spark.conf.set("spark.sql.shuffle.partitions", outParts.toString)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      try body
      finally {
        spark.conf.set("spark.sql.shuffle.partitions", parts0)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", coalesce0)
      }
    }
    val unguarded = sized(measure(spark,
      TextOps.candidatePairs(bands, "doc_id", hotThreshold = Int.MaxValue)))
    val salted = sized(measure(spark,
      TextOps.candidatePairs(bands, "doc_id", hotComplete = true)))
    val star = measure(spark, TextOps.candidatePairs(bands, "doc_id"))

    val expected = n.toLong * (n - 1) / 2 + normalBuckets.toLong * (8 * 7 / 2)
    require(unguarded.pairs == expected,
      s"unguarded relation wrong: ${unguarded.pairs} vs $expected")
    require(salted.pairs == unguarded.pairs && salted.checksum == unguarded.checksum,
      s"salted-complete diverged: ${salted.pairs}/${salted.checksum} vs " +
        s"${unguarded.pairs}/${unguarded.checksum}")

    def j(m: ModeStats) =
      s"""{"pairs":${m.pairs},"sec":${m.seconds},"max_task_s":${m.maxTaskS},"tasks":${m.tasks}}"""
    println(s"""{"metric":"hot_bucket_complete","n":$n,""" +
      s""""unguarded":${j(unguarded)},"salted":${j(salted)},"star":${j(star)},""" +
      s""""checksums_equal":true}""")
    spark.stop()
  }
}
