package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.TextQueries

/** Wall-clock validation for batched BPE training at a REALISTIC merge
  * count: the oracle-gated `q_bpe_batch_rounds` proves 4 rounds × window
  * 16 exact; this probe runs the SAME loop
  * ([[TextQueries.bpeTrainBatched]]) to a full 256-merge table and
  * measures the claim that wall-clock is O(driver rounds), not O(merges)
  * — the difference between a practical vocabulary build and 256
  * sequential Spark jobs.
  *
  * The corpus's natural-text vocabulary is deliberately tiny (the dense
  * shared-vocab construction other dedup probes exploit), which would
  * exhaust mergeable pairs long before 256 — so the probe derives a
  * deterministic hex "word" corpus from the documents table (md5 of the
  * text, split into four 8-hex-char words): 16 initial symbols, tens of
  * thousands of distinct words, merge supply far beyond 256, and
  * identical across runs/SFs by construction.
  *
  * The "would it survive 1000×" claims under test:
  *  - each round aggregates the VOCABULARY table (|distinct words| rows,
  *    never corpus rows) — corpus size only affects the one initial
  *    word-count aggregate;
  *  - merges/round grows as dominance conflicts thin out, so rounds
  *    stay ~O(target/window) — the probe prints the per-round
  *    acceptance profile to make a collapse (1 merge/round = the
  *    sequential regime) obvious.
  *
  * Usage: runMain graft.app.BpeScaleBench [sfDir] [targetMerges] [window]
  */
object BpeScaleBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val target = args.lift(1).map(_.toInt).getOrElse(256)
    val window = args.lift(2).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .appName("bpe-scale-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(concat_ws(" ",
        substring(md5(col("text")), 1, 8), substring(md5(col("text")), 9, 8),
        substring(md5(col("text")), 17, 8), substring(md5(col("text")), 25, 8))
        .as("text"))

    val t0 = System.nanoTime()
    val (merges, rounds) =
      TextQueries.bpeTrainBatched(corpus, maxRounds = 10000,
        window = window, targetMerges = target.toLong)
    val sec = (System.nanoTime() - t0) / 1e9

    val perRound = merges.groupBy(_._1).view.mapValues(_.size).toSeq
      .sortBy(_._1).map(_._2)
    // sanity: accepted merges are unique pairs, counts monotone within a
    // round's rank order (dominance keeps each round internally ranked)
    require(merges.map(m => (m._3, m._4)).distinct.size == merges.size,
      "duplicate merge pair accepted")
    println(
      s"""{"metric":"bpe_scale","merges":${merges.size},"rounds":$rounds,""" +
      s""""window":$window,"sec":${math.round(sec * 1000) / 1000.0},""" +
      s""""merges_per_round":[${perRound.mkString(",")}],""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
