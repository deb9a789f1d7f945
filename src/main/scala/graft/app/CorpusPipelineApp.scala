package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.operators.ConnectedComponents

/** End-to-end training-corpus preparation pipeline — the engine's text
  * operators composed into one job:
  *
  *   1. normalize (lowercase / strip / collapse whitespace)
  *   2. exact dedup on the normalized hash (keep min-id doc)
  *   3. near-dup dedup: MinHash signatures → LSH band buckets →
  *      candidate pairs → exact n-gram Jaccard ≥ threshold → connected
  *      components → drop non-canonical members
  *   4. quality filter (min words, stopword evidence)
  *   5. language-ID annotation
  *
  * Every stage is map-side or a bounded-key aggregation; candidate pairs
  * (the only quadratic object) exist solely inside LSH buckets.
  *
  * Usage: runMain graft.app.CorpusPipelineApp <docsParquet> <outDir>
  *        [jaccardThreshold] — prints one JSON stats line.
  */
object CorpusPipelineApp {

  final case class Stats(
      input: Long, exactDups: Long, nearDups: Long,
      lowQuality: Long, output: Long)

  def run(spark: SparkSession, docsPath: String, outDir: String,
          jaccardThreshold: Double = 0.8): Stats = {
    val raw = spark.read.parquet(docsPath)
    val input = raw.count()

    // 1. normalize
    val normed = raw.withColumn("norm_text", TextOps.normalize(col("text")))
      .withColumn("norm_hash", md5(col("norm_text")))
      .localCheckpoint(true)

    // 2. exact dedup on normalized hash
    val canonicalExact = normed.groupBy(col("norm_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
    // canonical set is corpus-sized: no broadcast hint (shuffle join at
    // scale is correct; Catalyst may still broadcast when it fits)
    val afterExact = normed.join(canonicalExact.select("doc_id"),
      Seq("doc_id"), "left_semi").localCheckpoint(true)
    val afterExactN = afterExact.count()
    val exactDups = input - afterExactN

    // 3. near-dup: minhash -> bands -> candidates -> jaccard -> components
    // (shared TextOps blocks — identical seeds/shingles as the
    // oracle-checked queries)
    val sh = TextOps.explodedShingles(afterExact, "doc_id", col("norm_text"))
      .localCheckpoint(true)
    val sig = TextOps.signatureFromText(afterExact, "doc_id", col("norm_text"))
      .localCheckpoint(true)
    val cand = TextOps.candidatePairs(TextOps.lshBands(sig, "doc_id"), "doc_id")
      .localCheckpoint(true)
    val dupPairs = TextOps.jaccardOverPairs(sh, "doc_id", cand)
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("doc_a"), col("doc_b"))
    val groups = ConnectedComponents.canonicalize(dupPairs)
    val dropNearDup = groups.filter(col("doc_id") =!= col("canonical_id"))
      .select("doc_id")
    val afterNear = afterExact.join(dropNearDup, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    val afterNearN = afterNear.count()
    val nearDups = afterExactN - afterNearN

    // 4. quality filter (shared tokenizer)
    val qualified = afterNear
      .filter(size(TextOps.words(col("norm_text"))) >= 5).localCheckpoint(true)
    val lowQuality = afterNearN - qualified.count()

    // 5. language-ID annotation (shared marker table)
    val out = TextOps.withLangId(qualified, col("norm_text"), "pred_lang")
      .drop("norm_hash")

    out.write.mode("overwrite").parquet(outDir)
    Stats(input, exactDups, nearDups, lowQuality,
      spark.read.parquet(outDir).count())
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: CorpusPipelineApp <docsParquet> <outDir> [jaccardThreshold]")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-corpus-pipeline")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val st = run(spark, args(0), args(1),
      args.lift(2).map(_.toDouble).getOrElse(0.8))
    println(s"""{"input":${st.input},"exact_dups":${st.exactDups},""" +
      s""""near_dups":${st.nearDups},"low_quality":${st.lowQuality},""" +
      s""""output":${st.output}}""")
  }
}
