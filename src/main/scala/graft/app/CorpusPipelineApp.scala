package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
    val normed = raw.withColumn("norm_text", norm)
      .withColumn("norm_hash", md5(col("norm_text")))
      .localCheckpoint(true)

    // 2. exact dedup on normalized hash
    val canonicalExact = normed.groupBy(col("norm_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
    val afterExact = normed.join(broadcast(canonicalExact.select("doc_id")),
      Seq("doc_id"), "left_semi").localCheckpoint(true)
    val exactDups = input - afterExact.count()

    // 3. near-dup: minhash -> bands -> candidates -> jaccard -> components
    val words = split(trim(col("norm_text")), "\\s+")
    val shingles = transform(sequence(lit(1), greatest(size(words) - 2, lit(1))),
      i => concat_ws(" ", slice(words, i, lit(3))))
    val sh = afterExact
      .select(col("doc_id"), explode(array_distinct(shingles)).as("sh"))
      .localCheckpoint(true)
    val sig = sh.groupBy(col("doc_id")).agg(
      min(md5(concat(lit("s0:"), col("sh")))).as("mh0"),
      min(md5(concat(lit("s1:"), col("sh")))).as("mh1"),
      min(md5(concat(lit("s2:"), col("sh")))).as("mh2"),
      min(md5(concat(lit("s3:"), col("sh")))).as("mh3"))
    val bands = sig.select(col("doc_id"), lit(0).as("band"),
        md5(concat(col("mh0"), col("mh1"))).as("bucket"))
      .union(sig.select(col("doc_id"), lit(1).as("band"),
        md5(concat(col("mh2"), col("mh3"))).as("bucket")))
      .localCheckpoint(true)
    val cand = bands.as("l").join(bands.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket")
          && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b")).distinct()
      .localCheckpoint(true)
    // exact Jaccard verify over candidates (pairs broadcast both hops)
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val aSh = sh.select(col("doc_id").as("doc_a"), col("sh"))
      .join(broadcast(cand), Seq("doc_a"))
    val inter = sh.select(col("doc_id").as("doc_b"), col("sh"))
      .join(broadcast(aSh), Seq("doc_b", "sh"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("ni"))
    val withNa = cnt.select(col("doc_id").as("doc_a"), col("n").as("na"))
      .join(broadcast(inter), Seq("doc_a"))
    val dupPairs = cnt.select(col("doc_id").as("doc_b"), col("n").as("nb"))
      .join(broadcast(withNa), Seq("doc_b"))
      .filter(col("ni").cast("double") / (col("na") + col("nb") - col("ni"))
        >= jaccardThreshold)
      .select(col("doc_a"), col("doc_b"))
    val groups = ConnectedComponents.canonicalize(dupPairs)
    val dropNearDup = groups.filter(col("doc_id") =!= col("canonical_id"))
      .select("doc_id")
    val afterNear = afterExact.join(broadcast(dropNearDup), Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    val nearDups = afterExact.count() - afterNear.count()

    // 4. quality filter
    val nWords = size(split(trim(col("norm_text")), "\\s+"))
    val qualified = afterNear.filter(nWords >= 5).localCheckpoint(true)
    val lowQuality = afterNear.count() - qualified.count()

    // 5. language-ID annotation
    val langMarkers = Seq(
      "en" -> Seq("the", "and", "of"), "es" -> Seq("el", "la", "de"),
      "de" -> Seq("der", "und", "die"), "fr" -> Seq("le", "la", "et"))
    val w2 = split(trim(col("norm_text")), "\\s+")
    val hitCols = langMarkers.map { case (l, ms) =>
      l -> size(filter(w2, x => array_contains(array(ms.map(lit): _*), x))) }
    val best = greatest(hitCols.map(_._2): _*)
    val pred = hitCols.reverse.foldLeft(lit("unk")) { case (acc, (l, h)) =>
      when(h === best && best > 0, lit(l)).otherwise(acc) }
    val out = qualified.withColumn("pred_lang", pred)
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
