package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.bfr.BFR
import graft.core.ClusterSummary

/** Streaming re-expression of the reference's bounded, ordered,
  * incremental chunk loop (SURVEY.md §2.9): the reference loads one file
  * per round (code/bfr.py:432-438, HW4.pdf §3a "load one file to the
  * memory and process"); here the same semantics run as a Structured
  * Streaming file source with `maxFilesPerTrigger=1` + `foreachBatch`.
  *
  * Caveat documented in SURVEY §2.1-S1: the file source orders batches by
  * modification time, not name; for strict lexicographic-round parity use
  * the batch driver (BfrApp). Everything else — threshold assignment
  * against broadcast DS state, monoid summary updates — is identical code.
  */
object Streaming {

  /** S1-as-stream: one chunk file per micro-batch, parsed to
    * (id, features). `d` fixes the schema width (streams cannot infer).
    */
  def chunkStream(spark: SparkSession, path: String): DataFrame = {
    val parts = split(col("value"), ",")
    spark.readStream
      .option("maxFilesPerTrigger", 1)
      .text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(
        element_at(parts, 1).try_cast("long").as("id"),
        transform(slice(parts, lit(2), size(parts) - 1), _.try_cast("double")).as("features"))
      .filter(col("id").isNotNull && size(col("features")) > 0 &&
        !array_contains(transform(col("features"), _.isNull), true))
  }

  /** Incremental BFR over a chunk stream: round 1 initializes DS from the
    * first micro-batch, later rounds run the α-threshold assignment and
    * fold matched points into DS via the summary monoid (M5/A4). RS
    * points are carried in `state.rs` (driver-bounded; M6 spill applies).
    * Assignments append to `outDir` as parquet.
    */
  final class BfrStreamState(cfg: BFR.Config) extends Serializable {
    @volatile var ds: IndexedSeq[ClusterSummary] = IndexedSeq.empty
    @volatile var rounds: Int = 0
  }

  def bfrStream(spark: SparkSession, inputPath: String, outDir: String,
                cfg: BFR.Config, checkpoint: String): (StreamingQuery, BfrStreamState) = {
    val state = new BfrStreamState(cfg)
    val q = chunkStream(spark, inputPath)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val chunk = batch.toDF()
        if (state.ds.isEmpty) {
          // round 1: reuse the batch init path on this single chunk
          val res = BFR.run(chunk.sparkSession, Seq(chunk),
            cfg.copy(rsClusterThreshold = Int.MaxValue))
          state.ds = res.ds
          res.assignments.write.mode("append").parquet(outDir)
        } else {
          val (a, r) = BFR.assignToDsWithFeatures(chunk, state.ds, cfg.alphaAssign)
          // fold matched points into DS summaries (A4) via the shared
          // batch helper — no batch/streaming drift; features ride along
          // on the assigned side, no re-join of the chunk
          state.ds = BFR.absorb(state.ds,
            a.select(col("cluster").as("label"), col("features")))
          // unmatched -> outliers in streaming mode (RS spill is the batch
          // driver's job; here we emit -1 like the reference's finalize)
          a.select("id", "cluster")
            .union(r.select(col("id"), lit(-1).cast("int").as("cluster")))
            .write.mode("append").parquet(outDir)
        }
        state.rounds += 1
      }
      .start()
    (q, state)
  }

  /** Watermarked tumbling-window aggregation over the events stream —
    * the engine's §2.9 window surface (batch twin: q_events_window).
    */
  def windowedEventCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))

  /** Streaming exact dedup: watermarked dropDuplicates on the id column —
    * duplicates arriving within the watermark horizon are suppressed,
    * state for ids older than the watermark is evicted (bounded state at
    * 100 TB ingest; exactly the shape a streaming training-data dedup
    * stage needs).
    */
  def dedupStream(events: DataFrame, idCol: String, tsCol: String,
                  watermark: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark).dropDuplicates(idCol, tsCol)

  /** Streaming near-duplicate suppression: each document's MinHash
    * signature computes MAP-SIDE via the native kernel (no explode, no
    * aggregation — which is what makes it legal inside a streaming
    * query), and `dropDuplicatesWithinWatermark` on the concatenated
    * signature keeps only the first document per signature within the
    * watermark horizon. Catches re-posts whose bytes differ but whose
    * shingle minima all agree — the tier between exact-hash streaming
    * dedup ([[dedupStream]]) and the offline LSH pipeline (banded
    * candidates + exact-Jaccard verify), with state bounded by the
    * watermark exactly like the exact tier.
    */
  def nearDupStream(docs: DataFrame, textCol: String, tsCol: String,
                    watermark: String = "10 minutes"): DataFrame = {
    val sigKey = concat_ws("",
      (0 until graft.functions.TextOps.minhashPerms).map(i => col(s"__sig.mh$i")): _*)
    docs
      .withColumn("__sig",
        graft.functions.NativeTextFunctions.minhashSignatureNative(col(textCol)))
      .withColumn("__sigkey", sigKey)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__sigkey")
      .drop("__sig", "__sigkey")
  }

  /** Stream-stream inner join with a time bound: pair each left event
    * with right events for the same key within `boundSeconds` after it.
    * Watermarks on both sides bound the join state.
    */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
                       keyCol: String, tsCol: String,
                       boundSeconds: Int = 300,
                       watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(tsCol, watermark)
      .select(col(keyCol).as("k"), col(tsCol).as("lts"))
    val r = right.withWatermark(tsCol, watermark)
      .select(col(keyCol).as("rk"), col(tsCol).as("rts"))
    l.join(r, col("k") === col("rk") &&
      col("rts") >= col("lts") &&
      col("rts") <= col("lts") + expr(s"INTERVAL $boundSeconds SECONDS"))
  }

  /** Custom arbitrary state: running per-key counts via
    * mapGroupsWithState (KeyValueGroupedDataset surface).
    */
  def runningCounts(events: Dataset[(String, Double)]): Dataset[(String, Long, Double)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), (String, Long, Double)](
        GroupStateTimeout.NoTimeout()) {
        case (key, rows, gstate: GroupState[(Long, Double)]) =>
          val (n0, s0) = gstate.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          rows.foreach { r => n += 1; s += r._2 }
          gstate.update((n, s))
          (key, n, s)
      }
  }
}
