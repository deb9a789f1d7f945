package graft.sources

import org.apache.spark.sql.DataFrame

/** Partition-aware parquet sink: the layout choices that decide whether a
  * 100 TB read prunes or scans everything.
  *
  *  - `writePartitioned` — hive-style directory partitioning on a
  *    low-cardinality column: filters on that column become
  *    PartitionFilters (whole directories skipped, no footer reads).
  *  - `writeClustered` — within-file ordering (repartition + sortWithin
  *    Partitions) on a high-cardinality column so parquet min/max row-
  *    group stats prune selective point/range predicates.
  */
object PartitionedSink {

  def writePartitioned(df: DataFrame, partitionCol: String, outDir: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(outDir)

  def writeClustered(df: DataFrame, clusterCol: String, outDir: String,
                     numFiles: Int = 8): Unit =
    df.repartition(numFiles, org.apache.spark.sql.functions.col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode("overwrite").parquet(outDir)

  /** Epoch-shard training layout: the materialization of
    * `q_epoch_shuffle` — rows repartitioned by (epoch, shard) and sorted
    * by the md5 order key WITHIN partitions, written hive-partitioned as
    * epoch=E/shard=S/. Each shard file's physical row order IS the
    * epoch's serving order, reproducible from the seed alone; no global
    * sort, no per-shard rank window (which would serialize corpus/16
    * rows into one task at 100 TB).
    */
  def writeEpochShards(assignments: DataFrame, outDir: String,
                       shards: Int = 16): Unit = {
    import org.apache.spark.sql.functions.col
    assignments
      .repartition(shards, col("epoch"), col("shard"))
      .sortWithinPartitions("epoch", "shard", "ord")
      .write.mode("overwrite").partitionBy("epoch", "shard").parquet(outDir)
  }

  /** Bucketed catalog table: pre-shuffles once at write so repeated joins
    * and aggregations on the bucket key run with NO exchange — the
    * co-located-join layout for fact tables that are joined on the same
    * key at every query (SURVEY.md §4 posture).
    */
  def writeBucketed(df: DataFrame, bucketCol: String, table: String,
                    numBuckets: Int = 8): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
