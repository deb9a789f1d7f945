package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator inventory lives in Queries/TextQueries/MlQueries; this
  * object only assembles the maps the driver consumes.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped aggregation — scan, filter, partial+final agg.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.aggSum.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (deterministic clustering et al.) → driver records a rows-only check.
    */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap

  /** Scaled-gate oracle overlay (CHECK_ORACLE_SCALE=1): cheaper DuckDB
    * twins that may consume `dump_q_<name>` views of already-verified
    * engine dumps — see [[Queries.Q.scaleOracle]].
    */
  def scaleOracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.scaleOracle.map(o => q.name -> o)).toMap
}
