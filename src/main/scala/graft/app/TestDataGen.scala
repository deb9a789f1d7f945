package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of the driver's synthetic testdata: replicate a
  * source scale factor `copies`× with FK-consistent key offsets, so the
  * full oracle gate (Verify + DuckDB) and Bench can run one scale factor
  * above the largest driver-provided directory (sf0.1 → sf1).
  *
  * Design rules:
  *  - every new key is `old + copy * tableCardinality`, applied to the
  *    SAME formula on both sides of every FK edge (orders.o_custkey and
  *    customer.c_custkey move together), so joins at sf1 behave like
  *    joins at sf0.1 with 10× the rows;
  *  - `Customer#…`/`Supplier#…` names are re-derived from the NEW key so
  *    name↔key stays bijective (queries that group by name must not see
  *    10-way collisions the source scale never had);
  *  - copy 0 is byte-identical to the source; perturbed copies carry a
  *    trailing ` copymark<c>` token (documents — near-dups across copies,
  *    exercising MinHash/LSH with group size = copies, far below the
  *    hot-bucket guard) or hash-noise (embeddings — deterministic
  *    xxhash64-keyed jitter, no RNG, so regeneration is bit-stable and
  *    independent of partitioning);
  *  - dimension tables (region, nation) are fixed-cardinality and copied
  *    verbatim, exactly as TPC-H holds them constant across SFs.
  *
  * Usage: runMain graft.app.TestDataGen <srcDir> <dstDir> [copies=10]
  */
object TestDataGen {

  /** xxhash64-keyed jitter in [-1, 1], deterministic in its inputs. */
  private def noise(cols: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
    pmod(xxhash64(cols: _*), lit(2000001L)).cast("double") / 1000000.0 - 1.0

  private def withCopies(df: DataFrame, copies: Int): DataFrame =
    df.withColumn("copy", explode(sequence(lit(0L), lit(copies - 1L))))

  /** `tables`: restrict generation to a subset (dimension tables always
    * written — they are tiny and every reader expects them). Targeted
    * scale steps (e.g. the 100× documents-only text-tier step) need not
    * pay for a 100× lineitem.
    */
  def generate(spark: SparkSession, srcDir: String, dstDir: String,
               copies: Int, tables: Set[String] = Set.empty): Unit = {
    def read(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
    def wants(t: String) = tables.isEmpty || tables.contains(t)
    def write(df: DataFrame, t: String, parts: Int): Unit =
      if (wants(t)) df.repartition(parts).write.mode("overwrite")
        .parquet(s"$dstDir/$t.parquet")

    // fixed-cardinality dimensions: verbatim (TPC-H semantics); always
    // written — tiny, and every reader expects them
    read("region").repartition(1).write.mode("overwrite")
      .parquet(s"$dstDir/region.parquet")
    read("nation").repartition(1).write.mode("overwrite")
      .parquet(s"$dstDir/nation.parquet")

    val nCust = read("customer").count()
    val nSupp = read("supplier").count()
    val nPart = read("part").count()
    val nOrd = read("orders").count()
    val nEvt = read("events").count()
    val nDoc = read("documents").count()
    val nVec = read("embeddings").count()

    write(withCopies(read("customer"), copies)
      .select(
        (col("c_custkey") + col("copy") * nCust).as("c_custkey"),
        format_string("Customer#%09d", col("c_custkey") + col("copy") * nCust).as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")),
      "customer", math.max(1, copies / 2))

    write(withCopies(read("supplier"), copies)
      .select(
        (col("s_suppkey") + col("copy") * nSupp).as("s_suppkey"),
        format_string("Supplier#%09d", col("s_suppkey") + col("copy") * nSupp).as("s_name"),
        col("s_nationkey"), col("s_acctbal")),
      "supplier", 1)

    write(withCopies(read("part"), copies)
      .select(
        (col("p_partkey") + col("copy") * nPart).as("p_partkey"),
        col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
        col("p_retailprice")),
      "part", math.max(1, copies / 2))

    write(withCopies(read("orders"), copies)
      .select(
        (col("o_orderkey") + col("copy") * nOrd).as("o_orderkey"),
        (col("o_custkey") + col("copy") * nCust).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority")),
      "orders", copies)

    write(withCopies(read("lineitem"), copies)
      .select(
        (col("l_orderkey") + col("copy") * nOrd).as("l_orderkey"),
        (col("l_partkey") + col("copy") * nPart).as("l_partkey"),
        (col("l_suppkey") + col("copy") * nSupp).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate")),
      "lineitem", copies * 3)

    write(withCopies(read("events"), copies)
      .select(
        (col("event_id") + col("copy") * nEvt).as("event_id"),
        col("ts"),
        (col("user_id") + col("copy") * 1500L).as("user_id"),
        col("event_type"), col("value"), col("props")),
      "events", copies)

    // copy 0 verbatim; later copies are NEAR-duplicates (one appended
    // token) — exact-dup structure within each copy is preserved, and
    // cross-copy near-dup groups have size = copies (bounded, well under
    // the 256-doc hot-bucket guard)
    write(withCopies(read("documents"), copies)
      .select(
        (col("doc_id") + col("copy") * nDoc).as("doc_id"),
        when(col("copy") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" copymark"), col("copy")))
          .as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long")),
      "documents", copies)

    // copy 0 verbatim; later copies jittered per-dimension with
    // deterministic hash noise (~2% amplitude — keeps label-cluster
    // structure, breaks exact equality, and leaves cross-copy cosine
    // high enough that the near-dup tier has real work at this scale)
    write(withCopies(read("embeddings"), copies)
      .select(
        (col("vec_id") + col("copy") * nVec).as("vec_id"),
        when(col("copy") === 0, col("embedding"))
          .otherwise(zip_with(
            col("embedding"),
            sequence(lit(0), size(col("embedding")) - 1),
            (x, i) => (x + noise(col("vec_id") + col("copy") * nVec, i,
              col("copy")) * lit(0.02)).cast("float")))
          .as("embedding"),
        col("label")),
      "embeddings", math.max(1, copies / 2))
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dstDir = args.lift(1).getOrElse("testdata_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    // optional 4th arg: comma-separated table subset (dims always written)
    val tables = args.lift(3).map(_.split(",").toSet).getOrElse(Set.empty[String])
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-testdata-gen")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try generate(spark, srcDir, dstDir, copies, tables)
    finally spark.stop()
  }
}
