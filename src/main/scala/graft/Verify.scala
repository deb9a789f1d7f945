package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Dump every registered query's result + the oracle SQL map without
    * owning the session lifecycle — reused by [[OracleParitySpec]] so the
    * oracle-vs-engine schema gate runs inside `sbt test` on the shared
    * test session (the round-7 defect class shipped because the local
    * compare was not part of the green bar).
    */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          only: Option[Set[String]] = None,
          except: Set[String] = Set.empty): Unit = {
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) =>
        only.forall(_.contains(name)) && !except.contains(name) }
      .foreach { case (name, fn) =>
        // repartition(1), not coalesce(1): coalesce folds the WHOLE final
        // stage into one task (a multi-hundred-million-row candidate
        // verify then runs single-threaded before the single-file write —
        // observed live at the sf10 vector step); repartition keeps the
        // query parallel and only the post-shuffle write is one task.
        // The compare is order-insensitive, so the extra shuffle is free.
        try fn(spark, sfDir).repartition(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          // Fail FAST if the failure took the SparkContext down with it
          // (driver OOM at the r13 sf10 gate): every later query would
          // print a meaningless "stopped SparkContext" stack, burying
          // the one real cause ~60 errors deep in the gate log.
          if (spark.sparkContext.isStopped) {
            System.err.println(
              s"[verify] SparkContext is stopped — aborting the run; " +
                s"root cause above ($name)")
            throw e
          }
        }
      }
    writeOracleJson(outDir)
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private[graft] def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def writeOracleJson(outDir: String): Unit = {
    new java.io.File(outDir).mkdirs()
    def dump(m: Map[String, String], file: String): Unit = {
      val json = m.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/$file"), json)
    }
    dump(SparkEntry.oracleSql, "oracle_sql.json")
    // scaled-gate overlay (may reference dump_q_* views of verified
    // engine dumps); consumed only when CHECK_ORACLE_SCALE=1
    dump(SparkEntry.scaleOracleSql, "oracle_sql_scale.json")
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query names (fast local
    // iteration on one query; the driver always runs the full set), or
    // `all-but:q_a,q_b` to run the full registry MINUS a named
    // exclusion list (the scale gates' declared-semantics exclusions)
    val spec = args.lift(2)
    val except = spec.filter(_.startsWith("all-but:"))
      .map(_.stripPrefix("all-but:").split(",").toSet).getOrElse(Set.empty)
    val only = spec.filterNot(_.startsWith("all-but:")).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sfDir, outDir, only, except)
    spark.stop()
  }
}
