package graft

import java.nio.file.{Files, Paths}

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** Guard for the oracle-type defect class that shipped hash-red in rounds
  * 6 and 7: a bare DuckDB `sum()` returns HUGEINT, which the driver's
  * comparison pipeline reads as float64 while the Spark side emits
  * BIGINT — values hash-mismatch even when numerically identical.
  *
  * Every registered oracle's DuckDB result schema (resolved lazily, not
  * executed) must match the Spark query's schema column-for-column after
  * the driver's sort-by-name. Runs `tools/lint_oracle_types.py` so the
  * check uses the same DuckDB build as the driver gate.
  */
class OracleParitySpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  test("every oracle's DuckDB schema matches the Spark schema (no HUGEINT)") {
    assume(Files.exists(Paths.get(sf)), "driver testdata not present")
    assume(Seq("python3", "-c", "import duckdb").! == 0,
      "python3+duckdb unavailable here; the driver gate still applies")
    val spark = SparkTestSession.get
    val out = Files.createTempDirectory("oracle-lint").toString
    Verify.writeOracleJson(out)
    // Schema only — fn() builds the plan (a few queries materialize
    // bounded driver-side state eagerly, fine at sf0.001) but nothing is
    // executed for the comparison itself.
    val schemas = SparkEntry.queries.toSeq
      .filter { case (name, _) => SparkEntry.oracleSql.contains(name) }
      .map { case (name, fn) =>
        // Verify.q escapes quotes/backslashes/control chars — a column
        // name containing any of those must yield a schema diff, not a
        // JSON parse error in the lint.
        val fields = fn(spark, sf).schema.fields
          .map(f => s"[${Verify.q(f.name)},${Verify.q(f.dataType.simpleString)}]")
        s"${Verify.q(name)}:[${fields.mkString(",")}]"
      }
    Files.writeString(Paths.get(s"$out/spark_schema.json"),
      schemas.mkString("{", ",", "}"))
    val log = new StringBuilder
    val code = Seq("python3", "tools/lint_oracle_types.py", sf,
      s"$out/oracle_sql.json", s"$out/spark_schema.json")
      .!(ProcessLogger(l => { log.append(l).append('\n'); () }))
    assert(code == 0, s"oracle type lint failed:\n$log")
  }
}
