package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Measured recall of the embedding near-dup tiers on PLANTED near-dups:
  * the banded form (4 bands × 8 planes, OR-of-ANDs) must catch what the
  * detection math promises (≈0.99 at the planted cos ≈0.993) and
  * strictly more than the single 8-bit bucket (≈0.74 per-band there).
  * Everything is deterministic — hash-derived jitter, exact-integer
  * hyperplanes — so the counts are stable run to run.
  */
class EmbeddingLshSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  test("banded hyperplane LSH catches more planted near-dups than single-band") {
    val dir = Files.createTempDirectory("banded_lsh").toString
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 200)
      .select(col("vec_id"), col("embedding"), col("label"))
    // planted copy of each base vector: id + 10000, per-dim deterministic
    // jitter ±0.025 (|noise| ≈ 0.115 on unit vectors → cos ≈ 0.993)
    val jittered = base.select(
      (col("vec_id") + 10000).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        (x.cast("double") +
          (pmod((col("vec_id") * 64 + i) * 2654435761L, lit(1000)) - 500) / 500.0 * 0.025
        ).cast("float")).as("embedding"),
      col("label"))
    base.union(jittered).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    def plantedCaught(qname: String): Long =
      Queries.all.find(_.name == qname)
        .getOrElse(fail(s"query $qname not registered"))
        .fn(spark, dir)
        .filter(col("idb") === col("ida") + 10000).count()

    val banded = plantedCaught("q_embedding_near_dup_banded")
    val single = plantedCaught("q_embedding_near_dup_lsh")
    info(s"planted near-dups caught: banded=$banded/200, single-band=$single/200")
    // math: P(banded) = 1-(1-p^8)^4 ≈ 0.996, P(single) = p^8 ≈ 0.74 at
    // the planted angle — banded must be near-total and strictly ahead
    assert(banded >= 180, s"banded caught $banded of 200 planted")
    assert(banded > single, s"banded=$banded not ahead of single=$single")
  }
}
