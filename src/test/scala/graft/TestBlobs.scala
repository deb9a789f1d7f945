package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Seeded Gaussian-blob fixture for clustering-quality tests — the
  * regenerated analog of the reference's my_test fixture (FIXTURES.md §1:
  * unique ids, seeded). Points with trueLabel -1 are far-out uniform
  * outliers.
  */
object TestBlobs {
  def generate(spark: SparkSession, n: Int = 2000, k: Int = 5, d: Int = 4,
               outliers: Int = 20, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(k, d)(rnd.nextDouble() * 200.0 - 100.0)
    val rows = (0 until n).map { i =>
      val c = i % k
      val f = centers(c).map(x => x + rnd.nextGaussian() * 2.0)
      (i.toLong, f, c)
    } ++ (0 until outliers).map { j =>
      val f = Array.fill(d)(rnd.nextDouble() * 4000.0 - 2000.0)
      ((n + j).toLong, f, -1)
    }
    rows.toDF("id", "features", "trueLabel")
  }
}
