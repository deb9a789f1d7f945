package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.eval.Nmi
import graft.functions.VectorFunctions
import graft.kmeans.MLlibKMeans
import graft.plans.GraftExtensions

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestSession.get
    GraftExtensions.install(s)
    s
  }

  test("optimizer rule rewrites HOF dot/sqdist folds to codegen kernels") {
    // parquet-backed input so constant folding can't collapse the plan
    val e = graft.sources.PointSource.fromEmbeddings(spark, "/root/testdata/sf0.001")
    val q = e.select(col("id"),
      VectorFunctions.dot(col("features"), col("features")).as("d"),
      VectorFunctions.sqDist(col("features"), col("features")).as("s"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dot_native"), s"dot not rewritten:\n$plan")
    assert(plan.contains("sqdist_native"), s"sqdist not rewritten:\n$plan")
    // values must match the un-rewritten HOF semantics: d = |v|^2, s = 0
    val row = q.orderBy(col("id")).head()
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-3) // unit-norm embeddings
    assert(row.getDouble(2) == 0.0)
  }

  test("native kernels are SQL-callable") {
    val r = spark.sql(
      """SELECT dot_native(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       sqdist_native(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS s,
        |       mahalanobis_native(array(2.0D, 5.0D), array(0.0D, 5.0D),
        |                          array(1.0D, 0.0D)) AS m""".stripMargin).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 25.0)
    assert(r.getDouble(2) == 2.0) // zero-std dim skipped
  }

  test("MLlib-backed k-means recovers blob clusters (SURVEY §7 MLlib mode)") {
    val blobs = TestBlobs.generate(spark, n = 1500, k = 5, d = 4, outliers = 0)
    val model = MLlibKMeans.fit(blobs.select(col("id"), col("features")), k = 5, iters = 5)
    assert(model.centers.length == 5)
    val pred = model.assign(blobs, "features").select(col("id"), col("label"))
    val nmi = Nmi.score(pred, blobs.select(col("id"), col("trueLabel")))
    assert(nmi > 0.95, s"MLlib k-means NMI $nmi")
  }
}
