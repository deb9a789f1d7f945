package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.app.BfrApp
import graft.bfr.BFR
import graft.core.ClusterSummary
import graft.eval.Nmi
import graft.sources.{PointSource, Sinks}

/** End-to-end test of the argv-compatible driver on a reference-layout
  * chunked CSV dataset, plus source/sink unit checks (SURVEY.md §2.1).
  */
class AppAndIoSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  /** Write a chunked dataset in the reference's layout: data0.txt..dataN.txt
    * of `id,f0,...` lines (FIXTURES.md §1).
    */
  def writeChunkedDataset(dir: String, nChunks: Int): Map[Long, Int] = {
    val base = TestBlobs.generate(spark, n = 1200, k = 4, d = 3, outliers = 12)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getInt(2)))
    Files.createDirectories(Paths.get(dir))
    (0 until nChunks).foreach { c =>
      val lines = base.filter(_._1 % nChunks == c)
        .map { case (id, f, _) => s"$id,${f.mkString(",")}" }
      Files.write(Paths.get(s"$dir/data$c.txt"),
        lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    }
    base.map { case (id, _, l) => id -> l }.toMap
  }

  test("PointSource parses id,features lines with inferred dimensionality") {
    val f = Files.createTempFile("points", ".txt")
    Files.write(f, "0,-40.0,-73.5\n1,2.5,3.5\n\n2,1.0,2.0\n".getBytes)
    val df = PointSource.readChunk(spark, f.toString)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 3) // blank line dropped
    assert(rows(0).getLong(0) == 0L)
    assert(rows(0).getSeq[Double](1).toSeq == Seq(-40.0, -73.5))
  }

  test("PointSource drops malformed lines instead of emitting nulls") {
    val f = Files.createTempFile("points_bad", ".txt")
    Files.write(f,
      "0,1.0,2.0\nnot_an_id,3.0,4.0\n1,abc,5.0\n2\n3,6.0,7.0\n".getBytes)
    val rows = PointSource.readChunk(spark, f.toString).orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 3L),
      s"kept ${rows.map(_.getLong(0)).toSeq}")
  }

  test("readChunkStrict drops ragged lines (d from first row, code/bfr.py:145)") {
    val f = Files.createTempFile("points_ragged", ".txt")
    Files.write(f, "0,1.0,2.0\n1,3.0\n2,4.0,5.0,6.0\n3,7.0,8.0\n".getBytes)
    val rows = PointSource.readChunkStrict(spark, f.toString).orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 3L),
      s"kept ${rows.map(_.getLong(0)).toSeq}")
  }

  test("listChunks is lexicographic (round order, code/bfr.py:432)") {
    val d = Files.createTempDirectory("chunks")
    Seq("data2.txt", "data0.txt", "data1.txt").foreach(n =>
      Files.write(d.resolve(n), "0,1.0".getBytes))
    val got = PointSource.listChunks(d.toString).map(p => Paths.get(p).getFileName.toString)
    assert(got == Seq("data0.txt", "data1.txt", "data2.txt"))
  }

  test("BfrApp end-to-end: JSON object + stats CSV in the reference format") {
    val dir = Files.createTempDirectory("bfrds").toString
    val truth = writeChunkedDataset(dir, nChunks = 3)
    val outJson = s"$dir/out_clusters.json"
    val outCsv = s"$dir/out_stats.csv"
    BfrApp.main(Array(dir, "4", outJson, outCsv))

    // sink 1: one JSON object, string keys, int labels (HW4.pdf §4.3a)
    val js = new String(Files.readAllBytes(Paths.get(outJson)), StandardCharsets.UTF_8)
    assert(js.startsWith("{") && js.endsWith("}"))
    val pairs = js.stripPrefix("{").stripSuffix("}").split(",").map { kv =>
      val Array(k, v) = kv.split(":").map(_.trim)
      k.stripPrefix("\"").stripSuffix("\"").toLong -> v.toInt
    }.toMap
    assert(pairs.size == truth.size, s"expected ${truth.size} entries, got ${pairs.size}")

    // NMI vs ground truth above the pass bar
    import spark.implicits._
    val predDf = pairs.toSeq.toDF("id", "cluster")
    val truthDf = truth.toSeq.toDF("id", "label")
    val nmi = Nmi.score(predDf, truthDf)
    assert(nmi > 0.8, s"app NMI $nmi below pass bar")

    // sink 2: header + one row per round, monotone discard counts
    val csv = Files.readAllLines(Paths.get(outCsv))
    assert(csv.get(0) == "round_id,nof_cluster_discard,nof_point_discard," +
      "nof_cluster_compression,nof_point_compression,nof_point_retained")
    assert(csv.size == 4) // header + 3 rounds
    val discards = (1 until csv.size).map(i => csv.get(i).split(",")(2).toLong)
    assert(discards.zip(discards.tail).forall { case (a, b) => a <= b })
  }

  test("BfrApp --seed / --best-of: restarts are deterministic, best kept") {
    val dir = Files.createTempDirectory("bfrseed").toString
    val out = Files.createTempDirectory("bfrseed_out").toString // not the chunk dir
    val truth = writeChunkedDataset(dir, nChunks = 3)
    // three restarts individually, then the best-of-3 protocol run
    BfrApp.main(Array(dir, "4", s"$out/s0.json", s"$out/s0.csv", "--seed", "0"))
    BfrApp.main(Array(dir, "4", s"$out/s1.json", s"$out/s1.csv", "--seed", "1"))
    BfrApp.main(Array(dir, "4", s"$out/s1b.json", s"$out/s1b.csv", "--seed", "1"))
    BfrApp.main(Array(dir, "4", s"$out/s2.json", s"$out/s2.csv", "--seed", "2"))
    BfrApp.main(Array(dir, "4", s"$out/best.json", s"$out/best.csv",
      "--best-of", "3"))
    def labels(p: String): Map[Long, Int] = {
      val js = new String(Files.readAllBytes(Paths.get(p)), StandardCharsets.UTF_8)
      js.stripPrefix("{").stripSuffix("}").split(",").map { kv =>
        val Array(k, v) = kv.split(":").map(_.trim)
        k.stripPrefix("\"").stripSuffix("\"").toLong -> v.toInt
      }.toMap
    }
    assert(labels(s"$out/s1.json") == labels(s"$out/s1b.json"),
      "same seed must reproduce identical assignments")
    // the protocol's pick is exactly one of the member runs
    val best = labels(s"$out/best.json")
    val members = Seq("s0", "s1", "s2").map(n => labels(s"$out/$n.json"))
    assert(members.contains(best), "best-of must return one of its member runs")
    // the reference's quality bar holds for the default-seed run
    import spark.implicits._
    val truthDf = truth.toSeq.toDF("id", "label")
    val nmi0 = Nmi.score(labels(s"$out/s0.json").toSeq.toDF("id", "cluster"), truthDf)
    assert(nmi0 > 0.8, s"seed-0 NMI $nmi0 below pass bar")
  }

  test("JSON-object label source round-trips the assignment sink (S4/S6)") {
    import spark.implicits._
    val df = Seq((1L, 0), (2L, 1), (3L, -1)).toDF("id", "cluster")
    val f = Files.createTempFile("labels", ".json").toString
    Sinks.writeAssignmentsJsonObject(df, f)
    val back = Sinks.readJsonObjectLabels(spark, f).orderBy("id").collect()
    assert(back.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((1L, 0), (2L, 1), (3L, -1)))
  }

  test("columnar source/sink breadth: ORC round-trips with pushdown") {
    import spark.implicits._
    val dir = Files.createTempDirectory("orc_io").toString
    val df = (1L to 1000L).map(i => (i, s"name$i", i * 1.5)).toDF("id", "name", "v")
    df.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir).filter(col("id") > 990).select("id", "v")
    assert(back.count() == 10)
    val p = back.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,990)]"),
      s"ORC pushdown missing:\n$p")
    assert(p.contains("ReadSchema: struct<id:bigint,v:double>"),
      s"ORC pruning missing:\n$p")
  }

  test("mergeCs merges close summaries and remaps indices (M7, bug-fixed)") {
    def mk(center: Array[Double], n: Int): ClusterSummary =
      (0 until n).foldLeft(ClusterSummary.zero(2))((s, i) =>
        s.add(center.map(_ + (i % 3 - 1) * 0.1)))
    val far = mk(Array(1000.0, 1000.0), 9)
    val a = mk(Array(0.0, 0.0), 9)
    val b = mk(Array(0.05, 0.05), 9) // well within 3*sqrt(2) of a's spread
    val (merged, remap) = BFR.mergeCs(IndexedSeq(a, b, far))
    assert(merged.size == 2, s"expected a+b merged: ${merged.map(_.center.toSeq)}")
    assert(merged.head.n == 18)
    assert(remap.get(1).contains(0) || remap.get(0).contains(0))
    assert(remap(2) == 1) // far kept, shifted down
  }
}
