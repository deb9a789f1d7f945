package graft

import java.nio.file.{Files, Paths}
import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

import graft.app.BfrApp
import graft.eval.Nmi

/** Behavioral parity against the ACTUAL reference driver: run
  * `/root/reference/code/bfr.py` (pure stdlib Python) and our BfrApp on
  * the same chunked dataset and require both to recover the ground truth
  * and each other's partition. Cancelled when the reference checkout or
  * python3 is unavailable.
  */
class ReferenceParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  val refDriver = "/root/reference/code/bfr.py"

  test("engine matches the reference driver's clustering on identical input") {
    assume(Files.exists(Paths.get(refDriver)), "reference checkout not present")
    assume(Process(Seq("python3", "--version")).!(ProcessLogger(_ => ())) == 0,
      "python3 not available")

    val dir = Files.createTempDirectory("parity_ds").toString
    val out = Files.createTempDirectory("parity_out").toString // keep outputs
    val truth = new AppAndIoSpec().writeChunkedDataset(dir, nChunks = 3)
    // outputs must NOT land in the chunk dir (it is scanned as input)

    // reference
    val refJson = s"$out/ref.json"
    val rc = Process(Seq("python3", refDriver, dir, "4", refJson, s"$out/ref.csv"),
      new java.io.File("/tmp")).!(ProcessLogger(_ => ()))
    assert(rc == 0, s"reference driver exited $rc")

    // ours
    val ourJson = s"$out/ours.json"
    BfrApp.main(Array(dir, "4", ourJson, s"$out/ours.csv"))

    import spark.implicits._
    def loadJson(f: String) = {
      val m = new String(Files.readAllBytes(Paths.get(f))).trim
        .stripPrefix("{").stripSuffix("}").split(",")
        .map { kv => val Array(k, v) = kv.split(":").map(_.trim)
          k.stripPrefix("\"").stripSuffix("\"").toLong -> v.toInt }
      m.toSeq.toDF("id", "cluster")
    }
    val refDf = loadJson(refJson)
    val ourDf = loadJson(ourJson)
    val truthDf = truth.toSeq.toDF("id", "label")

    val refNmi = Nmi.score(refDf, truthDf)
    val ourNmi = Nmi.score(ourDf, truthDf)
    val mutual = Nmi.score(refDf, ourDf)
    info(f"reference NMI=$refNmi%.4f ours NMI=$ourNmi%.4f mutual NMI=$mutual%.4f")
    assert(ourNmi > 0.9, s"our NMI $ourNmi")
    // the reference seeds with unseeded random.randint — a rare bad draw
    // is its flake, not ours: require parity only when its run is sane
    assume(refNmi > 0.9, s"reference produced a degenerate clustering ($refNmi); skipping parity")
    assert(mutual > 0.9, s"partitions diverge: mutual NMI $mutual")
  }
}
