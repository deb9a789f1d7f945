package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin

/** Scale validation for the SymSpell fuzzy join: a synthetic dictionary
  * of N base-26 words (length 7, id-derived, deterministic) with a
  * planted typo partner — one char deleted — for every 10th word, run
  * through the deletion-variant blocking self-join + levenshtein verify.
  *
  * The "would it survive 1000×" claims under test:
  *  - variant-key generation is map-side (no UDF, no shuffle before the
  *    join), so the keyed table is ~37 rows/word however large N is;
  *  - bucket fan-in stays small for id-derived words (no degenerate
  *    variant bucket), so candidate counts scale ~linearly with N —
  *    the probe prints candidates/word to make super-linear growth
  *    obvious;
  *  - every planted typo pair is found (recall 1.0 by the blocking
  *    completeness property), checked exactly.
  *
  * Usage: runMain graft.app.FuzzyScaleBench [nWords] [partitions]
  */
object FuzzyScaleBench {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val partitions = args.lift(1).map(_.toInt).getOrElse(cpus.toInt * 4)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", partitions)
      .config("spark.ui.enabled", "false")
      .appName("fuzzy-scale-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // word(id): 7 letters from the id's md5 (16-letter alphabet,
    // deterministic, well-spread); every 10th id also plants word(id)
    // minus its 4th char — a lev-1 typo partner
    val word = translate(substring(md5(col("id").cast("string")), 1, 7),
      "0123456789abcdef", "abcdefghijklmnop")
    val base = spark.range(0, n).select(word.as("w"))
    val typos = spark.range(0, n).filter(col("id") % 10 === 0)
      .select(word.as("w0"))
      .select(concat(col("w0").substr(lit(1), lit(3)),
        col("w0").substr(lit(5), lit(3))).as("w"))
    val vocab = base.union(typos).distinct().repartition(partitions)
      .localCheckpoint(true)
    val vocabN = vocab.count()

    val t0 = System.nanoTime()
    val out = FuzzyJoin.selfJoin(vocab, "w").localCheckpoint(true)
    val nPairs = out.count()
    val joinSec = (System.nanoTime() - t0) / 1e9

    // recall on the planted typo pairs: every (word, word-minus-char-4)
    // pair is at lev 1 and must appear
    val planted = spark.range(0, n).filter(col("id") % 10 === 0)
      .select(word.as("wa"))
      .select(col("wa"), concat(col("wa").substr(lit(1), lit(3)),
        col("wa").substr(lit(5), lit(3))).as("wb"))
      .filter(col("wa") =!= col("wb"))
      .select(least(col("wa"), col("wb")).as("w_a"),
        greatest(col("wa"), col("wb")).as("w_b"))
      .distinct()
    val nPlanted = planted.count()
    val found = planted.join(out, Seq("w_a", "w_b"), "left_semi").count()

    println(s"""{"metric":"fuzzy_scale","n_words":$vocabN,"pairs":$nPairs,""" +
      s""""pairs_per_word":${"%.3f".format(nPairs.toDouble / vocabN)},""" +
      s""""planted":$nPlanted,"planted_found":$found,""" +
      s""""join_sec":${"%.1f".format(joinSec)}}""")
    spark.stop()
  }
}
