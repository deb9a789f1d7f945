package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{NativeTextFunctions, TextOps}

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  test("native distinct shingles ≡ declarative HOF form (incl. edge cases)") {
    import spark.implicits._
    val texts = Seq(
      "",                       // empty → single empty shingle
      "one",                    // 1 word → truncated shingle
      "one two",                // 2 words → truncated shingle
      "one two three",          // exactly one full shingle
      "a b c d e",              // sliding shingles
      "  leading and   inner   spaces  ", // trim + \s+ collapse
      "dup dup dup dup dup",    // repeated shingles collapse to one
      "the quick brown fox jumps over the lazy dog the quick brown fox"
    ).toDF("text")
    val rows = texts.select(
      sort_array(NativeTextFunctions.distinctShinglesNative(col("text"))).as("native"),
      sort_array(array_distinct(TextOps.shingles(col("text")))).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"native=${r.getSeq[String](0)} hof=${r.getSeq[String](1)}")
    }
  }
}
