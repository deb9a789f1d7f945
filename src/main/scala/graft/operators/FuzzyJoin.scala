package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance self-join via SymSpell symmetric-delete blocking
  * (Garbe's algorithm): two strings within Levenshtein distance d share
  * a common string reachable by ≤ d deletions from each (property-tested
  * in `TextOpsSpec`), so candidates come from an EQUI-join on deletion-
  * variant keys — never an all-pairs scan — and only bucket-mates reach
  * the codegen `levenshtein` verify.
  *
  * Scale shape: a word of length L emits 1 + L + L(L−1)/2 variant keys
  * (map-side HOFs, no UDF); bucket fan-in is the variant's dictionary
  * popularity (small for natural vocabularies); the self-join is pinned
  * SHUFFLE_MERGE because the keyed side sits behind an explode whose
  * size the planner can only guess — a real dictionary (10M words × ~37
  * variants) must never be statically broadcast.
  */
object FuzzyJoin {

  /** One-char-deletion neighborhood: delete position i for i = 1..L. */
  private def del1(x: Column): Column =
    transform(sequence(lit(1), length(x)), i =>
      concat(x.substr(lit(1), i - lit(1)), x.substr(i + lit(1), length(x))))

  /** All strings reachable by ≤ 2 deletions (incl. the word itself). */
  def deletionVariants2(w: Column): Column =
    array_distinct(concat(array(w), del1(w),
      flatten(transform(del1(w), x => del1(x)))))

  /** @param vocab   distinct strings, one per row
    * @param wordCol column name of the string
    * @return (w_a, w_b, dist) — all unordered pairs with lev ≤ 2
    */
  def selfJoin(vocab: DataFrame, wordCol: String): DataFrame = {
    // rename BEFORE the variant projection: aliasing and referencing the
    // word in one select makes the analyzer thread the explode's lambdas
    // through a lateral column alias, which Spark rejects at checkAnalysis
    val v = vocab.select(col(wordCol).as("w"))
    val keyed = v.select(col("w"), explode(deletionVariants2(col("w"))).as("vkey"))
    keyed.select(col("w").as("w_a"), col("vkey")).hint("shuffle_merge")
      .join(keyed.select(col("w").as("w_b"), col("vkey")).hint("shuffle_merge"),
        Seq("vkey"))
      .filter(col("w_a") < col("w_b"))
      .select(col("w_a"), col("w_b")).distinct()
      .withColumn("dist", levenshtein(col("w_a"), col("w_b")).cast("long"))
      .filter(col("dist") <= 2)
  }
}
