package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the retrieval/curation family — the invariants the
  * DuckDB oracle can't express: the winnowing guarantee, SQ8 quantizer
  * bounds, and BM25/RRF result sanity at sf0.001.
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    Queries.all.find(_.name == name).getOrElse(fail(s"no query $name"))
      .fn(spark, sf).collect()

  test("winnowing guarantee: a shared run of ≥ k+w−1 tokens yields a shared selected hash") {
    import spark.implicits._
    // two docs that differ everywhere except one 6-token (= k+w−1) run
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one two three four five $shared six seven eight nine ten"),
      (2L, s"red green blue cyan violet $shared amber umber ochre teal pink"))
      .toDF("doc_id", "text")
    val sel = RetrievalQueries.winnowingSelected(docs)
      .select("doc_id", "wmin").distinct().collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getString(1)).toSet }
    assert(sel(1L).intersect(sel(2L)).nonEmpty,
      "docs sharing a ≥ k+w−1 token run must share a winnowing fingerprint")
  }

  test("winnowing density: selected set is a subset at ~2/(w+1) of the hash count") {
    val rows = run("q_winnowing")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nHashes, nSelected) = (r.getLong(1), r.getLong(2))
      assert(nSelected >= 1 && nSelected <= nHashes,
        s"selected must be a nonempty subset: $r")
    }
    // aggregate density should be well below 1 (the point of winnowing)
    val dens = rows.map(_.getLong(3)).sum.toDouble / rows.length
    assert(dens < 900000, s"mean density_micro $dens suggests selection is a no-op")
  }

  test("q_ann_sq8: 3 exact-reranked neighbors per query, cosine in [-1,1]") {
    val rows = run("q_ann_sq8")
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 5 && byQ.values.forall(_.length == 3), s"expected 5×3 rows")
    rows.foreach { r =>
      val cos = r.getDouble(2)
      assert(cos >= -1.0 && cos <= 1.0, s"cosine out of range: $r")
    }
    // rerank is exact: per query, cos must be non-increasing in rn
    byQ.values.foreach { g =>
      val sorted = g.sortBy(_.getLong(3))
      assert(sorted.map(_.getDouble(2)).sliding(2).forall(p => p(0) >= p(1) - 1e-12),
        "rerank order must be by exact cosine")
    }
  }

  test("q_bm25_search: scores positive, rank strictly by (score desc, doc_id)") {
    val rows = run("q_bm25_search").sortBy(_.getLong(2))
    assert(rows.length == 10)
    val scores = rows.map(_.getLong(1))
    assert(scores.forall(_ > 0), "query terms occur in corpus → positive scores")
    assert(scores.sliding(2).forall(p => p(0) >= p(1)), "descending by score")
  }

  test("q_hybrid_rrf: fused top-5 per query, rrf bounded by the two best ranks") {
    val rows = run("q_hybrid_rrf")
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.values.forall(_.length == 5))
    rows.foreach { r =>
      val (rLex, rVec, rrf) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(rLex >= 1 && rVec >= 1)
      val expect = math.floor(1e6 / (60 + rLex)).toLong + math.floor(1e6 / (60 + rVec)).toLong
      assert(rrf == expect, s"rrf must be the two-ranker reciprocal sum: $r")
    }
  }

  test("q_pagerank: isolated docs hold exactly the teleport mass; hubs strictly above") {
    val rows = run("q_pagerank")
    val n = rows.length
    val teleport = math.floor(0.15 * 1e12 / n).toLong
    assert(rows.forall(_.getLong(1) >= teleport),
      "every node keeps at least the teleport mass")
    // docs in no candidate pair receive no in-flow: pr == teleport exactly
    val paired = Queries.all.find(_.name == "q_minhash_lsh_pairs").get
      .fn(spark, sf).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    rows.filterNot(r => paired(r.getLong(0))).foreach { r =>
      assert(r.getLong(1) == teleport, s"isolated doc must sit at teleport: $r")
    }
    assert(rows.filter(r => paired(r.getLong(0))).forall(_.getLong(1) > teleport),
      "docs with in-edges must accumulate above teleport")
  }

  test("q_quality_logit: keep is exactly the score-threshold decision") {
    val rows = run("q_quality_logit")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (score, keep) = (r.getLong(1), r.getLong(2))
      assert(score >= 0 && score < 1000000, s"sigmoid micro out of range: $r")
      assert((keep == 1) == (score >= 500000), s"keep must equal score ≥ 0.5: $r")
    }
  }

  test("q_corpus_diff: statuses partition the union of both snapshots") {
    val rows = run("q_corpus_diff")
    val byStatus = rows.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(byStatus.keySet.subsetOf(Set("added", "removed", "changed", "same")))
    // added = doc_id % 7 == 3 docs; removed = doc_id % 11 == 5 phantoms
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    assert(byStatus.getOrElse("added", 0L) == ids.count(_ % 7 == 3))
    assert(byStatus.getOrElse("removed", 0L) == ids.count(_ % 11 == 5))
    assert(byStatus.values.sum == n + ids.count(_ % 11 == 5))
  }
}
