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

  test("normalize is Unicode-aware: CJK/Cyrillic/Arabic text survives") {
    import spark.implicits._
    val rows = Seq(
      "Привет, мир! Как дела?",        // Cyrillic + punctuation
      "你好，世界！这是 一个 测试。",      // CJK + fullwidth punctuation
      "مرحبا بالعالم",                  // Arabic
      "Mixed: English и русский 和 中文 123!?")
      .toDF("text")
      .select(TextOps.normalize(col("text")).as("n"))
      .collect().map(_.getString(0))
    assert(rows(0) == "привет мир как дела")
    assert(rows(1) == "你好 世界 这是 一个 测试")
    assert(rows(2) == "مرحبا بالعالم")
    assert(rows(3) == "mixed english и русский 和 中文 123")
    rows.foreach(r => assert(r.nonEmpty, "non-Latin text normalized to empty"))
  }

  test("language-ID covers non-Latin scripts (ru, zh)") {
    import spark.implicits._
    val got = Seq(
      ("и в не было ничего", "ru"),
      ("的 是 了 数据 查询", "zh"),
      ("في من على البيت", "ar"),
      ("the quick brown fox and the dog of war", "en"),
      ("xyzzy plugh", "unk"))
      .toDF("text", "expect")
    val rows = TextOps.withLangId(got, col("text"), "pred").collect()
    rows.foreach(r => assert(r.getAs[String]("pred") == r.getAs[String]("expect"),
      s"text='${r.getAs[String]("text")}'"))
  }

  test("scale probe smoke: every replicated copy lands in its base group") {
    val r = graft.app.TextScaleBench.run(
      spark, "/root/testdata/sf0.001/documents.parquet", copies = 2, partitions = 4)
    assert(r.docs == r.base * 2)
    // each base doc's 2 perturbed copies are mutual near-dups; a few
    // borderline-Jaccard docs may fall under the 0.8 verify bar, so
    // require near-total (not exact) grouping — the smoke is about the
    // pipeline wiring, not the hash family's recall at the margin
    assert(r.groupedDocs >= r.docs * 9 / 10, s"grouped ${r.groupedDocs} of ${r.docs}")
    assert(r.dupPairs >= r.base * 9 / 10,
      s"expected >= ${r.base * 9 / 10} dup pairs, got ${r.dupPairs}")
  }

  test("skew probe: hot bucket emits a linear star, not quadratic pairs") {
    // 1000 identical planted docs >> hotBucketThreshold (256): unguarded,
    // one bucket would emit ~500k pairs; the star emits 999
    val r = graft.app.TextScaleBench.runSkewed(
      spark, "/root/testdata/sf0.001/documents.parquet", planted = 1000, partitions = 4)
    assert(r.docs == r.base + 1000)
    assert(r.candidates < 1000L * 5,
      s"pair blowup: ${r.candidates} candidates for ${r.planted} planted")
    assert(r.candidates >= 999, s"star missing: only ${r.candidates} candidates")
    // identical docs verify at jaccard 1.0 and all land in one group
    assert(r.plantedGrouped == 1000, s"grouped ${r.plantedGrouped} of 1000 planted")
  }

  test("hot-bucket star preserves connected components vs unguarded pairs") {
    import spark.implicits._
    // 300 docs in one shared bucket (> threshold) + a small normal bucket
    val bands = ((1L to 300L).map(i => (i, 0, "hot")) ++
      Seq((400L, 0, "cold"), (401L, 0, "cold"))).toDF("doc_id", "band", "bucket")
    val guarded = TextOps.candidatePairs(bands, "doc_id")
    assert(guarded.count() == 299 + 1) // star on hub=1 + one cold pair
    val unguarded = TextOps.candidatePairs(bands, "doc_id", hotThreshold = Int.MaxValue)
    assert(unguarded.count() == 300L * 299 / 2 + 1)
    val g = graft.operators.ConnectedComponents.canonicalize(guarded)
      .orderBy("doc_id").collect().map(r0 => (r0.getLong(0), r0.getLong(1)))
    val u = graft.operators.ConnectedComponents.canonicalize(unguarded)
      .orderBy("doc_id").collect().map(r0 => (r0.getLong(0), r0.getLong(1)))
    assert(g.sameElements(u), "guarded components differ from unguarded")
  }

  test("salted-complete hot bucket ≡ unguarded complete pairs") {
    import spark.implicits._
    // Fingerprint-tier mode: two hot buckets (100 and 40 members at a
    // threshold of 16 → 7 and 3 hash blocks), one cold bucket, and a
    // cross-band repeat (docs 1,2 share a bucket on band 0 AND band 1)
    // exercising the trailing distinct. The complete mode must
    // reproduce the unguarded pair relation EXACTLY — the property the
    // sf1 gate caught the star mode violating on saturated band spaces.
    val bands = ((1L to 100L).map(i => (i, 0, "hotA")) ++
      (200L to 239L).map(i => (i, 0, "hotB")) ++
      Seq((300L, 0, "cold"), (301L, 0, "cold"),
        (1L, 1, "rep"), (2L, 1, "rep"))).toDF("doc_id", "band", "bucket")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r0 => (r0.getLong(0), r0.getLong(1))).toSet
    val complete = pairSet(
      TextOps.candidatePairs(bands, "doc_id", hotThreshold = 16, hotComplete = true))
    val unguarded = pairSet(
      TextOps.candidatePairs(bands, "doc_id", hotThreshold = Int.MaxValue))
    assert(complete == unguarded, "salted-complete pair relation diverged")
    // (1,2) surfaces in hotA AND rep — the trailing distinct keeps one
    assert(complete.size == 100 * 99 / 2 + 40 * 39 / 2 + 1)
    assert(complete.forall(p => p._1 < p._2), "doc_a < doc_b contract broken")
    // and the star mode genuinely differs here (it is NOT pair-complete)
    val starred = pairSet(
      TextOps.candidatePairs(bands, "doc_id", hotThreshold = 16))
    assert(starred.size == 99 + 39 + 1)
  }

  test("salted hot-key verify path ≡ unsalted pairOverlap") {
    import spark.implicits._
    val rng = new scala.util.Random(19)
    // 60 docs, randomized shingle sets; doc 1 is a hub paired with all
    // others (hot under a threshold of 10), plus random cold pairs
    val sh = (1L to 60L).flatMap { id =>
      val words = (0 until 5 + rng.nextInt(20)).map(_ => s"w${rng.nextInt(40)}")
      words.distinct.map(w => (id, w))
    }.toDF("doc_id", "sh")
    val pairs = ((2L to 60L).map(b => (1L, b)) ++
      (0 until 40).map { _ =>
        val x = 2L + rng.nextInt(58); val y = 2L + rng.nextInt(58)
        (math.min(x, y), math.max(x, y))
      }.filter(p => p._1 != p._2)).distinct.toDF("doc_a", "doc_b")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val salted = rows(TextOps.pairOverlap(sh, "doc_id", pairs, hotThreshold = 10))
    val unsalted = rows(TextOps.pairOverlap(sh, "doc_id", pairs,
      hotThreshold = Int.MaxValue))
    assert(salted == unsalted, "salted verify path changed the overlap results")
    assert(salted.nonEmpty)
  }

  test("char split is code-point exact on non-BMP text (Spark ≡ DuckDB)") {
    import spark.implicits._
    // expected counts verified against DuckDB string_split(text, '') —
    // BOTH engines split into code points: astral chars (surrogate pairs
    // in UTF-16) stay whole, ZWJ and combining marks count separately.
    // A parser that split UTF-16 code units would double-count every
    // astral char and hash-red q_char_entropy on real web text.
    val fixtures = Seq(
      // (doc, expected distinct, expected total code points) — strings are
      // explicit UTF-16 escapes so composed-vs-decomposed source-file
      // ambiguity cannot skew the expectations
      ("hi \uD83D\uDE00\uD83D\uDE00 ok", 6L, 8L),     // U+1F600 x2
      ("\uD83D\uDC68\u200D\uD83D\uDC69\u200D\uD83D\uDC67", 4L, 5L), // ZWJ family
      ("cafe\u0301 e\u0301e\u0301", 6L, 10L),           // combining acute
      ("\uD840\uDC00\uD840\uDC00\uD869\uDED6", 2L, 3L))  // CJK ext B (U+20000 x2, U+2A6D6)
    val df = fixtures.map(_._1).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // the exact q_char_entropy split stage
    val counts = df
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("ch")).as("nd"), sum(col("c")).as("tot"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    fixtures.zipWithIndex.foreach { case ((t, nd, tot), i) =>
      assert(counts(i.toLong) == (nd, tot),
        s"fixture $i '$t': got ${counts(i.toLong)}, want ($nd, $tot)")
    }
    // no surrogate halves may ever surface as "characters"
    val chars = df.select(explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= "").collect().map(_.getString(0))
    assert(chars.forall(c => !c.exists(ch => Character.isSurrogate(ch) && c.length == 1)),
      "a lone UTF-16 surrogate half leaked out of the char split")
  }

  test("native word counts ≡ explode + groupBy counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a c b a"), (2L, "one"), (3L, "  x   y  x ")
    ).toDF("doc_id", "text")
    val native = docs
      .select(col("doc_id"), explode(TextOps.wordCounts(col("text"))).as("wc"))
      .select(col("doc_id"), col("wc.w").as("w"), col("wc.c").cast("long").as("c"))
      .orderBy("doc_id", "w").collect().map(_.toSeq)
    val viaAgg = docs
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("w"))
      .groupBy("doc_id", "w").count().withColumnRenamed("count", "c")
      .orderBy("doc_id", "w").collect().map(_.toSeq)
    assert(native.toSeq == viaAgg.toSeq, s"native=${native.toSeq} agg=${viaAgg.toSeq}")
  }

  test("native bigram stats ≡ declarative HOF cascade (incl. edge cases)") {
    import spark.implicits._
    val stop = Seq("the", "a", "and", "of", "to", "in", "is", "on")
    val stopArr = array(stop.map(lit): _*)
    val texts = Seq(
      "",                       // empty → one empty token, one degenerate bigram
      "one",                    // 1 word → truncated bigram
      "one two",                // exactly one bigram
      "a b c d e",              // sliding bigrams, one stopword
      "  leading and   inner   spaces  ", // trim + \s+ collapse
      "dup dup dup dup dup",    // repeated bigrams collapse
      "the quick brown fox jumps over the lazy dog the quick brown fox"
    ).toDF("text")
    val ws = TextOps.words(col("text"))
    val bg = TextQueries.bigramsFrom(ws)
    val rows = texts.select(
      NativeTextFunctions.bigramStatsNative(col("text"), stop).as("native"),
      struct(
        size(ws).as("n_words"),
        size(filter(ws, w => array_contains(stopArr, w))).as("n_stop"),
        size(bg).as("n_bigrams"),
        size(array_distinct(bg)).as("n_distinct_bigrams")).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getStruct(0).toSeq == r.getStruct(1).toSeq,
        s"native=${r.getStruct(0)} hof=${r.getStruct(1)}")
    }
  }

  test("native map-side signature ≡ min-aggregated signature over exploded shingles") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "one"),
      (3L, "one two"),
      (4L, "dup dup dup dup dup"),
      (5L, (1 to 40).map(i => s"w${i % 7}").mkString(" "))
    ).toDF("doc_id", "text")
    val viaAgg = TextOps.signatureFromShingles(
      TextOps.explodedShingles(docs, "doc_id", col("text")), "doc_id")
      .orderBy("doc_id").collect()
    val viaNative = TextOps.signatureFromText(docs, "doc_id", col("text"))
      .orderBy("doc_id").collect()
    assert(viaAgg.length == viaNative.length)
    viaAgg.zip(viaNative).foreach { case (a, b) =>
      assert(a.toSeq == b.toSeq, s"agg=$a native=$b")
    }
  }

  // CDC re-sync property (q_cdc_chunks): after a front insertion, the
  // boundaries downstream of the edit re-synchronize, so most trailing
  // chunk fingerprints are SHARED between original and edited doc —
  // fixed-width chunking would shift every window and share nothing.
  test("CDC chunking re-syncs after an insertion (trailing chunks shared)") {
    import spark.implicits._
    import graft.functions.TextOps
    val rng = new scala.util.Random(19)
    val body = (0 until 400).map(_ => s"tok${rng.nextInt(500)}").mkString(" ")
    val edited = "inserted words up front " + body
    val fps = TextOps.cdcChunkFingerprints(
      Seq((1L, body), (2L, edited)).toDF("id", "text"), "id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val a = fps.filter(_._1 == 1L).map(_._2).toSet
    val b = fps.filter(_._1 == 2L).map(_._2).toSet
    val shared = a.intersect(b).size
    assert(a.size > 10, s"expected many chunks, got ${a.size}")
    assert(shared >= a.size - 3,
      s"CDC must re-sync after the edit: only $shared of ${a.size} chunks shared")
    // and a fixed-width (non-content-defined) chunking of the same pair
    // shares nothing — the property is content-definedness, not luck
    def fixed(ws: Array[String]) = ws.grouped(16).map(_.mkString(" ")).toSet
    val fw = fixed(body.split(" ")).intersect(fixed(edited.split(" ")))
    assert(fw.size <= 1, s"fixed-width control unexpectedly shared: ${fw.size}")
  }

  // SymSpell deletion-neighborhood blocking (q_fuzzy_join): two words
  // within Levenshtein distance 2 ALWAYS share a string reachable by
  // ≤ 2 deletions from each — property-checked against brute-force edit
  // distance so the equi-join provably misses no candidate pair.
  test("deletion-neighborhood blocking covers every pair with lev ≤ 2") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => i.max(j))
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j), d(i)(j - 1)) + 1,
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def del1(w: String): Set[String] =
      (0 until w.length).map(i => w.substring(0, i) + w.substring(i + 1)).toSet
    def del2(w: String): Set[String] = Set(w) ++ del1(w) ++ del1(w).flatMap(del1)

    val rng = new scala.util.Random(13)
    val vocab = Seq.fill(120)(
      (0 until 3 + rng.nextInt(5)).map(_ => ('a' + rng.nextInt(4)).toChar).mkString)
      .distinct
    var close = 0
    for (Seq(u, v) <- vocab.combinations(2)) {
      if (lev(u, v) <= 2) {
        close += 1
        assert(del2(u).intersect(del2(v)).nonEmpty,
          s"blocking missed pair ($u, $v) at lev ${lev(u, v)}")
      }
    }
    assert(close > 50, s"fixture too sparse to be meaningful: $close close pairs")
  }

  test("native BPE apply stats ≡ chained sentinel-string HOF folds") {
    import spark.implicits._
    // adversarial merge chain: overlap (a,a) on runs, a merged symbol as
    // the LEFT of a later merge (aa+a), one consuming an earlier output
    // (e+ll), plus a merge that never fires
    val merges = Seq(("a", "a"), ("aa", "a"), ("l", "l"), ("e", "ll"), ("z", "q"))
    val texts = Seq(
      "",                        // empty text → 0 / 0
      "aaa aaaa aaaaa a",        // greedy left-to-right runs + chained aa+a
      "hello bell ball",         // l+l then e+ll
      "with|pipe safe here",     // sentinel word excluded, rest counted
      "  padded   spaces  ",     // trim + \s+ parity with the HOF words
      "héllo héllaa über 😀a😀a", // non-ASCII + astral code points
      "zq zzq qz",               // never-firing merge leaves chars intact
      // NEL/LS/PS are NOT Java \s, so they survive word tokenization and
      // must be segmented like any code point (HOF needs (?s): Java '.'
      // excludes them, unlike the native kernel and the RE2 oracle)
      "aa a ll b b plain")
    val df = texts.toDF("text")
    val (hofChars, hofToks) = TextQueries.bpeApplyHofCols(merges)
    val rows = df.select(col("text"),
      NativeTextFunctions.bpeApplyStatsNative(col("text"), merges).as("st"),
      hofChars.as("hc"), hofToks.as("ht")).collect()
    rows.foreach { r =>
      val st = r.getStruct(1)
      assert(st.getLong(0) == r.getLong(2) && st.getLong(1) == r.getLong(3),
        s"text='${r.getString(0)}': native (${st.getLong(0)}, ${st.getLong(1)})" +
          s" vs HOF (${r.getLong(2)}, ${r.getLong(3)})")
    }
    // pin the greedy semantics, not just cross-impl agreement:
    // "aaa"→[aa,a]→[aaa]; "aaaa"→[aa,aa]→[aaa,a]; "aaaaa"→[aa,aa,a]→[aaa,aa]
    val run = rows(1).getStruct(1)
    assert(run.getLong(0) == 13 && run.getLong(1) == 1 + 2 + 2 + 1,
      s"greedy run merge wrong: $run")
  }
}
