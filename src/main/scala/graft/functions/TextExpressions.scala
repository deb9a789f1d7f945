package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word 3-gram shingles of a text column as one tight loop —
  * semantically identical to the declarative form
  * `array_distinct(transform(sequence(1, greatest(size(words)-2, 1)),
  * i -> concat_ws(' ', try_element_at(ws,i), …, try_element_at(ws,i+2))))`
  * (see [[TextOps.shingles]]; equality is unit-tested), but evaluated in
  * one pass per row instead of an interpreted HOF chain that walks the
  * expression tree per element (~3× faster shingling at the 100k-doc
  * scale probe — the corpus shingle pass dominates the dedup pipeline).
  *
  * Codegen emits a single call into [[compute]] via a bound reference, so
  * the surrounding projection stays inside whole-stage codegen.
  */
case class WordShinglesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_shingles_native expects STRING, got ${child.dataType.sql}")
  }

  def compute(text: UTF8String): ArrayData = {
    // UTF8String.trim strips ASCII spaces only — same as Spark's trim();
    // split("\s+", -1) matches the split() builtin the HOF form uses
    val tokens = WordShinglesExpr.Whitespace.split(text.trim.toString, -1)
    val n = tokens.length
    val m = math.max(n - 2, 1)
    val seen = new java.util.LinkedHashSet[String](math.min(m * 2, 1 << 12))
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder(tokens(i))
      if (i + 1 < n) sb.append(' ').append(tokens(i + 1))
      if (i + 2 < n) sb.append(' ').append(tokens(i + 2))
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShinglesExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "word_shingles_native"
}

object WordShinglesExpr {
  private[functions] val Whitespace = Pattern.compile("\\s+")
}

/** Per-document MinHash signature (mh0..mh7, fp) computed map-side in one
  * pass: shingle → two md5 digests → running minima of the eight 32-bit
  * hex chunks and the full plain digest. Semantically identical to
  * min-aggregating [[TextOps.signatureFromShingles]] over the exploded
  * shingles (min over duplicates = min over distinct; equality is
  * unit-tested), but nothing leaves the row — the signature stage of the
  * dedup pipeline shuffles NOTHING at any scale; the only LSH shuffle
  * left is the band-bucket join.
  */
case class MinhashSignatureExpr(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{StructField, StructType}

  override def dataType: DataType = MinhashSignatureExpr.Schema
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_signature_native expects STRING, got ${child.dataType.sql}")
  }

  def compute(text: UTF8String): Any = {
    val tokens = WordShinglesExpr.Whitespace.split(text.trim.toString, -1)
    val n = tokens.length
    val m = math.max(n - 2, 1)
    val seen = new java.util.HashSet[String](math.min(m * 2, 1 << 12))
    val mins = new Array[String](MinhashSignatureExpr.Perms)
    var fp: String = null
    val md = MinhashSignatureExpr.digest.get()
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder(tokens(i))
      if (i + 1 < n) sb.append(' ').append(tokens(i + 1))
      if (i + 2 < n) sb.append(' ').append(tokens(i + 2))
      val sh = sb.toString
      if (seen.add(sh)) {
        val h1 = MinhashSignatureExpr.md5Hex(md, sh)
        val h2 = MinhashSignatureExpr.md5Hex(md, TextOps.minhashSalt + sh)
        if (fp == null || h1.compareTo(fp) < 0) fp = h1
        var c = 0
        while (c < 4) {
          val s1 = h1.substring(c * 8, c * 8 + 8)
          if (mins(c) == null || s1.compareTo(mins(c)) < 0) mins(c) = s1
          val s2 = h2.substring(c * 8, c * 8 + 8)
          if (mins(4 + c) == null || s2.compareTo(mins(4 + c)) < 0) mins(4 + c) = s2
          c += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](MinhashSignatureExpr.Perms + 1)
    var j = 0
    while (j < MinhashSignatureExpr.Perms) {
      out(j) = UTF8String.fromString(mins(j)); j += 1
    }
    out(MinhashSignatureExpr.Perms) = UTF8String.fromString(fp)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinhashSignatureExpr].getName)
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature_native"
}

/** Per-document term frequencies as array<struct<w,c>> in one pass —
  * term frequency is a function of the document alone, so computing it
  * map-side removes the corpus-wide (doc, word) shuffle from TF-IDF
  * (only the vocabulary-sized document-frequency aggregate shuffles).
  * Tokenization matches [[TextOps.words]] (trim + split on \s+);
  * first-occurrence order, counts as int.
  */
case class WordCountsExpr(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("w", StringType, nullable = false),
      StructField("c", IntegerType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_counts_native expects STRING, got ${child.dataType.sql}")
  }

  def compute(text: UTF8String): ArrayData = {
    val tokens = WordShinglesExpr.Whitespace.split(text.trim.toString, -1)
    val counts = new java.util.LinkedHashMap[String, Int](
      math.min(tokens.length * 2, 1 << 12))
    var i = 0
    while (i < tokens.length) {
      counts.merge(tokens(i), 1, (a, b) => a + b)
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue))
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordCounts", this, classOf[WordCountsExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "word_counts_native"
}

/** Per-document token/bigram quality statistics in one pass —
  * struct(n_words, n_stop, n_bigrams, n_distinct_bigrams). Semantically
  * identical to the declarative cascade
  * `size(ws)` / `size(filter(ws, w -> array_contains(stop, w)))` /
  * `size(bigrams)` / `size(array_distinct(bigrams))` where
  * `ws = split(trim(text), "\s+")` and bigram i = `concat_ws(" ",
  * slice(ws, i, 2))` for i in 1..max(n-1, 1) (equality is unit-tested),
  * but those HOFs are interpreted per element — the Gopher-style quality
  * signals (repetition ratio, stopword evidence) dominated the sf0.1
  * bench at ~6 s each; one tight loop per row removes that while staying
  * inside whole-stage codegen via a bound-reference call.
  */
case class BigramStatsExpr(child: Expression, stopWords: Seq[String])
    extends UnaryExpression {
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("n_distinct_bigrams", IntegerType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bigram_stats_native expects STRING, got ${child.dataType.sql}")
  }

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopWords.size * 2)
    stopWords.foreach(s.add)
    s
  }

  def compute(text: UTF8String): Any = {
    val tokens = WordShinglesExpr.Whitespace.split(text.trim.toString, -1)
    val n = tokens.length
    var nStop = 0
    var i = 0
    while (i < n) {
      if (stopSet.contains(tokens(i))) nStop += 1
      i += 1
    }
    val m = math.max(n - 1, 1)
    val seen = new java.util.HashSet[String](math.min(m * 2, 1 << 12))
    i = 0
    while (i < m) {
      val bg = if (i + 1 < n) tokens(i) + " " + tokens(i + 1) else tokens(i)
      seen.add(bg)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, nStop, m, seen.size))
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramStats", this, classOf[BigramStatsExpr].getName)
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "bigram_stats_native"
}

object MinhashSignatureExpr {
  import org.apache.spark.sql.types.{StructField, StructType}

  val Perms: Int = TextOps.minhashPerms

  val Schema: StructType = StructType(
    (0 until Perms).map(i => StructField(s"mh$i", StringType, nullable = false)) :+
      StructField("fp", StringType, nullable = false))

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private def md5Hex(md: java.security.MessageDigest, s: String): String = {
    md.reset()
    val bytes = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = new Array[Char](32)
    var i = 0
    while (i < 16) {
      hex(i * 2) = HexChars((bytes(i) >> 4) & 0xf)
      hex(i * 2 + 1) = HexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(hex)
  }
}

/** BPE application stats in one pass: per safe word (non-empty, no '|'
  * sentinel) segment to code points and apply the trained merges in
  * order, greedy left-to-right; returns (code points of safe words,
  * BPE tokens after all merges). Semantically identical to the chained
  * sentinel-string `aggregate` folds in `TextQueries.bpeApplyHofCols`
  * (equality unit-tested) but one tight loop per row instead of
  * BpeRounds nested interpreted HOFs — the same native-kernel treatment
  * as the MinHash signature. The merge table is a constructor literal,
  * so application stays a map-side projection inside whole-stage
  * codegen at any corpus size.
  */
case class BpeApplyStatsExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars_safe", LongType, nullable = false),
    StructField("n_bpe_tokens", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_apply_stats_native expects STRING, got ${child.dataType.sql}")
  }

  def compute(text: UTF8String): Any = {
    val tokens = WordShinglesExpr.Whitespace.split(text.trim.toString, -1)
    var chars = 0L
    var toks = 0L
    var t = 0
    while (t < tokens.length) {
      val w = tokens(t)
      if (!w.isEmpty && w.indexOf('|') < 0) {
        // code-point segmentation — matches regexp_replace(w,'(.)','|$1')
        // and Spark's length(), both code-point-based
        var syms = new java.util.ArrayList[String](w.length)
        var i = 0
        while (i < w.length) {
          val cc = Character.charCount(w.codePointAt(i))
          syms.add(w.substring(i, i + cc))
          chars += 1
          i += cc
        }
        // each merge pass: append symbols left to right, fusing when the
        // previous OUTPUT symbol is exactly l and the next input is r —
        // the list form of the sentinel-string fold (acc ends with |l),
        // so adjacent occurrences never double-consume a shared symbol
        merges.foreach { case (l, r) =>
          val out = new java.util.ArrayList[String](syms.size)
          var j = 0
          while (j < syms.size) {
            val x = syms.get(j)
            if (!out.isEmpty && out.get(out.size - 1) == l && x == r)
              out.set(out.size - 1, l + r)
            else out.add(x)
            j += 1
          }
          syms = out
        }
        toks += syms.size
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](chars, toks))
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeApplyStats", this, classOf[BpeApplyStatsExpr].getName)
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "bpe_apply_stats_native"
}

object NativeTextFunctions {
  /** Distinct word 3-gram shingles, single-pass. */
  def distinctShinglesNative(text: Column): Column =
    ColumnBridge.column(WordShinglesExpr(ColumnBridge.expression(text)))

  /** Map-side MinHash signature struct (mh0..mh7, fp), single-pass. */
  def minhashSignatureNative(text: Column): Column =
    ColumnBridge.column(MinhashSignatureExpr(ColumnBridge.expression(text)))

  /** Per-document term frequencies array<struct<w,c>>, single-pass. */
  def wordCountsNative(text: Column): Column =
    ColumnBridge.column(WordCountsExpr(ColumnBridge.expression(text)))

  /** Token/bigram quality stats struct(n_words, n_stop, n_bigrams,
    * n_distinct_bigrams), single-pass. */
  def bigramStatsNative(text: Column, stopWords: Seq[String]): Column =
    ColumnBridge.column(BigramStatsExpr(ColumnBridge.expression(text), stopWords))

  /** BPE application stats struct(n_chars_safe, n_bpe_tokens) under a
    * trained merge table, single-pass. */
  def bpeApplyStatsNative(text: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeApplyStatsExpr(ColumnBridge.expression(text), merges))
}
