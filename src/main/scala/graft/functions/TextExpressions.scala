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
  private val Whitespace = Pattern.compile("\\s+")
}

object NativeTextFunctions {
  /** Distinct word 3-gram shingles, single-pass. */
  def distinctShinglesNative(text: Column): Column =
    ColumnBridge.column(WordShinglesExpr(ColumnBridge.expression(text)))
}
