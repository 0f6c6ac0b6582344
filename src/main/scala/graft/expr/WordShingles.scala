package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column — the unit of near-dup
  * similarity.
  *
  * Native expression because the combinator formulation
  * (`array_distinct(transform(sequence(...), i => concat_ws(" ",
  * element_at(w,i+1), ...)))`) is interpreted per lambda call and
  * `array_distinct` compares quadratically: measured 15 s for 5000 docs,
  * which re-accrues on every lineage recomputation downstream. Here it's
  * one pass with a hash set: sub-second at the same scale, and pipelines
  * inside WholeStageCodegen.
  *
  * Tokenization matches `split(text, "\\s+")` (Java regex semantics,
  * including the leading empty token on leading whitespace) so results
  * stay identical to the combinator version and to the DuckDB oracle's
  * `string_split(text, ' ')` on single-spaced corpora.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType =>
      if (n > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"n must be positive, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {

  // Java regex \s (ASCII-only), matching split(text, "\\s+") exactly.
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val s = text.toString
    val words = new java.util.ArrayList[String]()
    var i = 0
    if (s.nonEmpty && isWs(s.charAt(0))) words.add("") // Java split semantics
    while (i < s.length) {
      while (i < s.length && isWs(s.charAt(i))) i += 1
      if (i < s.length) {
        val start = i
        while (i < s.length && !isWs(s.charAt(i))) i += 1
        words.add(s.substring(start, i))
      }
    }
    val m = words.size - n + 1
    if (m <= 0) return new GenericArrayData(new Array[AnyRef](0))
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var w = 0
    while (w < m) {
      sb.setLength(0)
      var d = 0
      while (d < n) {
        if (d > 0) sb.append(' ')
        sb.append(words.get(w + d))
        d += 1
      }
      seen.add(sb.toString)
      w += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}
