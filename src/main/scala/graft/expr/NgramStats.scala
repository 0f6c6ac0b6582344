package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document word n-gram frequency summary: `[top_count, total]` —
  * the count of the single most frequent n-gram and the total
  * (NON-distinct) n-gram count. `top_count / total` is the Gopher-style
  * top-n-gram repetition fraction.
  *
  * Native expression because the alternative is an explode → count →
  * max pipeline (two aggregation shuffles and an id join per corpus
  * pass — the r7 sf1 probe measured 37 s for 50k docs) or an
  * interpreted higher-order-function tree. Here it is one hash-map pass
  * per row inside WholeStageCodegen: the whole repetition profile
  * becomes scan-only. Memory per row is O(distinct n-grams of that
  * document) — the same bound [[WordShingles]] already carries.
  *
  * Tokenization is identical to [[WordShingles]] (Java `\s+` split
  * semantics), so fractions agree with the combinator formulation and
  * the DuckDB oracle on single-spaced corpora.
  */
case class NgramStats(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType =>
      if (n > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"n must be positive, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_stats expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_stats"

  override protected def nullSafeEval(input: Any): Any =
    NgramStats.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.NgramStats.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramStats {

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
    if (m <= 0) return new GenericArrayData(Array[Any](0L, 0L))
    val counts = new java.util.HashMap[String, Long]()
    val sb = new java.lang.StringBuilder()
    var top = 0L
    var w = 0
    while (w < m) {
      sb.setLength(0)
      var d = 0
      while (d < n) {
        if (d > 0) sb.append(' ')
        sb.append(words.get(w + d))
        d += 1
      }
      val c = counts.merge(sb.toString, 1L, (a, b) => a + b)
      if (c > top) top = c
      w += 1
    }
    new GenericArrayData(Array[Any](top, m.toLong))
  }
}
