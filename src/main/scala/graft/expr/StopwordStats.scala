package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Stopword profile of a document in one pass: `[n_stopword_tokens,
  * n_tokens]` over the [[WordTokens]] tokenization, where `n_tokens` is
  * `size(word_tokens(text))` — i.e. `max(real words, 1)`, keeping the
  * empty/all-whitespace degenerate case identical to the combinator
  * formulation (`greatest(size(tokens), 1)`) and to the DuckDB oracle.
  * The division `n_stopword_tokens / n_tokens` IS the stopword ratio
  * behind language ID and quality scoring.
  *
  * Native expression because the combinator formulation —
  * `size(filter(tokens, t => t.isin(...)))` — is an interpreted lambda
  * call per TOKEN (ArrayFilter is CodegenFallback), and the stopword
  * ratio backs the corpus-wide quality/language passes (q26, q49) plus
  * every qualityScore consumer: the same per-element-interpreted class
  * of cost the fingerprint and tokenizer expressions removed. Here it
  * is one character scan per row with an O(1) word-set probe, inside
  * WholeStageCodegen (PropertySpec pins native == combinator on
  * arbitrary strings).
  *
  * The stopword list is the engine's tiny builtin (a quality SIGNAL,
  * not a stopword model — TextOps scaladoc); it is compiled into the
  * expression and spelled identically in the DuckDB oracles.
  */
case class StopwordStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"stopword_stats expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "stopword_stats"

  override protected def nullSafeEval(input: Any): Any =
    StopwordStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.StopwordStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StopwordStats {

  /** The builtin list — keep in sync with the `IN (...)` lists in the
    * q26/q49 DuckDB oracles (graft.queries.PipelineQueries).
    */
  val Stopwords: java.util.Set[String] = java.util.Set.of(
    "the", "a", "an", "of", "and", "is", "to")

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(text: UTF8String): GenericArrayData = {
    val s = text.toString
    var nTok = 0L
    var nStop = 0L
    var i = 0
    while (i < s.length) {
      while (i < s.length && isWs(s.charAt(i))) i += 1
      if (i < s.length) {
        val start = i
        while (i < s.length && !isWs(s.charAt(i))) i += 1
        nTok += 1
        if (Stopwords.contains(s.substring(start, i))) nStop += 1
      }
    }
    new GenericArrayData(Array[Any](nStop, math.max(nTok, 1L)))
  }
}
