package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace tokenization: the words of the edge-stripped text, i.e.
  * exactly `split(regexp_replace(text, "^\s+|\s+$", ""), "\s+")` — real
  * words only (runs of spaces/tabs/newlines are one separator, document
  * edges contribute no phantom empty tokens), with the same one
  * degenerate case as the regex formulation: an empty or all-whitespace
  * text yields `[""]` (size 1), matching DuckDB's
  * `regexp_split_to_array('', '\s+')`.
  *
  * Native expression because the regex pipeline runs TWO regex engines
  * over every character of every document (the edge-strip replace, then
  * the split), and tokenization backs the per-row operators a pipeline
  * runs corpus-wide: token counts (q38), quality/language scoring
  * (q26/q49), and chunking (q60) — the r8 bench measured the regex
  * formulation doubling q60's cost vs a plain split. Here it is one
  * character scan per row inside WholeStageCodegen (PropertySpec pins
  * native == regex formulation on arbitrary strings). The whitespace
  * class is Java's `\s` (space, tab, \n, \x0B, \f, \r) — ASCII-only by
  * design, identical in RE2/DuckDB, part of the engine-portability
  * contract the text stack keeps throughout.
  */
case class WordTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_tokens expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_tokens"

  override protected def nullSafeEval(input: Any): Any =
    WordTokens.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.WordTokens.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordTokens {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val words = new java.util.ArrayList[Any]()
    var i = 0
    while (i < s.length) {
      while (i < s.length && isWs(s.charAt(i))) i += 1
      if (i < s.length) {
        val start = i
        while (i < s.length && !isWs(s.charAt(i))) i += 1
        words.add(UTF8String.fromString(s.substring(start, i)))
      }
    }
    // empty / all-whitespace → [""], matching the regex formulation
    // (split of an empty string is a one-element empty-string array)
    if (words.isEmpty) words.add(UTF8String.EMPTY_UTF8)
    new GenericArrayData(words.toArray)
  }
}
