package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE subword encoding of a text column under a FIXED merge table
  * (learned by [[graft.ops.TextOps.bpeMerges]]): whitespace words (the
  * [[WordTokens]] scan, same `\s+`-of-stripped semantics as the whole
  * text stack) are split to characters plus the `</w>` end-of-word
  * marker, then the merges are applied IN RANK ORDER, one greedy
  * left-to-right pass per rank — exactly the Sennrich training-time
  * evolution (training round r applies merge r to the state after
  * rounds 1..r-1), so encoding a word the table was trained on
  * reproduces its training segmentation symbol-for-symbol, which is
  * what makes the DuckDB oracle replay exact. Out-of-vocabulary words
  * run the same deterministic algorithm.
  *
  * Native expression because encoding is a per-row tight loop over
  * every character of every document (O(merges × word length) string
  * scans) — as an interpreted HOF tree it would be unusable, and as a
  * UDF it would break WholeStageCodegen for the whole export stage.
  * The merge table is a foldable literal child, pre-flattened ONCE per
  * expression instance into an interleaved pair array (never re-parsed
  * per row); codegen references that object directly.
  *
  * Degenerate case: empty / all-whitespace text is one `""` word
  * ([[WordTokens]] contract), which encodes to `["</w>"]`. ASCII-safe
  * by the same convention as the rest of the stack (characters are
  * UTF-16 code units on the Spark side, codepoints in DuckDB — equal
  * on ASCII corpora).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  // interleaved [a1, b1, a2, b2, ...] in rank order — one flat array the
  // per-row loop indexes without tuple boxing
  @transient private lazy val flat: Array[String] = {
    val out = new Array[String](merges.length * 2)
    var i = 0
    merges.foreach { case (a, b) => out(i) = a; out(i + 1) = b; i += 2 }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    BpeEncode.compute(input.asInstanceOf[UTF8String], flat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", flat, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.expr.BpeEncode.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {

  val EndOfWord = "</w>"

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '' || c == '\f' || c == '\r'

  /** One greedy left-to-right pass of merge (a, b) over the symbol
    * sequence — non-overlapping occurrences, a merged position never
    * re-pairs with what follows it in the same pass ("a a a" under
    * (a,a) gives [aa, a]).
    */
  def applyMerge(syms: java.util.ArrayList[String], a: String,
                 b: String): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String](syms.size)
    var i = 0
    while (i < syms.size) {
      if (i + 1 < syms.size && syms.get(i) == a && syms.get(i + 1) == b) {
        out.add(a + b); i += 2
      } else { out.add(syms.get(i)); i += 1 }
    }
    out
  }

  private def encodeWord(word: String, flat: Array[String],
                         out: java.util.ArrayList[Any]): Unit = {
    var syms = new java.util.ArrayList[String](word.length + 1)
    var i = 0
    while (i < word.length) { syms.add(String.valueOf(word.charAt(i))); i += 1 }
    syms.add(EndOfWord)
    var r = 0
    while (r < flat.length && syms.size > 1) {
      syms = applyMerge(syms, flat(r), flat(r + 1))
      r += 2
    }
    var j = 0
    while (j < syms.size) { out.add(UTF8String.fromString(syms.get(j))); j += 1 }
  }

  def compute(text: UTF8String, flat: Array[String]): GenericArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[Any]()
    var i = 0
    var sawWord = false
    while (i < s.length) {
      while (i < s.length && isWs(s.charAt(i))) i += 1
      if (i < s.length) {
        val start = i
        while (i < s.length && !isWs(s.charAt(i))) i += 1
        encodeWord(s.substring(start, i), flat, out)
        sawWord = true
      }
    }
    // empty / all-whitespace text is the [""] word (WordTokens contract)
    if (!sawWord) encodeWord("", flat, out)
    new GenericArrayData(out.toArray)
  }
}
