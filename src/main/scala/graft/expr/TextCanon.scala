package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text form for normalization-aware dedup: Unicode NFC
  * composition → ROOT-locale lowercase → edge trim → internal
  * whitespace runs collapsed to one space. The canonicalization a web
  * pipeline applies BEFORE exact/near dedup so that byte-level noise —
  * decomposed accents from one crawler and composed from another,
  * case-only edits, reflowed whitespace — cannot hide a duplicate from
  * a byte-keyed fingerprint.
  *
  * Native expression because Spark has no NFC builtin at all (the
  * lower/trim/regexp parts exist, but composing them around a UDF for
  * the normalization step would break whole-stage codegen on exactly
  * the full-corpus pass this feeds); here the whole chain is one
  * static-method call inside codegen. `java.text.Normalizer` is the
  * JDK's ICU-derived implementation of UAX #15 — deterministic, no
  * locale input; the lowercase step is `Locale.ROOT` so host locale
  * can never leak in (the Turkish-I trap).
  *
  * Cross-engine note: the DuckDB oracle replays this as
  * `regexp_replace(trim(lower(nfc_normalize(text))), '\s+', ' ', 'g')`.
  * NFC and ASCII lowercase agree across engines; FULL case folding of
  * exotic code points (dotted İ, final sigma) can differ between
  * java.lang and utf8proc, so oracle fixtures stay on the agreeing
  * subset — the operator itself is deterministic regardless.
  *
  * The reference has no text operators (its expression language is
  * `=`/`AND` over scalars, reference sql2ra/functionality.py:76); this
  * backs the pipeline-breadth layer.
  */
case class TextCanon(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text_canon expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "text_canon"

  override protected def nullSafeEval(input: Any): Any =
    TextCanon.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextCanon.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextCanon {

  /** The regex-`\s` character set, matching [[WordTokens]]' whitespace
    * definition exactly (and RE2's `\s` in the oracle) — deliberately
    * NOT `Character.isWhitespace`, whose Unicode extras (U+1680 etc.)
    * regex `\s` does not match in either engine.
    */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  /** NFC → ROOT lowercase → trim → collapse `\s+` to single spaces. */
  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    val nfc =
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    val lower = nfc.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(lower.length)
    var i = 0
    var pendingSpace = false
    var started = false
    while (i < lower.length) {
      val c = lower.charAt(i)
      if (isWs(c)) {
        if (started) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
        started = true
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
