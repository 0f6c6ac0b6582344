package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic polynomial rolling hash of a string, mod 1e9+7:
  * `acc = (acc*31 + codepoint) % 1_000_000_007` over the text's Unicode
  * code points (empty text → 0). The ENGINE-PORTABLE fingerprint behind
  * content-keyed dataset splitting, mixture sampling, and the q27 gate —
  * trivially re-implementable in any engine (the DuckDB oracle replicates
  * it with `list_reduce` over `unicode(substr(...))`).
  *
  * Native expression because the combinator formulation —
  * `aggregate(split(text, ""), 0L, (acc, c) => (acc*31 + ascii(c)) % M)` —
  * is an interpreted lambda call PER CHARACTER (CodegenFallback, boxing
  * a Long accumulator each step), and it sits on exactly the operators a
  * pipeline runs over the whole corpus (split assignment, mixture
  * sampling): the round-7 verdict measured it as the largest remaining
  * constant factor (q59's 6.9× sf1 warm ratio). Here the whole hash is
  * one JVM loop inside WholeStageCodegen. Identical semantics to the HOF
  * (PropertySpec pins native == HOF on arbitrary strings): Spark's
  * `split(text, "")` emits one element per CODE POINT (surrogate pairs
  * stay together) and `ascii` returns the full code point, so the loop
  * steps by `Character.charCount`. `(acc*31 + cp)` stays far below 2^63,
  * so ANSI mode never sees an overflow.
  *
  * The reference has no hashing at all (its expression language is
  * `=`/`AND` over scalars, reference sql2ra/functionality.py:76); this
  * backs the pipeline-breadth layer.
  */
case class PortableFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"portable_fingerprint expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "portable_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    PortableFingerprint.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.PortableFingerprint.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PortableFingerprint {

  private val Mod = 1000000007L

  def compute(text: UTF8String): Long = polyHash(text.toString)

  /** THE portable polynomial: one copy of the portability-critical
    * arithmetic, shared with [[PortableSimhash]] (which folds it per
    * shingle) so the two expressions can never drift apart — the DuckDB
    * oracles replicate this exact loop.
    */
  def polyHash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}
