package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType, StringType}

/** 56-bit engine-portable SimHash of an `array<string>` shingle set.
  *
  * Per shingle: a base-31 polynomial hash mod 1e9+7 (char codepoints);
  * bit k of the fingerprint is the majority vote over shingles of the
  * parity of `(poly*(2k+3)+k) mod 1e9+7`. 56 bits keeps every shift in
  * signed-long range for any SQL engine, letting the DuckDB correctness
  * oracle recompute fingerprints exactly (list_reduce over codepoints).
  *
  * Why a native Expression and not `transform`/`aggregate` column
  * combinators: the equivalent higher-order-function tree inlines the
  * polynomial sub-expression once per output bit (56×), and Catalyst's
  * optimizer walks that tree repeatedly through every rule — minutes of
  * planning for a O(|shingles|·56) per-row computation. Here the loop is
  * a tight JVM method invoked from whole-stage codegen: planning cost is
  * one tree node, runtime is linear, and the operator pipelines inside
  * WholeStageCodegen like any builtin. (Preference order per SURVEY §7.3:
  * compose builtins < custom Expression < UDF — this is the middle tier.)
  */
case class PortableSimhash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    // empty literal `array()` types as array<void>; NULL literal as void —
    // treat both as "no shingles" rather than erroring
    case ArrayType(NullType, _) => TypeCheckResult.TypeCheckSuccess
    case NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"portable_simhash expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "portable_simhash"

  override protected def nullSafeEval(input: Any): Any =
    PortableSimhash.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.PortableSimhash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PortableSimhash {
  final val Bits = 56
  final val Mod = 1000000007L

  /** Static so both the interpreted path and generated code share it. */
  def compute(arr: ArrayData): Long = {
    val total = arr.numElements()
    val poly = new Array[Long](total)
    var n = 0
    var i = 0
    while (i < total) {
      if (!arr.isNullAt(i)) { // null shingles contribute nothing
        // code-point polynomial shared with PortableFingerprint — ONE
        // copy of the oracle-replicated arithmetic in the codebase
        poly(n) = PortableFingerprint.polyHash(arr.getUTF8String(i).toString)
        n += 1
      }
      i += 1
    }
    var out = 0L
    var k = 0
    while (k < Bits) {
      val mult = k * 2 + 3
      var ones = 0
      i = 0
      while (i < n) {
        if (((poly(i) * mult + k) % Mod & 1L) == 1L) ones += 1
        i += 1
      }
      if (2 * ones > n) out |= 1L << k
      k += 1
    }
    out
  }
}
