package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, NullType, StringType, StructField, StructType}

/** Every `window`-token sliding-window fingerprint of a token array, with
  * its 0-based start position: `array<struct<start:int, fp:long>>` — the
  * candidate generator behind cross-document repeated-span removal
  * ([[graft.ops.Dedup.stripRepeatedSpans]], the Lee et al. 2021
  * "Deduplicating Training Data" exact-substring pass re-expressed at
  * token-window grain). A doc shorter than the window emits an empty
  * array.
  *
  * The fingerprint is a TWO-LEVEL portable polynomial: per-token
  * `b = polyHash(token) + 1` (the shared
  * [[PortableFingerprint.polyHash]] — base 31 mod 1e9+7, the +1 keeps
  * the empty token off the absorbing zero), then per-window
  * `fp = fold(0)((acc, b) => (acc·1000003 + b) mod 1e9+7)` over the
  * window's token hashes. Both levels are plain modular arithmetic the
  * DuckDB oracle replays verbatim with `list_reduce`.
  *
  * Native expression because stride-1 windows recomputed naively cost
  * O(tokens × window) hash work per document — at 100 TB that factor-W
  * is the whole bill. Here each token is hashed ONCE and successive
  * windows update by a ROLLING step (drop the leading token's
  * contribution via the precomputed `1000003^(window-1) mod M`, shift,
  * add the entering token): O(tokens) per document, one JVM loop inside
  * WholeStageCodegen. PropertySpec pins rolling ≡ the naive per-window
  * fold on arbitrary token arrays — the law the O(T) shortcut must obey.
  *
  * The reference has no text operators (its expression language is
  * `=`/`AND` over scalars, reference sql2ra/functionality.py:76); this
  * backs the pipeline-breadth layer.
  */
case class RollingFingerprints(child: Expression, window: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | NullType =>
      if (window > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"window must be positive, got $window")
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_fingerprints expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "rolling_fingerprints"

  override protected def nullSafeEval(input: Any): Any =
    RollingFingerprints.compute(input.asInstanceOf[ArrayData], window)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.RollingFingerprints.compute($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFingerprints {

  private val Mod = 1000000007L
  /** Window-level base, distinct from the char-level 31 so a one-token
    * window never collides with the token's own char hash by
    * construction of scale. */
  private val P = 1000003L

  def compute(arr: ArrayData, window: Int): GenericArrayData = {
    val n = arr.numElements()
    val m = n - window + 1
    if (m <= 0) return new GenericArrayData(new Array[AnyRef](0))
    val b = new Array[Long](n)
    var i = 0
    while (i < n) {
      val u = arr.getUTF8String(i)
      b(i) = (if (u == null) 0L else PortableFingerprint.compute(u)) + 1
      i += 1
    }
    var pw = 1L // P^(window-1) mod M — the leading token's weight
    i = 1
    while (i < window) { pw = pw * P % Mod; i += 1 }
    val out = new Array[AnyRef](m)
    var fp = 0L
    i = 0
    while (i < window) { fp = (fp * P + b(i)) % Mod; i += 1 }
    out(0) = new GenericInternalRow(Array[Any](0, fp))
    var s = 1
    while (s < m) {
      val drop = b(s - 1) % Mod * pw % Mod
      fp = ((fp - drop + Mod) % Mod * P + b(s + window - 1)) % Mod
      out(s) = new GenericInternalRow(Array[Any](s, fp))
      s += 1
    }
    new GenericArrayData(out)
  }
}
