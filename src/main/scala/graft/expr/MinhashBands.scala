package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType, StringType}

/** LSH band hashes of an `array<string>` shingle set: the K-slot MinHash
  * signature ([[MinhashSignature]] semantics) folded into `bands` band
  * fingerprints, where band b chains XXH64 over its k/bands consecutive
  * slots (seeded with b, so identical slot values in different bands
  * never collide).
  *
  * Fuses signature + banding into ONE native call because the two-step
  * column formulation re-evaluated the signature subtree inside every
  * band lane: `transform(sequence(0,B-1), b => xxhash64(slice(sig, ...)))`
  * references `sig` once in the tree, so CollapseProject inlines the
  * minhash_signature expression into the lambda and it runs B times per
  * row, interpreted (measured: banding pushed the 0.75 s signature scan
  * to 5.1 s at sf0.1 — the same pathology q50 hit with its inlined norm).
  *
  * Band hashes only drive LSH candidate generation (the dedup output is
  * exact-Jaccard verified), so the fingerprint choice is free — no
  * engine-portability constraint applies.
  */
case class MinhashBands(child: Expression, k: Int, bands: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(NullType, _) | NullType =>
      if (k <= 0) TypeCheckResult.TypeCheckFailure(
        s"k must be positive, got $k")
      else if (bands <= 0 || k % bands != 0) TypeCheckResult.TypeCheckFailure(
        s"bands must divide k, got k=$k bands=$bands")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    MinhashBands.compute(input.asInstanceOf[ArrayData], k, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.MinhashBands.compute($c, $k, $bands)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashBands {

  /** Static so both the interpreted path and generated code share it.
    * The signature core (one string hash per shingle, k full-avalanche
    * bijections) lives in [[MinhashSignature.signature]] — see there
    * for the scheme and why changing hash values is free.
    */
  def compute(arr: ArrayData, k: Int, bands: Int): ArrayData = {
    val sig = MinhashSignature.signature(arr, k)
    val rows = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = b.toLong
      var r = 0
      while (r < rows) {
        h = XXH64.hashLong(sig(b * rows + r), h)
        r += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
}
