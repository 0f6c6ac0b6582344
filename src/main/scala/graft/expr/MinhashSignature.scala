package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType, StringType}

/** K-slot MinHash signature of an `array<string>` shingle set:
  * `sig[j] = min over shingles of mix64(xxhash64(shingle) + b_j)` —
  * one base hash per shingle, k full-avalanche bijections of it (see
  * [[MinhashSignature.signature]] for the scheme and its history).
  *
  * Native expression for the same reason as [[PortableSimhash]]: the
  * higher-order-function formulation (`transform(sequence(0,K-1), j =>
  * array_min(transform(sh, s => xxhash64(s, j))))`) is interpreted
  * per-lambda-call — at K=128 over ~100 shingles that's ~13k boxed
  * evaluations per row, which measured ~80 s for 5000 documents. Here it's
  * one tight loop over the raw UTF8 bytes (Spark's own XXH64), invoked
  * from whole-stage codegen: the same work runs in well under a second.
  *
  * The signature hash only drives LSH candidate generation (the dedup
  * output is exact-Jaccard verified) and the tolerance-gated q45
  * estimate, so the hash choice is free.
  */
case class MinhashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(NullType, _) | NullType =>
      if (k > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"k must be positive, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    MinhashSignature.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.MinhashSignature.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSignature {

  /** Per-slot permutation offsets, derived deterministically from the
    * slot index. Cached per k: the table is shared by every row of every
    * task in the JVM, never recomputed in the hot loop.
    */
  private val perms =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]
  private[expr] def permsFor(k: Int): Array[Long] =
    perms.computeIfAbsent(k, k2 => {
      val b = new Array[Long](k2)
      var j = 0
      while (j < k2) {
        b(j) = XXH64.hashLong(j.toLong, 0x9e3779b97f4a7c15L)
        j += 1
      }
      b
    })

  /** splitmix64 finalizer — a full-avalanche bijection on 2^64. Slot j's
    * permutation is `mix64(base + b_j)`: a bare affine `a_j*base + b_j`
    * measured max |est−exact| 0.068 on the 190-pair sf0.1 gate (the k
    * slot minima stay correlated through one multiply — uncomfortably
    * close to the ±0.08 tolerance); the finalizer restores the
    * independent-permutation margin at ~5 ALU ops per slot.
    */
  @inline private def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** K-slot signature core, shared with [[MinhashBands]]. Each shingle is
    * hashed ONCE (XXH64 over its raw UTF8 bytes); the k slot values are k
    * bijections `mix64(h + b_j)` of that base hash — the
    * one-hash-k-permutations idea of Spark's own MinHashLSH, with a
    * full-avalanche mixer per slot (see [[mix64]] for why). The
    * previous per-slot `xxhash64(shingle, seed=j)` re-walked the string
    * bytes k times per shingle — at k=256 the dominant cost of the q45
    * sketch scan (sf1 probe warm times: see SCALE_PROBE_r08.json).
    * P(argmin_A = argmin_B) = J(A,B) holds for any fixed total order over
    * a random bijection, so estimator quality is unchanged; hash VALUES
    * change, which is free — signatures/bands only drive candidate
    * generation (outputs are exact-verified) and the q45 estimate is
    * tolerance-gated.
    *
    * Null shingles are skipped; an all-null/empty set yields a signature
    * of Long.MaxValue slots (collides only with other empty sets).
    */
  private[expr] def signature(arr: ArrayData, k: Int): Array[Long] = {
    val pb = permsFor(k)
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = XXH64.hashUTF8String(arr.getUTF8String(i), 0L)
        var j = 0
        while (j < k) {
          val h = mix64(base + pb(j))
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    sig
  }

  /** Static so both the interpreted path and generated code share it. */
  def compute(arr: ArrayData, k: Int): ArrayData =
    new GenericArrayData(signature(arr, k))
}
