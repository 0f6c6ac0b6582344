package graft.expr

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, NullType}

/** Sign-random-projection LSH bucket id of an embedding vector: `bits`
  * seeded Rademacher (±1) hyperplanes; bucket = the sign bit pattern of
  * the projections.
  *
  * Native expression replacing a per-hyperplane `zip_with`+`aggregate`
  * column tree: at 8 bands × 8 bits × 64 dims that tree cost ~4k
  * interpreted lambda calls per row (~2.5 s for 2000 vectors); this loop
  * is `bits × dim` fused multiply-adds inside whole-stage codegen. The
  * hyperplane matrix is derived deterministically from (bits, dim, seed)
  * and memoized per JVM, so executors regenerate identical planes with no
  * broadcast needed.
  */
case class SrpBucket(child: Expression, bits: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType, _) | ArrayType(NullType, _) |
         NullType =>
      if (bits >= 1 && bits <= 62) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"bits must be in [1,62], got $bits")
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_bucket expects array<float|double>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "srp_bucket"

  private val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // null on null array ELEMENTS too (the input type allows
  // containsNull=true): a null lane read as zero would hash the vector
  // into an arbitrary bucket — same contract as VecCosine, and a null
  // bucket drops out of every bucket equi-join instead of colliding.
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SrpBucket.compute(input.asInstanceOf[ArrayData], bits, seed, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long r = graft.expr.SrpBucket.compute($c, $bits, ${seed}L, $isFloat);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = r.longValue(); }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpBucket {

  private val planeCache = new ConcurrentHashMap[(Int, Int, Long), Array[Byte]]()

  /** Deterministic ±1 planes, identical across executors and runs
    * (same generation as Similarity.hyperplanes: seeded nextBoolean). */
  private def planes(bits: Int, dim: Int, seed: Long): Array[Byte] =
    planeCache.computeIfAbsent((bits, dim, seed), { key =>
      val rnd = new scala.util.Random(key._3)
      Array.fill(key._1 * key._2)(
        if (rnd.nextBoolean()) 1.toByte else -1.toByte)
    })

  /** Null (not a fabricated bucket) when any element is null — a vector
    * with missing lanes has no well-defined projection sign pattern.
    */
  def compute(arr: ArrayData, bits: Int, seed: Long,
              isFloat: Boolean): java.lang.Long = {
    val dim = arr.numElements()
    var d0 = 0
    while (d0 < dim) {
      if (arr.isNullAt(d0)) return null
      d0 += 1
    }
    val p = planes(bits, dim, seed)
    var bucket = 0L
    var j = 0
    while (j < bits) {
      var dot = 0.0
      var d = 0
      val base = j * dim
      while (d < dim) {
        val v = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
        dot += v * p(base + d)
        d += 1
      }
      if (dot > 0) bucket |= 1L << j
      j += 1
    }
    Long.box(bucket)
  }
}
