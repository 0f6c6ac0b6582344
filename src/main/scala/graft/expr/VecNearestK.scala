package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, NullType}

/** Indices of the `k` nearest centers (squared-euclidean, ascending
  * distance, ties to the lower index) of a vector against a centers
  * table `array<array<double>>` — [[VecNearest]]'s multi-probe sibling,
  * the assignment step when a row must land in SEVERAL cells (semantic
  * dedup candidate generation: a pair straddling a k-means cell
  * boundary still collides because each side also carries its runner-up
  * cells). One fused codegen loop; the k-selection is an insertion into
  * two k-sized locals (k is the probe count, 2..4 in practice — never
  * data-sized).
  *
  * Semantics: returns min(k, #valid centers) indices; mismatched-dim
  * centers are skipped; a null vector element or null/empty centers
  * table yields null (a corrupt vector must get no cell — the
  * [[VecNearest]] contract). `vec_nearest_k(v, cs, 1)[0] ==
  * vec_nearest(v, cs)` by construction (PropertySpec law).
  */
case class VecNearestK(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  private def vecOk(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType | FloatType, _) | ArrayType(NullType, _) |
         NullType => true
    case _ => false
  }

  private def centersOk(dt: DataType): Boolean = dt match {
    case ArrayType(ArrayType(DoubleType | FloatType, _), _) | NullType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"vec_nearest_k needs k >= 1, got $k")
    else if (vecOk(left.dataType) && centersOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_nearest_k expects (array<float|double>, array<array<double>>), " +
        s"got ${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "vec_nearest_k"
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def centersFloat: Boolean = right.dataType match {
    case ArrayType(ArrayType(FloatType, _), _) => true
    case _ => false
  }

  override protected def nullSafeEval(v: Any, cs: Any): Any =
    VecNearestK.compute(v.asInstanceOf[ArrayData], cs.asInstanceOf[ArrayData],
      k, isFloat(left), centersFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cs) => s"""
      org.apache.spark.sql.catalyst.util.ArrayData r =
        graft.expr.VecNearestK.compute($v, $cs, $k,
          ${isFloat(left)}, $centersFloat);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = r; }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecNearestK {

  def compute(v: ArrayData, centers: ArrayData, k: Int, vFloat: Boolean,
              cFloat: Boolean): ArrayData = {
    val n = v.numElements()
    val m = centers.numElements()
    // bounded insertion selection: bestD/bestI hold the current top-k by
    // (distance asc, index asc); filled prefix has length `len`
    val kk = math.min(k, math.max(m, 0))
    val bestD = new Array[Double](kk)
    val bestI = new Array[Int](kk)
    var len = 0
    var c = 0
    while (c < m) {
      if (!centers.isNullAt(c)) {
        val ctr = centers.getArray(c)
        if (ctr.numElements() == n) {
          var d = 0.0
          var i = 0
          while (i < n) {
            if (v.isNullAt(i) || ctr.isNullAt(i)) return null
            val x = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
            val y = if (cFloat) ctr.getFloat(i).toDouble else ctr.getDouble(i)
            val diff = x - y
            d += diff * diff
            i += 1
          }
          // strict `<` on distance: an equal-distance later center never
          // displaces an earlier one — same tie rule as VecNearest
          if (len < kk || d < bestD(len - 1)) {
            var p = if (len < kk) len else kk - 1
            while (p > 0 && d < bestD(p - 1)) {
              bestD(p) = bestD(p - 1); bestI(p) = bestI(p - 1); p -= 1
            }
            bestD(p) = d; bestI(p) = c
            if (len < kk) len += 1
          }
        }
      }
      c += 1
    }
    if (len == 0) null
    else new GenericArrayData(bestI.take(len).map(Int.box(_)))
  }
}
