package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, NullType}

/** Index of the nearest center (squared-euclidean argmin) of a vector
  * against a centers table `array<array<double>>` — the k-means / IVF
  * assignment step as ONE fused loop in whole-stage codegen.
  *
  * Native expression for the same reason as [[VecCosine]]: the
  * `aggregate`-over-centers HOF formulation is interpreted per lambda —
  * at nlist=16 × dim=64 that is ~4,000 boxed lambda calls per row
  * (measured: it pushed q51 from 5.3 s to 82 s at sf0.1), where this loop
  * is ~1k flops.
  *
  * Semantics: strict `<` comparison, so the lowest-index center wins
  * ties deterministically. Centers whose dimension mismatches the vector
  * are skipped (infinite distance). A null element in the vector or a
  * null/empty centers table yields null — a corrupt vector must get no
  * cluster, never an arbitrary one (same contract as [[VecCosine]]).
  */
case class VecNearest(left: Expression, right: Expression)
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
    if (vecOk(left.dataType) && centersOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_nearest expects (array<float|double>, array<array<double>>), " +
        s"got ${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "vec_nearest"
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
    VecNearest.compute(v.asInstanceOf[ArrayData], cs.asInstanceOf[ArrayData],
      isFloat(left), centersFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cs) => s"""
      java.lang.Integer r = graft.expr.VecNearest.compute($v, $cs,
        ${isFloat(left)}, $centersFloat);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = r.intValue(); }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecNearest {

  def compute(v: ArrayData, centers: ArrayData, vFloat: Boolean,
              cFloat: Boolean): java.lang.Integer = {
    val n = v.numElements()
    val k = centers.numElements()
    var best = -1
    var bestD = Double.MaxValue
    var c = 0
    while (c < k) {
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
          if (d < bestD) { bestD = d; best = c }
        }
      }
      c += 1
    }
    if (best < 0) null else Int.box(best)
  }
}
