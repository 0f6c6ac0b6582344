package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, NullType}

/** Asymmetric-distance-computation (ADC) inner-product sum for product
  * quantization (Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011): given a row's PQ `codes` (m sub-quantizer cell
  * ids) and a QUERY-side lookup table `lut` laid out flat as
  * `lut[j * ksub + c] = <query_subvector_j, codebook_center_{j,c}>`,
  * returns `Σ_j lut[j * ksub + codes[j]]` — the inner product of the
  * query with the row's RECONSTRUCTION, in m array reads instead of a
  * dim-length dot product.
  *
  * This is the whole point of PQ at scale: the corpus side of the scan
  * carries only m small ints per row (vs dim floats), and per-pair cost
  * drops from O(dim) to O(m) because the dim-dependent work was hoisted
  * into the per-QUERY lut (|queries| × m × ksub × dsub multiplies,
  * corpus-size-independent). One fused codegen loop, no allocation.
  *
  * Null/corruption contract (the [[VecCosine]] posture): a null codes or
  * lut input, a null element in either, a code outside [0, ksub), or a
  * lut whose length is not a multiple of ksub yields NULL — a corrupt
  * compressed row must fall out of every top-k (TopK filters null sims),
  * never score as garbage.
  */
case class PqAdc(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  private def codesOk(dt: DataType): Boolean = dt match {
    case ArrayType(IntegerType, _) | ArrayType(NullType, _) | NullType => true
    case _ => false
  }

  private def lutOk(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) | ArrayType(NullType, _) | NullType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ksub < 1)
      TypeCheckResult.TypeCheckFailure(s"pq_adc needs ksub >= 1, got $ksub")
    else if (codesOk(left.dataType) && lutOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects (array<int> codes, array<double> lut), " +
        s"got ${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"
  override def nullable: Boolean = true

  override protected def nullSafeEval(codes: Any, lut: Any): Any =
    PqAdc.compute(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData],
      ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => s"""
      Object r = graft.expr.PqAdc.compute($codes, $lut, $ksub);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((Double) r).doubleValue(); }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdc {

  /** Boxed Double so codegen/eval share one null-signaling path. */
  def compute(codes: ArrayData, lut: ArrayData, ksub: Int): java.lang.Double = {
    val m = codes.numElements()
    if (lut.numElements() != m.toLong * ksub) return null
    var sum = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val c = codes.getInt(j)
      if (c < 0 || c >= ksub) return null
      val idx = j * ksub + c
      if (lut.isNullAt(idx)) return null
      sum += lut.getDouble(idx)
      j += 1
    }
    sum
  }
}
