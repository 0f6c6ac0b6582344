package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, NullType}

/** Cosine similarity of two numeric arrays, computed in double precision
  * with a sequential fold (deterministic summation order → results are
  * identical at any parallelism and comparable across engines, matching
  * the DuckDB oracle to ~1e-15).
  *
  * Native expression for the ANN hot path: the `zip_with`+`aggregate`
  * column formulation is interpreted per lambda (~192 boxed calls per
  * pair at dim 64); this is one fused loop inside whole-stage codegen.
  * Zero-norm vectors (failed embeddings) score 0.0 — under ANSI the
  * division would throw, and a NaN would sort above every real
  * similarity and top-rank garbage.
  */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType | FloatType, _) | ArrayType(NullType, _) |
         NullType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_cosine expects two array<float|double>, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // the result is null on dimension mismatch or null elements, even when
  // both inputs are non-null
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecCosine.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double r = graft.expr.VecCosine.compute($a, $b,
        ${isFloat(left)}, ${isFloat(right)});
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = r.doubleValue(); }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecCosine {

  /** Null (not a fabricated number) on dimension mismatch or null
    * elements — matching the zip_with/aggregate formulation this replaced:
    * a corrupt vector must rank LAST (nulls sort last under desc), never
    * sneak into a top-k with a prefix or zero-filled similarity.
    */
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean,
              bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) Double.box(0.0) else Double.box(dot / denom)
  }
}
