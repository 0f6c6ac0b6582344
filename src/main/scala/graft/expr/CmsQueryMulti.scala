package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, NullType, StringType}

/** Batch form of [[CmsQuery]]: estimate EVERY item of an array against
  * one serialized CountMinSketch, deserializing the sketch ONCE per
  * call instead of once per probe row.
  *
  * Why it exists (r20 optimization round, profiled): [[CmsQuery]]'s
  * documented cost model is O(depth × width) deserialization per call —
  * at the registry default eps = 1e-4 that is ~1.1 MB of counter table
  * per probe, and q118's 620-probe relation spent 2.4 s single-task
  * re-reading the same 20 sketches. [[graft.ops.Sketch.estimateFreq]]
  * now groups the probe items per registry group and reads each group's
  * estimates through one call — G deserializations total, the floor the
  * summary's design intends.
  *
  * Same null/corruption contract as [[CmsQuery]] per ELEMENT semantics:
  * a null or corrupt sketch yields NULL (whole result); a null item
  * yields a NULL element; estimates are bit-identical to [[CmsQuery]]
  * because both call the same library `estimateCount(String)`.
  */
case class CmsQueryMulti(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(dt: DataType, want: DataType => Boolean): Boolean =
    want(dt) || dt == NullType

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType, _ == BinaryType) &&
        ok(right.dataType, {
          case ArrayType(StringType, _) => true
          case _ => false
        }))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_query_multi expects (binary sketch, array<string> items), " +
        s"got ${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "cms_query_multi"
  override def nullable: Boolean = true

  override protected def nullSafeEval(sk: Any, items: Any): Any =
    CmsQueryMulti.compute(sk.asInstanceOf[Array[Byte]],
      items.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, items) => s"""
      Object r = graft.expr.CmsQueryMulti.compute($sk, $items);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) r; }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CmsQueryMulti {

  /** Null on corrupt/implausible sketch bytes (the [[CmsQuery]]
    * contract); per-element null for null items. */
  def compute(sk: Array[Byte], items: ArrayData): GenericArrayData = {
    val cms =
      try {
        if (!CmsQuery.shapePlausible(sk)) null
        else org.apache.spark.util.sketch.CountMinSketch.readFrom(sk)
      } catch { case scala.util.control.NonFatal(_) => null }
    if (cms == null) return null
    val n = items.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (items.isNullAt(i)) null
        else cms.estimateCount(
          items.getUTF8String(i).toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}
