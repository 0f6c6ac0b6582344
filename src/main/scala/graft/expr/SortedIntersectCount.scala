package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType, StringType}

/** `|A ∩ B|` of two ASC-SORTED string arrays by a single merge walk —
  * the exact-set-similarity family's verify kernel
  * (r20 optimization round, profiled).
  *
  * `size(array_intersect(ta, tb))` pays, PER CANDIDATE ROW: an
  * OpenHashSet build over one side (hashing every element), a lookup per
  * element of the other, a dedup set insert per match, an ArrayBuffer →
  * GenericArrayData materialization of the intersection — all to read
  * its size and throw it away. With ~10⁶ candidate pairs per verify
  * stage (q283's door verified 730 k pairs for 47 survivors) that
  * allocation/hashing tax dominated the stage (~21 s of task time).
  * Here both arrays are sorted ONCE per document upstream
  * (`array_sort(array_distinct(…))` — each doc is sorted once but
  * verified against ~10²–10³ partners), so the count is one linear walk
  * of byte-wise `UTF8String.compareTo` — zero allocation, no hashing.
  *
  * CONTRACT: both inputs must be sorted ascending with nulls LAST (the
  * `array_sort` order). On such inputs the result equals
  * `size(array_intersect(a, b))` exactly, duplicates included (equal
  * runs are skipped, so the count is over DISTINCT common elements, and
  * a null present in both sides counts once) — OpsSpec pins the
  * equivalence law. Unsorted inputs are NOT detected (a full check
  * would cost the walk the expression exists to save); every caller
  * normalizes through one shared sorted normalizer, and the stored
  * JaccardIndex scheme version gates artifacts fitted before the sort.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _) | NullType,
            ArrayType(StringType, _) | NullType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects (array<string>, array<string>), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expr.SortedIntersectCount.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** One merge walk; nulls sort AFTER every string (the array_sort
    * order). Equal runs advance past all duplicates so each common
    * value counts once. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var cnt = 0L
    while (i < na && j < nb) {
      if (a.isNullAt(i)) {
        // everything from here on the a side is null (nulls last)
        if (b.isNullAt(j)) return cnt + 1 // null ∈ both, counts once
        j += 1 // bj < null: advance b
      } else if (b.isNullAt(j)) {
        i += 1 // ai < null: advance a
      } else {
        val ai = a.getUTF8String(i)
        val bj = b.getUTF8String(j)
        val c = ai.compareTo(bj)
        if (c == 0) {
          cnt += 1
          // skip the whole equal run on both sides (dedup)
          i += 1
          while (i < na && !a.isNullAt(i) && a.getUTF8String(i) == ai) i += 1
          j += 1
          while (j < nb && !b.isNullAt(j) && b.getUTF8String(j) == bj) j += 1
        } else if (c < 0) i += 1
        else j += 1
      }
    }
    cnt
  }
}
