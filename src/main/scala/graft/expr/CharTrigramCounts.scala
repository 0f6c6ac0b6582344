package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row character-trigram occurrence counts: `map<gram, n>` over the
  * 3-CODEPOINT sliding windows of the input — exactly the multiset the
  * Cavnar–Trenkle language-ID stack previously derived with
  * `explode(transform(sequence(1, length−2), i → substr(norm, i, 3)))`
  * followed by a count aggregate.
  *
  * Native expression for two reasons (r20 optimization round, profiled):
  *  - `substr(i, 3)` on a UTF8String walks codepoints from the START of
  *    the string per call, so the transform is O(len²) per document —
  *    the fit/score trigram stages ran ~2 s single-task per pass at
  *    sf0.1. Here the codepoint boundaries are found in ONE forward scan
  *    of the UTF-8 bytes (a boundary is any byte with (b & 0xC0) ≠ 0x80)
  *    and each trigram is a 3-codepoint byte slice — O(len) total.
  *  - returning per-document COUNTS collapses the exploded relation from
  *    one row per occurrence to one row per DISTINCT gram, so the
  *    downstream aggregate shuffles fewer rows (fit) or disappears
  *    entirely (score: doc ids are unique, so the exploded map IS the
  *    (id, gram, n) relation).
  *
  * Trigram identity is byte-equality of the 3-codepoint slices, which is
  * exactly codepoint-string equality — identical to the substr
  * formulation and to the DuckDB oracle's substr replay. Inputs with
  * fewer than 3 codepoints yield an empty map (callers keep their
  * `length ≥ 3` filters, so the boundary never even reaches this).
  */
case class CharTrigramCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_trigram_counts expects string, got ${other.simpleString}")
  }
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "char_trigram_counts"

  override protected def nullSafeEval(input: Any): Any =
    CharTrigramCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.CharTrigramCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharTrigramCounts {

  def compute(text: UTF8String): MapData = {
    val bytes = text.getBytes
    val n = bytes.length
    // codepoint start offsets (one forward pass), plus the end sentinel
    val offs = new Array[Int](text.numChars() + 1)
    var i = 0
    var c = 0
    while (i < n) {
      if ((bytes(i) & 0xC0) != 0x80) { offs(c) = i; c += 1 }
      i += 1
    }
    offs(c) = n
    val m = c - 2 // number of trigrams
    if (m <= 0)
      return new ArrayBasedMapData(
        new GenericArrayData(new Array[AnyRef](0)),
        new GenericArrayData(new Array[AnyRef](0)))
    // LinkedHashMap: deterministic (first-occurrence) key order — the
    // consumers aggregate or window over the values, so order is
    // semantically irrelevant, but determinism keeps plans replayable
    val counts = new java.util.LinkedHashMap[UTF8String, java.lang.Long]()
    var t = 0
    while (t < m) {
      val g = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, offs(t), offs(t + 3)))
      val prev = counts.get(g)
      counts.put(g, if (prev == null) 1L else prev + 1L)
      t += 1
    }
    val keys = new Array[AnyRef](counts.size)
    val vals = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      vals(j) = e.getValue
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }
}
