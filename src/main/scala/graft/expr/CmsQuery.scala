package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Point-query an Apache Spark `CountMinSketch` (Cormode & Muthukrishnan,
  * J. Algorithms 2005) serialized as the BINARY output of Spark's own
  * `count_min_sketch` aggregate: returns the sketch's frequency estimate
  * for `item` — `min_d counter[d][h_d(item)]`, which NEVER undercounts
  * and overcounts by at most εN with probability ≥ the sketch's
  * confidence.
  *
  * Spark ships the aggregate (the corpus-side pass) but no SQL-level
  * reader for the resulting bytes — estimates otherwise require
  * collecting sketches to the driver and looping outside the engine.
  * This expression closes that gap so the probe side stays a relational
  * join: (group, item) probe rows against the G-row sketch table.
  *
  * Cost model: each call deserializes the sketch (O(depth × width)
  * bytes), so this belongs on PROBE-sized relations — G sketches × P
  * probe items, both config-bounded — never on a corpus-sized scan
  * (the corpus pays only the aggregate that built the sketch; that is
  * the whole point of the summary).
  *
  * The item is hashed exactly as the aggregate hashed it: Spark's
  * `CountMinSketchAgg` feeds string columns to the sketch as UTF-8
  * bytes, and `CountMinSketch.estimateCount(String)` re-derives the
  * same bytes, so estimates here are bit-consistent with the sketch
  * the aggregate built (probed under an accented-string fixture in
  * OpsSpec).
  *
  * Null/corruption contract (the [[VecCosine]] posture): null inputs
  * and bytes that do not deserialize as a CountMinSketch yield NULL —
  * a corrupt registry row must surface as a missing estimate, never as
  * a garbage count.
  */
case class CmsQuery(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(dt: DataType, want: DataType): Boolean =
    dt == want || dt == NullType

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType, BinaryType) && ok(right.dataType, StringType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_query expects (binary sketch, string item), " +
        s"got ${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_query"
  override def nullable: Boolean = true

  override protected def nullSafeEval(sk: Any, item: Any): Any =
    CmsQuery.compute(sk.asInstanceOf[Array[Byte]],
      item.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, item) => s"""
      Object r = graft.expr.CmsQuery.compute($sk, $item);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((Long) r).longValue(); }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CmsQuery {

  /** Serialized header: version (4B int) + totalCount (8B long) +
    * depth (4B int) + width (4B int). A corrupt length/dimension field
    * would otherwise drive a huge (or negative) table allocation inside
    * `readFrom` — surfacing as NegativeArraySizeException or OOM rather
    * than the documented NULL — so the declared shape is sanity-checked
    * against the byte count BEFORE the library allocates. depth×width
    * longs must actually be present in the payload (conversely, a
    * truncated payload fails the same check). */
  private[expr] def shapePlausible(sk: Array[Byte]): Boolean = {
    if (sk.length < 20) return false
    val bb = java.nio.ByteBuffer.wrap(sk)
    bb.getInt; bb.getLong // version, totalCount
    val depth = bb.getInt
    val width = bb.getInt
    depth > 0 && width > 0 &&
      depth.toLong * width <= (sk.length - 20L) / 8L
  }

  /** Boxed Long so codegen/eval share one null-signaling path. */
  def compute(sk: Array[Byte], item: UTF8String): java.lang.Long =
    if (!shapePlausible(sk)) null
    else
      try {
        java.lang.Long.valueOf(
          org.apache.spark.util.sketch.CountMinSketch.readFrom(sk)
            .estimateCount(item.toString))
      } catch {
        case scala.util.control.NonFatal(_) => null
      }
}
