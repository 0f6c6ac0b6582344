package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, NullType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Keep-first deduplication of a document's `sep`-separated units in ONE
  * pass: returns `struct(n_units, n_kept, text_intra)` where
  * `text_intra` re-joins (with `sep`) the units whose first occurrence
  * in the document is themselves — the intra-document repetition
  * removal behind [[graft.ops.Dedup.intraDocDedup]].
  *
  * Native expression because the combinator formulation —
  * `filter(units, (u, i) => array_position(units, u) === i + 1)` — is
  * an interpreted lambda whose `array_position` rescans the array per
  * element: O(units²) per document and outside codegen, measured 2.06 s
  * min for the q86 gate row at sf0.1 (the #2 bench query). Here the
  * whole operator is one hash-set pass per row (O(units)) inside
  * WholeStageCodegen. Identical semantics to the combinator (PropertySpec
  * pins native ≡ HOF on arbitrary strings): `sep` is a LITERAL separator
  * (Java `split(Pattern.quote(sep), -1)` semantics — trailing empty
  * units kept, empty text yields one empty unit), duplicates drop after
  * their first occurrence, survivors re-join in first-occurrence order.
  *
  * The reference has no text operators (its expression language is
  * `=`/`AND` over scalars, reference sql2ra/functionality.py:76); this
  * backs the pipeline-breadth layer.
  */
case class DedupUnits(child: Expression, sep: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType =>
      if (sep.nonEmpty) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("sep must be non-empty")
    case other => TypeCheckResult.TypeCheckFailure(
      s"dedup_units expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_units", IntegerType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false),
    StructField("text_intra", StringType, nullable = false)))
  override def prettyName: String = "dedup_units"

  override protected def nullSafeEval(input: Any): Any =
    DedupUnits.compute(input.asInstanceOf[UTF8String], sep)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", sep, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.expr.DedupUnits.compute($c, $sepRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DedupUnits {

  /** Literal split (Java `split(quote(sep), -1)` semantics: all fields
    * kept, "" yields [""]), keep-first via an insertion-ordered set,
    * re-join. One pass, O(total length). */
  def compute(text: UTF8String, sep: String): InternalRow = {
    val s = text.toString
    val units = new java.util.ArrayList[String]()
    var from = 0
    var idx = s.indexOf(sep, from)
    while (idx >= 0) {
      units.add(s.substring(from, idx))
      from = idx + sep.length
      idx = s.indexOf(sep, from)
    }
    units.add(s.substring(from))
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < units.size()) { seen.add(units.get(i)); i += 1 }
    val joined = String.join(sep, seen)
    new GenericInternalRow(Array[Any](units.size(), seen.size(),
      UTF8String.fromString(joined)))
  }
}
