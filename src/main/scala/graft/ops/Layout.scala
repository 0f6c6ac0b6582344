package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout tools: how rows are ARRANGED on storage decides how much
  * of 100 TB a selective scan actually reads. Sorting clusters one
  * dimension perfectly and leaves every other dimension scattered;
  * Z-ORDERING interleaves the bits of several dimensions into one sort
  * key, so file/row-group min-max statistics stay narrow on ALL of them
  * — a filter on any Z-dimension skips most files (the technique behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`).
  */
object Layout {

  /** The Z-value (Morton code) of `cols`, each min-max scaled to `bits`
    * bits from the supplied (min, max) ranges and bit-interleaved. Pure
    * column arithmetic — codegen-friendly, no UDF. Constant columns
    * (min == max) contribute 0 and are harmless.
    */
  private[ops] def zvalue(cols: Seq[Column], ranges: Seq[(Double, Double)],
                          bits: Int): Column = {
    val k = cols.size
    val maxLevel = (1L << bits) - 1
    val scaled = cols.zip(ranges).map { case (c, (mn, mx)) =>
      if (mx <= mn) lit(0L)
      else least(greatest(
        floor((c.cast("double") - mn) / (mx - mn) * maxLevel).cast("long"),
        lit(0L)), lit(maxLevel))
    }
    (0 until bits).flatMap { b =>
      scaled.zipWithIndex.map { case (s, i) =>
        shiftright(s, b).bitwiseAND(lit(1L)) * lit(1L << (b * k + i))
      }
    }.reduce(_ + _)
  }

  /** Rewrite `df` into a Z-ordered layout over `colNames`: one tiny
    * min/max aggregation fixes the scaling ranges, then a single
    * range-shuffle on the Z-value plus an in-partition sort produce
    * `numFiles` output splits whose min-max envelopes are narrow in
    * EVERY Z-dimension. Write the result straight to parquet/ORC and the
    * format's file/row-group stats do the pruning. Cost: one shuffle —
    * the same price as any repartition — amortized over every selective
    * scan that follows.
    */
  def zorderBy(df: DataFrame, colNames: Seq[String], numFiles: Int,
               bits: Int = 16): DataFrame =
    zorderBy(df, colNames, numFiles, columnRanges(df, colNames), bits)

  /** Precomputed-ranges variant: a caller laying out MANY tables (or the
    * same table repeatedly) reuses catalog/previously-computed column
    * stats instead of paying the [[columnRanges]] min/max scan per call.
    * Ranges only fix the Z-value SCALING — stale-but-roughly-right stats
    * still cluster well (out-of-range values clamp to the edge cells),
    * so reuse across appends is safe.
    */
  def zorderBy(df: DataFrame, colNames: Seq[String], numFiles: Int,
               ranges: Seq[(Double, Double)], bits: Int): DataFrame = {
    require(colNames.size >= 2, "z-ordering needs at least 2 columns")
    require(colNames.size == ranges.size,
      s"${colNames.size} cols but ${ranges.size} ranges")
    require(colNames.size * bits <= 62,
      s"${colNames.size} cols x $bits bits exceeds a long z-value")
    require(numFiles > 0, "numFiles must be positive")
    val z = zvalue(colNames.map(col), ranges, bits)
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
  }

  /** One tiny min/max aggregation (a single driver row) fixing the
    * Z-value scaling ranges for `colNames`; feed the result to the
    * precomputed-ranges [[zorderBy]] overload to layout-rewrite several
    * tables without re-scanning for stats each time.
    */
  def columnRanges(df: DataFrame, colNames: Seq[String])
      : Seq[(Double, Double)] = {
    val aggs = colNames.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    colNames.indices.map(i => (row.getDouble(2 * i), row.getDouble(2 * i + 1)))
  }
}
