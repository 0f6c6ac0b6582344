package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the most recent right
  * row at or before its timestamp, per key. The operator Spark famously
  * lacks (brief: "as-of join, range join, a novel sketch"); the reference
  * has no joins beyond inner equi either (SURVEY §2.1 #6).
  *
  * Implementation is the scalable union-window formulation, NOT a range
  * join: tag both sides, union them, and run one `last_value(..., ignore
  * nulls)` window per key ordered by time — every left row picks up the
  * latest preceding right payload in a single shuffle on the key, O(1)
  * window state per row. A per-key range join would fan out
  * O(|left|×|right|) per key before filtering; this never builds that
  * intermediate, and survives keys with millions of rows (AQE skew-split
  * applies to the one shuffle).
  */
object AsOf {

  /** `left` and `right` must both carry `keyCol` and `tsCol`. Right
    * payload columns are suffixed `_r` in the output; left rows with no
    * preceding right row keep nulls (left-outer as-of semantics).
    * Ties (equal timestamps) match — "at or before" — with the right
    * side winning deterministically via the side tag in the sort key.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String): DataFrame = {
    val rightPayload = right.columns.filter(c => c != keyCol && c != tsCol)
    val leftCols = left.columns
    // The whole right payload rides in ONE struct column: the struct is
    // non-null exactly on right rows (even when every payload FIELD is
    // null), so last(..., ignoreNulls) skips only the left-row
    // placeholders — a right row with a genuinely-null payload value
    // still wins and contributes its null, instead of leaking an older
    // row's value.
    // NULL join keys never match (SQL semantics, same as DuckDB ASOF):
    // null-key right rows are dropped; null-key left rows keep null
    // payloads via their own window partition having no right rows.
    // NULL TIMESTAMPS on the right are dropped too: under asc ordering
    // Spark sorts nulls first, so a null-ts right row would act as
    // timestamp -infinity and leak its payload into every left row —
    // DuckDB ASOF (l.ts >= r.ts) never matches a NULL timestamp. Null-ts
    // LEFT rows sort first, see no right rows, and keep null payloads
    // (also matching DuckDB: NULL >= r.ts is never true).
    val taggedRight = right
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull).select(
      Seq(col(keyCol), col(tsCol), lit(0).as("__side"),
        struct(rightPayload.map(col): _*).as("__r")) ++
        leftCols.filter(c => c != keyCol && c != tsCol)
          .map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("__side"),
        lit(null).cast(taggedRight.schema("__r").dataType).as("__r")) ++
        leftCols.filter(c => c != keyCol && c != tsCol).map(col): _*)
    // side 0 sorts before side 1 at equal ts → right rows are visible to
    // left rows with the same timestamp ("at or before")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(Seq(col(keyCol), col(tsCol)) ++
        leftCols.filter(c => c != keyCol && c != tsCol).map(col) ++
        rightPayload.map(c => col(s"__r.$c").as(s"${c}_r")): _*)
  }

  /** Range join: rows of `fact` matched to the (small) `ranges` side where
    * `valueCol` falls in [loCol, hiCol]. The broadcast-nested-loop shape —
    * correct when the ranges side is broadcastable; for two large sides
    * you'd bucket by range stride first (not needed by any fixture).
    */
  def rangeJoin(fact: DataFrame, ranges: DataFrame, valueCol: String,
                loCol: String, hiCol: String): DataFrame =
    fact.join(broadcast(ranges),
      col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))

  /** Interval-overlap join for TWO LARGE sides — the bucketed shape
    * [[rangeJoin]]'s docstring defers to: pairs (a, b) whose half-open
    * integer intervals `[start, end)` intersect, i.e.
    * `a.start < b.end AND b.start < a.end` (strict: touching intervals
    * do NOT overlap). The workhorse behind session-vs-session attribution,
    * ad-impression/visit matching, and validity-interval reconciliation —
    * jobs where neither side broadcasts and a naive range join is a
    * cartesian per time region.
    *
    * Plan shape: each interval explodes to the grid cells of width
    * `gridWidth` it touches (`⌊start/g⌋ .. ⌊(end−1)/g⌋` — exact integer
    * floor division via the pmod identity, so negative coordinates bucket
    * correctly, no doubles anywhere), the sides equi-join on the cell,
    * and each qualifying pair is emitted ONLY in the cell containing
    * `max(a.start, b.start)` — the classic grid-join anchor trick
    * (DeWitt et al., spatial partitioned join): every overlapping pair
    * shares that cell by construction, so no post-join `DISTINCT` and
    * its extra pair-grain shuffle. One equi-shuffle per side, join cost
    * Σ per-cell |A|·|B|.
    *
    * Sizing `gridWidth` is the caller's lever: explode factor per row is
    * `span/g + 1` (pick g ≈ the median span to keep it ≤ 2), while
    * per-cell occupancy bounds the quadratic term (pick g small enough
    * that a cell holds thousands, not millions — with AQE skew-split on
    * the cell shuffle absorbing hot cells). Degenerate intervals
    * (`end ≤ start`) cannot overlap anything under the strict predicate
    * and are dropped before the explode (an ascending-cell guard too:
    * Spark's `sequence` would happily count DOWN). Column names must be
    * disjoint across the two inputs (loud `require`); both bound columns
    * must be integral. int64 bound: cell ids live at coordinate/g scale,
    * overflow-free wherever the coordinates themselves fit.
    */
  def overlapJoin(a: DataFrame, b: DataFrame,
                  aStart: String, aEnd: String,
                  bStart: String, bEnd: String,
                  gridWidth: Long): DataFrame = {
    require(gridWidth >= 1, s"overlapJoin: gridWidth must be >= 1, got $gridWidth")
    val dup = a.columns.toSet.intersect(b.columns.toSet)
    require(dup.isEmpty,
      s"overlapJoin: column names must be disjoint, both sides carry " +
        dup.toSeq.sorted.mkString(", "))
    // exact int64 floor division (truncating `div` on the pmod-floored
    // numerator — never a double, so the full long range buckets right)
    def fdiv(x: String) =
      expr(s"cast((($x) - pmod(($x), $gridWidth)) div $gridWidth as bigint)")
    def cells(df: DataFrame, sC: String, eC: String) = df
      .filter(col(eC) > col(sC))
      .withColumn("_g_cell",
        explode(sequence(fdiv(s"`$sC`"), fdiv(s"`$eC` - 1"))))
    cells(a, aStart, aEnd).join(cells(b, bStart, bEnd), Seq("_g_cell"))
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd) &&
        col("_g_cell") === fdiv(s"greatest(`$aStart`, `$bStart`)"))
      .drop("_g_cell")
  }
}
