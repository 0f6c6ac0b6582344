package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling-design arithmetic — the allocation step UPSTREAM of the
  * hash-rank samplers (q100's weighted stratified keep): deciding how
  * many rows each stratum GETS before any row is drawn. Kept exact and
  * integral so a sample design replays bit-identically across engines
  * and re-runs — the same posture as the engine's threshold arithmetic
  * everywhere else (cross-multiplied integers, no floating quotas).
  */
object Sampling {

  /** Proportional quota allocation by the largest-remainder (Hamilton)
    * method: given per-stratum counts `n_i` summing to `T`, allocate a
    * total budget `N ≤ T` as `q_i = ⌊N·n_i/T⌋` plus one extra for the
    * `N − Σ⌊·⌋` largest remainders `(N·n_i) mod T` (stratum value
    * ascending breaks remainder ties, so the allocation is a pure
    * function of the counts). Hamilton satisfies the quota rule — every
    * `q_i` is its exact proportional share rounded up or down, never
    * further — which is exactly the property a sample design needs
    * (divisor methods like D'Hondt can drift a stratum multiple seats
    * from proportional). All arithmetic is int64 (`N·n_i` — callers
    * at 100 TB scale pass budgets, not corpus sizes, so the product
    * stays far under 2^63; guarded anyway).
    *
    * Cost: one key shuffle to stratum grain, then window passes over
    * the STRATA-cardinality relation — the corpus is touched once.
    * Output: `(stratumCol, n, quota)` with `Σ quota = N` exactly —
    * over a NONEMPTY input. Two edge contracts made explicit (r15
    * advice): an EMPTY input returns an empty allocation (there is no
    * stratum to carry a quota, so `Σ quota = 0`, not `N` — callers
    * that must allocate a positive budget need a nonempty population);
    * and `N > T` is permitted arithmetic (quotas are still each
    * stratum's exact proportional share of N, floor-or-ceil) but
    * over-allocates strata beyond their populations (`q_i > n_i`), so
    * a SAMPLER consuming the design must cap at `n_i` or treat the
    * design as a target, not a draw count.
    */
  def hamiltonAllocation(df: DataFrame, stratumCol: String,
                         total: Long): DataFrame = {
    require(total >= 0, s"hamiltonAllocation: negative budget $total")
    val counts = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n"))
    val wAll = Window.partitionBy()
    val wRem = Window.partitionBy()
      .orderBy(col("rem").desc, col(stratumCol).asc)
    // the overflow guard rides INSIDE base (a free-standing audit
    // column would be pruned away before it could fire)
    val guarded = s"IF(n > ${Long.MaxValue}L div GREATEST(${total}L, 1L)," +
      " CAST(raise_error('hamiltonAllocation: N*n_i overflows int64')" +
      s" AS BIGINT), ${total}L * n)"
    counts
      .withColumn("t", sum(col("n")).over(wAll))
      .withColumn("base", expr(s"$guarded div t"))
      .withColumn("rem", expr(s"$guarded % t"))
      .withColumn("extra", lit(total) - sum(col("base")).over(wAll))
      .withColumn("rk", row_number().over(wRem))
      .select(col(stratumCol), col("n"),
        (col("base") + when(col("rk") <= col("extra"), 1L)
          .otherwise(0L)).as("quota"))
  }
}
