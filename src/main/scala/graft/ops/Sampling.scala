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

  /** Exact quantile normalization — map every group's value
    * distribution onto the POOLED distribution (the microarray-lineage
    * standard; Bolstad et al., *Bioinformatics* 2003): a row at
    * within-group rank `r` of `n_g` takes the pooled order statistic
    * at position `⌈r·N/n_g⌉` (computed as `max(1, (r·N) div n_g)` —
    * pure integers). After it, every group has THE SAME value
    * distribution (up to rank granularity), which is what cross-source
    * score calibration needs before thresholds can be shared — q216's
    * percentile norm makes ranks comparable, this makes the VALUES
    * comparable.
    *
    * Ranks are deterministic: (value, id) ordering on both the group
    * and pooled side, so ties replay identically anywhere. Cost
    * shape, stated honestly (the q201 posture): the group rank is a
    * key-partitioned window (fine at any scale), but the pooled order
    * statistics need a GLOBAL row sort — a single-partition window at
    * corpus grain, the exact-comparator half of this pair. Production
    * at 100 TB runs [[quantileNormalizeBinned]], which replaces the
    * global sort with one bin-grain aggregate (the q209/q210
    * exact-vs-binned discipline). The target-position product `r·N`
    * runs in DECIMAL (the q293 widening — the old int64 spelling threw
    * past N ≈ 3·10⁹ under the session's ANSI default); the global sort
    * remains the real bound here, the binned sibling the scale path.
    */
  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: String,
                        idCol: String): DataFrame = {
    val wg = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(idCol))
    val wgAll = Window.partitionBy(col(groupCol))
    val pooled = df
      .select(col(valueCol).as("pv"), col(idCol).as("pid"))
      .withColumn("pos", row_number().over(
        Window.partitionBy().orderBy(col("pv"), col("pid"))).cast("long"))
      .select(col("pos"), col("pv"))
    df.select(col(groupCol), col(idCol), col(valueCol))
      .withColumn("r", row_number().over(wg).cast("long"))
      .withColumn("n_g", count(lit(1)).over(wgAll))
      .crossJoin(broadcast(df.agg(count(lit(1)).as("nn"))))
      .withColumn("pos", expr("greatest(1L, " +
        "(cast(r as decimal(20,0)) * nn) div n_g)"))
      .join(pooled, Seq("pos"))
      .select(col(groupCol), col(idCol), col(valueCol),
        col("pv").as("norm_value"))
  }

  /** Binned quantile normalization — the production sibling of
    * [[quantileNormalize]] (the q209/q210 discipline): pooled order
    * statistics come from ONE bin-grain histogram aggregate instead of
    * a global row sort, and a row maps to the LOWER EDGE of the pooled
    * bin containing its target position (error bounded by one bin
    * width, the documented trade). The group-rank window is unchanged
    * — key-partitioned, scales — and the bins-cardinality cumulative
    * table broadcasts into a range join, so nothing corpus-sized ever
    * sorts globally or single-partitions. Same deterministic tie
    * order, same integer position arithmetic — with the target-position
    * product `r·N` in DECIMAL (the q293 widening): the old int64
    * spelling was a job-killing ANSI throw at `r·N > 2⁶³`, i.e. ANY
    * >9·10⁶-row group against a 10¹²-row corpus — squarely inside this
    * path's own 100 TB charter.
    */
  def quantileNormalizeBinned(df: DataFrame, groupCol: String,
                              valueCol: String, idCol: String,
                              binWidth: Long): DataFrame = {
    require(binWidth >= 1,
      s"quantileNormalizeBinned: binWidth must be >= 1, got $binWidth")
    val wg = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(idCol))
    val wgAll = Window.partitionBy(col(groupCol))
    // bin-grain pooled histogram -> cumulative position ranges
    // (floor-division binning: the Incremental.histState convention,
    // negative values bin correctly; the cumulative windows run at
    // BINS cardinality, where a single partition is the point)
    val bins = df
      .select(expr(s"(`$valueCol` - pmod(`$valueCol`, $binWidth))" +
        s" div $binWidth").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("bn"))
      .withColumn("cum", sum(col("bn")).over(
        Window.partitionBy().orderBy(col("bin"))))
      .withColumn("cum_prev", coalesce(sum(col("bn")).over(
        Window.partitionBy().orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bin"), col("cum_prev"), col("cum"))
    val ranked = df.select(col(groupCol), col(idCol), col(valueCol))
      .withColumn("r", row_number().over(wg).cast("long"))
      .withColumn("n_g", count(lit(1)).over(wgAll))
      .crossJoin(broadcast(df.agg(count(lit(1)).as("nn"))))
      .withColumn("pos", expr("greatest(1L, " +
        "(cast(r as decimal(20,0)) * nn) div n_g)"))
    ranked.join(broadcast(bins),
        col("pos") > col("cum_prev") && col("pos") <= col("cum"))
      .select(col(groupCol), col(idCol), col(valueCol),
        (col("bin") * binWidth).as("norm_value"))
  }
}
