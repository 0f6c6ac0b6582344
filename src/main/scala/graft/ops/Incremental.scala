package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view move that
  * makes daily reporting affordable at 100 TB: never recompute a rollup
  * over the full corpus when yesterday's STATE plus today's delta batch
  * merges to the identical answer. The trick is restricting the state
  * to ALGEBRAIC aggregates (count / sum / min / max — each mergeable by
  * an associative, commutative combine), exactly the restriction every
  * engine's partial-aggregation layer already exploits within one
  * query; this module exposes the same algebra ACROSS runs, with the
  * state stored as a plain relation (q175's oracle proves
  * merge(state(base), state(delta)) ≡ state(base ∪ delta) by hash).
  *
  * Derived measures (avg = sum/n) are computed AT READ from the merged
  * state, never stored — storing them would break mergeability (avg is
  * not algebraic; its state is (sum, n), which is what we keep).
  *
  * Scale shape: `aggState` is one partial-combined key shuffle over the
  * batch (the only corpus-sized input); `merge` runs at KEY grain — two
  * state relations full-outer-joined, cost proportional to the rollup,
  * not the data that produced it. The reference engine recomputes every
  * aggregate from scratch (SURVEY §2.1 — its GROUP BY is a full MR
  * pass); this is the maintenance surface it lacks.
  */
object Incremental {

  private val stateCols = Seq("n", "sum_v", "min_v", "max_v")

  /** Aggregate state of one batch: per key group, `(n, sum_v, min_v,
    * max_v)` over `valueCol` (a long column — integerize first, the
    * cents posture, so sums replay bit-identically; NULL values count
    * toward `n` but not the value stats, matching SQL aggregate
    * semantics on both engines). One partial-combined shuffle.
    */
  def aggState(df: DataFrame, keys: Seq[String],
               valueCol: String): DataFrame = {
    require(keys.nonEmpty, "aggState: no grouping keys")
    keys.foreach(k => require(!stateCols.contains(k),
      s"aggState: key '$k' collides with a state column"))
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol)).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))
  }

  /** Merge two aggregate states produced by [[aggState]] with the same
    * keys: counts and sums add, extrema take least/greatest (null-safe
    * — a group whose values were all NULL carries null stats and must
    * not poison the other side's real extrema). Full-outer so groups
    * present in only one state survive. Associative and commutative,
    * so a week of deltas folds in any order (OpsSpec pins the laws).
    */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "merge: no grouping keys")
    Seq(a, b).foreach(s => stateCols.foreach(c =>
      require(s.columns.contains(c), s"merge: input lacks state column '$c'")))
    val bb = b.select((keys.map(col) ++
      stateCols.map(c => col(c).as(s"__b_$c"))): _*)
    a.join(bb, keys, "full_outer")
      .select((keys.map(col) :+
        (coalesce(col("n"), lit(0L)) + coalesce(col("__b_n"), lit(0L)))
          .as("n") :+
        when(col("sum_v").isNull && col("__b_sum_v").isNull,
          lit(null).cast("long"))
          .otherwise(coalesce(col("sum_v"), lit(0L)) +
            coalesce(col("__b_sum_v"), lit(0L))).as("sum_v") :+
        least(col("min_v"), col("__b_min_v")).as("min_v") :+
        greatest(col("max_v"), col("__b_max_v")).as("max_v")): _*)
  }

  /** Read-side derivation from a merged state: the average as a 4dp
    * decimal — computed from `(sum_v, n)` at read, never stored. */
  def withAvg(state: DataFrame): DataFrame =
    state.withColumn("avg_v",
      round(col("sum_v").cast("double") / col("n").cast("double"), 4))
}
