package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed —
  * the classic "one hot key lands on one reducer" failure at 100 TB.
  *
  * AQE's skew-join splitting (enabled in GraftSession) handles most cases
  * at runtime by splitting oversized partitions; [[saltedJoin]] is the
  * explicit, planner-independent fallback for when the skew is known
  * up-front (e.g. a null-ish default key holding 30% of a fact table):
  * the fact side scatters each key across `salt` sub-keys, the dimension
  * side replicates `salt`×, and the join key becomes (key, salt) — hot
  * keys now occupy `salt` reducers instead of one. Replication cost is
  * `salt × |dim|`, which is the right trade when |dim| ≪ |fact|.
  */
object Skew {

  /** Inner equi-join `fact ⨝ dim` on `key`, salted `salt` ways.
    * Result equals `fact.join(dim, key)` exactly; only the physical
    * distribution changes. The salt is drawn with a seeded `rand` —
    * deterministic per run, uniform regardless of key values.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salt: Int = 16, seed: Long = 42L): DataFrame = {
    require(salt > 1, "salt must exceed 1")
    val saltedFact = fact.withColumn("__salt",
      floor(rand(seed) * salt).cast("int"))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedFact.join(explodedDim, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }

  /** Two-phase salted aggregation for heavy-tailed group keys: aggregate
    * on (key, salt) first — hot keys spread over `salt` reducers — then
    * re-aggregate the per-salt partials on the key alone (tiny: at most
    * `salt` rows per key). Only valid for aggregates with an associative
    * merge; the caller supplies both phases. For plain sums/counts Spark's
    * own partial aggregation usually suffices — this is for when the
    * per-key state itself is big (collect-style or sketch aggregates).
    */
  def saltedAgg(df: DataFrame, key: String, salt: Int,
                partial: Seq[(String, Column => Column)],
                merge: Seq[(String, Column => Column)],
                seed: Long = 42L): DataFrame = {
    require(salt > 1, "salt must exceed 1")
    require(partial.map(_._1) == merge.map(_._1),
      "partial and merge phases must name the same columns")
    val salted = df.withColumn("__salt", floor(rand(seed) * salt).cast("int"))
    val phase1 = salted.groupBy(col(key), col("__salt"))
      .agg(partial.head._2(col(partial.head._1)).as(partial.head._1),
        partial.tail.map(p => p._2(col(p._1)).as(p._1)): _*)
    phase1.groupBy(col(key))
      .agg(merge.head._2(col(merge.head._1)).as(merge.head._1),
        merge.tail.map(m => m._2(col(m._1)).as(m._1)): _*)
  }

  /** Top-N heavy-hitter keys with their frequencies — the profiling step
    * that decides whether salting is worth the dim-side replication.
    * One partial-aggregated shuffle + a driver-side top-N of group counts.
    */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 10): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key).asc)
      .limit(topN)
}
