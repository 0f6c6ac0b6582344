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

  /** Top-N heavy-hitter keys with their frequencies — the profiling step
    * that decides whether salting is worth the dim-side replication.
    * One partial-aggregated shuffle + a driver-side top-N of group counts.
    */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 10): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key).asc)
      .limit(topN)
}
