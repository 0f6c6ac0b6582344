package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpus cleaning.
  *
  * Scale design (the 100 TB contract): every variant is
  * candidate-generation-by-key — a `groupBy`/equi-join on a hash-derived
  * key — followed by exact verification *within candidates only*. There is
  * no all-pairs comparison anywhere: the shuffle volume is O(rows × bands),
  * the join fan-out is bounded by real collision rates, and skewed buckets
  * (e.g. millions of empty docs sharing a band hash) can be capped with
  * `maxBucket`. The reference engine has no dedup at all; this is
  * breadth-layer capability.
  */
object Dedup {

  /** Exact dedup on arbitrary key columns: keep exactly one survivor per
    * key (the row with the minimal `orderCol`), and report group size.
    * One shuffle on the key — the same plan at any scale.
    */
  def exactByKey(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(col(orderCol)).as(s"first_$orderCol"),
        count(lit(1)).as("n_dups"))

  /** Exact content dedup stats for a text corpus: total rows vs distinct
    * normalized texts. `countDistinct` plans as a two-phase aggregate —
    * no driver-side set.
    */
  def exactTextStats(df: DataFrame, textCol: String = "text"): DataFrame =
    df.agg(count(lit(1)).as("n_docs"),
      countDistinct(lower(trim(col(textCol)))).as("n_unique"))

  /** Near-duplicate pairs via MinHash + LSH banding, exact-verified.
    *
    * Pipeline (all narrow or key-shuffled — no all-pairs stage):
    *  1. per doc: distinct word-n-gram shingles → K-slot MinHash signature
    *     → B band hashes (codegen'd column expressions, one pass);
    *  2. explode bands; self-equi-join on (band, band_hash) with id<id —
    *     a shuffle join keyed on the band hash, fan-out = true collisions;
    *  3. dedup candidate pairs, join back each side's shingle set, keep
    *     pairs with exact Jaccard >= `threshold`.
    *
    * Recall: pairs with similarity s survive with prob 1-(1-s^rows)^bands;
    * defaults (16×8) catch s>=0.9 with certainty ~1-1e-8. At 100 TB the
    * expensive stage is the band self-join; `maxBucket` drops degenerate
    * buckets (boilerplate/empty docs colliding by the million) the same
    * way production MinHash dedups do.
    */
  def nearDupMinhash(df: DataFrame, idCol: String, textCol: String,
                     threshold: Double = 0.5, shingleN: Int = 3,
                     k: Int = 128, bands: Int = 16, rowsPerBand: Int = 8,
                     maxBucket: Int = 1000): DataFrame = {
    require(bands * rowsPerBand == k, "bands*rowsPerBand must equal k")
    val sh = df.select(col(idCol).as("id"),
      TextOps.shingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
    val banded = sh
      .select(col("id"),
        explode(TextOps.lshBands(
          TextOps.minhashSignature(col("sh"), k), bands, rowsPerBand))
          .as("b"))
      .select(col("id"), col("b.band").as("band"),
        col("b.band_hash").as("band_hash"))
    candidatesToVerified(banded, Seq("band", "band_hash"), sh, threshold,
      maxBucket)
  }

  /** Near-duplicate pairs by SimHash Hamming distance — the Manku-style
    * production criterion (similar docs ⇒ close fingerprints), with the
    * chunk-banding candidate generator.
    *
    * The hash is split into `chunks` bit-slices; by pigeonhole, two hashes
    * within Hamming distance `chunks-1` agree on at least one slice, so
    * grouping by (chunk, value) is a COMPLETE candidate generator for
    * `radius <= chunks-1` — the output is exactly {pairs : hamming <=
    * radius}, not an approximation, and still no all-pairs stage. The
    * 56-bit portable SimHash keeps the criterion replicable in any SQL
    * engine (the DuckDB oracle recomputes it all-pairs and must agree).
    *
    * At 100 TB: shuffle is O(rows × chunks) on (chunk, value); each 7-bit
    * slice splits the corpus ~128 ways, so candidate fan-out stays near
    * true-collision volume; `maxBucket` caps degenerate slices.
    */
  def nearDupSimhash(df: DataFrame, idCol: String, textCol: String,
                     radius: Int = 7, shingleN: Int = 3,
                     chunks: Int = 8, bitsPerChunk: Int = 7,
                     maxBucket: Int = 1000): DataFrame = {
    require(radius <= chunks - 1, "pigeonhole completeness needs radius <= chunks-1")
    require(chunks * bitsPerChunk == graft.expr.PortableSimhash.Bits,
      "chunks*bitsPerChunk must cover the 56-bit fingerprint")
    val hashed = df.select(col(idCol).as("id"),
      TextOps.shingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), TextOps.portableSimhash(col("sh")).as("simh"))
    val chunked = hashed
      .select(col("id"),
        explode(TextOps.simhashChunks(col("simh"), chunks, bitsPerChunk))
          .as("c"))
      .select(col("id"), col("c.chunk").as("chunk"),
        col("c.chunk_val").as("chunk_val"))
    val sized = chunked
      .withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("chunk"), col("chunk_val"))))
      .filter(col("bucket_n") <= maxBucket)
      .drop("bucket_n")
    val l = sized.select(col("chunk"), col("chunk_val"), col("id").as("a_id"))
    val r = sized.select(col("chunk"), col("chunk_val"), col("id").as("b_id"))
    l.join(r, Seq("chunk", "chunk_val"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
      .join(hashed.select(col("id").as("a_id"), col("simh").as("ha")),
        Seq("a_id"))
      .join(hashed.select(col("id").as("b_id"), col("simh").as("hb")),
        Seq("b_id"))
      .withColumn("ham", TextOps.hamming(col("ha"), col("hb")))
      .filter(col("ham") <= radius)
      .select(col("a_id"), col("b_id"), col("ham").cast("int").as("ham"))
  }

  /** Shared tail: bucket self-join on `keyCols` → distinct id pairs →
    * exact-Jaccard verification against each side's shingle set.
    */
  private def candidatesToVerified(buckets: DataFrame, keyCols: Seq[String],
                                   shingleSets: DataFrame, threshold: Double,
                                   maxBucket: Int): DataFrame = {
    // Degenerate-bucket guard: a bucket of m docs yields m(m-1)/2 pairs;
    // capping m bounds worst-case fan-out at scale (trades recall only on
    // pathological boilerplate clusters).
    val sized = buckets
      .withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*)))
      .filter(col("bucket_n") <= maxBucket)
      .drop("bucket_n")
    val l = sized.select(keyCols.map(col) :+ col("id").as("a_id"): _*)
    val r = sized.select(keyCols.map(col) :+ col("id").as("b_id"): _*)
    val cand = l.join(r, keyCols, "inner")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    cand
      .join(shingleSets.select(col("id").as("a_id"), col("sh").as("sh_a")),
        Seq("a_id"))
      .join(shingleSets.select(col("id").as("b_id"), col("sh").as("sh_b")),
        Seq("b_id"))
      .withColumn("jacc", TextOps.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jacc") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jacc"), 4).as("jacc"))
  }
}
