package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths, per the standard ANN playbook:
  *  - [[bruteForceTopK]]: exact top-k by scanning the corpus once per
  *    (small, broadcast) query set — the correctness baseline, and also
  *    the right plan at 100 TB when |queries| is small: one corpus scan,
  *    no corpus×corpus join, and per-partition partial top-k via
  *    [[TopKAgg]] so only k × partitions rows shuffle per query.
  *  - [[lshTopK]]: sign-random-projection LSH — corpus rows hash into
  *    2^bits buckets; each query probes its own bucket plus all 1-bit
  *    flips, so only a ~(bits+1)/2^bits fraction of the corpus is scored.
  *    Approximate (tunable recall), and the scale path when |queries| is
  *    large.
  *
  * All dot products run in double precision inside the native
  * [[graft.expr.VecCosine]] expression (codegen'd fused loop) — no UDF
  * and no interpreted lambda in the hot path.
  */
object Similarity {

  /** Cosine similarity in double precision — a native Catalyst expression
    * ([[graft.expr.VecCosine]], registered by GraftSession): sequential
    * fold (deterministic at any parallelism, engine-comparable), fused in
    * whole-stage codegen, zero-norm vectors scoring 0.0 (under ANSI the
    * naive division throws; a NaN would sort above every real similarity).
    */
  def cosine(a: Column, b: Column): Column =
    call_function("vec_cosine", a, b)

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact cosine top-k: score every (query, corpus) pair with the query
    * side broadcast, then rank per query via the shuffle-bounded
    * [[TopKAgg]] — per-partition partial top-k means only k × partitions
    * rows cross the wire per query, with no full sort of the scored
    * relation anywhere (the `row_number()` window this replaces sorted
    * EVERY scored row inside one partition per query). Self-matches are
    * excluded; ties break on the neighbor id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
    val scored = c.join(broadcast(q), col("nid") =!= col("qid"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    TopK.perQuery(scored, k)
  }

  /** Sign-random-projection bucket id: `bits` seeded Rademacher (±1)
    * hyperplanes, bucket = the sign bit pattern. A native Catalyst
    * expression ([[graft.expr.SrpBucket]], registered by GraftSession) —
    * the per-hyperplane `zip_with`+`aggregate` column tree was interpreted
    * and ~10× slower; planes regenerate deterministically per executor
    * from the seed, so nothing is broadcast.
    */
  def srpBucket(vec: Column, bits: Int, seed: Long = 42L): Column =
    call_function("srp_bucket", vec, lit(bits), lit(seed))

  /** Approximate cosine top-k via SRP-LSH with 1-bit multiprobe.
    *
    * Corpus rows land in their single bucket; each query fans out to its
    * bucket plus every 1-bit flip (bits+1 probes), then only rows in probed
    * buckets are scored. The join is a shuffle on the bucket id — at 100 TB
    * the scored fraction is ~(bits+1)/2^bits of the corpus per query
    * instead of all of it.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              bits: Int = 12, seed: Long = 42L,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("cv"))
      .withColumn("bucket", srpBucket(col("cv"), bits, seed))
    val probes = transform(sequence(lit(0), lit(bits)),
      j => when(j === 0, col("qbucket"))
        .otherwise(col("qbucket").bitwiseXOR(call_function("shiftleft", lit(1L), j - 1))))
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qbucket", srpBucket(col("qv"), bits, seed))
      .withColumn("bucket", explode(probes))
      .select(col("qid"), col("qv"), col("bucket"))
    // no (qid, nid) dedup needed: each corpus row has exactly ONE bucket
    // and a query's probe buckets are pairwise distinct, so a pair meets
    // at most once
    val scored = c.join(q, Seq("bucket"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    TopK.perQuery(scored, k)
  }

  /** K-means centroids for IVF coarse quantization: deterministic seeded
    * init (hash-ordered sample) + `iters` Lloyd rounds, all as DataFrame
    * ops. Per round: assignment broadcast-joins nlist centroids and
    * collapses the fan-out map-side via `min_by` (only ~|corpus| winner
    * rows cross the shuffle); the update re-averages per (cluster,
    * dimension), partial-aggregated likewise. nlist stays driver-small
    * (coarse quantizers are 2^10..2^16 even at billion scale).
    */
  def kmeansCentroids(corpus: DataFrame, nlist: Int, iters: Int = 5,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame =
    fitIndex(corpus, nlist, iters, idCol, vecCol)._1

  /** Nearest-centroid assignment with map-side argmin: broadcast-join the
    * centroids, then `min_by` per row id — partial aggregation collapses
    * the corpus×nlist join fan-out to one winner per id per partition
    * BEFORE the shuffle, so only ~|corpus| rows cross the wire (a window
    * argmin would shuffle the full fan-out).
    */
  private def assign(c: DataFrame, centroids: DataFrame): DataFrame =
    c.join(broadcast(centroids))
      .groupBy(col("id"))
      .agg(min_by(struct(col("cluster"), col("v")),
        struct(euclid2(col("v"), col("centroid")), col("cluster")))
        .as("best"))
      .select(col("id"), col("best.cluster").as("cluster"),
        col("best.v").as("v"))

  /** Lloyd rounds + ONE final assignment, returned for reuse (ivfTopK
    * builds its inverted file from it instead of re-assigning).
    * Clusters that capture no points keep their previous centroid
    * instead of silently vanishing (nlist is a configured trade-off).
    */
  private def fitIndex(corpus: DataFrame, nlist: Int, iters: Int,
                       idCol: String, vecCol: String)
      : (DataFrame, DataFrame) = {
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    // The init window is GLOBAL by design but bounded: it runs over the
    // nlist rows the limit() already reduced to (coarse quantizers are
    // 2^10..2^16 even at billion scale, driver-small). partitionBy(lit(0))
    // states that single-partition intent explicitly instead of tripping
    // WindowExec's "No Partition Defined" warning on every fit.
    var centroids = c.orderBy(xxhash64(col("id")).asc).limit(nlist)
      .select((row_number().over(
        Window.partitionBy(lit(0)).orderBy(xxhash64(col("id")).asc)) - 1)
        .as("cluster"),
        col("v").as("centroid"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val updated = assign(c, centroids)
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos")).agg(avg(col("x")).as("m"))
        .groupBy(col("cluster"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("ps"))
        .select(col("cluster"),
          transform(col("ps"), p => p.getField("m")).as("new_centroid"))
      centroids = centroids.join(updated, Seq("cluster"), "left")
        .select(col("cluster"),
          coalesce(col("new_centroid"), col("centroid")).as("centroid"))
        .localCheckpoint()
    }
    (centroids, assign(c, centroids).localCheckpoint())
  }

  /** Squared euclidean distance (codegen'd via vec_cosine's sibling loop
    * is unnecessary — nlist is small, HOF cost is bounded by
    * rows × nlist). */
  private def euclid2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** IVF approximate top-k: corpus rows assigned once to their nearest
    * centroid; each query scores only the `nprobe` nearest cells. The
    * scored fraction is ~nprobe/nlist of the corpus per query — the
    * standard inverted-file trade (vs [[lshTopK]]'s hash-bucket trade).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4, iters: Int = 5,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val (centroids, fitted) = fitIndex(corpus, nlist, iters, idCol, vecCol)
    val assigned = fitted
      .select(col("id").as("nid"), col("v").as("cv"), col("cluster"))
    val q0 = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
    // nprobe-nearest cells per query, via the same shuffle-bounded top-k
    // (negated distance = similarity; ties on the smaller cluster id like
    // the window it replaces). Only nprobe × partitions rows per query
    // cross the shuffle instead of the full |queries| × nlist fan-out.
    val probed = TopK.perQuery(
      q0.join(broadcast(centroids))
        .select(col("qid"), (-euclid2(col("qv"), col("centroid"))).as("sim"),
          col("cluster").as("nid")),
      nprobe)
      .select(col("qid"), col("nid").as("cluster"))
    val q = probed.join(q0, Seq("qid"))
    val scored = assigned.join(q, Seq("cluster"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    TopK.perQuery(scored, k)
  }

  /** Embedding near-duplicate pairs: SRP-LSH bucketing on the corpus with
    * itself (same pigeonhole layout as text SimHash dedup), exact cosine
    * verification at `threshold`. High thresholds (>=0.9) are the regime
    * where sign-LSH recall is strong — which is exactly the near-dup use
    * case.
    */
  def nearDupPairs(corpus: DataFrame, threshold: Double = 0.9,
                   bands: Int = 8, bitsPerBand: Int = 8, seed: Long = 42L,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val banded = (0 until bands).map { b =>
      c.select(col("id"), col("v"), lit(b).as("band"),
        srpBucket(col("v"), bitsPerBand, seed + b).as("bucket"))
    }.reduce(_ unionByName _)
    val l = banded.select(col("band"), col("bucket"), col("id").as("a_id"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("b_id"))
    // dedup candidate ids FIRST (a pair can collide in several bands), then
    // join the vectors back — never carry vectors through the pair-join
    l.join(r, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
      .join(c.select(col("id").as("a_id"), col("v").as("va")), Seq("a_id"))
      .join(c.select(col("id").as("b_id"), col("v").as("vb")), Seq("b_id"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("sim"), 4).as("sim"))
  }
}
