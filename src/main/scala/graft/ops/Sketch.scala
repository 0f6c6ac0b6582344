package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Sketch aggregates: mergeable summaries whose per-group state is a
  * fixed-size array, the pattern behind every large-scale profiling
  * pipeline (HLL, KMV, MinHash unions).
  *
  * [[MinhashUnion]] unions per-document MinHash signatures into a
  * per-group signature by elementwise min — the signature of the UNION of
  * the groups' shingle sets. Because min is associative/commutative, the
  * aggregate is partial-aggregation friendly: each executor folds its rows
  * into one k-slot array and only those arrays cross the shuffle
  * (O(groups × k), independent of corpus size). Sketch Jaccard between two
  * groups is then `matching slots / k`, with standard error ~1/√k.
  */
object Sketch {

  /** Typed UDAF: elementwise-min union of `array<long>` MinHash
    * signatures (Aggregator → `functions.udaf`, the SURVEY §2.3 UDAF
    * tier — used where no builtin aggregate fits).
    *
    * Encoders are injected by the caller from `session.implicits` —
    * public API only (round-2 hygiene: the previous
    * `catalyst.encoders.ExpressionEncoder` is private to Spark and breaks
    * across minors).
    *
    * The INPUT type is `Array[Long]`, not `Seq[Long]`: the primitive
    * array deserializer is one `toLongArray` copy per row, where the Seq
    * encoder boxes every slot — at k=256 over sf1's 600k docs that is
    * 150M boxed Longs. Measured at sf1: the signature scan alone is
    * ~2 s warm but scan+union was ~12 s with the Seq input — the
    * aggregation loop is trivial, the encoder was the cost.
    */
  class MinhashUnion(k: Int, bufEnc: Encoder[Array[Long]],
                     outEnc: Encoder[Seq[Long]])
      extends Aggregator[Array[Long], Array[Long], Seq[Long]] {
    def zero: Array[Long] = Array.fill(k)(Long.MaxValue)
    def reduce(buf: Array[Long], sig: Array[Long]): Array[Long] = {
      var i = 0
      val n = if (sig.length < k) sig.length else k
      while (i < n) {
        if (sig(i) < buf(i)) buf(i) = sig(i)
        i += 1
      }
      buf
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }
    def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    def bufferEncoder: Encoder[Array[Long]] = bufEnc
    def outputEncoder: Encoder[Seq[Long]] = outEnc
  }

  /** Per-group MinHash sketch of a text corpus: one k-slot signature per
    * value of `groupCol`.
    */
  def groupSketches(df: DataFrame, groupCol: String, textCol: String,
                    k: Int = 256, shingleN: Int = 3): DataFrame = {
    val session = df.sparkSession
    import session.implicits._
    val union = udaf(new MinhashUnion(k,
      implicitly[Encoder[Array[Long]]], implicitly[Encoder[Seq[Long]]]))
    df.select(col(groupCol),
        TextOps.minhashSignature(
          TextOps.shingles(col(textCol), shingleN), k).as("sig"))
      .groupBy(col(groupCol))
      .agg(union(col("sig")).as("sketch"))
  }

  /** Estimated Jaccard between two sketches: fraction of matching slots. */
  def sketchJaccard(a: org.apache.spark.sql.Column,
                    b: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    size(filter(zip_with(a, b, (x, y) => x === y), m => m))
      .cast("double") / k

  /** Cross-source similarity matrix, SKETCH-ONLY — the production
    * operator (round-5 verdict #6: previously only reachable fused with
    * q45's exact-Jaccard gate). Every pair of `groupCol` values with the
    * estimated Jaccard of their unioned shingle sets, standard error
    * ~1/√k.
    *
    * Scale shape: the corpus is touched ONCE (signature scan + one
    * aggregation shuffle of O(groups × k) longs); the pairwise step then
    * runs on the tiny per-group sketch table (groups are config-scale —
    * sources, snapshots, crawls), broadcast on one side, so NO all-pairs
    * work ever touches document rows. At 100 TB the exact path q45 gates
    * against is unrunnable; this estimator is what you ship.
    */
  def crossSourceSimilarity(df: DataFrame, groupCol: String, textCol: String,
                            k: Int = 256, shingleN: Int = 3): DataFrame = {
    val sk = groupSketches(df, groupCol, textCol, k, shingleN)
    sk.select(col(groupCol).as("src_a"), col("sketch").as("sk_a"))
      .crossJoin(broadcast(
        sk.select(col(groupCol).as("src_b"), col("sketch").as("sk_b"))))
      .filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        sketchJaccard(col("sk_a"), col("sk_b"), k).as("est_j"))
  }

  /** Misra–Gries frequent-items summary (Misra & Gries 1982; merge rule
    * from Agarwal et al., "Mergeable Summaries", PODS 2012 — both
    * public): at most `k` counters per group, O(k) memory regardless of
    * stream length. Guarantees, for a group of `n` item occurrences —
    * and these hold for ANY processing order and ANY partitioning, which
    * is exactly what a distributed aggregate needs:
    *   - every item with true frequency > n/(k+1) IS in the summary;
    *   - each estimate is an undercount by at most n/(k+1):
    *     `f(x) − n/(k+1) ≤ est(x) ≤ f(x)`.
    * The summary CONTENT for borderline items is order-dependent (two
    * runs may keep different tail items) — so consumers gate on the
    * guarantees, not on summary equality (the q116 posture), and the
    * operator is the bounded-memory "what dominates each source"
    * screen, not an exact top-k.
    *
    * reduce: the classic k-counter update (increment / insert / decrement
    * all on overflow). merge: sum both summaries' counters, then if more
    * than k survive, subtract the (k+1)-th largest count from all and
    * drop the non-positive — the PODS'12 rule that preserves both
    * bounds under associative, commutative combination, i.e. partial
    * aggregation: each executor folds its partition into one k-counter
    * map and only those maps cross the shuffle.
    */
  class MisraGries(k: Int, bufEnc: Encoder[Map[String, Long]],
                   outEnc: Encoder[Map[String, Long]])
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    def zero: Map[String, Long] = Map.empty
    def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
      buf.get(item) match {
        case Some(c) => buf.updated(item, c + 1L)
        case None if buf.size < k => buf.updated(item, 1L)
        case None =>
          buf.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
      }
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
        sum.view.mapValues(_ - cut).filter(_._2 > 0L).toMap
      }
    }
    def finish(buf: Map[String, Long]): Map[String, Long] = buf
    def bufferEncoder: Encoder[Map[String, Long]] = bufEnc
    def outputEncoder: Encoder[Map[String, Long]] = outEnc
  }

  /** Per-group Misra–Gries summaries of an item column: one partial-
    * combined aggregate, G × k counter entries across the wire — the
    * bounded-memory dominant-items screen (top domains per crawl, top
    * terms per source) where an exact top-k would need a full
    * (group, item) aggregate at vocabulary scale first.
    * Output: `(group, mg)` with `mg: map<item, est>`.
    */
  def heavyHitters(df: DataFrame, groupCol: String, item: Column,
                   k: Int = 64): DataFrame = {
    require(k > 0, s"heavyHitters: k must be positive, got $k")
    val session = df.sparkSession
    import session.implicits._
    val mg = udaf(new MisraGries(k,
      implicitly[Encoder[Map[String, Long]]],
      implicitly[Encoder[Map[String, Long]]]))
    df.select(col(groupCol).as("group"), item.as("__item"))
      .groupBy(col("group"))
      .agg(mg(col("__item")).as("mg"))
  }

  /** Stored per-group cardinality registry — the Apache DataSketches HLL
    * sketches Spark ships natively (`hll_sketch_agg`/`hll_union_agg`,
    * Spark 3.5+), kept as a PERSISTED artifact so "how many distinct
    * pages/fingerprints/users does each source hold" is maintained
    * INCREMENTALLY: fitted once per corpus version, each ingest batch
    * folds in by sketch UNION at batch cost (sketch union is exactly
    * the merge a re-count over base+batch would converge to — the HLL
    * mergeability guarantee), and estimates read off the G-row table
    * with no corpus rescan ever. The sketch sibling of the exact-state
    * artifacts ([[graft.ops.Dedup.CorpusIndex]], `termFreqs`,
    * `PostingsIndex`): those answer membership exactly; this answers
    * cardinality approximately in O(G · 2^lgK) bytes at any corpus
    * size.
    *
    * `keyScheme` is the caller's NAME for how the key column is derived
    * (e.g. "text-v1", "fp(text)-v1") — the tokenizer-scheme discipline:
    * a registry fitted on one derivation and extended under another
    * undercounts silently, so the mismatch fails loudly at extend/load
    * instead.
    */
  case class CardinalityIndex(sketches: DataFrame, lgK: Int,
                              keyScheme: String)

  /** Fit the registry: one partial-combined aggregate — HLL buffers
    * merge map-side, G sketch rows cross the wire. */
  def fitCardinality(df: DataFrame, groupCol: String, key: Column,
                     keyScheme: String,
                     lgK: Int = 12): CardinalityIndex = {
    require(lgK >= 4 && lgK <= 21,
      s"fitCardinality: lgK must be in [4, 21], got $lgK")
    CardinalityIndex(
      df.groupBy(col(groupCol).as("group"))
        .agg(hll_sketch_agg(key, lit(lgK)).as("sk")),
      lgK, keyScheme)
  }

  /** Fold an ingest batch into the registry: sketch the batch at the
    * SAME lgK, union per group (groups new to the batch appear, groups
    * absent from it pass through — the full-outer union semantics of
    * `hll_union_agg` over the stacked rows). Cost: the batch's own
    * aggregate + a G-bounded union. A foreign key derivation fails
    * loudly. */
  def extendCardinality(idx: CardinalityIndex, batch: DataFrame,
                        groupCol: String, key: Column,
                        keyScheme: String): CardinalityIndex = {
    require(keyScheme == idx.keyScheme,
      s"extendCardinality: registry was fitted under key scheme " +
        s"'${idx.keyScheme}' but the batch is keyed under '$keyScheme' — " +
        "refit or re-derive the batch key")
    val b = batch.groupBy(col(groupCol).as("group"))
      .agg(hll_sketch_agg(key, lit(idx.lgK)).as("sk"))
    CardinalityIndex(
      idx.sketches.unionByName(b)
        .groupBy(col("group"))
        .agg(hll_union_agg(col("sk"), lit(false)).as("sk")),
      idx.lgK, idx.keyScheme)
  }

  /** Per-group estimates off the registry — G rows, no corpus access. */
  def estimateCardinality(idx: CardinalityIndex): DataFrame =
    idx.sketches.select(col("group"),
      hll_sketch_estimate(col("sk")).as("est"))

  /** Persist the registry (sketches as a parquet BINARY column +
    * lgK/scheme meta). */
  def saveCardinality(idx: CardinalityIndex, path: String): Unit = {
    idx.sketches.write.mode("overwrite").parquet(s"$path/sketches")
    val spark = idx.sketches.sparkSession
    import spark.implicits._
    Seq((idx.lgK, idx.keyScheme)).toDF("lg_k", "key_scheme")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Read a stored registry; the meta rides along so a later
    * [[extendCardinality]] under a foreign scheme still fails loudly. */
  def loadCardinality(spark: org.apache.spark.sql.SparkSession,
                      path: String): CardinalityIndex = {
    val meta = spark.read.parquet(s"$path/meta").head()
    CardinalityIndex(spark.read.parquet(s"$path/sketches"),
      meta.getAs[Int]("lg_k"), meta.getAs[String]("key_scheme"))
  }

  /** Typed UDAF: union of serialized Count–Min sketches by counter
    * addition — `CountMinSketch.mergeInPlace`, which is EXACT: CMS is a
    * linear sketch (each counter is a sum over the items hashed into
    * it), so sketch(A) ⊎ sketch(B) is bit-identical to sketch(A ∪ B)
    * built in one pass (PropertySpec pins the law). Incompatible
    * width/depth/seed throws from inside the sketch library — the loud
    * path a silently-wrong union would otherwise hide.
    *
    * Only G rows ever enter this aggregate (one per (group, batch-side)
    * pair after the per-side `count_min_sketch` corpus aggregates), so
    * the per-merge deserialize cost is registry-sized, never
    * corpus-sized.
    */
  class CmsUnion(bufEnc: Encoder[Array[Byte]], outEnc: Encoder[Array[Byte]])
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    import org.apache.spark.util.sketch.CountMinSketch
    def zero: Array[Byte] = Array.emptyByteArray
    private def union(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        val m = CountMinSketch.readFrom(a)
        m.mergeInPlace(CountMinSketch.readFrom(b))
        m.toByteArray
      }
    def reduce(buf: Array[Byte], sk: Array[Byte]): Array[Byte] = union(buf, sk)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = union(a, b)
    def finish(buf: Array[Byte]): Array[Byte] =
      if (buf.isEmpty) null else buf
    def bufferEncoder: Encoder[Array[Byte]] = bufEnc
    def outputEncoder: Encoder[Array[Byte]] = outEnc
  }

  /** Stored per-group term-frequency registry over Spark's native
    * Count–Min sketch aggregate — the point-frequency sibling of
    * [[CardinalityIndex]] (distinct counts) and the OVERcount-bounded
    * complement of [[heavyHitters]] (Misra–Gries undercounts by
    * ≤ n/(k+1) and keeps only k items; CMS answers ANY item, never
    * undercounts, and overcounts by ≤ εn with probability ≥
    * `confidence`). Maintained incrementally as a persisted artifact:
    * fit once per corpus version, each ingest batch folds in by counter
    * addition at batch cost (CMS linearity — extend ≡ refit
    * BIT-IDENTICAL, spec-pinned, a stronger guarantee than HLL's
    * convergence), estimates read off the G-row table with no corpus
    * rescan.
    *
    * `eps`/`confidence`/`seed` are frozen at fit time and ride the
    * meta: a union across differently-shaped sketches is meaningless
    * and the library throws on it; `itemScheme` is the tokenizer-scheme
    * discipline shared with every stored artifact here.
    */
  case class FreqIndex(sketches: DataFrame, eps: Double, confidence: Double,
                       seed: Int, itemScheme: String)

  /** Fit the registry: ONE partial-combined corpus aggregate — CMS
    * buffers merge map-side (counter addition), G sketch rows of
    * O(depth × width) bytes cross the wire regardless of corpus size.
    *
    * Memory contract at high group cardinality: each buffer is
    * ⌈2e/eps⌉ × ⌈ln(1/(1−confidence))⌉ longs (~1.1 MB at the eps = 1e-4
    * default), but map-side memory is NOT G × that — `count_min_sketch`
    * is a TypedImperativeAggregate, which plans as ObjectHashAggregate,
    * and that operator falls back to sort-based aggregation once its
    * in-memory map reaches `spark.sql.objectHashAggregate.sortBased.
    * fallbackThreshold` (default 128) distinct groups per task. So a
    * high-cardinality `groupCol` (registered domain, say) degrades to
    * sort-agg throughput — one buffer live at a time after the spill —
    * it does not OOM (plan + behavior pinned in OpsSpec). The costs
    * that DO scale with G are the registry itself (G × sketch bytes on
    * shuffle/disk) and [[estimateFreq]]'s broadcast — size eps to the
    * grain, or pass `broadcastSketches = false` there past ~a few
    * thousand groups at the default eps. */
  def fitFreq(df: DataFrame, groupCol: String, item: Column,
              itemScheme: String, eps: Double = 1e-4,
              confidence: Double = 0.99, seed: Int = 42): FreqIndex = {
    require(eps > 0 && eps < 1, s"fitFreq: eps must be in (0, 1), got $eps")
    require(confidence > 0 && confidence < 1,
      s"fitFreq: confidence must be in (0, 1), got $confidence")
    FreqIndex(
      df.groupBy(col(groupCol).as("group"))
        .agg(count_min_sketch(item, lit(eps), lit(confidence),
          lit(seed)).as("sk")),
      eps, confidence, seed, itemScheme)
  }

  /** Fold an ingest batch into the registry: sketch the batch under the
    * SAME (eps, confidence, seed), then union per group by counter
    * addition — batch-new groups appear, untouched groups pass through.
    * Cost: the batch's own aggregate + a G-bounded union. A foreign
    * item derivation fails loudly here; a foreign sketch shape throws
    * from the union itself. */
  def extendFreq(idx: FreqIndex, batch: DataFrame, groupCol: String,
                 item: Column, itemScheme: String): FreqIndex = {
    require(itemScheme == idx.itemScheme,
      s"extendFreq: registry was fitted under item scheme " +
        s"'${idx.itemScheme}' but the batch is keyed under '$itemScheme' — " +
        "refit or re-derive the batch items")
    val session = idx.sketches.sparkSession
    import session.implicits._
    val b = batch.groupBy(col(groupCol).as("group"))
      .agg(count_min_sketch(item, lit(idx.eps), lit(idx.confidence),
        lit(idx.seed)).as("sk"))
    val cmsUnion = udaf(new CmsUnion(
      implicitly[Encoder[Array[Byte]]], implicitly[Encoder[Array[Byte]]]))
    FreqIndex(
      idx.sketches.unionByName(b)
        .groupBy(col("group"))
        .agg(cmsUnion(col("sk")).as("sk")),
      idx.eps, idx.confidence, idx.seed, idx.itemScheme)
  }

  /** Estimate frequencies for a probe relation `(groupCol, itemCol)` off
    * the registry: join the G-row sketch table onto the probes and
    * read each estimate with the native [[graft.expr.CmsQuery]]
    * expression — probes × O(sketch bytes), no corpus access. Probes
    * for groups the registry has never seen estimate NULL (left join),
    * distinguishing "unknown group" from a true zero count.
    *
    * `broadcastSketches` (the [[graft.ops.Classify]].nbScore
    * `broadcastModel` posture): each sketch is ~1.1 MB at the default
    * eps = 1e-4, so a registry of thousands of groups exceeds broadcast
    * and driver limits — pass `false` to fall back to a shuffle join
    * (one exchange on each side, each sketch still shipped once per
    * reducer that probes its group). */
  def estimateFreq(idx: FreqIndex, probes: DataFrame, groupCol: String,
                   itemCol: String,
                   broadcastSketches: Boolean = true): DataFrame = {
    val sk = if (broadcastSketches) broadcast(idx.sketches) else idx.sketches
    // Probe items grouped per registry group, estimates read through ONE
    // cms_query_multi call per group, then exploded back to probe grain
    // (r20 optimization, profiled: the per-probe-row cms_query form
    // re-deserialized the ~1.1 MB counter table once per probe — 2.4 s
    // single-task for 620 probes over 20 sketches at sf0.1; this shape
    // pays G deserializations, the summary's design floor). Estimates
    // are bit-identical (same library estimateCount) and unknown-group
    // probes still surface est = NULL: a missing sketch coalesces to an
    // empty estimate array, which arrays_zip null-pads to the items'
    // length. The collect_list buffer is probe-sized per group — the
    // relation is config-bounded by this function's contract. Items are
    // collected as single-field STRUCTS, not bare values (r20 verdict
    // #2): collect_list silently skips NULL elements, so a (group, NULL
    // item) probe row — which the per-row cms_query form preserved with
    // est NULL — would vanish from the output; a struct wrapping a NULL
    // field is itself non-null and survives, and cms_query_multi's
    // per-element contract already maps the NULL item to a NULL est.
    val byGroup = probes
      .select(col(groupCol).as("group"), col(itemCol).as("item"))
      .groupBy(col("group"))
      .agg(collect_list(struct(col("item"))).as("__wrapped"))
      .withColumn("__items", col("__wrapped.item")).drop("__wrapped")
    byGroup.join(sk, Seq("group"), "left")
      .withColumn("__ests", coalesce(
        call_function("cms_query_multi", col("sk"), col("__items")),
        array().cast("array<long>")))
      .select(col("group"),
        explode(arrays_zip(col("__items"), col("__ests"))).as("__z"))
      .select(col("group"), col("__z.__items").as("item"),
        col("__z.__ests").as("est"))
  }

  /** Persist the registry (sketches as a parquet BINARY column +
    * shape/scheme meta). */
  def saveFreq(idx: FreqIndex, path: String): Unit = {
    idx.sketches.write.mode("overwrite").parquet(s"$path/sketches")
    val spark = idx.sketches.sparkSession
    import spark.implicits._
    Seq((idx.eps, idx.confidence, idx.seed, idx.itemScheme))
      .toDF("eps", "confidence", "seed", "item_scheme")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Read a stored registry; the meta rides along so a later
    * [[extendFreq]] under a foreign scheme still fails loudly. */
  def loadFreq(spark: org.apache.spark.sql.SparkSession,
               path: String): FreqIndex = {
    val meta = spark.read.parquet(s"$path/meta").head()
    FreqIndex(spark.read.parquet(s"$path/sketches"),
      meta.getAs[Double]("eps"), meta.getAs[Double]("confidence"),
      meta.getAs[Int]("seed"), meta.getAs[String]("item_scheme"))
  }
}
