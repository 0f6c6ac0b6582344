package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextOps}

/** Streaming ingest cleaning for a document stream (schema: doc_id, ts,
  * lang, text) — the streaming twin of the batch
  * [[graft.ops.TextOps.cleanCorpus]] pipeline.
  *
  * Only the stages whose state a stream can bound run here:
  *
  *  1. the quality gate (q49's keep criteria) — stateless per-row
  *     expressions, identical columns to the batch pass;
  *  2. exact content dedup on the portable fingerprint, watermark-bounded
  *     (`dropDuplicatesWithinWatermark`): re-delivered or re-crawled
  *     documents inside the watermark are dropped, and the dedup set is
  *     evicted as event time advances — state never grows past one
  *     watermark of distinct fingerprints, at any rate;
  *  3. the content-keyed split label, stateless.
  *
  * STREAM-VS-ITSELF near-dup LSH and decontamination are deliberately
  * absent from [[cleanStream]]: both need corpus-wide state (all bucket
  * members / the full probe gram table joined against everything seen),
  * which an unbounded stream cannot hold. Near-dup against a STATIC
  * base corpus is a different shape — stream-static joins over the
  * persisted band index — and [[flagAgainstBase]] provides it.
  * Production runs ingest through this stream for cheap at-the-door
  * hygiene and the full [[graft.ops.TextOps.cleanCorpus]] in the batch
  * compaction pass — the standard lambda split, encoded here by the two
  * operators sharing their stage implementations (same gate
  * expressions, same fingerprint, same split hash), so the stream and
  * the batch pass can never disagree about a document they both keep.
  */
object DocumentStreams {

  /** In-flight unigram-surprisal scoring against the STORED
    * corpus-version frequency table ([[graft.ops.TextOps.termFreqs]]
    * lifecycle) — the streaming twin of
    * [[graft.ops.TextOps.unigramSurprisal]]'s supplied-table overload,
    * for scoring documents at the ingest door (route high-surprisal
    * docs to review, drop encoding garbage) without waiting for the
    * batch pass.
    *
    * Shape: completely STATELESS — no stream-side shuffle, no state
    * store, no watermark. The top `maxVocab` frequency entries are a
    * driver-built hash map (a bounded collect — the
    * [[graft.ops.Similarity]] coarse-quantizer precedent) captured by
    * ONE scalar UDF scoring the whole token array per row. A UDF, not a
    * column expression, deliberately and measured: the first cut built a
    * `map(...)` LITERAL of 2·maxVocab children — a 100k-node expression
    * tree Catalyst took longer to plan than the bench ran, and
    * `element_at` on a literal map is a LINEAR scan per token besides.
    * The UDF does an O(1) hash lookup per token and costs one codegen
    * boundary per ROW (amortized over the document), the same trade the
    * repo's guideline ranks UDFs acceptable for when no builtin
    * expresses the semantics without a join. Tokens outside the kept
    * vocabulary take the batch overload's singleton floor (`cnt = 1`),
    * which truncation to `maxVocab` only strengthens (a truncated term's
    * true count is below every kept count — flooring errs toward MORE
    * surprisal, never less). Tokenizer vocabularies are bounded in
    * production (64k–256k), so the captured map is megabytes.
    *
    * Same round-inside-round (9 dp per token, 4 dp mean) as the batch
    * op, so the two agree exactly on any doc whose terms are all in the
    * kept vocabulary (spec-pinned). A NULL text yields NULL scores and
    * the row is KEPT — the stream's at-the-door contract is to annotate,
    * not silently drop (the batch explode path drops instead).
    *
    * Output: input columns + `n_tokens`, `surprisal`.
    */
  def surprisalStream(docs: DataFrame, freqs: DataFrame,
                      maxVocab: Int = 65536): DataFrame = {
    require(maxVocab > 0, s"maxVocab must be positive, got $maxVocab")
    val total = freqs.agg(sum(col("cnt")).cast("double")).head().getDouble(0)
    val vocab: Map[String, Long] = freqs
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(maxVocab).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val score = udf { toks: Seq[String] =>
      if (toks == null) None
      else {
        var s = 0.0
        toks.foreach { t =>
          s += r9(-math.log(vocab.getOrElse(t, 1L).toDouble / total))
        }
        Some((toks.size.toLong, r4(s / toks.size)))
      }
    }
    docs
      .withColumn("__sc", score(TextOps.tokens(col("text"))))
      .withColumn("n_tokens", col("__sc._1"))
      .withColumn("surprisal", col("__sc._2"))
      .drop("__sc")
  }

  def cleanStream(docs: DataFrame, watermark: String = "10 minutes",
                  minTokens: Int = 15, minQuality: Double = 0.6): DataFrame =
    docs
      .filter(TextOps.tokenCount(col("text")) >= minTokens &&
        TextOps.langGuess(col("text")) === col("lang") &&
        TextOps.qualityScore(col("text")) >= minQuality)
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .withColumn("split", TextOps.splitAssign(col("text")))

  /** PII scrub for ARRIVING documents — the streaming twin of the batch
    * scrub (q97's operator pair): the per-pattern audit counts are taken
    * BEFORE redaction (the post-scrub text matches nothing by design),
    * then [[TextOps.redactPii]]'s ordered chain rewrites `text` in
    * place. A pure stateless projection built from the SAME column
    * expressions as the batch pass, so stream and compaction cannot
    * disagree (the [[surprisalStream]] posture) — no watermark, no
    * state store, runs at scan speed per micro-batch. Scrub-then-store
    * is the production order: everything downstream (dedup, indexes,
    * exports) sees only redacted text, so no raw PII ever lands in a
    * stored artifact.
    */
  /** In-flight readability scoring — the streaming twin of
    * [[graft.ops.TextOps.readability]]: completely STATELESS (three
    * codegen'd regex/array counters and integer divisions per row — no
    * shuffle, no state store, no watermark), so a reading-ease gate
    * can route template spam at the ingest door with the SAME integer
    * milli-points the batch pass reports (StreamingSpec pins stream ≡
    * batch row-for-row; the shared implementation makes disagreement
    * structurally impossible). Passthrough of ts/lang so downstream
    * windows still see event time.
    */
  def readabilityStream(docs: DataFrame): DataFrame =
    graft.ops.TextOps.readability(docs, "doc_id", "text",
      keepCols = Seq("ts", "lang"))

  def scrubStream(docs: DataFrame): DataFrame =
    docs
      .withColumn("pii", TextOps.piiCounts(col("text")))
      .withColumn("text", TextOps.redactPii(col("text")))

  /** HTML → text extraction for ARRIVING documents — the streaming
    * twin of [[graft.ops.TextOps.htmlToText]] at the crawl door, the
    * [[scrubStream]] posture: the SAME column-expression chain (one
    * copy of the regex contract — stream and batch cannot drift),
    * stateless, no watermark, runs at scan speed per micro-batch.
    * Extract-at-the-door is the production order for a crawl: every
    * downstream stage (dedup fingerprints, quality gates, packing)
    * must see TEXT, never markup, and re-extracting in batch wastes a
    * full corpus pass. `n_raw_chars` keeps the pre-strip size so the
    * markup-overhead ratio (a crawl-health signal) survives the strip.
    */
  def htmlExtractStream(docs: DataFrame,
                        htmlCol: String = "text"): DataFrame =
    docs
      .withColumn("n_raw_chars",
        length(coalesce(col(htmlCol), lit(""))).cast("long"))
      .withColumn(htmlCol,
        TextOps.htmlToText(coalesce(col(htmlCol), lit(""))))

  /** Span flags for ARRIVING documents against a STORED
    * [[graft.ops.Dedup.SpanIndex]] — the streaming twin of
    * [[graft.ops.Dedup.crossRepeatedSpans]]: each arriving doc's
    * `window`-token rolling fingerprints (the same native expression the
    * batch pass uses — one copy of the hash arithmetic, so stream and
    * batch cannot drift) are semi-joined in-flight against the base's
    * stored fingerprint set, emitting one `(doc_id, ts, start, end)` row
    * per window the base already carries.
    *
    * Deliberately WINDOW-grain and stateless, the [[flagAgainstBase]]
    * posture: the island merge is a per-doc window function a stream
    * cannot run without stateful aggregation, and the ingest door's job
    * is to FLAG — the sink (or the batch compaction's
    * [[graft.ops.Dedup.crossStripSpans]], whose `mergeSpans`+cut this
    * output feeds exactly) applies the cut. `broadcastIndex` mirrors
    * [[flagAgainstBaseIndexed]]'s measured boundary: true broadcasts the
    * fp set so the stream side never shuffles — right while the fps fit
    * executor memory; false (default) plans the shuffle join, and the
    * session's runtime bloom-filter pruning lets a small micro-batch
    * prune the stored scan.
    */
  def spanFlagStream(docs: DataFrame, index: Dedup.SpanIndex,
                     broadcastIndex: Boolean = false): DataFrame = {
    require(index.scheme == Dedup.SpanIndex.Scheme,
      s"SpanIndex scheme ${index.scheme} != this build's " +
        s"${Dedup.SpanIndex.Scheme} — rebuild the index")
    val fps = if (broadcastIndex) broadcast(index.fps) else index.fps
    docs
      .select(col("doc_id"), col("ts"),
        explode(call_function("rolling_fingerprints",
          TextOps.tokens(col("text")), lit(index.window))).as("w"))
      .select(col("doc_id"), col("ts"), col("w.start").as("start"),
        (col("w.start") + lit(index.window)).as("end"),
        col("w.fp").as("fp"))
      .join(fps.select(col("fp")), Seq("fp"), "left_semi")
      .select(col("doc_id"), col("ts"), col("start"), col("end"))
  }

  /** Near-dup flags for ARRIVING documents against an EXISTING base
    * corpus — the streaming twin of [[graft.ops.Dedup.crossNearDup]],
    * and the one LSH shape a stream CAN run: the base is static, so the
    * whole candidate path is stream-static joins (stateless — Spark
    * re-plans the static side per micro-batch) against the same
    * persistable [[graft.ops.Dedup.bandIndex]] the batch pass joins, and
    * the only streaming state is the per-pair emit dedup, bounded by the
    * watermark. Stream-vs-ITSELF LSH stays deliberately absent (see
    * [[cleanStream]]) — that is the shape needing corpus-wide state.
    *
    * Emits one (new_id, base_id, jacc, ts) row per flagged pair: a pair
    * colliding in several bands produces several candidate rows, and
    * `dropDuplicatesWithinWatermark` collapses them (same-key re-emits
    * past the watermark are possible on re-delivery, like every
    * watermark-bounded dedup). The doc's shingle set rides the band
    * fan-out (bands× per doc within a micro-batch) — the price of
    * verifying exactly without a second pass over the stream; fan-out
    * after the index join is bounded by the index's `maxBucket` cap.
    * Callers persist `base`/the index — at 100 TB the index is a stored
    * table, not a per-batch recomputation.
    */
  def flagAgainstBase(docs: DataFrame, base: DataFrame,
                      watermark: String = "10 minutes",
                      threshold: Double = 0.5, shingleN: Int = 3,
                      k: Int = 128, bands: Int = 32,
                      maxBucket: Int = 1000): DataFrame =
    flagAgainstBaseIndexed(docs,
      Dedup.buildIndex(base, "doc_id", "text", shingleN, k, bands,
        maxBucket),
      watermark, threshold)

  /** [[flagAgainstBase]] over a prebuilt [[graft.ops.Dedup.CorpusIndex]]
    * — the production shape: the static side of a stream-static join
    * re-executes EVERY micro-batch, so an un-persisted index would
    * re-run the whole base pipeline per batch; a persisted (or stored
    * and re-read) index makes each micro-batch pay only its own docs.
    *
    * `broadcastIndex` decides who moves per micro-batch. Default false:
    * Spark plans a sort-merge join, shuffling the micro-batch's band
    * rows — WITH their shingle payloads — every batch; right for a base
    * too big to broadcast, and the reason the module doc routes
    * high-throughput dedup to the batch compaction pass. True hints
    * both index tables broadcast, so the stream side never shuffles:
    * measured ~1.5–5× the SMJ throughput (9.1k vs 1.7–6.4k pairs/s,
    * StreamBench `mode=flag`, r9 clean runs) at a 50k-doc base — use it
    * whenever the index fits executor memory. The boundary is REAL and
    * measured, not advisory: at a 500k-doc base (~80M band rows) the
    * broadcast build dies with `Not enough memory to build and
    * broadcast the table` (BroadcastExchangeExec) while the default SMJ
    * path sustains 2.3k pairs/s — which is why false is the default.
    */
  def flagAgainstBaseIndexed(docs: DataFrame, index: Dedup.CorpusIndex,
                             watermark: String = "10 minutes",
                             threshold: Double = 0.5,
                             broadcastIndex: Boolean = false): DataFrame = {
    require(index.hashScheme == Dedup.CorpusIndex.HashScheme,
      s"CorpusIndex hash scheme ${index.hashScheme} != this build's " +
        s"${Dedup.CorpusIndex.HashScheme} — rebuild the index")
    // tombstoned (overflowed) buckets are stored but never probed —
    // filtered BEFORE the broadcast hint so they don't ride the wire
    val liveBands = index.bands.filter(!col("overflow"))
      .select(col("band"), col("band_hash"), col("base_ids"))
    val (idxBands, idxShingles) =
      if (broadcastIndex) (broadcast(liveBands), broadcast(index.shingles))
      else (liveBands, index.shingles)
    docs
      .withWatermark("ts", watermark)
      .select(col("doc_id").as("new_id"), col("ts"),
        TextOps.shingles(col("text"), index.shingleN).as("sh_n"))
      .filter(size(col("sh_n")) > 0)
      .select(col("new_id"), col("ts"), col("sh_n"),
        posexplode(TextOps.minhashBands(col("sh_n"), index.k, index.nBands))
          .as(Seq("band", "band_hash")))
      .join(idxBands, Seq("band", "band_hash"))
      .select(col("new_id"), col("ts"), col("sh_n"),
        explode(col("base_ids")).as("base_id"))
      // collapse multi-band collisions BEFORE the shingle join: a true
      // near-dup collides in ~every band, so deduping after verification
      // (the first cut) paid the expensive join + jaccard once PER BAND
      // per pair — the batch twin's distinct()-before-verify shape,
      // expressed with the stream's watermark-bounded state (sh_n/ts
      // ride along on the surviving row; sub-threshold candidates enter
      // the state too, but candidate volume is already collision-bounded)
      .dropDuplicatesWithinWatermark("new_id", "base_id")
      .join(idxShingles, Seq("base_id"))
      .withColumn("jacc", TextOps.jaccard(col("sh_n"), col("sh_b")))
      .filter(col("jacc") >= threshold)
      .select(col("new_id"), col("base_id"),
        round(col("jacc"), 4).as("jacc"), col("ts"))
  }

  /** EXACT Jaccard flags for ARRIVING documents against the STORED
    * [[graft.ops.Dedup.JaccardIndex]] — the streaming twin of
    * [[graft.ops.Dedup.crossJaccardJoin]] (r18 verdict #2: the exact
    * set-similarity doors were the one stored-artifact family without
    * an ingest-stream shape). Same answers as the batch door, stream
    * plumbing like [[flagAgainstBaseIndexed]]: the whole candidate
    * path is stream-static joins against the stored relations
    * (stateless — Spark re-plans the static side per micro-batch), and
    * the only streaming state is the watermark-bounded pair dedup.
    *
    * One STRUCTURAL divergence from the batch door, pinned by
    * StreamingSpec: the batch side's prefix derivation is a per-doc
    * rank window, which a streaming plan cannot run — so the stream
    * uses the ONE-SIDED prefix filter (batch tokens × STORED prefixes
    * only). One-sided filtering is still COMPLETE above the fit
    * threshold (a qualifying pair must share a token in the stored
    * doc's prefix — the same theorem, half applied), it just prunes
    * less: candidate volume is bounded by the stored prefixes' fan-out
    * instead of both sides'. Under a biting `maxPosting` cap the two
    * generators can therefore diverge in exactly ONE direction —
    * every capped-batch pair is a capped-stream pair (the stream
    * applies the SAME stored-side cap and no batch-side one), never
    * the reverse; uncapped they are EQUAL (both exact-verified).
    *
    * The doc's token set rides the explode fan-out (|toks|× per doc
    * within a micro-batch) — the price of verifying exactly without a
    * second pass; exact `array_intersect` runs on the first-arrival
    * candidate row only, after the pair dedup. `docs` must carry the
    * SAME tokenization the index was fitted with (the batch door's
    * contract — [[graft.ops.Dedup.JaccardIndex]] stores token sets,
    * not a tokenizer). `broadcastIndex` is [[flagAgainstBaseIndexed]]'s
    * trade verbatim: true pins both stored relations broadcast so the
    * stream side never shuffles; false (default) lets the planner
    * shuffle the micro-batch against a base too big to broadcast.
    *
    * Emits `(new_id, base_id, n_inter, jaccard_bp, ts)` — the batch
    * door's columns plus event time.
    */
  def jaccardFlagStream(docs: DataFrame, index: Dedup.JaccardIndex,
                        thresholdBp: Long,
                        watermark: String = "10 minutes",
                        maxPosting: Int = 1000,
                        broadcastIndex: Boolean = false,
                        idCol: String = "doc_id",
                        tokensCol: String = "toks"): DataFrame = {
    require(index.scheme == Dedup.JaccardIndex.Scheme,
      s"JaccardIndex prefix scheme ${index.scheme} != this build's " +
        s"${Dedup.JaccardIndex.Scheme} — rebuild the index")
    require(thresholdBp >= 1 && thresholdBp <= 10000,
      s"jaccardFlagStream: thresholdBp must be in [1, 10000], got " +
        s"$thresholdBp")
    require(thresholdBp >= index.thresholdBp,
      s"jaccardFlagStream: probe threshold $thresholdBp is below the " +
        s"index's fit threshold ${index.thresholdBp} — stored prefixes " +
        "are too short to stay complete there; refit the index at the " +
        "lower threshold")
    require(maxPosting >= 2,
      s"jaccardFlagStream: maxPosting must be >= 2, got $maxPosting")
    val sPfx0 = Dedup.capBlockRows(index.prefixes, Seq("tk"), maxPosting)
      .select(col("tk"), col("base_id"), col("n").as("nb"))
    val (sPfx, sTok) =
      if (broadcastIndex) (broadcast(sPfx0), broadcast(index.tokens))
      else (sPfx0, index.tokens)
    docs
      .withWatermark("ts", watermark)
      // sorted-distinct: the sorted_intersect_count verify contract —
      // must match Dedup.normTokenSets verbatim (the stored tokens side
      // is sorted at fit, scheme-gated)
      .select(col(idCol).cast("long").as("new_id"), col("ts"),
        array_sort(array_distinct(col(tokensCol))).as("ta"))
      .filter(size(col("ta")) > 0)
      .select(col("new_id"), col("ts"), col("ta"),
        explode(col("ta")).as("tk"))
      .join(sPfx, Seq("tk"))
      // the lossless size filter prunes before the pair dedup's state:
      // J(A,B) >= t forces min(|A|,|B|) >= t * max(|A|,|B|)
      .filter(least(size(col("ta")).cast("long"), col("nb")) * 10000L >=
        lit(thresholdBp) *
          greatest(size(col("ta")).cast("long"), col("nb")))
      .dropDuplicatesWithinWatermark("new_id", "base_id")
      .join(sTok.select(col("base_id"), col("toks").as("tb")),
        Seq("base_id"))
      .select(col("new_id"), col("base_id"),
        call_function("sorted_intersect_count", col("ta"), col("tb"))
          .as("n_inter"),
        (size(col("ta")) + size(col("tb"))).cast("long").as("nu"),
        col("ts"))
      .select(col("new_id"), col("base_id"), col("n_inter"),
        expr("n_inter * 10000L div (nu - n_inter)").as("jaccard_bp"),
        col("ts"))
      .filter(col("jaccard_bp") >= thresholdBp)
  }

  /** SEMANTIC near-dup flags for ARRIVING embeddings against the
    * STORED [[graft.ops.Similarity.IvfIndex]] — the streaming twin of
    * [[graft.ops.Similarity.crossSemanticPairs]], closing the semantic
    * family's ingest-stream symmetry in the same round the stored door
    * landed (every dedup family now has door + stream + delete). The
    * simplest twin in the module: routing is ROW-LOCAL (the native
    * vec_nearest_k codegen loop over the stored centers literal — no
    * state, no shuffle on the stream side), candidates are one
    * stream-static inner join against the capped stored inverted file,
    * and the exact-cosine verify is row-local on the joined row. Each
    * base id sits in exactly ONE stored cell, so a (new, base) pair
    * arises at most once — COMPLETELY STATELESS, not even the
    * watermark-bounded pair dedup the LSH/Jaccard twins need (the
    * watermark rides along for the egress contract only). Stream ≡
    * batch door exactly (StreamingSpec law — same routing, same cells,
    * same verify arithmetic).
    *
    * `maxCell` is the batch door's tombstone verbatim, applied on the
    * static side before the join ([[graft.ops.Similarity
    * .crossSemanticAudit]] remains the loud twin — run it at
    * compaction cadence); `broadcastIndex` hints the capped inverted
    * file broadcast so the stream side never shuffles (the
    * flagAgainstBaseIndexed trade — right whenever cells × dim fits
    * executor memory).
    *
    * Emits `(new_id, base_id, sim, ts)`, cosine at 4 dp.
    */
  def semanticFlagStream(docs: DataFrame,
                         index: graft.ops.Similarity.IvfIndex,
                         threshold: Double, probes: Int = 2,
                         maxCell: Int = 10000,
                         watermark: String = "10 minutes",
                         broadcastIndex: Boolean = false,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    require(index.scheme == graft.ops.Similarity.IvfIndex.Scheme,
      s"IvfIndex fit scheme ${index.scheme} != this build's " +
        s"${graft.ops.Similarity.IvfIndex.Scheme} — rebuild the index")
    require(probes >= 1,
      s"semanticFlagStream needs probes >= 1, got $probes")
    require(maxCell >= 1,
      s"semanticFlagStream: maxCell must be >= 1, got $maxCell")
    val kept = graft.ops.Similarity.cellSizes(index)
      .filter(col("cell_rows") <= maxCell).select(col("cluster"))
    val base0 = index.assigned
      .select(col("id").as("base_id"), col("v").as("cv"), col("cluster"))
      .join(broadcast(kept), Seq("cluster"), "left_semi")
    val base = if (broadcastIndex) broadcast(base0) else base0
    docs
      .withWatermark("ts", watermark)
      .select(col(idCol).cast("long").as("new_id"), col("ts"),
        col(vecCol).cast("array<double>").as("qv"))
      .where(coalesce(
        assert_true(size(col("qv")) === index.dim,
          lit(s"semanticFlagStream: vector dimension != index dim " +
            s"${index.dim} — a mismatched vector would route to an " +
            "arbitrary cell")),
        lit(true)))
      .select(col("new_id"), col("ts"), col("qv"),
        explode(call_function("vec_nearest_k", col("qv"),
          typedLit(index.centersArray.toSeq), lit(probes))).as("cluster"))
      .join(base, Seq("cluster"))
      .withColumn("sim", graft.ops.Similarity.cosine(col("qv"), col("cv")))
      .filter(col("sim") >= threshold)
      .select(col("new_id"), col("base_id"),
        round(col("sim"), 4).as("sim"), col("ts"))
  }

  /** ENTITY-LINKAGE flags for ARRIVING records against the STORED
    * [[graft.ops.Entity.EntityRegistry]] — the streaming twin of
    * [[graft.ops.Entity.crossLinkage]], closing the records family's
    * ingest-stream symmetry (r19 verdict #7: every other cross family
    * had one — jaccardFlagStream, semanticFlagStream,
    * flagAgainstBase, mediaFlagAgainstBase). The master-data use: flag
    * each arriving record's plausible existing entities AT the door,
    * so a human-or-policy admit decision can run before
    * [[graft.ops.Entity.admitBatch]] commits it.
    *
    * Shape — the [[semanticFlagStream]] posture: the stream side keys
    * itself ROW-LOCALLY (the registry's pinned first/last-`prefixLen`
    * blocks, exploded from a 2-element literal array — no state, no
    * stream-side shuffle), candidates are ONE stream-static equi-join
    * against the stored records' capped key projection, and the
    * native codegen'd `jaro_winkler` scores the joined row at the
    * registry's PINNED threshold. The blocking generator is
    * [[graft.ops.Entity.blockKeys]] itself on the stored side — one
    * copy of the rule, no drift surface. The only state is the
    * watermark-bounded pair dedup (a record can meet a registry row
    * through BOTH its keys — the batch door's `.distinct()`, bounded
    * here like the LSH/Jaccard twins').
    *
    * Divergences from the batch door, both pinned in StreamingSpec:
    * the cap applies to the STORED side only (capping the arriving
    * side needs a per-key micro-batch aggregate — a shuffle the door
    * stays stateless by skipping), so under a biting cap the stream
    * flags a SUPERSET of the batch door (batch ⊆ stream, the
    * jaccardFlagStream direction — never a silent miss); and NULL or
    * empty names emit no pairs (nothing to block or score —
    * [[graft.ops.Entity.admitBatch]] is where they refuse loudly).
    *
    * Emits `(new_id, rec_id, canonical_id, jw, ts)` — the batch
    * door's columns plus event time, jw at 4 dp.
    */
  def entityFlagStream(records: DataFrame,
                       registry: graft.ops.Entity.EntityRegistry,
                       watermark: String = "10 minutes",
                       maxBlock: Int = 1000,
                       broadcastRegistry: Boolean = false,
                       idCol: String = "rec_id",
                       nameCol: String = "name"): DataFrame = {
    require(registry.scheme == graft.ops.Entity.EntityRegistry.Scheme,
      s"EntityRegistry scheme ${registry.scheme} != this build's " +
        s"${graft.ops.Entity.EntityRegistry.Scheme} — rebuild the " +
        "registry")
    require(maxBlock >= 2,
      s"entityFlagStream: maxBlock must be >= 2, got $maxBlock")
    val rKeys0 = Dedup.capBlockRows(
        graft.ops.Entity.blockKeys(
          registry.records.select(col("rec_id"), col("name")),
          registry.prefixLen),
        Seq("bk"), maxBlock)
      .join(registry.records.select(col("rec_id"), col("canonical_id")),
        Seq("rec_id"))
      .select(col("bk"), col("rec_id"), col("name").as("nb"),
        col("canonical_id"))
    val rKeys = if (broadcastRegistry) broadcast(rKeys0) else rKeys0
    records
      .withWatermark("ts", watermark)
      .select(col(idCol).cast("long").as("new_id"), col("ts"),
        col(nameCol).as("nv"))
      .filter(col("nv").isNotNull && length(col("nv")) > 0)
      .select(col("new_id"), col("ts"), col("nv"),
        explode(array(
          substring(col("nv"), 1, registry.prefixLen),
          substring(col("nv"), -registry.prefixLen, registry.prefixLen)))
          .as("bk"))
      .join(rKeys, Seq("bk"))
      .dropDuplicatesWithinWatermark("new_id", "rec_id")
      .withColumn("jw", expr("jaro_winkler(nv, nb)"))
      .filter(col("jw") >= registry.threshold)
      .select(col("new_id"), col("rec_id"), col("canonical_id"),
        round(col("jw"), 4).as("jw"), col("ts"))
  }

  /** In-flight DSIR importance scoring against a STORED
    * [[graft.ops.TextOps.ImportanceModel]] — the streaming twin of
    * [[graft.ops.TextOps.importanceScore]], for routing target-like
    * documents at the ingest door (keep/boost high-weight docs, shunt
    * the rest to cold storage) without waiting for the batch selection
    * pass.
    *
    * Shape: completely STATELESS, the [[surprisalStream]] posture — the
    * model's dense numBuckets-row log-ratio table is a driver-collected
    * `Array[Double]` indexed directly by bucket (the model is total by
    * construction, so every token hits a real entry), captured by ONE
    * scalar UDF that buckets the doc's token array (the same
    * poly-31-mod-B hash, via the shared
    * [[graft.expr.PortableFingerprint.polyHash]] — one copy of the
    * portability-critical arithmetic, so stream and batch cannot
    * drift), aggregates per-bucket counts in a small hash map, and
    * applies the batch op's exact round-inside-round contract
    * (9 dp per bucket contribution, 4 dp final) — so stream and batch
    * agree EXACTLY on every doc (spec-pinned).
    *
    * A NULL text yields NULL scores and the row is KEPT — the stream's
    * at-the-door contract is to annotate, not silently drop (the batch
    * explode path drops instead).
    *
    * Output: input columns + `n_tokens`, `dsir`.
    */
  def importanceStream(docs: DataFrame,
                       model: TextOps.ImportanceModel): DataFrame = {
    val b = model.numBuckets
    val lrArr = new Array[Double](b)
    val seen = new Array[Boolean](b)
    model.lr.collect().foreach { r =>
      val i = r.getLong(0).toInt
      lrArr(i) = r.getDouble(1)
      seen(i) = true
    }
    require(seen.forall(identity),
      s"importance model is not dense: ${seen.count(!_)} of $b buckets " +
        "missing — refit with fitImportanceModel (models are dense by " +
        "construction; a hand-built table must cover every bucket)")
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val score = udf { toks: Seq[String] =>
      if (toks == null) None
      else {
        val counts = new scala.collection.mutable.HashMap[Int, Long]()
        toks.foreach { t =>
          val bucket = (graft.expr.PortableFingerprint.polyHash(t) % b).toInt
          counts.update(bucket, counts.getOrElse(bucket, 0L) + 1L)
        }
        var s = 0.0
        counts.foreach { case (bucket, cnt) => s += r9(cnt * lrArr(bucket)) }
        Some((toks.size.toLong, r4(s)))
      }
    }
    docs
      .withColumn("__sc", score(TextOps.tokens(col("text"))))
      .withColumn("n_tokens", col("__sc._1"))
      .withColumn("dsir", col("__sc._2"))
      .drop("__sc")
  }

  /** Streaming twin of [[graft.ops.Classify.nbScore]] — the seed-set
    * quality classifier applied at the ingest door: STATELESS, the
    * [[importanceStream]] posture. The fitted weight table collapses to
    * a driver map (truncated to the `maxVocab` terms with the LARGEST
    * `|w − defaultW|`, i.e. the ones whose loss would move scores most,
    * ties by term); per doc the score is the batch op's exact
    * round-inside-round chain (9 dp per term contribution over the
    * doc's own counts, 4 dp on the sum + bias), so stream ≡ batch
    * EXACTLY whenever the vocabulary fits `maxVocab` (spec-pinned).
    * Truncation replaces a dropped term's weight with the unseen
    * default — it biases scores toward the PRIOR, never invents
    * keep-side evidence.
    *
    * A NULL text yields NULL score/keep and the row is KEPT — the
    * annotate-never-drop contract the batch op shares (its id join-back
    * emits the same NULL/NULL row). Per-doc sums are exact decimal
    * accumulations on both sides, so the equivalence is order-free.
    *
    * Output: input columns + `nb_logodds`, `keep`.
    */
  def nbStream(docs: DataFrame, model: graft.ops.Classify.NbModel,
               threshold: Double = 0.0,
               maxVocab: Int = 262144): DataFrame = {
    require(maxVocab > 0, s"maxVocab must be positive, got $maxVocab")
    val rows = model.weights
      .orderBy(abs(col("w") - lit(model.defaultW)).desc, col("term"))
      .limit(maxVocab).collect()
    val wMap = rows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    val (bias, defW) = (model.bias, model.defaultW)
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val score = udf { toks: Seq[String] =>
      if (toks == null) None
      else {
        val counts = new scala.collection.mutable.HashMap[String, Long]()
        toks.foreach(t => counts.update(t, counts.getOrElse(t, 0L) + 1L))
        // exact decimal accumulation of the 9dp contributions — the sum
        // is independent of HashMap iteration order, exactly as the
        // batch path's DECIMAL(38,9) aggregation is independent of
        // Spark's aggregation order, so stream ≡ batch holds bit-for-bit
        // even for scores landing on a 4dp rounding boundary
        var s = BigDecimal(0)
        counts.foreach { case (t, c) =>
          s += BigDecimal(c * wMap.getOrElse(t, defW))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        }
        Some(r4(s.toDouble + bias))
      }
    }
    docs
      .withColumn("nb_logodds", score(TextOps.tokens(col("text"))))
      .withColumn("keep", col("nb_logodds") > threshold)
  }

  /** Crawl-frontier URL dedup at the ingest door — the streaming twin of
    * [[graft.ops.WebOps.dedupByCanonicalUrl]]: canonicalize each
    * arriving URL with the IDENTICAL column expression (one copy of the
    * normalization, so stream and batch cannot drift) and drop re-fetches
    * of the same canonical resource inside the watermark via
    * `dropDuplicatesWithinWatermark` — the [[cleanStream]] content-dedup
    * posture applied one stage earlier, at the URL grain a fetcher
    * queue needs (the page needn't be parsed, or even fetched, to be
    * recognized as already-queued). State is one canonical key per
    * distinct resource per watermark, evicted as event time advances;
    * like every watermark-bounded dedup, a re-delivery PAST the
    * watermark can re-emit — the batch compaction's keyed dedup is the
    * exact backstop. Keeps the first arrival (micro-batch order), adds
    * the `canon_url` column.
    */
  def urlDedupStream(docs: DataFrame, urlCol: String,
                     watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("canon_url", graft.ops.WebOps.urlCanonicalize(col(urlCol)))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("canon_url")

  /** Boilerplate scrub for ARRIVING documents against a STORED
    * [[graft.ops.Dedup.BoilerplateIndex]] — the streaming twin of
    * [[graft.ops.Dedup.stripWithBoilerplateIndex]], completing that
    * artifact's lifecycle at the ingest door (fit/extend run in the
    * batch compaction pass; the door only scrubs).
    *
    * Completely STATELESS, and — unlike the nb/importance twins — with
    * NO driver-side map and NO UDF: the batch op's explode → cut-list
    * join → re-aggregate reassembly is a stream-side shuffle a stream
    * cannot run, but the SAME decision restates row-locally — collapse
    * the thresholded cut list to one array per group, stream-static
    * LEFT-join it on the group key (stateless; the static side re-plans
    * per micro-batch, so persist the index), and filter the doc's own
    * split units against it with a higher-order `filter` + `array_join`
    * reassembly. Per-row work is O(units × cut-lines-of-its-group)
    * array probes; the cut list is prevalence-bounded (lines carried by
    * ≥ minDf docs — template-sized, not corpus-sized). `broadcastCuts`
    * mirrors the [[flagAgainstBaseIndexed]] boundary: true (default —
    * cut lists are template-sized) broadcasts the G-row array table so
    * the stream side never shuffles.
    *
    * Stream ≡ batch EXACTLY (spec-pinned): unit split, hash-free string
    * equality, order-preserving reassembly and the NULL-text-as-empty
    * contract all restate [[graft.ops.Dedup.stripWithBoilerplateIndex]]
    * per doc; the only difference is WHERE the filter runs (row-local
    * vs join-side), which cannot change which units match. The batch's
    * own prevalence never contributes — the door scrubs against the
    * base the compaction pass last published (the cross-batch contract
    * shared with [[spanFlagStream]]).
    *
    * Output: input columns + `n_units`, `n_kept`, `text_clean`.
    */
  def boilerplateScrubStream(docs: DataFrame,
                             index: Dedup.BoilerplateIndex,
                             groupCol: String, minDf: Long,
                             broadcastCuts: Boolean = true): DataFrame = {
    require(index.scheme == Dedup.BoilerplateIndex.Scheme,
      s"BoilerplateIndex scheme ${index.scheme} != this build's " +
        s"${Dedup.BoilerplateIndex.Scheme} — refit the index")
    require(minDf >= 2,
      s"boilerplateScrubStream: minDf must be >= 2, got $minDf")
    val cutsG = index.lineDf.filter(col("line_df") >= minDf)
      .groupBy(col("group"))
      .agg(collect_set(col("unit")).as("__cuts"))
    val cuts = if (broadcastCuts) broadcast(cutsG) else cutsG
    val sep = index.sep
    val units = split(coalesce(col("text"), lit("")),
      java.util.regex.Pattern.quote(sep))
    docs
      .withColumn("group", col(groupCol))
      .join(cuts, Seq("group"), "left")
      .withColumn("__units", units)
      .withColumn("__kept", filter(col("__units"),
        u => !array_contains(coalesce(col("__cuts"),
          array().cast("array<string>")), u)))
      .withColumn("n_units", size(col("__units")).cast("long"))
      .withColumn("n_kept", size(col("__kept")).cast("long"))
      .withColumn("text_clean", array_join(col("__kept"), sep))
      .drop("group", "__cuts", "__units", "__kept")
  }

  /** Media fingerprinting at the ingest door — the streaming twin of
    * the batch [[graft.ops.Multimodal.averageHash]] /
    * [[graft.ops.Multimodal.audioEnergyHash]] pair, for a mixed blob
    * stream (schema: media_id, content + passthrough): magic-byte
    * dispatch picks the modality, the REAL decoder
    * (`javax.imageio` / `javax.sound`) runs on the micro-batch's scan
    * partitions, and each blob leaves as
    * `(media_id, media_kind, fp_hi, fp_lo)` — 64-bit fingerprint as
    * 32-bit halves, NULL when the magic lied or the blob is
    * undecodable, kind `unknown` for non-media bytes (the two
    * crawl-health reads kept distinct). Downstream, near-dup flagging
    * joins these 20-byte rows against a persisted fingerprint
    * relation ([[graft.ops.Multimodal.hammingNearDup]] in the batch
    * compaction pass, or a stream-static band join — the
    * [[flagAgainstBase]] posture); the BYTES never cross an exchange
    * in either half.
    *
    * Shape: completely STATELESS — typed `mapPartitions` (the one
    * construct that puts an imperative decoder inside a streaming
    * plan without a state store), no watermark, no shuffle; the
    * fingerprint internals are the SAME private functions the batch
    * operators call, so stream and batch cannot disagree on a blob
    * they both hash.
    */
  def mediaFingerprintStream(media: DataFrame): DataFrame =
    graft.ops.Multimodal.mediaFingerprints(media)

  /** Video fingerprinting at the ingest door —
    * [[mediaFingerprintStream]]'s twin for raw-frame video blobs
    * (which carry no magic bytes, so the dispatch stream cannot route
    * them): each arriving blob slices its frame grid, hashes every
    * sampled frame and majority-votes the 64-bit fingerprint
    * ROW-LOCALLY ([[graft.ops.Multimodal.videoFingerprintInline]] —
    * the blob arrives whole, so the vote needs no aggregate), leaving
    * as `(media_id, n_frames, vfp_hi, vfp_lo)` — the exact relation
    * the batch [[graft.ops.Multimodal.videoFingerprint]] emits, so
    * downstream near-dup flagging (stream-static band join against a
    * stored fingerprint relation, the [[mediaFlagAgainstBase]]
    * posture) is shared verbatim. Completely STATELESS: typed
    * mapPartitions, no watermark, no shuffle; the slice/hash/vote
    * internals are the same private function, and StreamingSpec pins
    * stream ≡ batch over planted blobs.
    */
  def videoFingerprintStream(media: DataFrame, w: Int, h: Int,
                             every: Int): DataFrame =
    graft.ops.Multimodal.videoFingerprintInline(media, w, h, every)

  /** Flag ARRIVING media blobs that near-duplicate the STORED
    * fingerprint base — [[flagAgainstBase]]'s media twin and
    * [[graft.ops.Multimodal.crossNearDupMedia]]'s streaming form: each
    * micro-batch fingerprints itself ([[mediaFingerprintStream]],
    * stateless), explodes its four 16-bit bands, and STREAM-STATIC
    * joins the base's capped band postings; verification is the exact
    * `bit_count(xor)` on the static hash columns. Same completeness
    * (`maxDist ≤ 3` pigeonhole), same base-bucket cap, same
    * kind-matching as the batch operator — the band/verify relations
    * derive from the SAME stored index both halves read, so door and
    * compaction pass cannot disagree about a blob they both flag.
    * Stateless end to end: no watermark, no state store — the static
    * side is re-read per micro-batch (broadcast when small; persist
    * the loaded index for a long-lived stream). Exactly-once per pair
    * comes from the row-local ANCHOR-BAND predicate (emit only from
    * the smallest AGREEING band — both hashes sit in the joined row),
    * not a stateful dedup. One documented divergence vs the batch
    * operator, only on OVER-CAP buckets: if a pair's smallest
    * agreeing band was cap-dropped, the batch join still keeps the
    * pair through a later surviving band while the anchor drops it —
    * i.e. stream flags ⊆ batch flags, equal whenever no shared band
    * is over-cap (the spec pins both directions). The cap audit is
    * the same loud screen either way; size the cap there.
    * Output: `(new_id, base_id, hamming, media_kind)` per flagged
    * arrival, non-duplicates absent (the flag relation, not a
    * passthrough).
    */
  def mediaFlagAgainstBase(media: DataFrame,
                           index: graft.ops.Multimodal.FingerprintIndex,
                           maxDist: Int,
                           maxBucket: Int = 1000): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      s"mediaFlagAgainstBase: banding is complete only for maxDist " +
        s"<= 3, got $maxDist")
    require(maxBucket >= 2,
      s"mediaFlagAgainstBase: maxBucket must be >= 2, got $maxBucket")
    val base = index.fingerprints
      .filter(col("fp_hi").isNotNull && col("fp_lo").isNotNull)
      .select(col("media_id").as("base_id"),
        col("media_kind").as("kind_b"),
        col("fp_hi").as("hb"), col("fp_lo").as("lb"))
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col("b"), col("v"))
    def bands(hi: org.apache.spark.sql.Column,
              lo: org.apache.spark.sql.Column) = explode(array(
      struct(lit(0).as("b"), pmod(lo, lit(65536L)).as("v")),
      struct(lit(1).as("b"), (lo / 65536L).cast("long").as("v")),
      struct(lit(2).as("b"), pmod(hi, lit(65536L)).as("v")),
      struct(lit(3).as("b"), (hi / 65536L).cast("long").as("v"))))
    val baseBands = base
      .select(col("base_id"), bands(col("hb"), col("lb")).as("bv"))
      .select(col("base_id"), col("bv.b").as("b"), col("bv.v").as("v"))
      .withColumn("__n", count(lit(1)).over(wB))
      .filter(col("__n") <= maxBucket).drop("__n")
    val arriving = mediaFingerprintStream(media)
      .filter(col("fp_hi").isNotNull && col("fp_lo").isNotNull)
      .select(col("media_id").as("new_id"), col("media_kind"),
        col("fp_hi").as("ha"), col("fp_lo").as("la"))
    // exactly-once per pair WITHOUT stateful dedup: a pair reached
    // through several shared bands emits only from its SMALLEST one —
    // the anchor-cell trick (AsOf.overlapJoin), here a pure row-local
    // predicate because both hashes sit in the joined row. Keeps the
    // operator genuinely stateless (a streaming dropDuplicates would
    // grow pair-grain state forever).
    val anchor = {
      val eq0 = pmod(col("la"), lit(65536L)) === pmod(col("lb"), lit(65536L))
      val eq1 = (col("la") / 65536L).cast("long") ===
        (col("lb") / 65536L).cast("long")
      val eq2 = pmod(col("ha"), lit(65536L)) === pmod(col("hb"), lit(65536L))
      (col("b") === 0) ||
        (col("b") === 1 && !eq0) ||
        (col("b") === 2 && !eq0 && !eq1) ||
        (col("b") === 3 && !eq0 && !eq1 && !eq2)
    }
    arriving
      .select(col("new_id"), col("media_kind"), col("ha"), col("la"),
        bands(col("ha"), col("la")).as("bv"))
      .select(col("new_id"), col("media_kind"), col("ha"), col("la"),
        col("bv.b").as("b"), col("bv.v").as("v"))
      .join(baseBands, Seq("b", "v"))
      .join(base, Seq("base_id"))
      .filter(col("media_kind") === col("kind_b"))
      .filter(anchor)
      .select(col("new_id"), col("base_id"),
        (bit_count(expr("ha ^ hb")) + bit_count(expr("la ^ lb")))
          .cast("long").as("hamming"), col("media_kind"))
      .filter(col("hamming") <= maxDist)
  }
}
