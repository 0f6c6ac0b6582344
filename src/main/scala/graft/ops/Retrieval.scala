package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over a document corpus — BM25 ranking of corpus
  * documents against a (small) query set.
  *
  * Part of the training-data-pipeline breadth layer next to the
  * embedding-space searches ([[Similarity]]): data curation uses exactly
  * this shape to pull the nearest TRAINING documents for an eval prompt
  * (contamination triage beyond n-gram overlap — [[TextOps.contamination]]
  * catches verbatim leakage, BM25 catches paraphrased near-neighbors) and
  * to build retrieval baselines over a cleaned corpus. The reference
  * engine has no text operators at all (its expression language is
  * `=`/`AND` over scalars, reference `sql2ra/functionality.py:76`).
  *
  * Scale shape (the part that matters at 100 TB): the query set is SMALL
  * (an eval benchmark — thousands of rows, not billions), so its distinct
  * term set broadcasts, and the corpus-side explode is semi-joined down
  * to query-term postings BEFORE anything shuffles — a document sharing
  * no term with any query never leaves its scan partition. The only
  * corpus-sized shuffle is the (doc, term) tf aggregation over those
  * surviving postings; document length rides that same shuffle as a
  * `max` aggregate instead of a second corpus join. Corpus constants (N,
  * avgdl) are one scan-only aggregate cross-joined in as a 1-row plan
  * (no eager action at plan-construction time), and per-term document
  * frequencies are an aggregate of the already-restricted tf table —
  * bounded by |query vocabulary|, then broadcast back. The df branch
  * names the same tf subtree, and AQE's ReuseExchange collapses the two
  * into ONE corpus explode at runtime (a `ReusedExchange` in the
  * executed plan, spec-pinned) — deliberately NOT a window count over
  * tf, which would shuffle full postings rows by raw term and pile a
  * stop-word-hot term onto one task; the aggregate path partial-combines
  * map-side before anything moves.
  *
  * Score: the Robertson/Sparck-Jones BM25 with the standard "+1" idf
  * floor (Lucene's formulation, public): for each query term t in doc d,
  * `idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dlen/avgdl))` with
  * `idf = ln((N - df + 0.5) / (df + 0.5) + 1)`. Query-side term
  * frequency is ignored (terms are distinct per query) — the standard
  * choice for short queries. Per-term contributions are rounded at 9 dp
  * and the per-(query, doc) sum re-rounded at 4 dp — the repo's
  * round-inside-round pattern that keeps cross-engine double aggregation
  * hash-stable regardless of float summation order (see q25/q58).
  *
  * Output: `(query_id, rnk, doc_id, bm25)` — top `topK` docs per query,
  * rnk 1..topK by (bm25 desc, doc_id asc); docs sharing no term with a
  * query score nothing and never appear (BM25 of disjoint texts is 0).
  */
object Retrieval {

  def bm25TopK(docs: DataFrame, queries: DataFrame,
               docId: String = "doc_id", textCol: String = "text",
               queryId: String = "query_id", queryTextCol: String = "qtext",
               topK: Int = 3, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    require(k1 >= 0 && b >= 0 && b <= 1,
      s"BM25 parameters out of range: k1=$k1 b=$b")

    // Distinct terms per query; the cross-query distinct term SET is the
    // broadcast side of the corpus semi-join.
    val qTerms = queries.select(col(queryId).as("query_id"),
      explode(array_distinct(TextOps.tokens(col(queryTextCol)))).as("term"))
    val qTermSet = qTerms.select(col("term")).distinct()

    // Corpus constants from a scan-only aggregate (no explode): a 1-row
    // DataFrame cross-joined into the score expression, never an eager
    // .first() at plan-construction time (q47's ns pattern).
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(TextOps.tokenCount(col(textCol)).cast("double")).as("avgdl"))

    // Postings restricted to query terms BEFORE the tf shuffle: the
    // broadcast hash join runs map-side inside the scan stage, so only
    // query-term occurrences are ever exchanged. dlen rides the same
    // shuffle (`max` of a per-doc constant), avoiding a corpus-sized
    // doc-length join. Tokenize ONCE into an alias before the explode:
    // an inline `size(tokens(text))` next to `explode(tokens(text))`
    // lands ABOVE the Generate and re-tokenizes the document once per
    // emitted token — O(len²) per doc: the first sf1 probe measured
    // 11.95 s warm, the aliased shape 2.55 s on the same clean probe
    // (4.7×; size() over the carried array is O(1) per row).
    // materialized ONCE (r21, guide §5/§3.3): the df aggregate below and
    // the score join both read this relation, and each read re-executed
    // the whole corpus tokenize+explode+semi-join lineage (plus, under
    // [[maxPassageTopK]], the upstream chunking) — profiled as the two
    // heaviest stages of q69/q90 running twice per call. The relation is
    // query-bounded — (docs containing a query term) × |query vocab| —
    // so the checkpoint is small at any corpus size.
    val tf = docs
      .select(col(docId).as("d_id"), TextOps.tokens(col(textCol)).as("__toks"))
      .select(col("d_id"), size(col("__toks")).cast("double").as("dlen"),
        explode(col("__toks")).as("term"))
      .join(broadcast(qTermSet), "term")
      .groupBy(col("d_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"), max(col("dlen")).as("dlen"))
      .localCheckpoint(true)

    // (d_id, term) is unique in tf, so df(term) = row count; bounded by
    // the query vocabulary, broadcast back onto the postings.
    val df_ = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))

    scoreBm25(tf, df_, qTerms, stats, topK, k1, b)
      .select(col("query_id"), col("rnk"), col("d_id").as(docId), col("bm25"))
  }

  /** THE BM25 scoring tail — one copy of the score arithmetic (idf
    * formula, length norm, the 9dp/4dp round-inside-round, the
    * (bm25 desc, doc asc) rank), shared by [[bm25TopK]] (per-call corpus
    * scan) and [[probePostings]] (stored-index scan) so the two paths
    * can never drift: the probe ≡ direct law in OpsSpec is a law about
    * THIS function being fed identical (tf, df, stats) inputs.
    */
  private def scoreBm25(tf: DataFrame, df_ : DataFrame, qTerms: DataFrame,
                        stats: DataFrame, topK: Int,
                        k1: Double, b: Double): DataFrame = {
    val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1)
    val norm = col("tf") +
      lit(k1) * (lit(1 - b) + lit(b) * col("dlen") / col("avgdl"))
    val scored = tf
      .join(broadcast(df_), "term")
      .crossJoin(broadcast(stats))
      .join(broadcast(qTerms), "term")
      .withColumn("contrib", round(idf * col("tf") * (k1 + 1) / norm, 9))
      .groupBy(col("query_id"), col("d_id"))
      .agg(round(sum(col("contrib")), 4).as("bm25"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("bm25").desc, col("d_id").asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("query_id"), col("rnk"), col("d_id"), col("bm25"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher's public RRF) of
    * per-query rankings from heterogeneous systems — the standard way to
    * combine [[bm25TopK]]'s lexical ranking with an embedding-space
    * ranking ([[Similarity.bruteForceTopK]] / ANN) into one hybrid
    * retrieval result without calibrating their incomparable scores:
    * `rrf(d) = Σ_systems 1 / (rrfK + rank_s(d))` over the systems that
    * ranked d at all.
    *
    * Scale shape: inputs are already per-query top-N lists (bounded —
    * queries × N rows per system), so everything here is small no matter
    * the corpus size; one union → one (query, doc) aggregation → one
    * per-query window. The rounding at 6 dp keeps the hash cross-engine
    * stable; with ≤ 2 systems the sum is two addends and exact
    * regardless of order.
    *
    * Output: `(query_id, rnk, doc_id, rrf)` — top `topK` per query by
    * (rrf desc, doc_id asc). Input frames must carry
    * (queryCol, docCol, rankCol) and be RANKINGS — (query, doc) unique
    * within each system; a duplicated row would contribute twice.
    */
  def rrfFuse(rankings: Seq[DataFrame], rrfK: Int = 60, topK: Int = 3,
              queryCol: String = "query_id", docCol: String = "doc_id",
              rankCol: String = "rnk"): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(rrfK >= 1 && topK >= 1, s"invalid rrfK=$rrfK / topK=$topK")
    val normed = rankings.map(_.select(
      col(queryCol).as("query_id"), col(docCol).as("doc_id"),
      col(rankCol).cast("int").as("in_rnk")))
    val fused = normed.reduce(_ unionByName _)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(lit(1.0) / (lit(rrfK) + col("in_rnk"))), 6).as("rrf"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
    fused
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("query_id"), col("rnk"), col("doc_id"), col("rrf"))
  }

  /** Passage-grain retrieval with MaxP document aggregation (the public
    * Dai & Callan 2019 recipe): split every document into sliding-window
    * chunks ([[TextOps.chunk]] — window/overlap in `\s+` words), rank
    * CHUNKS against the queries with [[bm25TopK]], then score each
    * document by its best chunk (`max` over its chunks in the per-query
    * top-`chunkPool`) and re-rank documents. Long documents stop hiding
    * their one relevant passage behind a diluted whole-document term
    * frequency — the reason passage-grain is the standard at retrieval
    * scale.
    *
    * The MaxP pool is explicitly the per-query chunk top-`chunkPool`
    * (bounded), not all chunks: a doc whose best chunk misses the pool
    * scores nothing, exactly like every other top-k retrieval cut here.
    * Chunk ids are `"<doc>#<idx>"` strings only inside this composition
    * (BM25's tie-break on them is deterministic bytewise in any engine);
    * the output speaks doc ids.
    *
    * Scale shape: chunking is one scan (output-sized, no shuffle),
    * BM25 over chunks keeps its single restricted-postings shuffle —
    * the chunk explosion multiplies rows by ~n/stride but each chunk is
    * window-bounded, so postings volume stays ~(1 + overlap/stride)× the
    * doc-grain volume — and everything after the chunk ranking is
    * queries × chunkPool rows.
    *
    * Output: `(query_id, rnk, doc_id, maxp)` — top `topK` docs per
    * query, rnk 1..topK by (maxp desc, doc_id asc).
    */
  def maxPassageTopK(docs: DataFrame, queries: DataFrame,
                     docId: String = "doc_id", textCol: String = "text",
                     queryId: String = "query_id",
                     queryTextCol: String = "qtext",
                     window: Int = 200, overlap: Int = 20,
                     chunkPool: Int = 10, topK: Int = 3,
                     k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(chunkPool >= topK,
      s"maxPassageTopK: chunkPool ($chunkPool) must cover topK ($topK)")
    val chunks = TextOps.chunk(docs.select(col(docId), col(textCol)),
        docId, textCol, window, overlap)
      .select(concat(col("doc_id").cast("string"), lit("#"),
        col("chunk_idx").cast("string")).as("chunk_id"),
        col("chunk_text"))
    val chunkRank = bm25TopK(chunks, queries, docId = "chunk_id",
      textCol = "chunk_text", queryId = queryId,
      queryTextCol = queryTextCol, topK = chunkPool, k1 = k1, b = b)
    val docScore = chunkRank
      .withColumn("doc_id", split(col("chunk_id"), "#").getItem(0)
        .cast(docs.schema(docId).dataType))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(max(col("bm25")).as("maxp"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("maxp").desc, col("doc_id").asc)
    docScore
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("query_id"), col("rnk"),
        col("doc_id").as(docId), col("maxp"))
  }

  /** A STORED lexical index — the fit-once-probe-per-batch lifecycle for
    * BM25, completing the index-artifact family next to the dedup band
    * index ([[graft.ops.Dedup.CorpusIndex]]) and the ANN quantizers
    * ([[graft.ops.Similarity.IvfIndex]]/PqIndex): [[bm25TopK]] tokenizes
    * and explodes the WHOLE corpus on every call, which is the right
    * shape for a one-off eval sweep and the wrong one for a production
    * retrieval endpoint that sees query batches daily — at 100 TB the
    * corpus pass is the entire cost. Here the postings relation
    * `(term, d_id, tf, dlen)` and the two corpus constants are computed
    * once per corpus version; every probe touches only the query terms'
    * postings rows.
    *
    * Storage layout IS the probe optimization: [[save]] range-partitions
    * the postings BY TERM and sorts within partitions, so every parquet
    * row group carries a tight term min/max — [[probePostings]] pushes
    * its query-term `IN` filter into the scan (a `PushedFilters: [In(term,
    * ...)]` row-group prune, spec-pinned), and a term absent from a file's
    * stats never costs IO. That replaces bm25TopK's corpus-wide
    * tokenize+explode+semi-join with a read of ~|query vocab| row groups.
    *
    * Corpus stats are stored EXACTLY: `n_docs` and `sum_dlen` as longs
    * (token counts are integers; the long sum is exact), so a probe's
    * `avgdl = sum_dlen / n_docs` reproduces bm25TopK's
    * `avg(size(tokens))` double bit-for-bit while total tokens < 2^53 —
    * and [[extendPostings]] can fold a batch in by integer addition, no
    * re-averaging pass. The SCHEME version pins the tokenizer
    * ([[TextOps.tokens]]'s `\s+` word contract): postings built under a
    * different tokenization would silently mis-score, so [[loadPostings]]
    * rejects a mismatch loudly (the CorpusIndex/IvfIndex posture).
    *
    * Lifecycle: [[fitPostings]] → [[PostingsIndex.save]] →
    * [[loadPostings]] → [[probePostings]], with [[extendPostings]]
    * appending a new batch's postings (batch-proportional — one batch
    * tokenize, never a base recompute). Unlike the ANN indexes this one
    * is EXACT: probePostings over a fit of the corpus returns
    * byte-identical rankings to bm25TopK over the corpus (OpsSpec law),
    * so there is no recall gate to pay, only the storage.
    */
  final case class PostingsIndex(postings: DataFrame,
                                 nDocs: Long, sumDlen: Long,
                                 scheme: Int = PostingsIndex.Scheme) {
    /** Average document length in tokens — exact integer arithmetic
      * rendered to the double bm25TopK's `avg` computes. */
    def avgdl: Double = sumDlen.toDouble / nDocs

    /** Store as two parquet tables under `path` (`postings/`, `meta/`).
      * Postings are range-partitioned and sorted by term so row-group
      * stats make the probe's pushed `IN(term, …)` filter an index scan,
      * not a table scan. */
    def save(path: String): Unit = {
      postings
        .repartitionByRange(col("term"))
        .sortWithinPartitions(col("term"), col("d_id"))
        .write.mode("overwrite").parquet(s"$path/postings")
      val spark = postings.sparkSession
      import spark.implicits._
      Seq((nDocs, sumDlen, scheme)).toDF("n_docs", "sum_dlen", "scheme")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    }
  }

  object PostingsIndex {
    /** Version of the tokenization + postings arithmetic. Bump whenever
      * stored (term, tf, dlen) rows would stop matching what this build
      * computes for the same text. */
    val Scheme = 1
  }

  /** Build a [[PostingsIndex]] from a corpus: one tokenize of each doc
    * feeding both the postings aggregation (the only corpus shuffle,
    * partial-combined on (doc, term)) and the exact corpus stats (a
    * scan-only long-sum aggregate, evaluated eagerly here — fit is the
    * once-per-corpus-version step, exactly like [[Similarity.fitIvf]]'s
    * driver Lloyd).
    */
  def fitPostings(docs: DataFrame, docId: String = "doc_id",
                  textCol: String = "text"): PostingsIndex = {
    val toks = docs.select(col(docId).as("d_id"),
      TextOps.tokens(col(textCol)).as("__toks"))
    val postings = toks
      .select(col("d_id"), size(col("__toks")).cast("long").as("dlen"),
        explode(col("__toks")).as("term"))
      .groupBy(col("d_id"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"), max(col("dlen")).as("dlen"))
      .select(col("term"), col("d_id"), col("tf"), col("dlen"))
    val statsRow = toks.agg(
      count(lit(1)).as("n_docs"),
      sum(size(col("__toks")).cast("long")).as("sum_dlen")).head()
    PostingsIndex(postings, statsRow.getLong(0), statsRow.getLong(1))
  }

  /** Read a [[PostingsIndex]] written by [[PostingsIndex.save]]. Stats
    * come from the stored meta row, never the caller; a scheme mismatch
    * fails loudly here rather than silently mis-scoring probes built
    * under a different tokenizer.
    */
  def loadPostings(spark: org.apache.spark.sql.SparkSession,
                   path: String): PostingsIndex = {
    val meta = spark.read.parquet(s"$path/meta").head()
    val scheme = meta.getAs[Int]("scheme")
    require(scheme == PostingsIndex.Scheme,
      s"stored PostingsIndex at $path uses scheme $scheme but this build " +
        s"produces scheme ${PostingsIndex.Scheme} — rebuild the index (a " +
        "cross-tokenizer probe would silently mis-score)")
    PostingsIndex(spark.read.parquet(s"$path/postings"),
      meta.getAs[Long]("n_docs"), meta.getAs[Long]("sum_dlen"), scheme)
  }

  /** BM25 rank a query batch against a STORED index — the per-batch
    * production cost: the distinct query-term set (config-bounded — a
    * query batch is an eval set, thousands of rows, the [[bm25TopK]]
    * contract) is collected and pushed into the postings scan as a
    * literal `IN` filter, so on a [[PostingsIndex.save]] layout only the
    * matching term ranges' row groups are read; df is then an aggregate
    * of the |query vocab|-bounded surviving postings (identical to
    * bm25TopK's — df counts docs PER TERM, and restricting by term
    * before counting changes nothing), and the scoring tail is the
    * SHARED [[scoreBm25]]. Result: byte-identical to
    * `bm25TopK(corpus, queries)` with the corpus pass replaced by an
    * indexed read.
    */
  def probePostings(index: PostingsIndex, queries: DataFrame,
                    queryId: String = "query_id",
                    queryTextCol: String = "qtext",
                    topK: Int = 3, k1: Double = 1.2,
                    b: Double = 0.75): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    require(k1 >= 0 && b >= 0 && b <= 1,
      s"BM25 parameters out of range: k1=$k1 b=$b")
    val qTerms = queries.select(col(queryId).as("query_id"),
      explode(array_distinct(TextOps.tokens(col(queryTextCol)))).as("term"))
    val termList = qTerms.select(col("term")).distinct()
      .collect().map(_.getString(0)).toSeq
    val tf = index.postings
      .filter(col("term").isin(termList: _*))
      .select(col("term"), col("d_id"),
        col("tf").cast("double").as("tf"),
        col("dlen").cast("double").as("dlen"))
    val df_ = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    val spark = index.postings.sparkSession
    import spark.implicits._
    val stats = Seq((index.nDocs.toDouble, index.avgdl))
      .toDF("n_docs", "avgdl")
    scoreBm25(tf, df_, qTerms, stats, topK, k1, b)
      .select(col("query_id"), col("rnk"), col("d_id").as("doc_id"),
        col("bm25"))
  }

  /** Fold a NEW document batch into a [[PostingsIndex]] — the per-ingest
    * cost is one batch tokenize (postings aggregation + the batch's long
    * stats), never a base recompute; corpus constants update by exact
    * integer addition. The extended index scores every query exactly as
    * a fresh [[fitPostings]] over the unioned corpus would (OpsSpec
    * extend ≡ refit law) — BM25's corpus statistics are additive, so
    * unlike the ANN indexes there is no drift to compact away, only
    * lineage: [[PostingsIndex.save]] after a run of extends rewrites one
    * merged layout.
    *
    * `verifyIds` (default true) rejects a batch whose doc ids are
    * already indexed — a duplicate would double-count tf rows and
    * corpus stats silently. One eager semi-join on the pruned `d_id`
    * column of the stored postings (the [[Similarity.extendIvf]]
    * posture; skip it only when the caller's id discipline is already
    * transactional).
    */
  def extendPostings(index: PostingsIndex, newDocs: DataFrame,
                     docId: String = "doc_id", textCol: String = "text",
                     verifyIds: Boolean = true): PostingsIndex = {
    if (verifyIds) {
      val overlap = newDocs.select(col(docId).as("d_id"))
        .join(index.postings.select(col("d_id")), Seq("d_id"), "left_semi")
        .limit(5).collect()
      require(overlap.isEmpty,
        s"extendPostings: batch ids already indexed " +
          s"(e.g. ${overlap.map(_.get(0)).mkString(", ")}) — their tf and " +
          "corpus stats would double-count; dedup the batch or refit")
    }
    val batch = fitPostings(newDocs, docId, textCol)
    PostingsIndex(index.postings.unionByName(batch.postings),
      index.nDocs + batch.nDocs, index.sumDlen + batch.sumDlen,
      index.scheme)
  }

  /** Positional postings — the index structure PHRASE queries need
    * (tf-only postings can say two terms co-occur, never that they
    * are ADJACENT): one row per (doc, term, position) over the shared
    * `\s+` tokenization, positions 0-based. Term-partitionable like
    * the BM25 postings; size is the token stream, the honest floor
    * for positional search.
    */
  def fitPositional(docs: DataFrame, docId: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    docs.select(col(docId).as("d_id"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "term")))
      .select(col("d_id"), col("term"), col("pos").cast("long").as("pos"))

  /** Exact phrase match over positional postings: a document matches
    * the phrase `[t₀ … t_{k−1}]` iff some start position p has every
    * tᵢ at p+i. Plan shape: the first term's postings anchor the
    * candidate (doc, p) set, then each subsequent term equi-joins on
    * the (d_id, pos+i) compound key — k−1 joins, each restricted to
    * ONE term's postings (a term `IN` pushdown on a term-sorted
    * stored layout, the q102 posture, makes each a pruned indexed
    * read). Candidate volume is bounded by the rarest prefix term the
    * phrase happens to start with — intersection shrinks
    * monotonically, never grows. Returns
    * (d_id, pos) of every occurrence; `count` per doc gives phrase
    * tf. NULL-free by construction.
    */
  def phraseMatch(positional: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseMatch: empty phrase")
    val anchor = positional.filter(col("term") === phrase.head)
      .select(col("d_id"), col("pos"))
    phrase.zipWithIndex.drop(1).foldLeft(anchor) {
      case (acc, (term, i)) =>
        acc.join(positional.filter(col("term") === term)
            .select(col("d_id"), (col("pos") - i).as("pos")),
          Seq("d_id", "pos"))
    }
  }

  /** Retrieval-quality evaluation — per-query ranking metrics of a run
    * against relevance judgments, the harness every retrieval component
    * here (BM25, RRF, hybrid ANN, hard-negative mining) needs before
    * its output feeds training data: a run whose MRR/recall regressed
    * is how a bad index rebuild is actually caught. Standard metrics
    * (Manning et al., *Introduction to Information Retrieval* ch. 8) in
    * EXACT integer basis points — every division is integer `div` on
    * 10⁴-scaled counts, so any two engines agree bit-for-bit (the
    * engine-wide cents posture; doubles would make the gate flaky):
    *
    *  - `p_at_k_bp`  = 10000·|relevant ∩ top-k| div k
    *  - `r_at_k_bp`  = 10000·|relevant ∩ top-k| div |relevant|
    *  - `rr_bp`      = 10000 div (rank of first relevant in top-k), 0
    *                   if none — mean over queries = MRR
    *  - `ap_bp`      = (Σ over relevant ranks r ≤ k of
    *                   10000·relcount@r div r) div |relevant| — AP with
    *                   per-term basis-point truncation (documented
    *                   divergence from float AP: each precision term is
    *                   floored to 1 bp before the mean; the metric
    *                   stays in [0, 10000] and ordering-faithful)
    *
    * Inputs: `run` = (query_id, doc_id, rank) with rank 1-based dense
    * within query (a top-k retrieval output); `qrels` = (query_id,
    * doc_id) positive judgments. Queries with no relevant docs are
    * dropped (metrics undefined — the TREC convention).
    *
    * Scale shape: one equi-join of the run on (query_id, doc_id)
    * against qrels (LEFT — unjudged retrieved docs count as
    * non-relevant), a query-keyed window for relcount@r, and one
    * query-grain aggregate. Runs are |queries|·k rows — tiny next to
    * the corpus that produced them — and qrels broadcast when small;
    * nothing is ever corpus-sized. int64 bound: 10⁴·relcount@r ≤
    * 10⁴·k per term, summed over ≤ k terms ⇒ ≤ 10⁴k², overflow-free
    * for any real k.
    */
  def rankingMetrics(run: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"rankingMetrics: k must be >= 1, got $k")
    val judged = run.filter(col("rank") <= k)
      .join(qrels.select(col("query_id"), col("doc_id"),
          lit(1L).as("rel")),
        Seq("query_id", "doc_id"), "left")
      .select(col("query_id"), col("rank"),
        coalesce(col("rel"), lit(0L)).as("rel"))
    val w = Window.partitionBy("query_id").orderBy("rank")
    val nRel = qrels.groupBy("query_id")
      .agg(count(lit(1)).as("n_rel"))
    judged
      .withColumn("relcount", sum(col("rel")).over(w))
      .groupBy("query_id")
      .agg(
        sum(col("rel")).as("hits_at_k"),
        min(when(col("rel") === 1L, col("rank"))).as("first_rel"),
        sum(when(col("rel") === 1L,
          expr("10000 * relcount div rank")).otherwise(lit(0L)))
          .as("ap_num"))
      .join(nRel, Seq("query_id"))
      .select(col("query_id"), col("n_rel"), col("hits_at_k"),
        expr(s"10000 * hits_at_k div $k").as("p_at_k_bp"),
        expr("10000 * hits_at_k div n_rel").as("r_at_k_bp"),
        coalesce(expr("10000 div first_rel"), lit(0L)).as("rr_bp"),
        expr("ap_num div n_rel").as("ap_bp"))
  }
}
