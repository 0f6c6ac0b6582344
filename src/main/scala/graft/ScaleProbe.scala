package graft

import java.nio.file.{Files, Paths}

/** Empirical scale probe (round-6 verdict #2): every round has graded the
  * "designed for 100×" claim by reading plans; this main TESTS it. It
  * runs the structural heavyweights at two scale factors (default: the
  * sf0.1 fixtures and the locally generated sf1 — 10× the rows, see
  * `tools/gen_sf1.py`) and reports, per query:
  *
  *  - wall time at each SF (cold = first run incl. per-query codegen,
  *    warm = second run) and the warm big/small ratio — a scan-bound
  *    operator should scale ~linearly in rows (ratio ≲ 10 at 10× data,
  *    usually well under: fixed planning/shuffle-setup overheads
  *    amortize);
  *  - a PLAN-SHAPE FINGERPRINT (counts of shuffle Exchanges, sort-merge
  *    joins, broadcast joins, cartesian products) at each SF and whether
  *    it changed — a new Exchange or a broadcast-join flip to SMJ at the
  *    bigger SF is exactly the "works at test scale, dies at 100 TB"
  *    failure mode the plan audits look for.
  *
  * Output: one JSON line to stdout + SPARK_GRAFT_PROBE_OUT (default
  * ./scale_probe.json).
  */
object ScaleProbe {

  /** The 8 structural heavyweights named by the round-6 verdict, the
    * round-7 corpus operators (contamination / repetition / mixture) so
    * new ops prove their scaling on arrival, and one representative per
    * remaining operator family — embeddings (exact top-k, banded
    * near-dup, IVF ANN) and event-time windows (sessionize) — so every
    * pipeline category has empirical sf1 evidence.
    */
  private val probes = Seq(
    "q09_join_multikey", "q23_neardup_minhash", "q24_neardup_simhash",
    "q37_approx_sketch", "q45_sketch_similarity", "q46_dup_clusters",
    "q52_tpch_q3", "q53_tpch_q5",
    "q57_contamination", "q58_repetition", "q59_mixture_sample",
    "q28_ann_topk", "q30_embed_neardup", "q51_ann_ivf", "q34_sessionize",
    // round-7 verdict #3 (the r8 backlog): chunking is the one operator whose cost is
    // dominated by OUTPUT volume (~nChunks× its input), and the token
    // counters are the per-row scan the whole quality stack rides on —
    // both need sf1 evidence like everything else.
    "q60_chunking", "q38_token_counts",
    // r8 arrivals: sub-document dedup — corpus-wide first-occurrence
    // state is the one new shape (unit-keyed min) — and the composed
    // cleaning pipeline, the heaviest single query in the contract
    "q62_line_dedup", "q63_clean_pipeline",
    // late-r8 arrivals: incremental batch-vs-base dedup (the capped base
    // bucket index is the new shape — its cost must track the BATCH, not
    // the base) and the shuffle-shard export (one shard-keyed shuffle
    // whose per-shard sort is the write layout itself)
    "q64_incremental_dedup", "q65_shuffle_shard",
    // sequence packing: the window-cumsum pass whose exchange must be
    // REUSED from the shard assignment (one shuffle for the composition)
    "q66_pack_sequences",
    // leakage audit (crossNearDup composed over the split) and the
    // per-source exact rank gate (the one operator with a per-source
    // sort — its approx twin is the sort-free scale path)
    "q67_split_leakage", "q68_quality_topfrac",
    // r9 arrivals, the corpus-sized ones: BM25's single restricted-
    // postings shuffle + ReusedExchange df branch, and the two
    // vocabulary passes (top-k cut; freq join back onto the token
    // stream). q70 is prune-bounded by construction; q72's two
    // corpus-sized components are exactly q69 (BM25) and q28's
    // brute-force cosine, both probed — its fusion is top-N-bounded.
    "q69_bm25_retrieval", "q71_vocab_oov", "q73_unigram_surprisal",
    // bigram collocations: the pair aggregate is the biggest token-
    // derived table in the repo (vocab² upper bound) — sf1 evidence on
    // arrival like everything else
    "q74_bigram_pmi",
    // per-source KL drift: one (source, term) corpus aggregate.
    // (q76 rebalancing shares q70's prune-bounded machinery — covered.)
    "q75_source_drift",
    // r10/r12 arrivals (r10 verdict #2): the gated ANN hybrid (exact
    // anchor + per-call fit — the RECALL evidence) and the stored-index
    // production path (probeIvf over a fitted+saved+reloaded index —
    // the honest per-batch cost; its fit runs once in the warmup pass
    // via the session cache, so warm timings isolate probe+fuse), plus
    // the BPE learner — the one operator whose cost is a bounded LOOP
    // of vocab-sized rounds after a single corpus pass
    "q77_hybrid_ann", "q80_hybrid_ann_stored", "q78_bpe_merges",
    // the composed exports: the two-shuffle curation pipeline and the
    // subword-packed variant (BpeEncode's per-row scan cost at 10×
    // corpus under a session-cached learned table)
    "q81_curate_export", "q82_subword_pack",
    // r13 arrivals, the corpus-sized ones: DSIR's two explode+aggregate
    // passes (histograms + raw-doc scores — cost must track the token
    // stream, never the bucket join), and MaxP's chunk-grain BM25 (the
    // chunk explosion multiplies postings ~(1+overlap/stride)×; the
    // restricted-postings shuffle must stay the only corpus exchange).
    // q89 shares q28's probed broadcast-scan shape and is query-bounded.
    // q91's bigram-key join against the distinct-bigram-bounded table is
    // the inherent n-gram-LM cost — its growth must track the scored
    // batch plus the bigram table, never quadratics.
    "q88_dsir_select", "q90_maxp_retrieval", "q91_stupid_backoff",
    // late-r13 arrivals: PQ ANN (the fit+encode pass is the corpus-sized
    // side — m vec_nearest codegen calls per row — and the ADC sweep must
    // stay one compressed-relation scan), the tokenizer fertility report
    // (pure scan + G-bounded aggregate — the flattest shape in the repo,
    // its ratio should read ≈ the raw bandwidth ratio) and the centroid
    // outlier screen (the (group, dim) partial aggregate + broadcast-back
    // scan — shuffle volume is G × dim × partitions, corpus-independent)
    "q92_ann_pq", "q93_tokenizer_fertility", "q94_embedding_outliers",
    // IVF-PQ: the deployed ANN composition — its probe must scan
    // nprobe/nlist of the COMPRESSED file (cluster-keyed join over codes)
    // with the exact re-rank bounded at refine × k vectors per query
    "q95_ann_ivfpq",
    // late-r13 arrivals: the PII scrub (five regex engines per row on a
    // zero-exchange scan — the pure-bandwidth shape, like q93 but
    // regex-bound). Its ratio reads AT the scan band's 10× edge (10.3
    // in the r18 sweep, the one non-comparator row above 10 — r18
    // verdict watch item #1, diagnosed r19): per-row text volume is
    // IDENTICAL at both SFs (avg 297 chars, driver fixture), rows are
    // exactly 10×, and the plan is one codegen'd scan with zero joins —
    // so the regex work is exactly corpus-linear BY DESIGN and the
    // reading is honest cost plus sweep noise (re-measured standalone
    // at 5.6×: the 15 MB sf1 file splits into 2 input partitions and
    // parallelizes where the 1.5 MB file cannot; at production scale
    // file count supplies the parallelism). Not a plan artifact —
    // pinned like q201/q87's comparator notes. Then CCNet perplexity
    // buckets (q73's token passes + ONE
    // doc-grain window exchange per source — the per-group sort must
    // stay doc-grain), and weighted sampling (corpus scan +
    // TakeOrderedAndProject — the cheapest exact-n pass; its ratio
    // should read ≈ the scan ratio, no shuffle at any size)
    "q97_pii_redact", "q98_perplexity_buckets", "q99_weighted_sample",
    // continuation arrivals: the stored-postings BM25 probe (the indexed
    // read — its cost must track the query vocabulary's postings rows,
    // never the corpus; fit+save run once in the warmup via the session
    // cache, exactly like q80) and the repeated-span pass (rolling
    // fingerprints are one O(T) scan; the fp-stats aggregate is THE
    // corpus shuffle; everything past the minDf cut is duplicate-bounded)
    "q102_bm25_stored", "q103_span_dedup",
    // the ingest-door span scrub: cost must track the BATCH's windows +
    // one semi-join against the stored fp set (fit+save run once in the
    // warmup via the session cache) — never a base re-tokenize
    "q104_cross_span_scrub",
    // this-session arrivals: the URL curation pass (domain-count
    // aggregate + the heavy-tail-only rank window — light domains must
    // never enter the window exchange), the fused distinct-n explode
    // (~3× the token stream through ONE explode, deduped two-phase —
    // the heaviest new scan), the winsorized z pass (one doc-grain
    // window per source + two group-bounded broadcast-backs), the
    // snapshot diff (full-outer join of fingerprint PROJECTIONS — text
    // never shuffles — + two distinct-term anti-joins), and the NB
    // classifier (two token passes: class histograms and scoring, with
    // a vocabulary-key join that must stay broadcast)
    "q108_domain_cap", "q109_ngram_diversity", "q110_winsorized_z",
    "q111_corpus_diff", "q113_nb_classifier",
    // canonicalization (two distinct passes over the doubled corpus —
    // the NFC scan must read ≈ bandwidth), the MG heavy-hitters
    // aggregate (G × k counters across the wire regardless of rows — a
    // corpus-proportional ratio here means the partial aggregation
    // broke), and the composed web-curation pipeline (cap + NB fit +
    // score — the composition must track its parts, not multiply them)
    "q115_canon_dedup", "q116_heavy_hitters", "q117_web_curation",
    // r13 tail + r14 arrivals (r13 verdict #5): the CMS registry —
    // two corpus fit/extend aggregates whose shuffled state is
    // G × sketch bytes regardless of rows (the fit side is
    // corpus-linear, the registry side ~1×); the remove-all-copies
    // boilerplate cut (two distinct-carrier shuffles + the cut-list
    // join-back) at source grain, its stored-histogram lifecycle, and
    // its registered-domain production form (the high-G consumer);
    // the Zipf fit (vocab-sized window, the corpus never enters the
    // rank exchange); the two recursive CTEs (planted-forest walk =
    // pure per-level scans vs edge-join walk = per-level BHJ probe —
    // levels grow log₇, so warm ratio should track rows, not depth);
    // and the LATERAL pair (generator + decorrelated top-k rank)
    "q118_freq_registry", "q120_boilerplate", "q121_zipf_fit",
    "q122_boilerplate_stored", "q119_recursive_cte",
    "q123_domain_boilerplate", "q124_recursive_edge_join", "q125_lateral",
    // later r14 arrivals, on-arrival per the r7 discipline: URL
    // canonicalization dedup (regex/array scan + one key shuffle), the
    // Gopher/C4 rule scan (regexp_count counters + one HOF), retention
    // cohorts (two distinct aggs + user-keyed join-back), token-budget
    // fill (one source-keyed window), language segmentation (explode →
    // (doc,lang) count → lang-bounded windows), CDC compaction (one
    // id-keyed window over base ∪ changes), and the hopping window
    // (Expand doubles the aggregate's input — the one op whose input
    // legitimately exceeds the corpus)
    "q126_url_dedup", "q128_quality_rules", "q130_retention_cohorts",
    "q132_token_budget", "q133_lang_segments", "q134_cdc_compaction",
    "q135_hopping_window",
    // the iterative-graph shape: K synchronous PageRank iterations,
    // each a ranks-edges join + a dst-keyed aggregate — per-iteration
    // cost tracks EDGES, and the edge relation here is corpus-derived,
    // so the sf1 ratio is the honest Pregel-cost evidence
    "q137_centrality",
    // the regex-heaviest per-row scan in the catalog (7 passes over
    // every document's HTML) — the q128 scan-bound family, priced
    "q139_html_extract",
    // blocked edit-distance join: the one deliberately-quadratic-
    // WITHIN-BLOCK shape — its sf1 ratio prices the block-size²
    // growth the blocking contract is supposed to bound
    "q141_edit_distance",
    // the two corpus trigram passes (fit + score) of the language-ID
    // model — the heaviest scan-bound arrival of the session — and
    // the extracted-link PageRank composition (extraction scan +
    // node-grain iterations)
    "q166_lang_id_model", "q162_link_pagerank",
    // r15 arrivals, on-arrival: rolling actives (user-day dedup + the
    // fixed ×7 coverage explode — the explode factor is the WINDOW, so
    // its ratio must track rows); MAD outliers (three corpus passes,
    // the exact-MAD floor — its ratio prices the multi-pass honestly);
    // fuzzy linkage (blocked quadratic like q141, digit-block
    // bounded, plus the native jaro_winkler scan); the agg-state merge
    // (two key-grain states + a rollup-sized outer join — its ratio
    // should track the corpus aggregates, the merge itself is free);
    // and the snapshot diff (id-keyed full-outer at corpus grain)
    "q171_rolling_actives", "q173_mad_outliers", "q176_fuzzy_linkage",
    "q175_agg_state_merge", "q179_snapshot_diff",
    // batch-2 r15 arrivals: the column profile's ×5 multi-distinct
    // Expand is the priced cost (corpus × profiled columns through one
    // aggregate), and the PIT enrichment's user-keyed equi-join with
    // the residual interval filter must never degrade to a range scan
    "q182_column_profile", "q184_pit_enrichment",
    // batch-3 r15 arrivals: session paths ride the q34 user window plus
    // a session-keyed aggregate (the array_sort is per-session-bounded);
    // link components price the star-contraction rounds on a
    // corpus-derived graph (log² rounds, edge-proportional per round)
    "q185_session_paths", "q188_link_components",
    // batch-5 r15 arrivals: the reconciliation join (line-side
    // aggregate + header join — both corpus-grain) and the time-travel
    // sweep (5 epoch reads over the ~1.5×-corpus history, each one
    // version-filtered id window — production runs ONE)
    "q193_reconciliation", "q194_time_travel",
    // batch-6 r15 arrival: session baskets ride the q34 user window,
    // the (session, type) dedup shuffle and the per-session ≤|types|²
    // pair join — its ratio must track the event stream
    "q198_session_baskets",
    // batch-8 r15 arrival: the weighted median is the one new op whose
    // windows run at CORPUS grain (cumweight + rank per return flag) —
    // its ratio must track lineitem rows; the other statistics land on
    // supplier/grid/digit-grain relations after one aggregate
    "q201_weighted_median",
    // r15 verdict #3: the 22 r15 arrivals that shipped without an sf1
    // row — the arrival-discipline backfill. Most window only AFTER a
    // corpus aggregate lands on grid/group/user grain (q177 quotas,
    // q178 seasonality cells, q180 chi-square, q181 calibration
    // deciles, q186/q203 scalar totals, q190 FD audit, q191
    // interarrival type-windows, q192 Pareto suppliers, q195 WOE bins,
    // q197 monthly grid, q200 KS distinct-value grid, q202 Gini
    // suppliers, q204 Benford digits, q205 group concat, q206 argmax,
    // q207 try_cast) and should probe ≈ the scan/aggregate ratio;
    // q172's EWMA and q174's blast-radius ride user/order-keyed
    // windows (corpus-grain but key-parallel); q187's bag/set ops and
    // q189's reciprocal-best ride key shuffles; q199's skyline is the
    // one global-window op — its r16 band pre-reduction is exactly
    // what this probe prices
    "q172_ewma_engagement", "q174_join_explosion",
    "q177_quota_allocation", "q178_seasonality", "q180_chi_square",
    "q181_calibration", "q186_type_correlation", "q187_bag_set_ops",
    "q189_mutual_best", "q190_fd_audit", "q191_interarrival",
    "q192_pareto_abc", "q195_woe_binning", "q197_growth_cumulative",
    "q199_skyline", "q200_ks_test", "q202_gini", "q203_trend_ols",
    "q204_benford", "q205_group_concat", "q206_argmax_parity",
    "q207_try_cast",
    // r16 arrivals, on-arrival: the stored-model language ID (score
    // half only — its ratio vs q166's fit+score prices the lifecycle),
    // and the binned weighted-median/MAD production siblings (one
    // partial-combined aggregate + bin-grain windows — both should
    // probe ≈ the aggregate ratio, far under their exact comparators)
    "q208_lang_id_stored", "q209_wmedian_binned", "q210_mad_binned",
    // r16 batch-2 arrivals: CUSUM/RFM/lag/growth/skew ride one corpus
    // aggregate each to grid/user/day grain (q214's quintile windows
    // run over USERS — corpus-grain only through the aggregate; q215
    // scans twice to user grain; q218's sketch union is days²-bounded
    // after the per-day sketch aggregate); q216's per-source rank
    // window is the one doc-grain window (the q68 exact-rank family),
    // q217 its window-free broadcast-extremes contrast; q211/q212/q220
    // land on source-grain cells immediately
    "q211_target_encoding", "q212_group_kfold", "q213_cusum_drift",
    "q214_rfm_scores", "q215_conversion_lag", "q216_percentile_norm",
    "q217_minmax_scale", "q218_sketch_growth", "q219_skew_profile",
    "q220_source_entropy",
    // r16 batch-3 arrivals: the null-safe join is one hash shuffle
    // (EqualNullSafe keys plan like `=`); triangles price the oriented
    // wedge join (Σ outdeg² — the planted graph keeps degrees bounded,
    // so the ratio must track edges); PSI lands on bin cells after one
    // corpus aggregate
    "q221_nullsafe_join", "q222_triangles", "q223_psi_drift",
    // r16 batch-4 arrivals: phrase search prices the positional
    // token-stream index + k−1 (doc, pos) equi-joins; ref-integrity is
    // two anti-join directions with a distinct-ed parent side; linear
    // interpolation is the hourly aggregate + spine-grain windows;
    // the bloom scrub is one scan against a scalar-subquery filter
    // (fit runs once in warmup via the session cache)
    "q224_phrase_search", "q225_ref_integrity", "q226_linear_interp",
    "q227_bloom_scrub",
    // r16 batch-5: the binary-column scan (encode+concat+substring —
    // the byte-bandwidth shape) and the user-day islands window
    "q228_magic_sniff", "q229_longest_streak",
    // r16 batch-6: golden-record survivorship is ONE id-keyed
    // partial-combined aggregate over the ~1.8x-corpus history
    "q230_golden_record",
    // r16 batch-7: the real-decoder pass — mapPartitions over the scan,
    // bytes never shuffle; ratio must read ≈ the per-row decode cost
    "q231_png_header_decode",
    // r16 batch-8: the stored positional probe (pruned indexed reads +
    // (doc,pos) equi-joins; fit runs once in warmup via the session
    // cache) and the LE-packed WAV decode scan (javax.sound per row)
    "q232_phrase_stored", "q233_wav_header_decode",
    // r17 arrivals: triangles' materialized sibling — per-node health
    // composes the same checkpointed oriented relation plus one
    // node-grain corner aggregate, so its ratio must track q222's
    "q238_graph_health",
    // r17 arrivals: the last two real-decoder scans (javax.imageio
    // JPEG SOF0 + the ISO-BMFF box walker per row) — like
    // q231/q233, mapPartitions on the scan, ratio ≈ per-row decode
    "q234_jpeg_header_decode", "q235_mp4_header_decode",
    // r17: incremental join maintenance — three delta-keyed joins plus
    // the stored-view union; all terms key-shuffled, none base×base
    "q236_delta_join",
    // r17: the native session_window — one user-keyed exchange, open-
    // session state per partition; ratio must track q34's manual twin
    "q237_session_window",
    // r17: the APP1/TIFF walk rides the same real-decoder scan as
    // q234 (javax.imageio dims + the direct IFD0 read per row)
    "q239_exif_orientation",
    // r17: ranking metrics — one (query,doc)-keyed left join, one
    // query-keyed window, one query-grain aggregate; run-sized, never
    // corpus-sized, so the ratio must track the row count
    "q240_ranking_metrics",
    // r17: the grid-bucketed interval join — one cell-keyed exchange
    // per side; pairs are time-local so the ratio must track rows,
    // and the ≤2-cells-per-interval explode keeps the fan-in flat
    "q241_overlap_join",
    // r17: ACF — one day-grain corpus aggregate, then days-sized lag
    // joins with scalar broadcasts; the ratio must read ≈ the scan
    "q242_autocorrelation",
    // r17: l-diversity — one group-keyed two-level partial aggregate
    // (distinct rides the same shuffle); ratio ≈ the scan
    "q243_l_diversity",
    // r17: k-core peel — per round one edge-grain degree aggregate +
    // two semi-joins, checkpointed; rounds are data-bounded (tendril
    // depth 3 + fixed-point exit), so the ratio prices rounds×edges
    "q244_kcore_peel",
    // r17: readability — one scan, zero exchanges, three codegen'd
    // regex/array counters per row; ratio ≈ the text-bandwidth scan
    "q245_readability",
    // r17: compaction plan — one partition-keyed sort window at file-
    // METADATA grain + two group-grain rollups; ratio ≈ the sort
    "q246_compaction_plan",
    // r17: HITS — per iteration two edge-grain join+aggregate half-
    // steps with scalar-max broadcasts, invariants checkpointed (the
    // pageRank discipline); ratio prices iters×edges
    "q247_hits",
    // r17: the quantile-normalization pair — q248 carries the
    // documented GLOBAL row sort (exact comparator), q249 the
    // bin-grain production path; their ratio gap IS the evidence
    "q248_quantile_norm", "q249_quantile_norm_binned",
    // r17: co-occurrence — capped Σ|basket|² self-join after one
    // basket-keyed shuffle; the audit is one aggregate. Ratio tracks
    // baskets because the cap bounds the per-basket quadratic term
    "q250_cooccurrence", "q251_cooccurrence_audit",
    // r17: label propagation — `rounds` synchronous neighbor-join +
    // (node,label)-count + arg-max steps, labels checkpointed per
    // round (the pageRank discipline); ratio prices rounds×edges
    "q252_label_prop",
    // r17: Jaccard join — per-doc sorted-shingle prefix explode, then
    // the capped posting self-join (Σ|posting|² bounded by the cap)
    // and exact verify on candidates only; the audit is one aggregate
    "q253_jaccard_join", "q254_jaccard_join_audit",
    // r17: attribution — one lookback-bounded range join at touch
    // grain + two ranking windows; the user cap bounds per-key fan-in,
    // so the ratio tracks conversions × average touches
    "q255_attribution", "q256_attribution_audit",
    // r17: Theil-Sen — the pair self-join runs at DAY-GRID grain
    // (calendar-bounded quadratic, never corpus rows), grid
    // localCheckpoint'd once; ratio ≈ the day-count aggregate
    "q257_theil_sen",
    // r17: aHash — real ImageIO raster decode on the scan partitions
    // (bytes never shuffle; 20 bytes/image move downstream), then the
    // capped 16-bit-band Hamming self-join over the hashes
    "q258_ahash_decode", "q259_ahash_neardup",
    // r17: audio fingerprint — real javax.sound PCM decode on the
    // scan partitions (28 bytes/clip move downstream), then the SAME
    // capped banded Hamming join the image family uses
    "q260_audio_fingerprint", "q261_audio_neardup",
    // r17: annotation agreement — one pair-grain partial-combined
    // aggregate; everything after runs at labels² grain
    "q262_cohen_kappa", "q263_agreement_confusion",
    // r17: containment join — capped asymmetric posting join (left
    // prefix × right full postings); the full-postings side caps by
    // design at this scale (its audit is the screen), so the ratio
    // prices the SURVIVING posting product, not the raw df²
    "q264_containment_join", "q265_containment_join_audit",
    // r17: image dedup capstone — decode+hash scan, capped band join,
    // star-contraction rounds (log² component), one survivor join;
    // every stage's own probe exists, this prices the composition
    "q266_image_dedup",
    // r17: retraction — two corpus histState aggregates + one
    // state-grain full-outer; the retraction itself never touches
    // corpus rows, so the ratio prices the histogram builds
    "q267_retract_hist", "q268_retract_audit",
    // r17: robust outliers — one corpus day-count aggregate, then two
    // rank windows at GROUP-SERIES (days × types) grain; ratio ≈ scan
    "q269_robust_outliers",
    // r17: stored-index media cross near-dup — the batch decodes
    // itself (checkpointed once) and band-joins the stored 20-byte
    // rows; the base NEVER re-decodes, so the ratio prices the stored
    // scan + band join, not the corpus decode
    "q270_media_cross_neardup",
    // r17: binned quantiles — one corpus histState aggregate + bin-
    // grain windows + a literal quantile explode; ratio ≈ the scan
    "q271_binned_quantiles",
    // r17: chi-square — one user-grain aggregate then a 1-row
    // statistic; ratio ≈ the corpus aggregate
    "q272_chi_square",
    // r18 arrivals: video fingerprint — frame slicing + per-frame hash
    // on the scan partitions (2 KB of video bytes per doc never
    // shuffle), then ONE media-keyed 64-counter vote aggregate; the
    // near-dup twin adds the capped banded join over the fingerprints
    "q273_video_fingerprint", "q274_video_neardup",
    // r17 verdict #3 backfill: the five >1 s bench rows whose probe
    // rows predate the gates: convention — re-probed so the current
    // sweep alone answers the scale question. q72 fuses the two probed
    // corpus components (BM25 + brute cosine, top-N-bounded fusion);
    // q85 rides the text near-dup pair generator at survivor grain;
    // q87 is the recall gate whose cost IS its exact all-pairs
    // comparator (deliberately quadratic — the q166 fit-in-query
    // posture; this backfill row CAUGHT the pinned-nlist n²/16 approx
    // side, fixed to auto-sized ≈ n^1.5, and the prod_semantic_pairs
    // row below prices the production path alone); q138 is one
    // partial-combined validation pass per relation; q168 is the NB
    // fit + heldout score + distinct-score-grain AUC window
    "q72_hybrid_rrf", "q85_keepbest_survivors", "q87_semantic_dedup",
    "q138_validation", "q168_classifier_auc",
    // r18: retraction-aware join maintenance — three delta-keyed
    // signed joins + the value-grain delta aggregate + ONE null-safe
    // full-outer state merge; base x base never re-joins, so the
    // ratio prices the stored-view build + delta terms, and the audit
    // twin rides the same alignment
    "q275_retract_join", "q276_retract_join_audit",
    // r18: stored-index cross Jaccard — the batch shingles itself and
    // computes prefixes under the PINNED stored ordering (one df JOIN,
    // never the base's df aggregate — fit+save run once in warmup via
    // the session cache, the q102/q270 posture), then the capped
    // posting join + exact verify against stored token sets; ratio
    // must price the batch + stored-postings scan, not a base refit
    "q277_cross_jaccard_stored",
    // r18: t-closeness — one cell-grain corpus aggregate, a group
    // window + domain-sized value join at CELL grain, one 1-row total
    // broadcast; ratio ≈ the corpus aggregate (the q243 family)
    "q278_t_closeness",
    // r18: video dedup capstone — slice+hash+vote scan, capped band
    // join, star-contraction rounds, one survivor join; the q266
    // composition pricing at video grain
    "q279_video_dedup",
    // r18: link prediction — the capped wedge self-join through each
    // center (Σ min(deg, cap)², the q250 shape) + the non-edge
    // anti-join; planted degrees bounded, so the ratio must track
    // edges, and the audit is one degree aggregate
    "q280_link_prediction", "q281_link_prediction_audit",
    // r18: Mann–Kendall — the q257 day-grid pair join (calendar-
    // bounded quadratic, grid checkpointed) + one value-grain tie
    // aggregate; ratio must track q257's
    "q282_mann_kendall",
    // r18: stored-postings containment door — batch prefix (one df
    // join) x stored FULL postings, both capped; the base is never
    // re-exploded, so the ratio prices batch + stored-postings scan
    "q283_cross_containment_stored",
    // r18: novelty — batch explode + ONE vocab-grain distinct over the
    // stored postings + a token-keyed left join; ratio prices batch +
    // index-linear vocab scan, never a base re-tokenize
    "q284_novelty_score",
    // r18: ER capstone — blocked jw pairs (q176's probed shape) +
    // star-contraction rounds + one universe survivor join; prices the
    // composition like q266/q279 do for media
    "q285_entity_resolution",
    // r19: stored-IVF semantic door — the batch routes itself through
    // the stored centroids (codegen'd map, zero routing exchanges) and
    // joins the capped stored inverted file; fit+save run once in
    // warmup via the session cache (the q277 posture), so the ratio
    // prices batch routing + the stored-file cell join, never a refit.
    // The audit twin re-runs the door capped/uncapped + the except
    // alignment — gate machinery, priced as such
    "q286_cross_semantic", "q287_cross_semantic_audit",
    // r19: delete path — the q277 door over the lazily-shrunk index
    // (three id anti-joins ride the stored-relation scans; save() is
    // the compaction, not paid here), so the ratio must track q277's;
    // the phantom audit is one id anti-join at retraction grain
    "q288_cross_jaccard_removed", "q289_remove_phantom_audit",
    // r19: stored-registry ER door — batch keys itself (row-local) and
    // equi-joins the stored records' key projection; the registry is
    // resolved + saved once in warmup via the session cache, so the
    // ratio prices batch keying + the capped block join + the
    // canonical attach, never a re-resolve
    "q290_entity_link_stored",
    // r19: admit-or-merge — q290's links + one batch-grain argmax
    // window + the registry union; same stored side, so the ratio
    // must track q290's
    "q291_entity_admit",
    // r19: semantic dedup capstone — within-corpus cell-bounded pairs
    // (the prod_semantic_pairs shape) + star-contraction rounds + one
    // survivor join; the q266/q279/q285 composition pricing on vectors
    "q292_semantic_dedup_capstone",
    // r19: assortativity — one symmetrize+distinct shuffle, a degree
    // aggregate, two degree joins and ONE global int64 sum; ratio ≈
    // the edge-scan ratio, no per-node state beyond degrees
    "q293_degree_assortativity",
    // r19: delete-path doors on the OTHER two stored families — the
    // shrunk-IVF probe rides q286's shape plus one id anti-join on
    // the inverted file; the shrunk-band probe pays the q64 fit (the
    // fit-in-query posture) plus the bucket-thinning regroup
    "q294_cross_semantic_removed", "q295_cross_neardup_removed",
    // r20: the delete path on the last two families — the media door
    // rides q270's shape plus one id anti-join on the 20-byte stored
    // relation (the batch still pays its own decode, the base never
    // re-decodes), and the registry retraction pays q291's admit shape
    // plus one anti-join and ONE canonical-grain re-election
    // aggregate; both phantom audits are one id anti-join at
    // retraction grain
    "q296_media_cross_removed", "q297_media_remove_phantom_audit",
    "q298_registry_remove_reelect",
    "q299_registry_remove_phantom_audit")

  private def materialize(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Counts of the plan nodes that decide scale behavior, from the
    * pre-execution physical plan (AQE's runtime re-plan can only improve
    * on it — a static SMJ/Exchange regression at the bigger SF shows up
    * here).
    */
  private def fingerprint(df: org.apache.spark.sql.DataFrame): Map[String, Int] = {
    val plan = df.queryExecution.executedPlan.toString
    def n(p: String) = p.r.findAllIn(plan).size
    Map(
      "exchange" -> (n("\\bExchange hashpartitioning") + n("\\bExchange rangepartitioning") + n("\\bExchange SinglePartition")),
      "smj" -> n("\\bSortMergeJoin"),
      "bhj" -> n("\\bBroadcastHashJoin"),
      "cartesian" -> (n("\\bCartesianProduct") + n("\\bBroadcastNestedLoopJoin")))
  }

  private case class Probe(name: String, coldS: Double, warmS: Double,
                           coldB: Double, warmB: Double,
                           fpS: Map[String, Int], fpB: Map[String, Int],
                           gates: Seq[String]) {
    def ratio: Double = if (warmS > 0) warmB / warmS else 0.0
    def changed: Boolean = fpS != fpB
    private def fpJson(fp: Map[String, Int]) =
      s"""{"exchange":${fp("exchange")},"smj":${fp("smj")},"bhj":${fp("bhj")},"cartesian":${fp("cartesian")}}"""
    private def gatesJson: String =
      gates.map(g => s""""$g"""").mkString("[", ",", "]")
    private def noteJson: String =
      noteOf.get(name).map(n => s""","note":"$n"""").getOrElse("")
    def json: String =
      f""""$name":{"gates":$gatesJson$noteJson,"small_cold":$coldS%.2f,"small_warm":$warmS%.2f,"big_cold":$coldB%.2f,"big_warm":$warmB%.2f,"warm_ratio":$ratio%.1f,"plan_small":${fpJson(fpS)},"plan_big":${fpJson(fpB)},"plan_changed":$changed}"""
  }

  /** Machine-checkable outlier documentation (r19 verdict #5): the
    * high-band pins used to live only in BASELINE prose, so
    * "outlier-must-be-documented" was a narrative, not a gate. Every
    * probe row expected to read above 5× at 10× rows carries its note
    * HERE, the note ships inside the row's JSON, and
    * `tools/check_probe_gates.py` REFUSES an artifact with an
    * unannotated >5× row (and a polluted banner — r19 verdict #2).
    * Classes, not prose-per-row: at 10× rows a corpus-linear pass
    * honestly reads anywhere up to ~10×, so the whole scan/decode band
    * shares one note; the genuinely super-linear rows (deliberate
    * comparators) get their own. Coverage is deliberately generous
    * (every row that read >4× in the last clean sweep) so run-to-run
    * noise across the 5× line can't fail a clean artifact. */
  private val ScanNote = "scan band: corpus-linear by design — one " +
    "codegen'd scan (+ key-grain aggregates/windows) whose per-row " +
    "work is constant, so 10x rows honestly reads up to ~10x; see " +
    "this row's shape comment in ScaleProbe.probes"
  private val DecodeNote = "decode-scan band: real per-row media " +
    "decode on the scan partitions (bytes never shuffle), " +
    "corpus-linear by design — 10x rows honestly reads up to ~10x"
  private val PairGenNote = "capped candidate-pair generator: cost " +
    "tracks surviving posting/band products under the documented " +
    "caps, between linear and the cap bound — super-linearity past " +
    "the band would show as a plan change, not a ratio drift"
  private val noteOf: Map[String, String] = Map(
    "q87_semantic_dedup" -> ("recall GATE, not the production path: " +
      "its cost IS the deliberate exact all-pairs comparator " +
      "(fit-in-query posture) that prices recall; production is " +
      "prod_semantic_pairs (~n^1.5 auto-sized cells) and the stored " +
      "door q286"),
    "q166_lang_id_model" -> ("fit-in-query comparator: trains the " +
      "trigram model INSIDE the query to price the lifecycle; " +
      "production is the stored-model twin q208"),
    "maint_rebuild_dedup_index" -> ("the deliberate base-proportional " +
      "CONTRAST row: rebuild re-reads the full corpus so ~10x is its " +
      "designed reading — maint_extend_dedup_index must beat it, and " +
      "does"),
    "maint_refine_ivf" -> ("deliberately corpus-proportional: one " +
      "Lloyd round over the FULL corpus (the scheduled-refit cost); " +
      "the per-batch path is maint_extend_ivf"),
    "prod_semantic_pairs" -> ("auto-sized IVF cells give ~n^1.5 pair " +
      "growth — sub-quadratic by design; contrast with the q87 gate " +
      "row whose exact comparator is the quadratic half"),
    "q97_pii_redact" -> (ScanNote + "; sf1's single 15 MB file " +
      "splits into only 2 input partitions locally (re-measured " +
      "standalone 5.6x) — at production scale file count supplies " +
      "the parallelism"),
    "q208_lang_id_stored" -> ScanNote,
    "q201_weighted_median" -> ("exact comparator of the binned pair: " +
      "corpus-grain cumweight/rank windows (rows x log sort) — the " +
      "production sibling is q209_wmedian_binned"),
    "q248_quantile_norm" -> ("exact comparator: the documented GLOBAL " +
      "row sort; production is q249_quantile_norm_binned"),
    "q295_cross_neardup_removed" -> ("in-gate per-call index FIT: the " +
      "gate builds the band index over the base slice, retracts, then " +
      "probes — its ratio prices the base-proportional build (the " +
      "maint_rebuild contrast class, ~10x honest at 10x rows), not a " +
      "stored-door probe; r20/r21 clean sweeps read 4.6x/5.5x, riding " +
      "the 5x line"),
    "q67_split_leakage" -> PairGenNote,
    "q45_sketch_similarity" -> PairGenNote,
    "q254_jaccard_join_audit" -> PairGenNote,
    "q265_containment_join_audit" -> PairGenNote,
    "q264_containment_join" -> PairGenNote,
    "q253_jaccard_join" -> PairGenNote,
    "q250_cooccurrence" -> PairGenNote,
    "q30_embed_neardup" -> PairGenNote,
    "q259_ahash_neardup" -> (DecodeNote + "; plus the capped " +
      "16-bit-band Hamming join over the 20-byte hashes"),
    "q261_audio_neardup" -> (DecodeNote + "; plus the capped banded " +
      "Hamming join over the 28-byte fingerprints"),
    "q270_media_cross_neardup" -> DecodeNote,
    "q266_image_dedup" -> (DecodeNote + "; capstone composition — " +
      "each stage has its own probe row"),
    "q274_video_neardup" -> DecodeNote,
    "q258_ahash_decode" -> DecodeNote,
    "q260_audio_fingerprint" -> DecodeNote,
    "q231_png_header_decode" -> DecodeNote,
    "q233_wav_header_decode" -> DecodeNote,
    "q234_jpeg_header_decode" -> DecodeNote,
    "q235_mp4_header_decode" -> DecodeNote,
    "q239_exif_orientation" -> DecodeNote,
    "q139_html_extract" -> ScanNote,
    "q128_quality_rules" -> ScanNote,
    "q245_readability" -> ScanNote,
    "q93_tokenizer_fertility" -> ScanNote,
    "q98_perplexity_buckets" -> ScanNote,
    "q109_ngram_diversity" -> ScanNote,
    "q38_token_counts" -> ScanNote,
    "q58_repetition" -> ScanNote,
    "q60_chunking" -> ScanNote,
    "q73_unigram_surprisal" -> ScanNote,
    "q71_vocab_oov" -> ScanNote,
    "q99_weighted_sample" -> ScanNote,
    "q91_stupid_backoff" -> ScanNote,
    "q74_bigram_pmi" -> ScanNote,
    "q116_heavy_hitters" -> ScanNote,
    "q62_line_dedup" -> ScanNote,
    "q103_span_dedup" -> ScanNote,
    "q64_incremental_dedup" -> ScanNote,
    "q108_domain_cap" -> ScanNote,
    "q221_nullsafe_join" -> ScanNote,
    "q224_phrase_search" -> ScanNote,
    "q123_domain_boilerplate" -> ScanNote,
    "q176_fuzzy_linkage" -> ("blocked quadratic WITHIN digit-bounded " +
      "blocks (the q141 family) + the native jaro_winkler scan — " +
      "block caps bound the pair product, so the ratio prices " +
      "block-size growth, not corpus^2"))

  /** The CORRECTNESS query name(s) each probe row's evidence belongs to
    * (r16 verdict #6: probe keys, bench keys and correctness keys must
    * join mechanically — every row now carries its gated-query names,
    * and `tools/check_probe_gates.py` validates the mapping against
    * the SparkEntry contract). Query probes gate themselves — the
    * probe name IS the queries key. The maintenance probes time
    * lifecycle halves (extend/rebuild/encode/refine) whose READ halves
    * are the gated queries of the same stored-index family listed
    * here.
    */
  private def gatesOf(name: String): Seq[String] =
    if (name.startsWith("q")) Seq(name)
    else name match {
      case "maint_extend_dedup_index" | "maint_rebuild_dedup_index" =>
        Seq("q64_incremental_dedup")
      case "maint_extend_ivf" | "maint_refine_ivf" =>
        Seq("q51_ann_ivf", "q80_hybrid_ann_stored")
      case "maint_encode_pq" => Seq("q92_ann_pq", "q95_ann_ivfpq")
      case "prod_semantic_pairs" => Seq("q87_semantic_dedup")
      case other => sys.error(s"gatesOf: unmapped probe '$other'")
    }

  def main(args: Array[String]): Unit = {
    val small = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val big = args.lift(1).getOrElse("localdata/sf1")
    // optional 3rd arg: comma-separated substring filter (the Verify
    // dev-loop convention) — re-probe a touched operator without
    // re-running the whole 70+ probe sweep
    val nameFilter: Seq[String] = args.lift(2)
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq.empty)
    // pre-run load flag (same rationale as StreamBench): a probe run on
    // a busy machine inflates warm ratios and once misdiagnosed a
    // rewrite as a non-improvement this round
    val preload = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val cpus = Runtime.getRuntime.availableProcessors
    // banded like StreamBench (r8 advice): "clean" means genuinely idle,
    // not merely under a quarter of the cores — and capped BY the
    // quarter-of-cores rule (r9 advice) so a small box can't loosen it.
    // The loaded cutoff is max(quarter-of-cores, 2× the clean cutoff)
    // (r10 advice): on ≤ 8 cpus the two cutoffs used to coincide and the
    // middle band was unreachable — mid-load runs jumped straight from
    // clean to polluted.
    val cleanCut = math.min(2.0, cpus * 0.25)
    val loadBand =
      if (preload <= cleanCut) "clean"
      else if (preload <= math.max(cpus * 0.25, 2 * cleanCut)) "loaded"
      else "polluted"
    val polluted = loadBand != "clean"
    if (polluted) System.err.println(
      f"$loadBand%s: pre-run load average $preload%.1f on $cpus cpus — " +
        "ratios will be inflated; rerun idle")
    val spark = GraftSession.local(appName = "graft-scaleprobe")

    def timeThunk(thunk: () => org.apache.spark.sql.DataFrame)
        : (Double, Double) = {
      def once(): Double = {
        val t0 = System.nanoTime()
        materialize(thunk())
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once(); val warm = once()
      (cold, warm)
    }

    def timeTwice(name: String, dir: String): (Double, Double) =
      timeThunk(() => SparkEntry.queries(name)(spark, dir))

    val selected =
      if (nameFilter.isEmpty) probes
      else probes.filter(n => nameFilter.exists(n.contains))
    val results = selected.map { name =>
      val fpS = fingerprint(SparkEntry.queries(name)(spark, small))
      // clearCaches between fingerprinting and timing: constructing
      // q46's frame eagerly derives and persists the shared near-dup
      // pair set, so without the reset the "cold" timing would silently
      // exclude the dominant derivation cost
      clearCaches(spark)
      val (coldS, warmS) = timeTwice(name, small)
      clearCaches(spark)
      val fpB = fingerprint(SparkEntry.queries(name)(spark, big))
      clearCaches(spark)
      val (coldB, warmB) = timeTwice(name, big)
      clearCaches(spark)
      // localCheckpoint blocks (triangles' oriented edges, the
      // fingerprint relations, the Theil-Sen grid, …) linger in the
      // block manager until their RDD objects are GARBAGE-collected
      // and ContextCleaner reaps them — across a 177-probe sweep that
      // accumulation inflated late probes ~1.5× (run-1 vs isolated
      // re-probe deltas, r17). Nudge the collector so each probe
      // starts against a drained store.
      System.gc()
      Thread.sleep(300)
      val p = Probe(name, coldS, warmS, coldB, warmB, fpS, fpB, gatesOf(name))
      // progress is useful on a 10-minute run
      println(f"[probe] $name small=${p.warmS}%.2fs big=${p.warmB}%.2fs " +
        f"ratio=${p.ratio}%.1fx planChanged=${p.changed}")
      p
    }

    // ---- index-maintenance probes (r12 verdict #4) ----
    // The per-ingest-batch costs a 100 TB operator pays daily, never
    // timed before: folding a batch into a STORED dedup index
    // (extendIndex — documented as index-linear compaction, far below
    // rebuild) and into a STORED IVF index (extendIvf — batch
    // -proportional assignment plus id-pruned base guards). Design:
    // the batch SIZE is fixed (10% of the SMALL corpus) while the
    // stored base grows 10×, so the ratio column reads directly as
    // base-sensitivity — ≈1× is the batch-proportional signature,
    // ≈10× is base-proportional. The rebuild row is the deliberate
    // base-proportional contrast extendIndex must beat.
    import org.apache.spark.sql.functions.col
    import graft.ops.{Dedup, Similarity}
    def maintSetup(dir: String) = {
      val docs = table(spark, dir, "documents")
      val batchD = docs.orderBy(col("doc_id")).limit(500).localCheckpoint()
      val baseD = docs.join(batchD.select("doc_id"), Seq("doc_id"), "left_anti")
      val emb = table(spark, dir, "embeddings")
      val batchE = emb.orderBy(col("vec_id")).limit(200).localCheckpoint()
      val baseE = emb.join(batchE.select("vec_id"), Seq("vec_id"), "left_anti")
      // untimed: build + SAVE + LOAD both indexes — maintenance acts on
      // the stored artifact, exactly like a restarted ingest process
      val dDir = Files.createTempDirectory("probe-dedup-idx").toString
      Dedup.buildIndex(baseD, "doc_id", "text").save(dDir)
      val vDir = Files.createTempDirectory("probe-ivf-idx").toString
      Similarity.fitIvf(baseE).save(vDir)
      val pDir = Files.createTempDirectory("probe-pq-idx").toString
      Similarity.fitPq(baseE).save(pDir)
      (Dedup.loadIndex(spark, dDir), batchD, docs,
        Similarity.loadIvf(spark, vDir), batchE,
        Similarity.loadPq(spark, pDir))
    }
    // a filtered run skips the maintenance family unless a filter
    // substring matches one of the probe NAMES — the same
    // `name.contains(filter)` contract as the query probes (names
    // declared here because setup must run before the probe table is
    // built; kept in sync by the require against maintProbes below)
    val maintNames = Seq("maint_extend_dedup_index",
      "maint_rebuild_dedup_index", "maint_extend_ivf",
      "maint_encode_pq", "maint_refine_ivf", "prod_semantic_pairs")
    val runMaint = nameFilter.isEmpty ||
      maintNames.exists(n => nameFilter.exists(n.contains))
    val (idxS, batchDS, docsS, ivfS, batchES, pqS) =
      if (runMaint) maintSetup(small) else (null, null, null, null, null, null)
    val (idxB, batchDB, docsB, ivfB, batchEB, pqB) =
      if (runMaint) maintSetup(big) else (null, null, null, null, null, null)
    val maintProbes: Seq[(String, () => org.apache.spark.sql.DataFrame,
        () => org.apache.spark.sql.DataFrame)] = Seq(
      ("maint_extend_dedup_index",
        () => Dedup.extendIndex(idxS, batchDS, "doc_id", "text").bands,
        () => Dedup.extendIndex(idxB, batchDB, "doc_id", "text").bands),
      ("maint_rebuild_dedup_index",
        () => Dedup.buildIndex(docsS, "doc_id", "text").bands,
        () => Dedup.buildIndex(docsB, "doc_id", "text").bands),
      ("maint_extend_ivf",
        // the extendIvf CALL runs the eager guards (id semi-join +
        // overgrowth count); the materialized frame is the assignment
        // delta — together the full per-batch ingest cost. The
        // fingerprint sees the delta plan only (the guards are driver
        // actions, not part of the returned frame).
        () => { Similarity.extendIvf(ivfS, batchES)
                Similarity.assignBatch(ivfS, batchES) },
        () => { Similarity.extendIvf(ivfB, batchEB)
                Similarity.assignBatch(ivfB, batchEB) }),
      ("maint_encode_pq",
        // PQ ingest maintenance: encode the batch against the STORED
        // codebooks — by construction it never reads the base (the
        // append is the artifact), so the ratio column should read ≈1×;
        // the row documents the per-batch cost and would CATCH any
        // future base-coupling regression
        () => Similarity.encodePqBatch(pqS, batchES),
        () => Similarity.encodePqBatch(pqB, batchEB)),
      ("maint_refine_ivf",
        // the compaction-cadence contrast to extend: ONE distributed
        // Lloyd round over the FULL corpus (refineIvf — the cell-balance
        // repair / post-drift refit). Deliberately corpus-proportional:
        // the ratio should read ≈ the corpus scan ratio (~10× at 10×
        // rows), pricing what a scheduled refit costs vs the per-batch
        // extend rows above; the materialized frame is the re-assigned
        // inverted file (the mean aggregates are driver actions inside
        // the call, included in the timing)
        () => Similarity.refineIvf(ivfS,
          table(spark, small, "embeddings"), iters = 1).assigned,
        () => Similarity.refineIvf(ivfB,
          table(spark, big, "embeddings"), iters = 1).assigned),
      ("prod_semantic_pairs",
        // the PRODUCTION path of the q87 recall gate: semanticPairs
        // alone — auto-sized cells, two-probe assignment, capped cell
        // pair join, NO exact comparator (q87's quadratic half is the
        // gate's evidence, not the user's cost). Ratio should read
        // ≈ n^1.5 / amortized fit, far under the gate row's
        () => Similarity.semanticPairs(
          table(spark, small, "embeddings"), threshold = 0.4),
        () => Similarity.semanticPairs(
          table(spark, big, "embeddings"), threshold = 0.4)))
    require(maintProbes.map(_._1) == maintNames,
      s"maintNames out of sync with maintProbes: " +
        s"$maintNames vs ${maintProbes.map(_._1)}")
    val maintResults = (if (runMaint) maintProbes
      else Seq.empty[(String, () => org.apache.spark.sql.DataFrame,
        () => org.apache.spark.sql.DataFrame)]).map {
      case (name, mkS, mkB) =>
      val fpS = fingerprint(mkS())
      val (coldS, warmS) = timeThunk(mkS)
      val fpB = fingerprint(mkB())
      val (coldB, warmB) = timeThunk(mkB)
      val p = Probe(name, coldS, warmS, coldB, warmB, fpS, fpB, gatesOf(name))
      println(f"[probe] $name small=${p.warmS}%.2fs big=${p.warmB}%.2fs " +
        f"ratio=${p.ratio}%.1fx planChanged=${p.changed}")
      p
    }
    val all = results ++ maintResults

    val anyChanged = all.exists(_.changed)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "scale_probe.json")
    // A FILTERED run merges into the existing file instead of
    // truncating the sweep to the filtered rows: keep every stored
    // probe body whose key was not re-probed (string-level splice —
    // the stored bodies are re-emitted verbatim, so untouched rows
    // stay bit-identical and provenance-auditable).
    val merged: String =
      if (nameFilter.isEmpty) all.map(_.json).mkString(",")
      else {
        val prior = if (Files.exists(Paths.get(outPath))) {
          val txt = Files.readString(Paths.get(outPath)).trim
          val qStart = txt.indexOf("\"queries\":{")
          val body = txt.substring(qStart + "\"queries\":{".length,
            txt.lastIndexOf("}}"))
          // split top-level probe entries: "name":{...}
          """"([a-z0-9_]+)":\{[^{}]*\{[^{}]*\}[^{}]*\{[^{}]*\}[^{}]*\}"""
            .r.findAllIn(body).toSeq
        } else Seq.empty
        val reprobed = all.map(_.name).toSet
        val kept = prior.filterNot(e =>
          reprobed.exists(n => e.startsWith("\"" + n + "\":")))
        (kept ++ all.map(_.json)).mkString(",")
      }
    val line =
      f"""{"metric":"scale_probe","small":"$small","big":"$big","plan_changes":$anyChanged,"preload":$preload%.1f,"load_band":"$loadBand","polluted":$polluted,"queries":{$merged}}"""
    Files.writeString(Paths.get(outPath), line + "\n")
    println(line)
    spark.stop()
  }
}
