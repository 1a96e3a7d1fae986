package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.aggGroupBy(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_groupby"        -> ((s, d) => Relational.aggGroupBy(s, d)),
    "q_grep"               -> ((s, d) => Relational.grep(s, d)),
    "q_wordcount"          -> ((s, d) => Relational.wordCount(s, d)),
    "q_topical_wordcount"  -> ((s, d) => Relational.topicalWordCount(s, d)),
    "q_wordcount_stopwords" -> ((s, d) => Relational.wordCountStopWords(s, d)),
    "q_secondary_sort"     -> ((s, d) => Relational.secondarySort(s, d)),
    "q_topn_per_group"     -> ((s, d) => Relational.topNPerGroup(s, d)),
    // same result as q_topn_per_group via map-side partial top-k (TopK):
    // shuffle carries ≤ k×groups×partitions rows instead of all rows
    "q_topn_scalable"      -> ((s, d) => TopK.perGroup(
      io.Tables.orders(s, d),
      Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
      .select(org.apache.spark.sql.functions.col("o_custkey"),
        org.apache.spark.sql.functions.col("rk"),
        org.apache.spark.sql.functions.col("o_orderkey"),
        org.apache.spark.sql.functions.col("o_totalprice"))),
    "q_rollup"             -> ((s, d) => Relational.rollupAgg(s, d)),
    "q_join_reduce_side"   -> ((s, d) => Relational.joinReduceSide(s, d)),
    "q_join_broadcast"     -> ((s, d) => Relational.joinBroadcast(s, d)),
    // B10 read path: bucketed fact⋈fact join + group-by, zero Exchange
    "q_bucketed_join"      -> ((s, d) => Relational.bucketedJoin(s, d)),
    // B11 read path: Morton-clustered rewrite + range scan, oracle-lossless
    "q_zorder_scan"        -> ((s, d) => Relational.zorderScan(s, d)),
    "q_zorder3_scan"       -> ((s, d) => Relational.zorder3Scan(s, d)),
    // B18 read path: pinned pre-merge generation vs the raw-table oracle —
    // a leaked or lost row from the corrupting CDC merge hash-mismatches
    "q_timetravel"         -> ((s, d) => Relational.timetravelRead(s, d)),
    // B14 landing: seed + 2 micro-batches with batch 1 delivered TWICE —
    // a broken exactly-once dedupe doubles batch 1 and hash-mismatches
    "q_ingest_read"        -> ((s, d) => Relational.ingestRead(s, d)),
    // B16 landing: every 89th custkey erased; oracle = raw MINUS victims
    "q_erasure_read"       -> ((s, d) => Relational.erasureRead(s, d)),
    // B19 landing: file-granular erasure across a partitioned event log
    "q_erasure_dir"        -> ((s, d) => Relational.erasureDirRead(s, d)),
    // B22 serving read: incrementally-maintained per-user aggregate —
    // a bare bucketed scan (zero shuffles, zero agg work at serve time)
    "q_incremental_agg"    -> ((s, d) => Relational.incrementalAgg(s, d)),
    "q_cogroup"            -> ((s, d) => Relational.coGroup(s, d)),
    // 3 heterogeneous schemas, one tagged-union shuffle (TupleJob.coGroupMulti)
    "q_cogroup_multi"      -> ((s, d) => Relational.coGroupMultiCounts(s, d)),
    "q_moving_avg"         -> ((s, d) => Relational.movingAverage(s, d)),
    // q_window_range: trailing-7-calendar-day RANGE frame (value-bounded,
    // vs q_moving_avg's ROWS frame) — same single user-keyed exchange (r9)
    "q_window_range"       -> ((s, d) => Relational.rangeWindow(s, d)),
    "q_normalize"          -> ((s, d) => Relational.normalize(s, d)),
    "q_topic_fingerprint"  -> ((s, d) => Relational.topicFingerprint(s, d)),
    // reference BitField output shape: top words as a packed 128-bit set
    "q_topic_fp_bits"      -> ((s, d) => Relational.topicFingerprintBits(s, d)),
    "q_distinct"           -> ((s, d) => Relational.distinctUsers(s, d)),
    "q_set_ops"            -> ((s, d) => Relational.setOps(s, d)),
    "q_semi_join"          -> ((s, d) => Relational.semiJoin(s, d)),
    "q_anti_join"          -> ((s, d) => Relational.antiJoin(s, d)),
    "q_lag_delta"          -> ((s, d) => Relational.lagDelta(s, d)),
    "q_nb_train"           -> ((s, d) => TextAnalysis.nbTrain(s, d)),
    "q_nb_classify"        -> ((s, d) => TextAnalysis.nbClassify(s, d)),
    "q_dedup_exact"        -> ((s, d) => Dedup.exact(s, d)),
    "q_dedup_minhash"      -> ((s, d) => Dedup.minhashLsh(s, d)),
    // q_dedup_incremental: new-batch LSH probe against the corpus index
    // (batch bands broadcast, zero index shuffle) (r10b)
    "q_dedup_incremental"  -> ((s, d) => Dedup.minhashIncremental(s, d)),
    // q_curate_pipeline: quality gate -> LSH clusters over survivors ->
    // keep-best + singleton branch: the end-to-end curation verdict (r10b)
    "q_curate_pipeline"    -> ((s, d) => Curation.curatePipeline(s, d)),
    // transitive closure of the minhash pairs: iterative min-label
    // propagation (O(diameter) joined passes, lineage cut per pass)
    "q_dedup_cluster"      -> ((s, d) => Curation.dedupCluster(s, d)),
    "q_hash_split"         -> ((s, d) => Curation.hashSplit(s, d)),
    // C47: seeded deterministic epoch order — global sort + zipWithIndex,
    // no single-partition window
    "q_shuffle_order"      -> ((s, d) => Curation.shuffleOrder(s, d)),
    "q_training_batches"   -> ((s, d) => Curation.trainingBatches(s, d)),
    "q_tfidf"              -> ((s, d) => Curation.tfidf(s, d)),
    "q_skew_join_salted"   -> ((s, d) => Curation.saltedSupplierRevenue(s, d)),
    "q_collect_sorted"     -> ((s, d) => Curation.vocabPerSource(s, d)),
    // TakeOrdered top-k by portable hash: reproducible uniform sample,
    // no global sort
    "q_sample_uniform"     -> ((s, d) => Curation.hashSample(s, d)),
    "q_dedup_simhash"      -> ((s, d) => Dedup.simhash(s, d)),
    "q_ngram_jaccard"      -> ((s, d) => Dedup.ngramJaccard(s, d)),
    // q_ngram_topk: output-bounded variant — ≤ k best matches per doc
    // (WindowGroupLimit partial caps the shuffle like the C41 champions)
    "q_ngram_topk"         -> ((s, d) => Dedup.ngramTopK(s, d)),
    "q_dedup_embedding"    -> ((s, d) => Dedup.embeddingNearDup(s, d)),
    "q_ann_bruteforce"     -> ((s, d) => Ann.bruteForceTopK(s, d)),
    // q_ann_filtered: metadata-constrained exact search — the label
    // predicate pre-filters INSIDE a broadcast hash join (never post-ANN)
    "q_ann_filtered"       -> ((s, d) => Ann.filteredTopK(s, d)),
    "q_ann_lsh"            -> ((s, d) => Ann.lshTopK(s, d)),
    "q_ann_multiprobe"     -> ((s, d) => Ann.lshMultiProbeTopK(s, d)),
    "q_token_count"        -> ((s, d) => TextAnalysis.tokenCount(s, d)),
    "q_token_bpe"          -> ((s, d) => TextAnalysis.tokenCountBpe(s, d)),
    // q_bpe_train/q_bpe_tokenize: real BPE merge learning on the
    // frequency-capped dict + fused greedy apply — deterministic but the
    // sequential merge loop is not SQL-expressible → rows-only, spec-pinned
    "q_bpe_train"          -> ((s, d) => TextAnalysis.bpeTrain(s, d)),
    "q_bpe_tokenize"       -> ((s, d) => TextAnalysis.bpeTokenCount(s, d)),
    "q_rolling_hash"       -> ((s, d) => TextAnalysis.rollingHash(s, d)),
    // iters=0: raw seed codebook — zero FP accumulation, so the whole IVF
    // search path is oracle-checkable; the Lloyd-refined codebook (iters=2)
    // is recall-spec-tested instead (centroid sums are FP-order-sensitive)
    "q_ann_ivf"            -> ((s, d) => Ivf.topK(s, d, iters = 0)),
    // PQ/ADC: search scans 8-byte code rows + table lookups, never vectors;
    // integer-scaled distances → exact cross-engine ranking parity
    "q_ann_pq"             -> ((s, d) => Pq.topK(s, d)),
    // IVF cells × PQ codes: ADC scans only nprobe cells (the billion-scale
    // layout); both codebooks are the deterministic seed constructions
    "q_ann_ivfpq"          -> ((s, d) => IvfPq.topK(s, d)),
    // FAISS by_residual layout: PQ over r = e - centroid(cell), per-cell
    // query ADC tables; residual codebook seeds from vectors 16..31
    "q_ann_ivfpq_res"      -> ((s, d) => IvfPq.topKResidual(s, d)),
    // per-cell Lloyd-refined residual codebooks (the production FAISS
    // shape) — refined centroids are FP-accumulation-ordered, so rows-only
    // (AnnIndexSpec pins equality with the served ivfpq_res_refined layout)
    "q_ann_refined"        -> ((s, d) => IvfPq.topKResidualRefined(s, d)),
    "q_lang_id"            -> ((s, d) => TextAnalysis.langId(s, d)),
    "q_langid_ngram"       -> ((s, d) => TextAnalysis.langIdNgram(s, d)),
    "q_quality_score"      -> ((s, d) => TextAnalysis.qualityScore(s, d)),
    "q_fingerprint"        -> ((s, d) => TextAnalysis.fingerprint(s, d)),
    "q_asof_join"          -> ((s, d) => Analytics.asofPurchaseClick(s, d)),
    "q_range_join"         -> ((s, d) => Analytics.rangeJoinErrorClicks(s, d)),
    "q_pivot"              -> ((s, d) => Analytics.pivotUserActivity(s, d)),
    "q_cube"               -> ((s, d) => Analytics.cubeSegmentPriority(s, d)),
    // q_grouping_sets: custom agg lattice (both margins, no grand total)
    // through ONE Expand + one shuffle (r10b)
    "q_grouping_sets"      -> ((s, d) => Analytics.groupingSetsAgg(s, d)),
    "q_percentiles"        -> ((s, d) => Analytics.percentiles(s, d)),
    // sketch twins of q_distinct/q_percentiles (HLL++ / KLL-style) — no SQL
    // oracle (accuracy is engine-specific); spec bounds error vs exact
    "q_approx_stats"       -> ((s, d) => Analytics.approxStats(s, d)),
    "q_json_extract"       -> ((s, d) => Analytics.jsonExtract(s, d)),
    "q_events_window"      -> ((s, d) => Events.hourlyWindow(s, d)),
    "q_sessionize"         -> ((s, d) => Events.sessionize(s, d)),
    "q_events_topusers"    -> ((s, d) => Events.topUsers(s, d)),
    // training-data hygiene block (round 4): benchmark decontamination,
    // repeated-span detection, sequence packing, mixture resampling, PII
    // redaction, SemDeDup
    "q_decontaminate"      -> ((s, d) => Contamination.decontaminate(s, d)),
    // q_decontaminate_semantic: embedding-level benchmark-leak check —
    // closest benchmark vector per corpus vector, broadcast benchmark,
    // map-side struct-max reduction (one row per corpus vector shuffles)
    "q_decontaminate_semantic" -> ((s, d) => Contamination.decontaminateSemantic(s, d)),
    // q_benchmark_exposure: the per-ITEM transpose of the two checks
    // above — leak counts + nearest corpus cosine per benchmark item
    "q_benchmark_exposure" -> ((s, d) => Contamination.benchmarkExposure(s, d)),
    "q_repeated_spans"     -> ((s, d) => Contamination.repeatedSpans(s, d)),
    "q_pack_sequences"     -> ((s, d) => Curation.packSequences(s, d)),
    "q_domain_mix"         -> ((s, d) => Curation.domainMix(s, d)),
    "q_pii_redact"         -> ((s, d) => TextAnalysis.piiRedact(s, d)),
    "q_semdedup"           -> ((s, d) => Dedup.semDedup(s, d)),
    // int8 vector compression (FAISS SQ8 shape): train = one total agg,
    // encode = narrow scan, codes bit-identical cross-engine
    "q_scalar_quant"       -> ((s, d) => Quantize.scalarQuant(s, d)),
    "q_window_stats"       -> ((s, d) => Analytics.windowStats(s, d)),
    // iterative graph analytics in exact integer arithmetic (fixed 5
    // passes, floor division): bit-identical scores on any engine
    "q_pagerank"           -> ((s, d) => Graph.pageRank(s, d)),
    // classic multi-join shapes: pushdown + broadcast snowflake + AQE
    "q_tpch_q3"            -> ((s, d) => Relational.tpchQ3(s, d)),
    "q_tpch_q5"            -> ((s, d) => Relational.tpchQ5(s, d)),
    // q_tpch_q18: HAVING-filtered order set + multi-join + TakeOrdered-100
    "q_tpch_q18"           -> ((s, d) => Relational.tpchQ18(s, d)),
    // q_tpch_q10: returned-item revenue per customer, pre-aggregated top-20
    "q_tpch_q10"           -> ((s, d) => Relational.tpchQ10(s, d)),
    // q_tpch_q6: pure-scan filtered aggregate (pushdown benchmark)
    "q_tpch_q6"            -> ((s, d) => Relational.tpchQ6(s, d)),
    // q_tpch_q12: fact-fact shuffle join + conditional counts (r9)
    "q_tpch_q12"           -> ((s, d) => Relational.tpchQ12(s, d)),
    // q_tpch_q14: promo revenue share — exact cents, integer ppm (r9)
    "q_tpch_q14"           -> ((s, d) => Relational.tpchQ14(s, d)),
    // q_tpch_q4: EXISTS semi-join with a residual date predicate (r9)
    "q_tpch_q4"            -> ((s, d) => Relational.tpchQ4(s, d)),
    // q_tpch_q13: filtered outer join + two-level count distribution (r9)
    "q_tpch_q13"           -> ((s, d) => Relational.tpchQ13(s, d)),
    // q_tpch_q7: bilateral nation-pair revenue flow per ship year (r9)
    "q_tpch_q7"            -> ((s, d) => Relational.tpchQ7(s, d)),
    // q_tpch_q8: national market share — full snowflake, exact ppm (r9)
    "q_tpch_q8"            -> ((s, d) => Relational.tpchQ8(s, d)),
    // q_tpch_q15: top supplier — agg vs max-of-same-agg, decimal-exact (r9)
    "q_tpch_q15"           -> ((s, d) => Relational.tpchQ15(s, d)),
    // q_tpch_q17: correlated 20%-of-average compare in exact ints (r9)
    "q_tpch_q17"           -> ((s, d) => Relational.tpchQ17(s, d)),
    // q_tpch_q19: disjunctive predicates with lossless hull pushdown (r9)
    "q_tpch_q19"           -> ((s, d) => Relational.tpchQ19(s, d)),
    // q_tpch_q21: EXISTS/NOT-EXISTS pair folded into one per-order agg (r9)
    "q_tpch_q21"           -> ((s, d) => Relational.tpchQ21(s, d)),
    // q_tpch_q22: scalar-subquery broadcast + recency anti join (r9)
    "q_tpch_q22"           -> ((s, d) => Relational.tpchQ22(s, d)),
    // r9c block: the partsupp-backed shapes over the derived pair catalog
    // q_tpch_q2: correlated MIN re-joined on equality, top-100 (r9c)
    "q_tpch_q2"            -> ((s, d) => Relational.tpchQ2(s, d)),
    // q_tpch_q9: 6-way join margin rollup per nation×year (r9c)
    "q_tpch_q9"            -> ((s, d) => Relational.tpchQ9(s, d)),
    // q_tpch_q11: group value vs fraction-of-global scalar subquery (r9c)
    "q_tpch_q11"           -> ((s, d) => Relational.tpchQ11(s, d)),
    // q_tpch_q16: denylist anti join + count-distinct suppliers (r9c)
    "q_tpch_q16"           -> ((s, d) => Relational.tpchQ16(s, d)),
    // q_tpch_q20: nested correlated agg + semi-join chain (r9c)
    "q_tpch_q20"           -> ((s, d) => Relational.tpchQ20(s, d)),
    // q_collocations: PMI phrase mining — narrow bigram fan-out, exact
    // counts, order-pinned double lift (r9b)
    "q_collocations"       -> ((s, d) => TextAnalysis.collocations(s, d)),
    // q_lm_score: bigram-LM doc scoring (perplexity-filter stand-in) —
    // exact integer ppm, one corpus scan, model counts as windows
    "q_lm_score"           -> ((s, d) => TextAnalysis.lmScore(s, d)),
    // q_dsir_weight: DSIR importance weights over hashed bigram features
    // (fixed-bucket model broadcast, exact integer ppm) (r10)
    "q_dsir_weight"        -> ((s, d) => Curation.dsirWeight(s, d)),
    // q_dsir_resample: deterministic hash-acceptance resampling at the
    // DSIR weight rate (r10)
    "q_dsir_resample"      -> ((s, d) => Curation.dsirResample(s, d)),
    // q_cluster_prune: per-embedding-cluster prototype top-10 (D4-style
    // corpus rebalancing; fused nearest-cell kernel, WindowGroupLimit) (r10)
    "q_cluster_prune"      -> ((s, d) => Dedup.clusterPrune(s, d)),
    // round-6 block: quality gate + corpus profiling + graph density
    // q_quality_filter: Gopher/C4-style rule cascade — zero-shuffle narrow scan
    "q_quality_filter"     -> ((s, d) => Quality.qualityFilter(s, d)),
    // q_histogram: equi-width profile, two-phase (total-agg range + keyed agg)
    "q_histogram"          -> ((s, d) => Quality.histogram(s, d)),
    // q_sample_stratified: exact per-stratum top-k by salted hash (WindowGroupLimit)
    "q_sample_stratified"  -> ((s, d) => Quality.stratifiedSample(s, d)),
    // q_dedup_containment: |A∩B|/|A| over LSH candidates — catches subset dups
    "q_dedup_containment"  -> ((s, d) => Dedup.containment(s, d)),
    // q_triangles: degree-ordered wedge enumeration (O(m^1.5) on any skew)
    "q_triangles"          -> ((s, d) => Graph.triangles(s, d)),
    // q_dedup_paragraph: C4-style span dedup — first occurrence keeps the span
    "q_dedup_paragraph"    -> ((s, d) => Dedup.paragraphDedup(s, d)),
    // q_repetition: Gopher duplicate-n-gram fractions (integer ppm)
    "q_repetition"         -> ((s, d) => Quality.repetition(s, d)),
    // q_source_overlap: cross-source shared-shingle matrix (corpus audit)
    "q_source_overlap"     -> ((s, d) => Quality.sourceOverlap(s, d)),
    // round-7 block: product/growth analytics over the event stream
    // q_funnel: ordered view→click→purchase stages — ONE user_id exchange
    "q_funnel"             -> ((s, d) => Events.funnel(s, d)),
    // q_retention: first-seen cohort × day-offset distinct-active matrix
    "q_retention"          -> ((s, d) => Events.retention(s, d)),
    // q_user_growth: daily new users + cumulative total (tiny-table window)
    "q_user_growth"        -> ((s, d) => Events.userGrowth(s, d)),
    // q_dedup_keep_best: canonical-doc selection — most-words member of
    // each near-dup cluster keeps (min-id keepers discard the best copy)
    "q_dedup_keep_best"    -> ((s, d) => Curation.dedupKeepBest(s, d)),
    // q_dedup_substring: Lee et al. exact-substring removal spans —
    // maximal merged intervals of corpus-repeated 10-word windows
    "q_dedup_substring"    -> ((s, d) => Dedup.substringIntervals(s, d)),
    // q_compression_ratio: deflate-ratio boilerplate signal — rows-only
    // (codec output is JVM-specific; spec pins ordering + determinism)
    "q_compression_ratio"  -> ((s, d) => Quality.compressionRatio(s, d)),
    // q_image_dedup: perceptual dHash keep/drop verdicts over DECODED
    // image payloads — lossless (maxHamming+1)-band blocking, per-bucket
    // short-circuit smaller-id probe; one row per image
    "q_image_dedup"        -> ((s, d) => Multimodal.imageDedup(s, d)),
    // q_audio_dedup: perceptual energy-envelope hash verdicts over DECODED
    // PCM audio — imageDedup's mechanics on the other real decoder
    "q_audio_dedup"        -> ((s, d) => Multimodal.audioDedup(s, d)),
    // q_video_dedup: clip-level any-frame near-dup verdicts — per-frame
    // dHash from the parsed GVID container through the same banded kernel
    "q_video_dedup"        -> ((s, d) => Multimodal.videoDedup(s, d)),
    // q_multimodal_features: per-kind media summary over the deterministic
    // PNG/WAV corpus — real codec decode, integer checksums — rows-only
    // (DuckDB has no media decoder; spec pins pixel/sample values)
    "q_multimodal_features" -> ((s, d) => Multimodal.features(s, d)),
    // q_oov_rate: ppm of token occurrences outside the en-docs vocabulary
    // (CCNet-flavored coverage signal; exact token-level left join)
    "q_oov_rate"           -> ((s, d) => TextAnalysis.oovRate(s, d)),
    // r10c block: text retrieval + CDC dimension build
    // q_inverted_index: word -> df/cf + champion postings (bounded rows)
    "q_inverted_index"     -> ((s, d) => Retrieval.invertedIndex(s, d)),
    // q_bm25: BM25 top-20 for a query term set — exact integer ppm
    "q_bm25"               -> ((s, d) => Retrieval.bm25(s, d)),
    // q_scd2: changelog -> type-2 dimension intervals (one window exchange)
    "q_scd2"               -> ((s, d) => Events.scd2(s, d)),
    // q_text_knn: exact 3-shingle-Jaccard k-NN for a broadcast probe set
    "q_text_knn"           -> ((s, d) => Retrieval.textKnn(s, d)),
    // q_rank_fusion: RRF of BM25 + embedding k-NN heads (hybrid search)
    "q_rank_fusion"        -> ((s, d) => Retrieval.rankFusion(s, d)),
    // q_heavy_hitters: Misra-Gries sketch (typed Aggregator, O(k) state)
    // -> exact verify pass; composed output deterministic + oracle-exact
    "q_heavy_hitters"      -> ((s, d) => TopK.heavyHitters(s, d)),
    // q_corpus_profile: per-source data-card stats, one narrow scan
    "q_corpus_profile"     -> ((s, d) => Quality.corpusProfile(s, d)),
    // q_outliers: per-type 3-sigma anomalies, cross-multiplied exact
    // integer test in DECIMAL(38,0) (no sqrt/division/FP)
    "q_outliers"           -> ((s, d) => Analytics.outliers(s, d)),
    // q_chunk_overlap: sliding-window RAG chunking (narrow, zero-shuffle)
    "q_chunk_overlap"      -> ((s, d) => Curation.chunkOverlap(s, d)),
    // q_bfs: hop-limited frontier BFS over the customer-supplier graph
    // (edges checkpointed once; per-hop cost = frontier adjacency)
    "q_bfs"                -> ((s, d) => Graph.bfs(s, d)),
    // q_bloom_join: Bloom-pruned fact join — row-identical to the plain
    // join (false positives die in the exact join), prune pre-shuffle
    "q_bloom_join"         -> ((s, d) => BloomJoin.supplierLines(s, d)),
    // q_table_profile: deequ-style data-validation card, one agg row
    "q_table_profile"      -> ((s, d) => Analytics.tableProfile(s, d)),
    // q_events_sliding: 1h/15m sliding windows (x4 fan-out rides the
    // map-side partial agg, never the exchange)
    "q_events_sliding"     -> ((s, d) => Events.slidingWindow(s, d)),
    // q_equidepth: exact quartiles from the bounded value histogram —
    // the scale-honest NTILE (no fact-scale sort, one scan)
    "q_equidepth"          -> ((s, d) => Analytics.equidepth(s, d)),
    // q_rolling_median: trailing-7 exact lower-median per user (robust
    // twin of q_moving_avg; one user-keyed exchange, O(window) state)
    "q_rolling_median"     -> ((s, d) => Analytics.rollingMedian(s, d)),
    // q_kmeans: integer Lloyd over the int8-quantized corpus — one narrow
    // fused-argmin scan per iteration, K*64-int model collect, exact
    "q_kmeans"             -> ((s, d) => Kmeans.kmeans(s, d)),
    // q_text_normalize: pre-dedup canonicalization (lower/trim/ws-collapse
    // + adjacent-duplicate-token collapse) — zero-shuffle narrow scan
    "q_text_normalize"     -> ((s, d) => TextAnalysis.textNormalize(s, d)),
    // q_jsonl_roundtrip: documents -> JSON Lines -> schema-strict read
    // back; per-doc digests prove the round-trip lossless vs the oracle
    "q_jsonl_roundtrip"    -> ((s, d) => graft.io.JsonLines.roundtripDocs(s, d)),
    // q_event_transitions: per-user Markov transition matrix — one user_id
    // window exchange, then ppm shares over the |types|^2-row model table
    "q_event_transitions"  -> ((s, d) => Events.transitions(s, d)),
    // q_drift_ks: exact two-sample KS drift per event type (first vs
    // second time half) — histogram-domain windows, DECIMAL cross products
    "q_drift_ks"           -> ((s, d) => Analytics.driftKs(s, d)),
    // q_drift_psi: PSI — the mass-of-shift companion to KS's worst-point
    "q_drift_psi"          -> ((s, d) => Analytics.driftPsi(s, d)),
    // q_drift_chi2: Pearson χ² over the same baseline-quantile bins —
    // the drift trio's classical significance-testable member
    "q_drift_chi2"         -> ((s, d) => Analytics.driftChi2(s, d)),
    // q_validate_release: the composed data-validation gate — one verdict
    // row per check (profile, dup rate, outlier mass, drift KS), all
    // exact-integer, five checks on one documents scan
    "q_validate_release"   -> ((s, d) => Validate.validateRelease(s, d)),
    // q_copurchase: market-basket frequent part pairs — in-row pair
    // comprehension (never a fact self-join), TakeOrdered top-50
    "q_copurchase"         -> ((s, d) => Analytics.copurchase(s, d)),
    // q_entity_resolve: edit-distance record linkage — PassJoin segment
    // blocking (lossless), in-bucket short-circuit min-id verify
    "q_entity_resolve"     -> ((s, d) => Fuzzy.entityResolve(s, d)),
    // q_merge_upsert: CDC apply (MERGE INTO semantics) — latest-wins
    // changelog + tombstones onto the first-half snapshot, one key join
    "q_merge_upsert"       -> ((s, d) => Events.mergeUpsert(s, d)),
    // q_k_anonymize: k-anonymity generalization ladder over QI groups —
    // two bounded-cardinality aggs broadcast back, no fact self-join
    "q_k_anonymize"        -> ((s, d) => Privacy.kAnonymize(s, d)),
    // q_l_diversity: homogeneity-attack check on the k-anonymized release —
    // per released QI group, exact distinct count of the sensitive
    // attribute (customer's most urgent order priority) and the >= l verdict
    "q_l_diversity"        -> ((s, d) => Privacy.lDiversity(s, d)),
    // q_t_closeness: distribution-skew check completing the release
    // trilogy — exact-integer ordered-domain EMD vs the global sensitive
    // distribution, census-sized after the shared fact scan
    "q_t_closeness"        -> ((s, d) => Privacy.tCloseness(s, d)),
    // q_gap_fill: per-user daily resample + forward fill — span-bounded
    // sequence explode, one user window, all integer/date
    "q_gap_fill"           -> ((s, d) => Events.gapFill(s, d)),
    // q_peak_concurrency: per-day peak of open sessions — sweep line +
    // the two-pass distributed prefix scan (never a global window)
    "q_peak_concurrency"   -> ((s, d) => Events.peakConcurrency(s, d)),
  )

  /** DuckDB-equivalent SQL per query key (same column aliases — the driver
    * sorts columns by name before hashing).
    */
  def oracleSql: Map[String, String] = Map(
    "q_agg_groupby" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_base_price,
        | CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS sum_disc_price,
        | round(sum(CAST(l_quantity AS DECIMAL(12,2)))::DOUBLE / count(*), 6) AS avg_qty,
        | round(sum(CAST(l_discount AS DECIMAL(8,2)))::DOUBLE / count(*), 6) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_grep" ->
      "SELECT doc_id, source, n_chars FROM documents WHERE regexp_matches(text, 'merge .*batch')",
    "q_wordcount" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
        |WHERE word <> '' GROUP BY word""".stripMargin,
    "q_topical_wordcount" ->
      """SELECT source, word, count(*) AS cnt
        |FROM (SELECT source, unnest(string_split(text, ' ')) AS word FROM documents) t
        |WHERE word <> '' GROUP BY source, word""".stripMargin,
    "q_wordcount_stopwords" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
        |WHERE word <> '' AND word NOT IN ('a', 'the') GROUP BY word""".stripMargin,
    "q_secondary_sort" ->
      """SELECT user_id, event_type, epoch_ms(ts) AS first_ts_ms, round(value, 6) AS first_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        |      FROM events) t
        |WHERE rn = 1""".stripMargin,
    "q_topn_per_group" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |      FROM orders) t
        |WHERE rk <= 3""".stripMargin,
    "q_topn_scalable" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |      FROM orders) t
        |WHERE rk <= 3""".stripMargin,
    "q_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |       CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin,
    "q_join_reduce_side" ->
      """SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderpriority = '1-URGENT'""".stripMargin,
    "q_bucketed_join" ->
      """SELECT o_orderkey,
        |       CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |                      * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
        |            AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
        |       count(*) AS n_lines
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderkey""".stripMargin,
    "q_zorder_scan" ->
      """SELECT event_type, count(*) AS n_events,
        |       CAST(sum(user_id) AS BIGINT) AS sum_uid,
        |       count(DISTINCT user_id) AS n_users
        |FROM events WHERE user_id BETWEEN 10 AND 60
        |GROUP BY event_type""".stripMargin,
    "q_zorder3_scan" ->
      """SELECT event_type, count(*) AS n_events,
        |       CAST(sum(cents) AS BIGINT) AS sum_cents,
        |       count(DISTINCT user_id) AS n_users
        |FROM (SELECT event_type, user_id,
        |             CAST(round(value * 100) AS BIGINT) AS cents FROM events)
        |WHERE cents BETWEEN 100 AND 2000
        |GROUP BY event_type""".stripMargin,
    // the Spark side reads the PINNED pre-merge generation of a bucketed
    // copy that a CDC merge then corrupted — matching the raw table is
    // exactly the time-travel guarantee under test
    "q_timetravel" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |       count(DISTINCT o_custkey) AS n_custs
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    // the Spark side read a bucketed table fed by seed + 2 micro-batches
    // with batch 1 re-delivered — equality with the raw table IS the
    // exactly-once property
    "q_ingest_read" ->
      """SELECT event_type, count(*) AS n_events,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |       count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type""".stripMargin,
    // the Spark side erased the %89 keys from its bucketed copy — the
    // oracle subtracts them from the raw table: victims gone AND every
    // other row intact, or the hash mismatches
    "q_erasure_read" ->
      """SELECT c_mktsegment, count(*) AS n_custs,
        |       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_bal_cents,
        |       count(DISTINCT c_nationkey) AS n_nations
        |FROM customer WHERE c_custkey % 89 <> 0
        |GROUP BY c_mktsegment""".stripMargin,
    // the Spark side erased the %83 users from its partitioned event-log
    // copy (file-granular forgetKeysDir) — victims gone, every other row
    // and the partition column intact, or the hash mismatches
    "q_erasure_dir" ->
      """SELECT event_type, count(*) AS n_events,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |       count(DISTINCT user_id) AS n_users
        |FROM events WHERE user_id % 83 <> 0
        |GROUP BY event_type""".stripMargin,
    // the Spark side serves a maintained aggregate table (seed + two
    // incremental batches); the oracle recomputes from raw — any
    // maintenance drift (double count, missed key) hash-mismatches
    "q_incremental_agg" ->
      """SELECT user_id, count(*) AS n_events,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY user_id""".stripMargin,
    "q_join_broadcast" ->
      """SELECT n_name,
        |       CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |                      * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
        |            AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q_cogroup" ->
      """SELECT o_orderkey, o_totalprice,
        |       coalesce(line_total, CAST(0 AS DOUBLE)) AS line_total,
        |       coalesce(n_lines, 0) AS n_lines
        |FROM orders LEFT JOIN (
        |  SELECT l_orderkey,
        |         CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) AS line_total,
        |         count(*) AS n_lines
        |  FROM lineitem GROUP BY l_orderkey) l
        |ON o_orderkey = l_orderkey""".stripMargin,
    "q_cogroup_multi" ->
      """WITH c AS MATERIALIZED (SELECT c_custkey AS k, count(*) AS n FROM customer GROUP BY 1),
        |     o AS MATERIALIZED (SELECT o_custkey AS k, count(*) AS n FROM orders GROUP BY 1),
        |     e AS MATERIALIZED (SELECT user_id AS k, count(*) AS n FROM events GROUP BY 1)
        |SELECT coalesce(c.k, o.k, e.k) AS k,
        |       coalesce(c.n, 0) AS n_cust,
        |       coalesce(o.n, 0) AS n_orders,
        |       coalesce(e.n, 0) AS n_events
        |FROM c FULL JOIN o ON c.k = o.k
        |FULL JOIN e ON coalesce(c.k, o.k) = e.k""".stripMargin,
    "q_moving_avg" ->
      """SELECT user_id, day, clicks,
        |       round(avg(clicks) OVER (PARTITION BY user_id ORDER BY day
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mavg
        |FROM (SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS clicks
        |      FROM events WHERE event_type = 'click' GROUP BY 1, 2) t""".stripMargin,
    "q_window_range" ->
      """SELECT user_id, day, clicks,
        |       CAST(sum(clicks) OVER (PARTITION BY user_id
        |            ORDER BY date_diff('day', DATE '1995-01-01', day)
        |            RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS wk_clicks
        |FROM (SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS clicks
        |      FROM events WHERE event_type = 'click' GROUP BY 1, 2) t""".stripMargin,
    "q_normalize" ->
      """SELECT user_id, event_type, cnt,
        |       round(CAST(cnt AS DOUBLE) / total, 6) AS share
        |FROM (SELECT user_id, event_type, count(*) AS cnt,
        |             sum(count(*)) OVER (PARTITION BY user_id) AS total
        |      FROM events GROUP BY user_id, event_type) t""".stripMargin,
    "q_topic_fingerprint" ->
      """SELECT source, rk, word, cnt
        |FROM (SELECT source, word, cnt,
        |             row_number() OVER (PARTITION BY source ORDER BY cnt DESC, word) AS rk
        |      FROM (SELECT source, word, count(*) AS cnt
        |            FROM (SELECT source, unnest(string_split(text, ' ')) AS word FROM documents) u
        |            WHERE word <> '' GROUP BY source, word) c) t
        |WHERE rk <= 5""".stripMargin,
    "q_topic_fp_bits" ->
      """WITH c AS MATERIALIZED (SELECT source, word, count(*) AS cnt
        |           FROM (SELECT source, unnest(string_split(text, ' ')) AS word FROM documents) u
        |           WHERE word <> '' GROUP BY source, word),
        |t AS MATERIALIZED (SELECT source, word, cnt FROM (
        |        SELECT source, word, cnt,
        |               row_number() OVER (PARTITION BY source ORDER BY cnt DESC, word) AS rk
        |        FROM c) r
        |      WHERE rk <= 5),
        |v AS MATERIALIZED (SELECT word, row_number() OVER (ORDER BY word) - 1 AS idx
        |      FROM (SELECT DISTINCT word FROM t) dw),
        |j AS MATERIALIZED (SELECT t.source, v.idx, t.cnt FROM t JOIN v ON t.word = v.word)
        |SELECT source,
        |  CAST(sum(CASE WHEN idx < 64 THEN (1::BIGINT << CAST(idx AS INT)) ELSE 0 END) AS BIGINT) AS bits_0,
        |  CAST(sum(CASE WHEN idx >= 64 THEN (1::BIGINT << CAST(idx - 64 AS INT)) ELSE 0 END) AS BIGINT) AS bits_1,
        |  CAST(sum(cnt) AS BIGINT) AS totalcount
        |FROM j GROUP BY source""".stripMargin,
    "q_distinct" ->
      """SELECT event_type, count(*) AS n_users
        |FROM (SELECT DISTINCT event_type, user_id FROM events) t
        |GROUP BY event_type""".stripMargin,
    "q_set_ops" ->
      """SELECT user_id, epoch_ms(date_trunc('hour', ts)) AS hour_ms FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT user_id, epoch_ms(date_trunc('hour', ts)) FROM events WHERE event_type = 'purchase'
        |EXCEPT
        |SELECT user_id, epoch_ms(date_trunc('hour', ts)) FROM events WHERE event_type = 'error'""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin,
    "q_lag_delta" ->
      """SELECT user_id, count(*) AS n_gaps,
        |       CAST(sum(gap) AS BIGINT) AS total_gap_us,
        |       (CAST(sum(gap) AS BIGINT) // count(*)) AS mean_gap_us
        |FROM (SELECT user_id, epoch_us(ts) - lag(epoch_us(ts)) OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |      FROM events) t
        |WHERE gap IS NOT NULL GROUP BY user_id""".stripMargin,
    "q_nb_train"        -> Oracles.nbTrain,
    "q_nb_classify"     -> Oracles.nbClassify,
    "q_dedup_exact"     -> Oracles.dedupExact,
    "q_dedup_minhash"   -> Oracles.dedupMinhash,
    "q_dedup_cluster"   -> Oracles.dedupCluster,
    "q_hash_split"      -> Oracles.hashSplit,
    "q_shuffle_order" ->
      """SELECT doc_id,
        |  row_number() OVER (
        |    ORDER BY CAST(concat('0x', substr(md5('shuffle:epoch0:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
        |             doc_id) - 1 AS pos
        |FROM documents""".stripMargin,
    "q_training_batches" -> Oracles.trainingBatches,
    "q_tfidf"           -> Oracles.tfidf,
    "q_skew_join_salted" -> Oracles.saltedJoin,
    "q_collect_sorted"  -> Oracles.vocabPerSource,
    "q_sample_uniform"  -> Oracles.hashSample,
    "q_dedup_simhash"   -> Oracles.dedupSimhash,
    "q_ngram_jaccard"   -> Oracles.ngramJaccard,
    "q_ngram_topk"      -> Oracles.ngramTopK,
    "q_dedup_embedding" -> Oracles.dedupEmbedding,
    "q_ann_bruteforce"  -> Oracles.annBruteForce,
    "q_ann_filtered"    -> Oracles.annFiltered,
    "q_ann_lsh"         -> Oracles.annLsh,
    "q_ann_multiprobe"  -> Oracles.annMultiprobe,
    "q_token_count"     -> Oracles.tokenCount,
    "q_token_bpe"       ->
      "SELECT doc_id, len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT AS n_bpe_tokens FROM documents",
    "q_rolling_hash"    ->
      """SELECT doc_id, list_reduce(
        |         list_prepend(7::BIGINT, list_transform(string_split(text, ''), c -> ord(c)::BIGINT)),
        |         (acc, x) -> (acc * 31 + x) % 2147483647) AS rh
        |FROM documents""".stripMargin,
    "q_ann_ivf"         -> Oracles.annIvf,
    "q_ann_pq"          -> Oracles.annPq,
    "q_ann_ivfpq"       -> Oracles.annIvfPq,
    "q_ann_ivfpq_res"   -> Oracles.annIvfPqRes,
    "q_decontaminate"   -> Oracles.decontaminate,
    "q_decontaminate_semantic" -> Oracles.decontaminateSemantic,
    "q_benchmark_exposure" -> Oracles.benchmarkExposure,
    "q_repeated_spans"  -> Oracles.repeatedSpans,
    "q_pack_sequences"  -> Oracles.packSequences,
    "q_domain_mix"      -> Oracles.domainMix,
    "q_pii_redact"      -> Oracles.piiRedact,
    "q_semdedup"        -> Oracles.semDedup,
    "q_scalar_quant"    -> Oracles.scalarQuant,
    "q_window_stats"    -> Oracles.windowStats,
    "q_pagerank"        -> Oracles.pageRank,
    "q_tpch_q3"         -> Oracles.tpchQ3,
    "q_tpch_q5"         -> Oracles.tpchQ5,
    "q_tpch_q18"        -> Oracles.tpchQ18,
    "q_tpch_q10"        -> Oracles.tpchQ10,
    "q_tpch_q6"         -> Oracles.tpchQ6,
    "q_tpch_q12"        -> Oracles.tpchQ12,
    "q_tpch_q14"        -> Oracles.tpchQ14,
    "q_tpch_q4"         -> Oracles.tpchQ4,
    "q_tpch_q13"        -> Oracles.tpchQ13,
    "q_tpch_q7"         -> Oracles.tpchQ7,
    "q_tpch_q8"         -> Oracles.tpchQ8,
    "q_tpch_q15"        -> Oracles.tpchQ15,
    "q_tpch_q17"        -> Oracles.tpchQ17,
    "q_tpch_q19"        -> Oracles.tpchQ19,
    "q_tpch_q21"        -> Oracles.tpchQ21,
    "q_tpch_q22"        -> Oracles.tpchQ22,
    "q_tpch_q2"         -> Oracles.tpchQ2,
    "q_tpch_q9"         -> Oracles.tpchQ9,
    "q_tpch_q11"        -> Oracles.tpchQ11,
    "q_tpch_q16"        -> Oracles.tpchQ16,
    "q_tpch_q20"        -> Oracles.tpchQ20,
    "q_lang_id"         -> Oracles.langId,
    "q_langid_ngram"    -> Oracles.langIdNgram,
    "q_quality_score"   -> Oracles.qualityScore,
    "q_fingerprint"     -> Oracles.fingerprint,
    "q_asof_join"       -> Oracles.asofJoin,
    "q_range_join"      -> Oracles.rangeJoin,
    "q_pivot"           -> Oracles.pivot,
    "q_cube"            -> Oracles.cube,
    "q_percentiles"     -> Oracles.percentiles,
    "q_json_extract"    -> Oracles.jsonExtract,
    "q_events_window"   -> Oracles.eventsWindow,
    "q_sessionize"      -> Oracles.sessionize,
    "q_events_topusers" -> Oracles.topUsers,
    "q_quality_filter"  -> Oracles.qualityFilter,
    "q_histogram"       -> Oracles.histogram,
    "q_sample_stratified" -> Oracles.sampleStratified,
    "q_dedup_containment" -> Oracles.dedupContainment,
    "q_triangles"       -> Oracles.triangles,
    "q_dedup_paragraph" -> Oracles.dedupParagraph,
    "q_repetition"      -> Oracles.repetition,
    "q_source_overlap"  -> Oracles.sourceOverlap,
    "q_funnel"          -> Oracles.funnel,
    "q_retention"       -> Oracles.retention,
    "q_user_growth"     -> Oracles.userGrowth,
    "q_dedup_keep_best" -> Oracles.dedupKeepBest,
    "q_dedup_substring" -> Oracles.dedupSubstring,
    "q_oov_rate"        -> Oracles.oovRate,
    "q_collocations"    -> Oracles.collocations,
    "q_lm_score"        -> Oracles.lmScore,
    "q_grouping_sets"   ->
      """SELECT c_mktsegment, o_orderpriority,
        |       CAST(grouping(c_mktsegment, o_orderpriority) AS BIGINT) AS gid,
        |       count(*) AS n_orders,
        |       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY GROUPING SETS ((c_mktsegment, o_orderpriority),
        |                        (c_mktsegment), (o_orderpriority))""".stripMargin,
    "q_dedup_incremental" -> Oracles.dedupIncremental,
    "q_curate_pipeline" -> Oracles.curatePipeline,
    "q_dsir_weight"     -> Oracles.dsirWeight,
    "q_dsir_resample"   -> Oracles.dsirResample,
    "q_cluster_prune"   -> Oracles.clusterPrune,
    "q_inverted_index"  -> Oracles.invertedIndex,
    "q_bm25"            -> Oracles.bm25,
    "q_scd2"            -> Oracles.scd2,
    "q_text_knn"        -> Oracles.textKnn,
    "q_rank_fusion"     -> Oracles.rankFusion,
    "q_heavy_hitters"   -> Oracles.heavyHitters,
    "q_corpus_profile"  -> Oracles.corpusProfile,
    "q_outliers"        -> Oracles.outliers,
    "q_chunk_overlap"   -> Oracles.chunkOverlap,
    "q_bfs"             -> Oracles.bfs,
    "q_bloom_join"      -> Oracles.bloomJoin,
    "q_table_profile"   -> Oracles.tableProfile,
    "q_events_sliding"  -> Oracles.slidingWindow,
    "q_equidepth"       -> Oracles.equidepth,
    "q_rolling_median"  -> Oracles.rollingMedian,
    "q_kmeans"          -> Oracles.kmeans,
    "q_text_normalize"  -> Oracles.textNormalize,
    "q_jsonl_roundtrip" -> Oracles.jsonlRoundtrip,
    "q_event_transitions" -> Oracles.eventTransitions,
    "q_drift_ks"        -> Oracles.driftKs,
    "q_drift_psi"       -> Oracles.driftPsi,
    "q_drift_chi2"      -> Oracles.driftChi2,
    "q_validate_release" -> Oracles.validateRelease,
    "q_copurchase"      -> Oracles.copurchase,
    "q_entity_resolve"  -> Oracles.entityResolve,
    "q_merge_upsert"    -> Oracles.mergeUpsert,
    "q_k_anonymize"     -> Oracles.kAnonymize,
    "q_l_diversity"     -> Oracles.lDiversity,
    "q_t_closeness"     -> Oracles.tCloseness,
    "q_gap_fill"        -> Oracles.gapFill,
    "q_peak_concurrency" -> Oracles.peakConcurrency,
  )
}
