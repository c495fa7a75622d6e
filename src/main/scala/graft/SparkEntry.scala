package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.GrepEngine
import graft.engine.GrepEngine.{Regex, Substring, SubstringIgnoreCase, WholeWord}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a matching ANSI-SQL oracle in `oracleSql`
  * (run by the driver in DuckDB over the same parquet) unless the operator
  * is not SQL-expressible, in which case the driver records a rows-only
  * check. Column names are aliased identically on both sides — the driver
  * sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's one capability (grep + frequency, SURVEY.md §0) over
    * the documents table.
    */
  def entry(spark: SparkSession): DataFrame =
    GrepEngine.grepFreq(
      Tables.documents(spark, "/root/testdata/sf0.001"), "text", "spark")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- grep family (reference parity + M1 extensions, SURVEY.md §7.2) --
    "q_grep_freq" -> ((s, d) =>
      GrepEngine.grepFreq(Tables.documents(s, d), "text", "spark")),
    "q_grep_regex" -> ((s, d) =>
      GrepEngine.grepFreq(Tables.documents(s, d), "text", "ve[ck]tor", Regex)),
    "q_grep_ci" -> ((s, d) =>
      GrepEngine.grepFreq(Tables.documents(s, d), "text", "SPARK", SubstringIgnoreCase)),
    "q_grep_multi" -> ((s, d) =>
      GrepEngine.multiGrep(Tables.documents(s, d), "text", Seq("vector", "stream"))),
    "q_grep_topk" -> ((s, d) =>
      GrepEngine.grepTopK(Tables.documents(s, d), "text", "spark", 10)),
    // the classic grep FLAG family (-w/-v/-o/-c/-l/-C) over the same
    // corpus view: each doc a line, `source` the file, doc_id the line
    // number. Patterns chosen non-vacuously: word-'a' diverges from
    // substring-'a' (which hits hash/batch/table/...), 'spark' repeats
    // within lines (occ > freq), 'dup' is rare (files/context stay
    // selective and zero-match files exercise the -c zero row).
    "q_grep_word" -> ((s, d) =>
      GrepEngine.grepFreq(Tables.documents(s, d), "text", "a", WholeWord)),
    "q_grep_invert" -> ((s, d) =>
      GrepEngine.grepInvert(Tables.documents(s, d), "text", "spark")),
    "q_grep_occ" -> ((s, d) =>
      GrepEngine.grepOccurrences(Tables.documents(s, d), "text", "spark")),
    "q_grep_counts" -> ((s, d) =>
      GrepEngine.grepFileCounts(Tables.documents(s, d), "source", "text", "vector")),
    "q_grep_files" -> ((s, d) =>
      GrepEngine.grepFilesWithMatches(Tables.documents(s, d), "source", "text", "dup")),
    "q_grep_context" -> ((s, d) =>
      GrepEngine.contextGrep(Tables.documents(s, d), "source", "doc_id", "text", "dup", 1)),
    // same grep questions probing the MATERIALIZED trigram index
    // (sources.TextIndexes) instead of scanning the corpus — a green
    // row certifies the postings round-trip AND that trigram candidate
    // pruning + exact verify reproduces scan semantics bit-for-bit
    "q_grep_freq_idx" -> ((s, d) =>
      sources.TextIndexes.grepProbeDocs(s, d, "spark")),
    "q_grep_ci_idx" -> ((s, d) =>
      sources.TextIndexes.grepProbeDocs(s, d, "SPARK", SubstringIgnoreCase)),
    "q_grep_multi_idx" -> ((s, d) =>
      sources.TextIndexes.multiGrepProbeDocs(s, d, Seq("vector", "stream"))),
    "q_grep_regex_idx" -> ((s, d) =>
      sources.TextIndexes.grepProbeDocs(s, d, "ve[ck]tor", Regex)),
    "q_grep_topk_idx" -> ((s, d) =>
      sources.TextIndexes.grepTopKProbeDocs(s, d, "spark", 10)),
    // word mode through the stored probe: 'a' has no trigram, so this
    // certifies the index's distinct-lines fallback under the new mode
    "q_grep_word_idx" -> ((s, d) =>
      sources.TextIndexes.grepProbeDocs(s, d, "a", WholeWord)),
    // -- relational suite (M2, SURVEY.md §2.2 absences made real) --
    "q_pricing_summary" -> (operators.Relational.pricingSummary _),
    "q_revenue_by_nation" -> (operators.Relational.revenueByNation _),
    "q_ship_priority" -> ((s, d) => operators.Relational.shippingPriority(s, d)),
    "q_returned_top" -> ((s, d) => operators.Relational.returnedItemRanking(s, d)),
    // skew-safe two-phase spelling; == plain window (RelationalSpec)
    "q_top_orders_window" -> ((s, d) => operators.Relational.topOrdersPerCustomerSkewSafe(s, d)),
    "q_cust_no_orders" -> ((s, d) => operators.Relational.customersWithoutOrders(s, d)),
    "q_cust_order_stats" -> (operators.Relational.customerOrderStats _),
    "q_cust_activity_full" -> (operators.Relational.customerActivityFull _),
    "q_cust_big_orders" -> ((s, d) => operators.Relational.customersWithBigOrders(s, d)),
    "q_lineitem_rollup" -> (operators.Relational.lineitemRollup _),
    "q_lineitem_cube" -> (operators.Relational.lineitemCube _),
    "q_active_positive" -> (operators.Relational.activePositiveCustomers _),
    "q_revenue_by_region" -> (operators.Relational.revenueByRegion _),
    "q_part_type_revenue" -> (operators.Relational.partTypeRevenue _),
    "q_supplier_nation_volume" -> (operators.Relational.supplierNationVolume _),
    "q_union_big_or_debt" -> ((s, d) => operators.Relational.bigOrderOrDebtCustomers(s, d)),
    "q_except_small_only" -> ((s, d) => operators.Relational.onlySmallOrderCustomers(s, d)),
    "q_orders_ranked" -> (operators.Relational.ordersRanked _),
    "q_order_gaps" -> (operators.Relational.orderGaps _),
    // skew-safe blockwise-prefix-sum spelling; == plain ntile window
    // (RelationalSpec)
    "q_orders_ntile" -> ((s, d) => operators.Relational.ntileRevenueSkewSafe(s, d)),
    "q_events_daily" -> (operators.Relational.eventsDaily _),
    "q_events_pivot" -> (operators.Relational.eventsDailyPivot _),
    // dense per-(user, day) purchase matrix, missing days at zero over
    // the corpus-wide span — the crossJoin with the broadcast day axis
    // IS the gap-fill contract
    "q_events_gapfill" -> ((s, d) => operators.EventAnalytics.dailyGapFill(s, d)),
    // trailing-window integer z-score over the daily revenue series;
    // both anomaly classes non-vacuous at every sf (checked: 3 of 30
    // days trip at sf0.01)
    "q_events_anomaly" -> ((s, d) => operators.EventAnalytics.dailyAnomalies(s, d)),
    // global-week churn: active-this-week ∧ absent-next-week, last week
    // unjudged by convention
    "q_user_churn" -> ((s, d) => operators.EventAnalytics.weeklyChurn(s, d)),
    // top consecutive event-type trigrams per user stream, (ts,
    // event_id)-ordered so counts are engine-deterministic
    "q_event_paths" -> ((s, d) => operators.EventAnalytics.topEventPaths(s, d)),
    // OLS slope per event type from integer sufficient statistics
    "q_events_trend" -> ((s, d) => operators.EventAnalytics.dailyTrend(s, d)),
    // log2-bucket inter-event gap histogram (bitlen staircase)
    "q_event_latency_hist" -> ((s, d) => operators.EventAnalytics.latencyHistogram(s, d)),
    // exact trailing-7-day distinct actives via the cover-day fan-out
    "q_rolling_actives" -> ((s, d) => operators.EventAnalytics.rollingActives(s, d)),
    // per-day first-appearances + cumulative total over the day frame
    "q_user_growth" -> ((s, d) => operators.EventAnalytics.userGrowth(s, d)),
    // per-user first/last event type in one arg-min/arg-max aggregate
    "q_attribution" -> ((s, d) => operators.EventAnalytics.firstLastTouch(s, d)),
    // strict-order view → click → purchase funnel stage per user
    "q_event_funnel" -> ((s, d) => operators.EventAnalytics.funnel(s, d)),
    // first-activity cohorts × integer week offsets (day-diff DIV 7 —
    // no calendar-week license)
    "q_event_retention" -> ((s, d) => operators.EventAnalytics.retention(s, d)),
    "q_events_props" -> (operators.Relational.eventsPropsAgg _),
    "q_events_asof_order" -> (operators.AsOf.eventsAsOfOrders _),
    "q_event_session_pairs" -> ((s, d) => operators.AsOf.eventPairsWithin(s, d)),
    // skew-safe two-phase spelling; == single-window (RangeJoinSpec)
    "q_event_sessions" -> ((s, d) => operators.AsOf.sessionizeSalted(s, d)),
    "q_train_eval_split" -> ((s, d) => operators.TextAnalysis.trainEvalSplit(s, d)),
    "q_train_eval_assign" -> ((s, d) =>
      operators.TextAnalysis.trainEvalAssign(s, d).select("doc_id", "split")),
    // near-dup clusters share one split (leakage-safe under near-dup)
    "q_split_cluster_safe" -> (operators.TextAnalysis.trainEvalAssignClusterSafe _),
    "q_token_quantiles" -> ((s, d) => operators.TextAnalysis.tokenQuantilesBySource(s, d)),
    // rows-only: GK-sketch internals are engine-specific; error bound vs
    // the exact rank-selection quantiles asserted in TextAnalysisSpec
    "q_token_quantiles_approx" -> ((s, d) => operators.TextAnalysis.tokenQuantilesApprox(s, d)),
    "q_token_bpe" -> ((s, d) => operators.TextAnalysis.subwordStats(s, d)),
    "q_sample_stratified" -> ((s, d) => operators.TextAnalysis.stratifiedSample(s, d)),
    // rows-only: the salted-md5 A-ES draw has no cross-engine SQL
    // spelling; TextAnalysisSpec pins it to a first-principles reference
    "q_sample_weighted" -> ((s, d) => operators.TextAnalysis.weightedSample(s, d)),
    // rows-only: HLL sketch values are engine-specific; error bound vs
    // the exact count asserted in RelationalSpec
    "q_events_approx_users" -> ((s, d) => operators.Relational.eventTypeApproxUsers(s, d)),
    // -- text analysis (SURVEY.md §7.2 M2: token/n-gram frequency + profiling) --
    "q_token_freq" -> ((s, d) => operators.TextAnalysis.tokenFreq(s, d)),
    "q_ngram_docfreq" -> ((s, d) => operators.TextAnalysis.ngramDocFreq(s, d)),
    "q_lang_hist" -> (operators.TextAnalysis.langHistogram _),
    "q_quality" -> (operators.TextAnalysis.qualityMetrics _),
    "q_quality_filter" -> (operators.TextAnalysis.qualityFilter _),
    "q_token_shards" -> ((s, d) => operators.TextAnalysis.tokenShards(s, d)),
    "q_token_stats" -> (operators.TextAnalysis.tokenStatsBySource _),
    "q_fingerprint" -> (operators.TextAnalysis.fingerprints _),
    "q_rep_topgram" -> (operators.TextAnalysis.topGramShare _),
    // exact frequent tokens via O(k) Misra–Gries candidates + recount —
    // output equals plain GROUP BY/HAVING (the oracle) by the MG
    // no-false-negative guarantee; k=100 keeps the rare 'dup' token
    // below threshold at every sf so the filter is non-vacuous
    "q_heavy_hitters" -> ((s, d) => operators.TextAnalysis.heavyHitters(s, d)),
    // the same sketch per GROUP: each source's own frequent tokens
    "q_heavy_hitters_src" -> ((s, d) => operators.TextAnalysis.heavyHittersBySource(s, d)),
    // A-ES weighted draw per source, skew-safe two-phase top-k;
    // rows-only like q_sample_weighted (float score, spec-pinned)
    "q_sample_weighted_src" -> ((s, d) => operators.TextAnalysis.weightedSampleBySource(s, d)),
    // conjunctive AND search ranked by the tf-idf integer spelling
    "q_search_rank" -> ((s, d) => operators.TextAnalysis.searchRanked(s, d)),
    // BM25 (k1=1.2, b=0.75) in milli fixed-point: tf saturation +
    // doc-length normalization over the same conjunctive query
    "q_search_bm25" -> ((s, d) => operators.TextAnalysis.searchBm25(s, d)),
    // the stored-postings twin: bucket-pruned inverted-index probe
    // through the SAME bm25Rank core (80% base + 20% delta append;
    // novel-only postings make reconciled == inline)
    "q_search_bm25_idx" -> (sources.SearchIndexes.bm25Probe _),
    // disjunctive (match-ANY) BM25 — standard ranked retrieval, the
    // same fixed-point core minus the arity gate
    "q_search_bm25_any" -> ((s, d) => operators.TextAnalysis.searchBm25Any(s, d)),
    // exact ADJACENT-token phrase match ranked by occurrence count —
    // one codegen HOF fold per doc (no explode/shuffle before the
    // TakeOrdered cut); overlapping occurrences count per start
    "q_search_phrase" -> ((s, d) => operators.TextAnalysis.searchPhrase(s, d)),
    // the stored twin over the SAME bm25 postings index (now carrying
    // 1-based position lists): bucket-pruned term reads + shifted
    // array_intersect — the corpus text is never touched; scan ==
    // probe spec-pinned, oracle shared
    "q_search_phrase_idx" -> (sources.SearchIndexes.phraseProbe _),
    // ---- co-purchase graph analytics (operators.Graph) ----
    // distinct part pairs per order via bounded HOF expansion (<= 7
    // parts/order), one orderkey shuffle — the oracle self-joins
    "q_graph_edges" -> (operators.Graph.copurchaseEdges _),
    // 5 synchronous ppm fixed-point PageRank steps over ONE persisted
    // src-partitioned adjacency; per-edge integer truncation makes the
    // unrolled-CTE oracle bit-identical
    "q_graph_pagerank" -> ((s, d) => operators.Graph.pageRank(s, d)),
    // per-node triangle counts + clustering coefficient via per-edge
    // adjacency intersection (codegen array_intersect, no wedge-set
    // shuffle); the id-ordered wedge-join oracle enumerates the same
    // triangle bag
    "q_graph_triangles" -> (operators.Graph.triangleStats _),
    // top-3 "also bought" neighbors per part (per-node window, never a
    // global sort)
    "q_graph_recs" -> ((s, d) => operators.Graph.itemRecs(s, d)),
    // Resource-Allocation link prediction from seed parts: integer ppm
    // scores over seed-anchored 2-hop candidates, existing edges
    // anti-joined out
    "q_graph_linkpred" -> ((s, d) => operators.Graph.linkPredict(s, d)),
    // item-item CF serving composition: customer scores = summed
    // co-purchase weights from owned parts, owned excluded, per-cust
    // top-k (seed-anchored like linkpred)
    "q_graph_custrecs" -> ((s, d) => operators.Graph.customerRecs(s, d)),
    // temporal cut: per-order-month edge weights, month-over-month
    // delta per pair (lag window partitioned by pair), top-k movers
    "q_graph_trending" -> ((s, d) => operators.Graph.trendingPairs(s, d)),
    // traversal member: per-seed closure sizes at 1..2 co-purchase
    // hops (frontier-delta BFS, seed-anchored state). 2 hops for the
    // driver query: the dense fixture saturates at hop 2-3, so hop 3
    // is a closure x degree join (~218M rows) answering an
    // already-saturated question
    "q_graph_reach" -> ((s, d) =>
      operators.Graph.reachability(s, d, seedMod = 200, maxHops = 2)),
    // degree distribution in the length(bin(x)) log2 staircase — the
    // skew-shape question graph partitioning starts from
    "q_graph_degrees" -> (operators.Graph.degreeHistogram _),
    // weighted-Jaccard normalized co-purchase similarity: w DIV
    // (wdeg_a + wdeg_b - w) in ppm — mutual specificity, not raw
    // popularity; two node-sized joins + TakeOrdered
    "q_graph_sim" -> ((s, d) => operators.Graph.itemSimilarity(s, d)),
    // bounded-round min-label propagation (5 BSP rounds, self-loops
    // fold keep-own-label into the one neighbor-min aggregate per
    // round) — fixed-budget component/community bootstrapping, exact
    // vs the unrolled-CTE oracle
    "q_graph_labelprop" -> ((s, d) => operators.Graph.labelPropagation(s, d)),
    // EXACT connected components (component = min part id), reusing
    // the dedup clusterer's convergent min-label machinery; the oracle
    // takes min label over a recursive-CTE reachability closure —
    // convergence is engine-side, the partition is spelling-free
    "q_graph_components" -> (operators.Graph.components _),
    // SCD2 dimension build: per-version validity intervals from an
    // orders-derived attribute changelog (one per-key lead window)
    "q_scd2_orders" -> (operators.Snapshot.scd2Orders _),
    // cohort revenue matrix (retention's monetized sibling): per
    // (signup-day, week offset) distinct users + events + cents
    "q_cohort_revenue" -> (operators.EventAnalytics.cohortRevenue _),
    // stored-ledger twins: 80% base build + 20% delta append, probed
    // through the merge-on-read reconciled edge set (within-order
    // pairing additivity makes reconciled == inline, oracle shared)
    "q_graph_pagerank_idx" -> (sources.GraphIndexes.pageRankProbe _),
    "q_graph_recs_idx" -> (sources.GraphIndexes.recsProbe _),
    "q_graph_reach_idx" -> (sources.GraphIndexes.reachProbe _),
    // per-source hash-rank ceiling via the skew-safe banded exact rank
    "q_source_cap" -> ((s, d) => operators.TextAnalysis.capPerSource(s, d)),
    // the synthetic fixture contains no digits/'@' (verified), so this
    // oracle certifies cross-engine regex parity on the identity path;
    // planted-PII behavior is spec-verified (TextAnalysisSpec)
    "q_pii_redact" -> (operators.TextAnalysis.redactPii _),
    // redaction over docs with DETERMINISTIC planted PII (same construction
    // as the oracle's PiiPlantedT0, byte for byte) — certifies Java/RE2
    // regex parity on real matches, not just the identity path
    "q_pii_redact_planted" -> ((s, d) => operators.TextAnalysis.redactPiiOn(
      Tables.documents(s, d).select(col("doc_id"), concat(
        col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com via 10.0."), (col("doc_id") % 256).cast("string"),
        lit(".7 tel 555-"), lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
        lit("-4242 ref 90000"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")
      ).as("text")))),
    // -- multimodal: binary asset columns + REAL image decode (Multimodal.scala) --
    "q_mm_asset_stats" -> (operators.Multimodal.assetStats _),
    "q_mm_frame_stats" -> (operators.Multimodal.frameStats _),
    // real PPM/PGM decode of the in-flight image view (native
    // ImageDecode expression — BMP and PNG paths spec-covered with
    // golden pixels); hash-checked since r20: the fixture text is
    // ASCII so DuckDB re-derives the raster byte stats via
    // ord(substr(...)), per-channel arrays scalarized to CSV strings
    "q_mm_decode" -> (operators.Multimodal.imageDecodeStats _),
    // real RIFF/PCM WAV decode of the in-flight audio view (native
    // AudioDecode expression); hash-checked likewise — the oracle
    // re-centers the text bytes and reproduces the exact integer RMS
    "q_mm_audio" -> (operators.Multimodal.audioStatsDocs _),
    // real RIFF/AVI video decode of the in-flight DIB-frame view
    // (native VideoDecode expression — the MJPEG path is spec-covered
    // through an ImageIO JPEG round-trip); hash-checked likewise —
    // the oracle cycles the text bytes over the four BGR frame rasters
    "q_mm_video" -> (operators.Multimodal.videoStatsDocs _),
    // REAL image resize (r20): decode → 2x2 integer box-average →
    // re-encode as netpbm → decode AGAIN — the round-trip runs through
    // the real decoder twice; hash-checked (the oracle recomputes every
    // block mean from the text bytes)
    "q_mm_resize" -> (operators.Multimodal.imageResizeStats _),
    // REAL per-frame video stats (r20): frame sampling on the real AVI
    // container, one row per decoded frame; hash-checked
    "q_mm_video_frames" -> (operators.Multimodal.videoFrameStatsDocs _),
    // REAL windowed audio RMS (r20): the energy-contour primitive over
    // 64-frame windows, final short window honest; hash-checked
    "q_mm_audio_windows" -> ((s, d) => operators.Multimodal.audioWindowStatsDocs(s, d)),
    // -- non-parquet sources (SURVEY.md §2.2 scans row): csv/json round-trips --
    "q_csv_nation_region" -> ((s, d) =>
      sources.Roundtrip.csv(s, d, "nation")
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_nations"))),
    "q_events_by_day_partitioned" -> ((s, d) =>
      sources.Roundtrip.eventsPartitionedByDay(s, d)
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n"))),
    "q_orc_supplier_balance" -> ((s, d) =>
      sources.Roundtrip.orc(s, d, "supplier")
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_suppliers"),
          (sum(col("s_acctbal").cast("decimal(18,2)")) * 100).cast("long")
            .as("acctbal_cents"))),
    "q_json_customer_segments" -> ((s, d) =>
      sources.Roundtrip.json(s, d, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          (sum(col("c_acctbal").cast("decimal(18,2)")) * 100).cast("long")
            .as("acctbal_cents"))),
    // -- dedup suite (north-star training-data ops) --
    "q_dedup_exact" -> (operators.Dedup.exact _),
    "q_dedup_wordset" -> ((s, d) => operators.Dedup.wordset(s, d)),
    "q_dedup_minhash" -> ((s, d) => operators.Dedup.minHashNearDups(s, d)),
    "q_ngram_jaccard" -> ((s, d) => operators.Dedup.ngramJaccardPairs(s, d)),
    "q_dedup_simhash" -> ((s, d) => operators.Dedup.simHashNearDups(s, d)),
    "q_dedup_clusters" -> (operators.Dedup.nearDupClusters _),
    // keep-best policy: per cluster keep the highest-quality member
    "q_dedup_keep_best" -> (operators.Dedup.keepBestNearDups _),
    "q_verbatim_runs" -> ((s, d) => operators.Dedup.verbatimRunPairs(s, d)),
    "q_verbatim_spans" -> ((s, d) => operators.Dedup.verbatimRunSpans(s, d)),
    "q_verbatim_incr" -> (operators.Dedup.incrementalVerbatimRunsDocs _),
    "q_verbatim_clean" -> ((s, d) => operators.Dedup.verbatimCleanCorpus(s, d)),
    // harness threshold 3 (= n): the uniform fixture's self-repeats top
    // out at 5 tokens; real-threshold (>= 20) behavior is spec-driven
    // with planted repeating docs
    "q_self_repeats" -> ((s, d) => operators.Dedup.selfRepeats(s, d, minRepTokens = 3)),
    // self-repeats at the REAL threshold (default 20): every doc's text
    // doubled on BOTH engines, so each >=20-token doc carries a genuine
    // >=20-token self-copy and the oracle certifies the islands
    // arithmetic where the operator actually runs (the r7 verdict's
    // "artificially low threshold" caveat)
    "q_self_repeats_planted" -> ((s, d) => operators.Dedup.selfRepeatsOn(
      Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"), lit(" "), col("text")).as("text")))),
    // CCNet-style boilerplate-line removal over deterministic planted
    // 3-line docs (constant header + own text + doc_id%5 footer, same
    // construction in the oracle): header df=500 and footer df~100 are
    // struck at minDocFreq=50, each doc's own line survives
    "q_line_dedup" -> ((s, d) => operators.Dedup.stripCommonLines(
      Tables.documents(s, d).select(col("doc_id"), concat(
        lit("shared header boilerplate\n"), col("text"),
        lit("\nfooter group "), (col("doc_id") % 5).cast("string")
      ).as("text")), minDocFreq = 50)),
    // the 100 TB spelling (xxhash64 line keys) against the SAME oracle —
    // a green row certifies the 8-byte-key trade changes nothing
    "q_line_dedup_hash" -> ((s, d) => operators.Dedup.stripCommonLines(
      Tables.documents(s, d).select(col("doc_id"), concat(
        lit("shared header boilerplate\n"), col("text"),
        lit("\nfooter group "), (col("doc_id") % 5).cast("string")
      ).as("text")), minDocFreq = 50, hashKey = true)),
    // paragraph-granularity strike (the CCNet trio's middle member) over
    // deterministic planted 3-paragraph docs: constant preamble (df=500)
    // and doc_id%5 footer paragraph (df~100) struck at minDocFreq=50,
    // each doc's own text paragraph survives
    "q_para_dedup" -> ((s, d) => operators.Dedup.stripCommonParagraphs(
      Tables.documents(s, d).select(col("doc_id"), concat(
        lit("shared preamble paragraph\n\n"), col("text"),
        lit("\n\nfooter para "), (col("doc_id") % 5).cast("string")
      ).as("text")), minDocFreq = 50)),
    "q_dedup_incremental" -> (operators.Dedup.incrementalNewDocs _),
    "q_dedup_incr_near" -> (operators.Dedup.incrementalNearDupDocs _),
    // same contracts probing the MATERIALIZED (parquet) corpus indexes —
    // a green row certifies the write-once/probe-per-delivery round-trip
    "q_dedup_incr_near_idx" -> (sources.DedupIndexes.nearDupProbeDocs _),
    "q_verbatim_incr_idx" -> (sources.DedupIndexes.verbatimProbeDocs _),
    "q_decontaminate" -> ((s, d) => operators.TextAnalysis.contamination(s, d)),
    "q_decontaminate_cov" -> ((s, d) => operators.TextAnalysis.contaminationCoverage(s, d)),
    "q_decontaminate_eval_cov" -> ((s, d) => operators.TextAnalysis.evalContaminationCoverage(s, d)),
    "q_tfidf_terms" -> ((s, d) => operators.TextAnalysis.tfidfTopTerms(s, d)),
    // flagship composition: lang → quality → canonical dedup → split →
    // decontamination as ONE per-doc audit ledger (Pipeline.curate);
    // planted exact dups guarantee the dedup stage fires
    "q_pipeline_curate" -> ((s, d) => operators.Pipeline.curate(s, d)),
    // THE FULL RECIPE, every stage on at once — the flagship
    // composition hash-checking stage INTERACTIONS (cleaned text →
    // classifier → ppl survivor set) against one DuckDB CTE
    "q_pipeline_curate_full" -> ((s, d) => operators.Pipeline.curateFull(s, d)),
    // the full production-recipe composition: the MinHash near-dedup
    // stage (exact-verified LSH candidates → connected components →
    // min-representative keeper) runs between exact dedup and split;
    // planted near-copies (one appended token, J=(n-2)/(n-1) >= 0.8)
    // guarantee dropped_near_duplicate fires
    "q_pipeline_curate_fuzzy" -> ((s, d) => operators.Pipeline.curateFuzzy(s, d)),
    // coverage-threshold decontamination: a train doc drops only when
    // shared n-grams cover >= 40% of its distinct n-grams
    // (contaminationCoverage's thresholdable contract inside the ledger)
    "q_pipeline_curate_cov" -> ((s, d) => operators.Pipeline.curateCov(s, d)),
    // INCREMENTAL curation against the stored corpus state
    // (sources.CurateState): state inited from batch1 (fixture work,
    // writeOnce), the query judges + commits batch2 — exact gate on the
    // stored fps, near-dup gate through the stored MinHash index,
    // decontamination against stored ∪ in-batch eval grams; ledger ==
    // the full-rebuild ledger restricted to batch2 (the oracle)
    "q_pipeline_curate_incr" -> ((s, d) => sources.CurateState.curateIncrDocs(s, d)),
    // retro-decontamination report over the incremental corpus: every
    // committed TRAIN doc scored against the full stored eval-gram
    // universe — flagged = what a full rebuild would NEWLY drop (the
    // rebuild-due signal; ivfRefitDue's precedent). Rows-only: the
    // flagged set's equality with rebuild-minus-committed is asserted
    // in PipelineSpec; hash-checked since r19 (retroContamOracleSql)
    "q_pipeline_retro_contam" -> ((s, d) => sources.CurateState.retroContamDocs(s, d)),
    // retro-NEAR-DUP report — the second rebuild-drift axis: the full
    // rebuild dedup graph recomputed from the stored MinHash index
    // alone (banded self-join + exact verification), flagged = kept
    // committed reps a rebuild's component merge would drop (planted
    // cross-batch bridge trios make it non-vacuous); hash-checked
    // since r19 (retroNearDupOracleSql), flagged == rebuild-merged
    // additionally asserted in PipelineSpec
    "q_pipeline_retro_neardup" -> ((s, d) => sources.CurateState.retroNearDupDocs(s, d)),
    // ledger with the GPT-3-style classifier stage on: NB log-odds of
    // the en reference vs this corpus, kept train docs in the bottom
    // reference-similarity tertile -> dropped_classifier
    "q_pipeline_curate_clf" -> ((s, d) => operators.Pipeline.curateClf(s, d)),
    // ledger with the C4-style bad-words stage on (q_blocklist terms);
    // blocked en docs attribute as dropped_blocklist before quality
    "q_pipeline_curate_block" -> ((s, d) => operators.Pipeline.curateBlock(s, d)),
    // ledger with the ExactSubstr verbatim-span REMOVAL stage on:
    // >= 20-token cross-doc runs among the survivors cut from their
    // higher-id doc, n_tokens_removed in the ledger, decontamination
    // judged on the CLEANED text
    "q_pipeline_curate_verbatim" -> ((s, d) => operators.Pipeline.curateVerbatim(s, d)),
    // ledger with CCNet's closing perplexity stage on: final survivors
    // scored under the en-reference unigram LM (driver caps 16) and
    // bucketed head/middle/tail over the survivor distribution
    "q_pipeline_curate_ppl" -> ((s, d) => operators.Pipeline.curatePpl(s, d)),
    // the ledger rolled up per outcome with doc AND token totals — the
    // stage-loss summary (token-weighted, the number that actually
    // matters when long docs die to a length rule); rolls up the STORED
    // ledger artifact (writeOnce) so stats cost a ledger scan + one
    // groupBy, not a second pipeline pass — and the green row certifies
    // the ledger's parquet round-trip
    "q_pipeline_stats" -> ((s, d) => operators.Pipeline.curateStatsDocs(s, d)),
    // the VERBATIM ledger rolled up with the tokens-removed total per
    // outcome — how much text the ExactSubstr pass cut, and from which
    // fate; stored-ledger discipline like q_pipeline_stats
    "q_pipeline_stats_verbatim" -> ((s, d) => operators.Pipeline.curateStatsVerbatimDocs(s, d)),
    // -- training-mix construction (post-curation tail) --
    // GPT-style concat-and-chunk packing: deterministic fingerprint
    // shuffle → global token prefix sum (blockwise) → fixed 512-token
    // sequences; one row per (doc, sequence) incl. boundary straddles
    "q_pack_sequences" -> ((s, d) => operators.Mixture.packSequences(s, d)),
    // per-source doc/token counts + the sqrt-temperature quota — the
    // mixture plan a corpus build signs off on
    "q_mixture_plan" -> ((s, d) => operators.Mixture.mixturePlan(s, d)),
    // the sampling pass itself: first `quota` docs per source in
    // fingerprint order, rank surfaced so the oracle checks the
    // blockwise rank arithmetic, not just membership
    "q_mixture_sample" -> ((s, d) => operators.Mixture.temperatureSample(s, d)),
    // DSIR-style hashed-feature importance weights toward source=src0
    // (integer-exact ppm ratio spelling of the likelihood-ratio score)
    "q_dsir_weights" -> ((s, d) => operators.Mixture.importanceWeights(s, d)),
    // exact top-quartile selection by avg_ppm via the score histogram +
    // boundary-value tie-break — no corpus-wide rank window
    "q_dsir_resample" -> ((s, d) => operators.Mixture.importanceResample(s, d)),
    // composed corpus-build tail: coverage-threshold curation ledger's
    // train docs → temperature-balanced mixture (the cov variant — the
    // blunt any-3-gram rule empties `train` entirely at sf0.1 on the
    // fixture's 31-token vocabulary; the r13 bench non-emptiness probe
    // caught earlier rounds timing that empty tail)
    "q_mixture_curated" -> ((s, d) => operators.Mixture.mixtureCurated(s, d)),
    // the FULL corpus-build tail: curate -> train -> temperature
    // mixture -> packed 512-token sequences, raw docs in / (doc, seq,
    // span) out — each stage the oracle-verified standalone operator
    "q_corpus_build" -> ((s, d) => operators.Mixture.corpusBuild(s, d)),
    // -- CCNet-style LM perplexity filtering --
    // per-doc cross-entropy in whole bits under the en-reference unigram
    // LM (bitlen staircase — integer-exact across engines); vocab capped
    // at 16 so the cap AND out-of-vocabulary paths are both non-vacuous
    // on the 31-token fixture vocabulary
    "q_lm_score" -> ((s, d) => operators.Lm.lmScore(s, d, "en", 16)),
    // the STORED-model twin: LM sufficient statistics are additive
    // (per-token counts + the total), so the artifact stores mergeable
    // counts (init on en doc_id<250, append the rest) and the capped
    // vocab derives at read over the merge — hash-checked against the
    // inline query's own oracle (the q_nb_classifier_idx contract)
    "q_lm_score_idx" -> ((s, d) =>
      sources.LmModels.lmScoreStoredDocs(s, d, "en", 16)),
    // head/middle/tail perplexity tertiles from the score histogram;
    // only boundary-straddling score values pay a per-doc tie-break
    "q_lm_buckets" -> ((s, d) => operators.Lm.lmBuckets(s, d, "en", 16)),
    // -- bootstrap corpus classifier (NB token log-odds, bitlen
    // staircase — integer-exact across engines) --
    // fastText-language-ID shape: train en-vs-rest on the lang labels,
    // score every doc; vocab capped at 16 so cap + OOV paths stay
    // non-vacuous on the 31-token fixture
    "q_nb_classifier" -> ((s, d) =>
      operators.Classifier.nbLangClassify(s, d, "en", 16)),
    // the STORED-model twin: NB sufficient statistics are additive, so
    // the artifact stores mergeable counts (init on doc_id<250, append
    // the rest) and weight derivation at read equals a fresh full fit
    // EXACTLY -- hash-checked against the inline query's own oracle
    "q_nb_classifier_idx" -> ((s, d) =>
      sources.ClassifierModels.nbClassifyStoredDocs(s, d, "en", 16)),
    // the separable twin: deterministic zj-prefix vocabulary drift
    // planted into doc_id%3 docs, trained clean-vs-mangled, every doc
    // scored with its truth bit (vocab 64: drifted tokens must fit)
    "q_nb_classifier_planted" -> ((s, d) =>
      operators.Classifier.nbPlantedClassify(s, d, 64)),
    // its 4-cell confusion matrix — off-diagonals are the errors
    "q_nb_confusion" -> ((s, d) =>
      operators.Classifier.nbPlantedConfusion(s, d, 64)),
    // the ITERATIVE classifier's stored lifecycle end-to-end: logreg
    // init-fit + warm-start append as memoized fixture work, every doc
    // scored FROM the stored weights with its truth bit. Rows-only by
    // design (float margins are engine-specific); ClassifierSpec
    // asserts the separation bound and stored-resume == continuous fit
    "q_logreg_planted" -> ((s, d) =>
      sources.ClassifierModels.logRegPlantedStoredDocs(s, d)),
    // perplexity-curriculum ordering: global easy-to-hard position
    // (grade = LM bits_per_100, fingerprint shuffle within a grade),
    // ranked blockwise — the window runs over the (grade, fp-prefix)
    // counts frame, never the corpus
    "q_curriculum" -> ((s, d) => operators.Mixture.curriculumOrder(s, d)),
    // data-constrained epoch schedule (Muennighoff-style repeat
    // allocation): 60k-token budget, 4-epoch cap — at sf0.01 this
    // exercises full rounds, the name-order partial deal, the boundary
    // source, and the zero-extra tail all at once
    "q_epoch_schedule" -> ((s, d) => operators.Mixture.epochSchedule(s, d, 60000L)),
    // -- corpus packaging / audit --
    // sliding-window passage chunking (RAG / fixed-context prep):
    // 32-token chunks at stride 24 — pure explode projection, no shuffle
    "q_chunk_passages" -> ((s, d) => operators.Chunking.chunkPassages(s, d)),
    // content-level generation diff: added/removed/retained fingerprints
    // per source between two deterministic snapshot carvings
    "q_snapshot_diff" -> ((s, d) => operators.Snapshot.snapshotDiff(s, d)),
    // CDC latest-wins compaction with tombstones onto a base snapshot;
    // classes carved deterministically (see Snapshot.cdcApply scaladoc)
    "q_cdc_apply" -> ((s, d) => operators.Snapshot.cdcApply(s, d)),
    // minimal I/U/D stream between two snapshot carvings — the inverse
    // of q_cdc_apply; apply∘derive == identity is spec-asserted
    "q_cdc_derive" -> ((s, d) => operators.Snapshot.deriveChangelog(s, d)),
    // Levenshtein-1 record linkage via symmetric-deletion blocking +
    // exact verify — equals the oracle's cross-product filter with no
    // A×B product in the plan
    "q_fuzzy_match" -> ((s, d) => operators.FuzzyMatch.partCatalogMatch(s, d)),
    // Deequ-style constraint audit over a deterministically dirtied
    // landing zone: row/PK/FK shapes, zero rows kept (ran-and-clean)
    "q_dq_audit" -> ((s, d) => operators.Audit.ordersAudit(s, d)),
    // incremental view maintenance: 80%+20% pre-aggregated partials
    // merged per key; the oracle recomputes from scratch — equality IS
    // the IVM soundness claim
    "q_ivm_orders" -> ((s, d) => operators.Snapshot.incrementalRollup(s, d)),
    // shuffle-key health: top-5 heaviest event users with ppm share
    "q_key_skew" -> ((s, d) => operators.Profile.eventsUserSkew(s, d)),
    // bloom-pruned semi join == plain semi join (no false negatives)
    "q_bloom_semi" -> ((s, d) => operators.Relational.urgentLineitemsBloom(s, d)),
    // TPC-H Q6 analogue: pure filter+agg, predicates pushed to parquet
    "q_forecast_revenue" -> (operators.Relational.forecastRevenue _),
    // TPC-H Q14 analogue: conditional agg over a broadcast dim join
    "q_promo_share" -> (operators.Relational.promoRevenueShare _),
    // Pareto share of the top-1% customers, exact via banded rank
    "q_revenue_top1" -> ((s, d) => operators.Relational.revenueConcentration(s, d)),
    // first-order Markov transition matrix over per-user event streams
    "q_event_transitions" -> ((s, d) => operators.EventAnalytics.eventTransitions(s, d)),
    // the funnel under a 1-day conversion window per stage
    "q_event_funnel_1d" -> ((s, d) => operators.EventAnalytics.funnelWithin(s, d)),
    // -- corpus profiling / governance --
    // per-source data card: volumes + language-mix headline; the only
    // window runs over the (source × lang) catalog frame
    "q_corpus_card" -> ((s, d) => operators.Profile.corpusCard(s, d)),
    // ANALYZE-style per-column profile of orders (one formatter branch
    // per storage class: long, double→DECIMAL string, timestamp, string)
    "q_profile_orders" -> ((s, d) => operators.Profile.ordersProfile(s, d)),
    // C4-style blocklist verdict via explode → broadcast term join;
    // "spamword" never matches, keeping the miss path non-vacuous
    "q_blocklist" -> ((s, d) => operators.Profile.blocklistVerdict(s, d)),
    // pairwise source content overlap (containment of the smaller
    // side); cross-source duplicates planted per the plantDups pattern
    "q_source_overlap" -> ((s, d) => operators.Snapshot.sourceOverlap(s, d)),
    // bigram LM with stupid backoff — same bitlen staircase as
    // q_lm_score; caps 16/64 keep all three scoring paths non-vacuous
    "q_lm_bigram" -> ((s, d) => operators.Lm.bigramScore(s, d, "en", 16, 64)),
    // bigram perplexity tertiles through the SHARED bucketsFromScores
    // spelling — the unigram/bigram bucket paths cannot drift
    "q_lm_bigram_buckets" -> ((s, d) => operators.Lm.bigramBuckets(s, d, "en", 16, 64)),
    // -- tokenizer induction (BPE) --
    // first-iteration adjacent-char pair table: the exact frame the
    // first merge decision reads, hash-checked against DuckDB
    "q_bpe_pairs" -> ((s, d) => operators.Bpe.bpePairs(s, d)),
    // 8 learned merges, hash-checked since r19 against a scripted
    // 8-step unroll oracle (counts and tie-breaks are integer/
    // deterministic); BpeSpec additionally asserts == a
    // first-principles reimplementation
    "q_bpe_merges" -> ((s, d) => operators.Bpe.bpeMerges(s, d)),
    // per-doc share of corpus-unique 3-grams (novelty-weighted
    // sampling signal); equi-join df spelling so AQE can split a
    // boilerplate gram's skewed partition
    "q_novelty" -> ((s, d) => operators.TextAnalysis.novelty(s, d)),
    // -- similarity search --
    "q_embed_neardup" -> ((s, d) => operators.Similarity.cosineNearDupPairs(s, d)),
    "q_embed_ann" -> ((s, d) => operators.Similarity.annTopKBrute(s, d)),
    // SQ8 two-stage retrieval: int8-coded coarse pass (the 4x-smaller
    // scan) -> exact float re-rank of the per-query shortlist; rows-only
    // (float path), recall >= 0.9 vs the exact oracle in SimilaritySpec
    "q_embed_ann_sq" -> ((s, d) => operators.Similarity.annTopKSq(s, d)),
    "q_embed_ann_lsh" -> ((s, d) => operators.Similarity.annTopKLsh(s, d)),
    // rows-only: kmeans-seeded cells are engine-specific; recall vs
    // brute force asserted in SimilaritySpec
    "q_embed_ann_ivf" -> ((s, d) => operators.Similarity.annTopKIvf(s, d)),
    // the serving-knob tuning run: measured nprobe -> (recall_ppm,
    // scan_ppm) curve vs the exact oracle over the same query sample;
    // rows-only (kmeans cells) — monotonicity + the nprobe=nlist
    // degenerate-to-brute endpoints are pinned in SimilaritySpec.
    // Since r17 (verdict #5) the registered curve queries keep exactly
    // the spec-law ladder points (one interior + the endpoint) and —
    // except PCA — probe the writeOnce'd STORED fixture indexes (the
    // production "tune the index you serve" question; timed reps pay
    // probes, never fits/encodes; stored == inline spec-pinned)
    "q_embed_ivf_recall" -> ((s, d) => sources.SimilarityIndexes
      .ivfRecallCurveDocs(s, d, nprobes = Seq(1, 4, 16))),
    // the same serving-curve contract for the OTHER stored families'
    // knobs (r16 verdict #3), one query per curve, all rows-only with
    // spec-pinned laws: PCA width k' (recall NOT monotone — geometry,
    // not subsetting; the k'=dim full-rotation exactness endpoint is
    // the pinned law, and on this near-isotropic fixture the 16->32
    // cliff is the decision the curve answers; since r18 a FULL-WIDTH
    // stored fixture index serves the ladder, so the endpoint law
    // holds AND the timed reps pay probes only — r17's inline
    // spelling re-fit-fingerprinted and re-projected the corpus per
    // rep)...
    "q_embed_pca_recall" -> ((s, d) => sources.SimilarityIndexes
      .pcaRecallCurveDocs(s, d, kprimes = Seq(16, 32, 64))),
    // ...LSH table count (nested plane prefixes => candidate
    // supersets: recall AND measured scanned monotone by
    // construction, no exact endpoint — LSH never guarantees full
    // recall)...
    "q_embed_lsh_recall" -> ((s, d) => sources.SimilarityIndexes
      .lshRecallCurveDocs(s, d, nTabless = Seq(1, 4, 16))),
    // ...PQ rerank depth (nested shortlists => both monotone;
    // depth >= corpus degrades to exact brute — the full-rerank
    // precedent as a measured curve point at sf0.001 in the spec)...
    "q_embed_pq_rerank" -> ((s, d) => sources.SimilarityIndexes
      .pqRerankCurveDocs(s, d, reranks = Seq(8, 64, 512))),
    // ...and the COMPOSED families' fan-out knob measured over the
    // REAL two-stage probes (scanned counts code rows — the bytes the
    // composition exists to shrink; recall honestly NOT monotone by
    // construction at fixed rerank, approximate coarse scores can
    // displace — spec pins scanned monotonicity, the full-fan-out
    // scan endpoint, and nprobe=nlist == the pure family's recall)
    "q_embed_ivfsq_recall" -> ((s, d) => sources.SimilarityIndexes
      .ivfSqRecallCurveDocs(s, d, nprobes = Seq(1, 4, 16))),
    "q_embed_ivfpq_recall" -> ((s, d) => sources.SimilarityIndexes
      .ivfPqRecallCurveDocs(s, d, nprobes = Seq(1, 4, 16))),
    // same probe against the MATERIALIZED (parquet) IVF index — the
    // embedding-side counterpart of q_dedup_incr_near_idx; rows-only for
    // the same reason, stored == inline asserted in SimilaritySpec
    "q_embed_ann_ivf_idx" -> ((s, d) => sources.SimilarityIndexes.annIvfProbeDocs(s, d)),
    // same probe against the MATERIALIZED sketch index ((vec_id, key)
    // rows + a vectors table — no payload on sketch rows); rows-only
    // like its inline twin, stored == inline asserted in SimilaritySpec
    "q_embed_ann_lsh_idx" -> ((s, d) => sources.SimilarityIndexes.annLshProbeDocs(s, d)),
    // the SQ8 stored-probe twin: coarse pass reads the 4x-smaller
    // materialized code table, re-rank joins the stored vectors
    "q_embed_ann_sq_idx" -> ((s, d) => sources.SimilarityIndexes.annSqProbeDocs(s, d)),
    // IVF-SQ8 composed (FAISS IVF16,SQ8): cell probing prunes WHICH
    // vectors the coarse pass scans, int8 codes prune the BYTES per
    // vector, exact float re-rank on the shortlist; rows-only (kmeans
    // cells), nprobe=nlist == pure-SQ8 equality + recall bound in
    // SimilaritySpec
    "q_embed_ann_ivfsq" -> ((s, d) => operators.Similarity.annTopKIvfSq(s, d)),
    // its stored-probe twin: quantized inverted lists PARTITIONED BY
    // cell — the coarse pass reads only the probed cells' files
    "q_embed_ann_ivfsq_idx" -> ((s, d) => sources.SimilarityIndexes.annIvfSqProbeDocs(s, d)),
    // product quantization (FAISS PQ16x5): 16-byte ADC codes — the
    // deepest storage trade in the family (16x smaller than float) —
    // coarse-ranked per query via precomputed lookup tables, exact
    // float re-rank on the shortlist; rows-only (kmeans codebooks),
    // full-rerank == brute equality + recall bound in SimilaritySpec
    // (r19) in-flight encode under the STORED fixture codebooks — the
    // per-rep fit-fingerprint corpus scans were harness overhead; rows
    // identical to the fit-path spelling (pinned in SimilaritySpec)
    "q_embed_ann_pq" -> ((s, d) => sources.SimilarityIndexes.annPqInlineDocs(s, d)),
    // its stored-probe twin: codebooks + 16-byte code rows read from
    // parquet, appends encode under the STORED codebooks
    "q_embed_ann_pq_idx" -> ((s, d) => sources.SimilarityIndexes.annPqProbeDocs(s, d)),
    // IVF-PQ composed (FAISS IVF16,PQ16 — THE production big-corpus
    // index): cell probing prunes WHICH vectors pay the ADC lookups
    // (plain PQ scans every code row — the 10^9-vector bottleneck),
    // PQ prunes the bytes per scanned vector; rows-only (both fits
    // kmeans-seeded), nprobe=nlist == pure-PQ equality + recall bound
    // in SimilaritySpec
    "q_embed_ann_ivfpq" -> ((s, d) => sources.SimilarityIndexes.annIvfPqInlineDocs(s, d)),
    // its stored-probe twin: PQ-coded inverted lists PARTITIONED BY
    // cell — the ADC pass reads only the probed cells' files at 1/16
    // the bytes per vector
    "q_embed_ann_ivfpq_idx" -> ((s, d) => sources.SimilarityIndexes.annIvfPqProbeDocs(s, d)),
    // distributed PCA over the embeddings table (the FAISS
    // pre-transform: reduce THEN index): one corpus pass accumulates
    // the second-moment statistics via the native cov_stats aggregate
    // (control-plane buffer, map-side combined), the 64x64
    // eigendecomposition runs driver-side (cyclic Jacobi), projection
    // broadcasts the components back as one scan-fused transform.
    // Rows-only by design (float partial-sum order); PcaSpec owns the
    // algebra (orthonormality, planted-direction recovery, agg ==
    // driver reference, stored-moments merge == fresh fit)
    "q_embed_pca" -> ((s, d) => operators.Pca.embedPca(s, d)),
    // its stored-moments twin: the model derives from the COMMITTED
    // merged moments artifact (PcaModels) instead of a fresh fit —
    // certifying the artifact round-trip at driver cadence (the
    // q_lm_score_idx precedent). Rows-only; stored == inline within
    // the PCA float slack in PcaSpec
    "q_embed_pca_idx" -> ((s, d) => operators.Pca.embedPcaStored(s, d)),
    // PCA two-stage ANN (the FAISS PCAR pre-transform shape): coarse
    // cosine in 16-of-64 PCA space — a TUNABLE 4x byte cut where SQ8's
    // is fixed — exact full-dim re-rank; the basis is the raw
    // second-moment eigenbasis (dot-product-preserving, not the
    // centered covariance). Rows-only; recall + rerank>=corpus==brute
    // pinned in SimilaritySpec
    "q_embed_ann_pca" -> ((s, d) => operators.Similarity.annTopKPca(s, d)),
    // its stored serving twin (FAISS PCAR as a stored family): the
    // materialized REDUCED table is the coarse-pass scan (k'/dim of
    // the float bytes), queries project under the STORED basis,
    // appends project-never-refit with drift measured
    // (pcaDriftStats). Rows-only; stored == inline + append ==
    // stored-basis projection pinned in SimilaritySpec
    "q_embed_ann_pca_idx" -> ((s, d) => sources.SimilarityIndexes.annPcaProbeDocs(s, d)),
    // cluster-based corpus pruning (SemDeDup / MiniPile / Sorscher
    // prototypicality selection) — rows-only: kmeans-seeded cells, the
    // IVF precedent; semantics pinned in ClusteringSpec
    "q_embed_cluster_profile" -> ((s, d) => operators.Clustering.clusterProfile(s, d)),
    "q_embed_cluster_prune" -> ((s, d) => operators.Clustering.clusterPrune(s, d)),
    // rows-only for the same reason (IVF-cell candidate generation);
    // recall vs exact blocked all-pairs + representative invariants
    // asserted in SimilaritySpec
    "q_semantic_dedup" -> ((s, d) => operators.Similarity.semanticDedup(s, d)),
    // same dedup blocking on the MATERIALIZED multi-assign cell table —
    // completes the stored-twin symmetry (dedup, ANN, semantic dedup);
    // rows-only like the inline twin, stored cells == inline asserted
    // in SimilaritySpec
    "q_semantic_dedup_idx" -> ((s, d) => sources.SimilarityIndexes.semanticDedupProbeDocs(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  /** Scripted unroll of [[operators.Bpe.learnMergesOn]]'s first `k`
    * merges as one DuckDB query (r18 verdict #7 — counts and tie-breaks
    * are integer/deterministic, so the iterative learner is hash-
    * checkable). Each word's segmentation rides as a STRING of
    * chr(1)-sym-chr(2) wrapped symbols; applying merge (l, r) is then a
    * plain `replace` of the wrapped pair — SQL replace scans left to
    * right and continues AFTER each replacement, which is exactly the
    * greedy leftmost-first fold of [[operators.Bpe.applyMerge]] (an
    * "a a a" run becomes [aa, a] in both). Step i picks its winner with
    * the engine's own (cnt desc, lsym, rsym) tie-break and step i+1
    * re-counts pairs from the replaced strings.
    */
  private def bpeMergesOracleSql(k: Int): String = {
    val steps = (1 to k).map { i =>
      s"""p$i AS (
      SELECT syms[i] AS lsym, syms[i + 1] AS rsym, freq
      FROM (SELECT string_split(substr(seg, 2, length(seg) - 2),
                     chr(2) || chr(1)) AS syms, freq
            FROM s${i - 1}) s,
           (SELECT unnest(generate_series(1, len(syms) - 1)) AS i)
      WHERE len(syms) >= 2),
      t$i AS (SELECT lsym, rsym, CAST(SUM(freq) AS BIGINT) AS cnt
           FROM p$i GROUP BY lsym, rsym ORDER BY cnt DESC, lsym, rsym LIMIT 1),
      s$i AS (SELECT replace(seg, chr(1) || t.lsym || chr(2) || chr(1) || t.rsym || chr(2),
                            chr(1) || t.lsym || t.rsym || chr(2)) AS seg, freq
           FROM s${i - 1}, t$i t)"""
    }.mkString(",\n      ")
    val out = (1 to k)
      .map(i => s"SELECT $i AS step, lsym, rsym, cnt FROM t$i")
      .mkString(" UNION ALL ")
    s"""
      WITH wf AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) w
        GROUP BY word),
      s0 AS (
        SELECT list_aggregate(list_transform(generate_series(1, length(word)),
                 i -> chr(1) || substr(word, i, 1) || chr(2)), 'string_agg', '') AS seg,
               freq
        FROM wf WHERE length(word) >= 1),
      $steps
      $out""".stripMargin.trim
  }

  /** DuckDB oracle for the retro-decontamination report (r19 — moves
    * q_pipeline_retro_contam from rows-only to hash-green): the
    * committed corpus state is re-derived from first principles as
    * TWO ledgers — batch1's commit is a full rebuild over batch1
    * ALONE (docsWhere, no plants: `CurateState.init` judges the raw
    * batch) and batch2's commit is the incr oracle verbatim (the
    * equality contract) — then every committed TRAIN doc's distinct
    * word-3-grams are covered against the committed EVAL docs' gram
    * universe under the state's 40% threshold. Committed kept docs
    * are always base-corpus docs (plants lose their races by
    * construction), so texts join back to `documents` directly; docs
    * too short to shingle surface as (0, 0, 0, unflagged) via the
    * left join — the explode_outer contract.
    */
  private def retroContamOracleSql: String = {
    val led1 = pipelineOracle(nearPlants = false, fuzzy = true,
      covPct = Some(40), docsWhere = " WHERE doc_id < 250", plants = false)
    val led2 = oracleSqlBase("q_pipeline_curate_incr")
    s"""
      WITH committed AS MATERIALIZED (
        SELECT doc_id, outcome FROM ($led1) t1
        UNION ALL
        SELECT doc_id, outcome FROM ($led2) t2),
      train AS (SELECT d.doc_id, d.text FROM documents d
                JOIN committed c ON d.doc_id = c.doc_id AND c.outcome = 'train'),
      ev AS (SELECT d.text FROM documents d
             JOIN committed c ON d.doc_id = c.doc_id AND c.outcome = 'eval'),
      uni AS MATERIALIZED (SELECT DISTINCT ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS ng
              FROM (SELECT string_split(text, ' ') AS ws FROM ev) w,
                   (SELECT unnest(generate_series(1, len(ws) - 2)) AS i)
              WHERE len(ws) >= 3),
      tgd AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS ng
              FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM train) w,
                   (SELECT unnest(generate_series(1, len(ws) - 2)) AS i)
              WHERE len(ws) >= 3),
      agg AS (SELECT doc_id,
                CAST(COUNT(*) AS BIGINT) AS n_ngrams,
                CAST(SUM(CASE WHEN ng IN (SELECT ng FROM uni) THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
              FROM tgd GROUP BY doc_id)
      SELECT t.doc_id,
             COALESCE(a.n_shared, 0) AS n_shared,
             COALESCE(a.n_ngrams, 0) AS n_ngrams,
             COALESCE(a.n_shared, 0) * 100 // GREATEST(COALESCE(a.n_ngrams, 0), 1) AS cov_pct,
             CAST(COALESCE(a.n_shared, 0) * 100 // GREATEST(COALESCE(a.n_ngrams, 0), 1) >= 40 AS BIGINT) AS flagged
      FROM train t LEFT JOIN agg a ON t.doc_id = a.doc_id""".stripMargin.trim
  }

  /** DuckDB oracle for the retro-near-dup report (r19 — the
    * [[retroContamOracleSql]] treatment for the OTHER audit axis): the
    * committed state over the bridge-trio corpus is re-derived as two
    * first-principles ledgers (batch1 rebuild over docs<250 ∪ B1a ∪
    * B1b; the union rebuild restricted to batch2's rows — docs ≥ 250
    * and the 6M-range bridges; contamination disabled at the 101
    * threshold, mirroring the harness), then the FULL rebuild dedup
    * graph — exact ≥ 0.8 word-3-gram Jaccard pairs over ALL committed
    * exact-dedup survivors (near-losers included: the bridge spans
    * them) — is component-labeled by recursive min-reachability, and
    * every committed KEPT doc reports its rebuild rep. The token-slice
    * plants mirror `CurateState.retroNdBatches` exactly (Spark
    * slice(a, i, n) == DuckDB a[i:i+n-1], both truncating).
    */
  private def retroNearDupOracleSql: String = {
    def sliceDoc(idExpr: String, listExpr: String) = s"""
                 SELECT $idExpr AS doc_id,
                        array_to_string($listExpr, ' ') AS text
                 FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) sx
                 WHERE doc_id % 50 = 7 AND len(ws) >= 54"""
    val b1a = sliceDoc("doc_id * 2 + 5000000", "list_concat(ws[41:48], ws[1:40])")
    val b1b = sliceDoc("doc_id * 2 + 5000001", "list_concat(ws[1:40], ws[49:54])")
    val bridge = sliceDoc("doc_id + 6000000", "ws[1:40]")
    val extras1 = s"\n                 UNION ALL$b1a\n                 UNION ALL$b1b"
    val extrasU = extras1 + s"\n                 UNION ALL$bridge"
    val led1 = pipelineOracle(nearPlants = false, fuzzy = true,
      covPct = Some(101), docsWhere = " WHERE doc_id < 250", plants = false,
      extraDocsSql = extras1)
    val led2 = pipelineOracle(nearPlants = false, fuzzy = true,
      covPct = Some(101), plants = false, extraDocsSql = extrasU,
      finalWhere = "\n      WHERE (k.doc_id >= 250 AND k.doc_id < 5000000) OR k.doc_id >= 6000000")
    // batch2's COMMITTED outcomes cannot reuse the union-rebuild
    // restriction (the bridge corpus deliberately breaks the
    // ordered-id contract: batch1 holds 5M-range plants ABOVE batch2's
    // base ids), so the kept set is spelled as the engine's own
    // incremental judge: exact-stage outcomes still agree (no fp group
    // spans batches here), and the near-dup stage re-derives from the
    // SAME exact pair set — in-batch clusters drop WHOLE on any
    // cross-batch state hit, hit-free clusters keep their min id,
    // pairless docs drop iff they themselves hit the state.
    s"""
      WITH RECURSIVE
      t1led AS MATERIALIZED (SELECT doc_id, outcome FROM ($led1) x1),
      t2led AS MATERIALIZED (SELECT doc_id, outcome FROM ($led2) x2),
      corpus AS MATERIALIZED (SELECT doc_id, text FROM documents$extrasU),
      s1 AS (SELECT doc_id FROM t1led
             WHERE outcome IN ('train', 'eval', 'dropped_near_duplicate')),
      c2 AS (SELECT doc_id FROM t2led
             WHERE outcome NOT IN ('dropped_lang', 'dropped_quality', 'dropped_duplicate')),
      surv AS MATERIALIZED (
        SELECT co.doc_id, co.text FROM corpus co JOIN s1 USING (doc_id)
        UNION ALL
        SELECT co.doc_id, co.text FROM corpus co JOIN c2 USING (doc_id)),
      w3 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM surv),
      g3 AS MATERIALIZED (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS ng
             FROM w3, (SELECT unnest(generate_series(1, len(ws) - 2)) AS i)
             WHERE len(ws) >= 3),
      sz3 AS (SELECT doc_id, COUNT(*) AS sz FROM g3 GROUP BY doc_id),
      i3 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
             FROM g3 a JOIN g3 b ON a.ng = b.ng AND a.doc_id < b.doc_id GROUP BY 1, 2),
      pr3 AS MATERIALIZED (SELECT doc_a, doc_b
              FROM i3 JOIN sz3 sa ON sa.doc_id = doc_a JOIN sz3 sb ON sb.doc_id = doc_b
              WHERE inter * 9 >= 4 * (sa.sz + sb.sz)),
      ed3 AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM pr3
              UNION ALL SELECT doc_b AS u, doc_a AS v FROM pr3),
      reach3(u, lab) AS (
        SELECT u, u FROM ed3
        UNION
        SELECT e.u, rr.lab FROM ed3 e JOIN reach3 rr ON rr.u = e.v),
      comp3 AS (SELECT u AS doc_id, MIN(lab) AS cluster_id FROM reach3 GROUP BY u),
      inp AS (SELECT p.doc_a, p.doc_b FROM pr3 p
              JOIN c2 ca ON ca.doc_id = p.doc_a
              JOIN c2 cb ON cb.doc_id = p.doc_b),
      hit AS (SELECT DISTINCT x.doc_id FROM (
                SELECT doc_a AS doc_id, doc_b AS other FROM pr3
                UNION ALL SELECT doc_b AS doc_id, doc_a AS other FROM pr3) x
              JOIN c2 ON c2.doc_id = x.doc_id
              JOIN s1 ON s1.doc_id = x.other),
      ed2 AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM inp
              UNION ALL SELECT doc_b AS u, doc_a AS v FROM inp),
      reach2(u, lab) AS (
        SELECT u, u FROM ed2
        UNION
        SELECT e.u, rr.lab FROM ed2 e JOIN reach2 rr ON rr.u = e.v),
      comp2 AS (SELECT u AS doc_id, MIN(lab) AS cid FROM reach2 GROUP BY u),
      lab2 AS (SELECT c2.doc_id, COALESCE(comp2.cid, c2.doc_id) AS cid
               FROM c2 LEFT JOIN comp2 USING (doc_id)),
      chit AS (SELECT DISTINCT l.cid FROM lab2 l JOIN hit h ON h.doc_id = l.doc_id),
      kept AS (SELECT doc_id FROM t1led WHERE outcome IN ('train', 'eval')
               UNION ALL
               SELECT l.doc_id FROM lab2 l
               WHERE l.doc_id = l.cid
                 AND l.cid NOT IN (SELECT cid FROM chit))
      SELECT kp.doc_id,
             COALESCE(c3.cluster_id, kp.doc_id) AS rebuild_rep,
             CAST(kp.doc_id <> COALESCE(c3.cluster_id, kp.doc_id) AS BIGINT) AS flagged
      FROM kept kp LEFT JOIN comp3 c3 USING (doc_id)""".stripMargin.trim
  }

  def oracleSql: Map[String, String] = oracleSqlBase.updated(
    "q_bpe_merges", bpeMergesOracleSql(8)
  ).updated(
    "q_pipeline_retro_contam", retroContamOracleSql
  ).updated(
    "q_pipeline_retro_neardup", retroNearDupOracleSql
  ).updated(
    // the stats oracle wraps the LEDGER oracle as a derived table, so the
    // two cannot drift on any stage spelling
    "q_pipeline_stats",
    "SELECT outcome, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens FROM (" +
      oracleSqlBase("q_pipeline_curate") + ") GROUP BY outcome"
  ).updated(
    // same wrap for the VERBATIM ledger, tokens-removed total included
    "q_pipeline_stats_verbatim",
    "SELECT outcome, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens, " +
      "CAST(SUM(n_tokens_removed) AS BIGINT) AS n_tokens_removed FROM (" +
      oracleSqlBase("q_pipeline_curate_verbatim") + ") GROUP BY outcome"
  ) ++ Map(
    // the stored-index probes answer the SAME question as their inline
    // twins — identical oracle by definition; a green row here certifies
    // the parquet round-trip of the materialized indexes end to end
    "q_dedup_incr_near_idx" -> "q_dedup_incr_near",
    "q_verbatim_incr_idx" -> "q_verbatim_incr",
    // the hashKey spelling answers the SAME question as the string-keyed
    // q_line_dedup — identical oracle certifies the 8-byte-key trade
    "q_line_dedup_hash" -> "q_line_dedup",
    // the trigram-index probes answer the SAME grep questions as the
    // scan spellings (candidate pruning is recall-free, the verify
    // restores precision) — identical oracles certify it
    "q_grep_freq_idx" -> "q_grep_freq",
    "q_grep_ci_idx" -> "q_grep_ci",
    "q_grep_multi_idx" -> "q_grep_multi",
    "q_grep_regex_idx" -> "q_grep_regex",
    "q_grep_topk_idx" -> "q_grep_topk",
    "q_grep_word_idx" -> "q_grep_word",
    // the graph-ledger probes reconcile base + delta ingests into the
    // SAME edge set the inline build derives (within-order pairing is
    // additive across order partitions) — identical oracles certify
    // the merge-on-read sum and the parquet round-trip
    "q_graph_pagerank_idx" -> "q_graph_pagerank",
    "q_graph_recs_idx" -> "q_graph_recs",
    "q_graph_reach_idx" -> "q_graph_reach",
    // the postings probe ranks through the same bm25Rank core over the
    // same corpus — identical oracle certifies the bucket-pruned
    // round-trip end to end
    "q_search_bm25_idx" -> "q_search_bm25"
  ).map { case (idx, twin) => idx -> oracleSqlBase(twin) }

  /** Builds the curation-ledger oracle variants from ONE spelling of the
    * shared stages (plants → metrics → lang/quality → keeper window),
    * mirroring [[graft.operators.Pipeline.curateOn]]'s flags:
    * `nearPlants` mirrors plantNearDups (one appended token at
    * doc_id + 2_000_000), `fuzzy` inserts the near-dedup stage (the
    * q_split_cluster_safe recursive-component spelling over exact-dedup
    * survivors), `covPct` switches decontamination to the
    * q_decontaminate_cov coverage arithmetic at that threshold.
    */
  /** Shared WITH-prefix of the two DSIR oracles: token → 4096 md5-prefix
    * buckets, add-one-smoothed target/reference ppm ratio per bucket,
    * per-doc occurrence-weighted score — ONE spelling so the weights and
    * resample oracles cannot drift on the scoring arithmetic (mirrors
    * [[graft.operators.Mixture.importanceWeightsOn]]). Ends inside the
    * WITH clause (no trailing comma) so callers append their tail.
    */
  private val dsirScoreSql: String = """
      WITH tok AS (SELECT doc_id, source,
                     unnest(string_split(text, ' ')) AS tok
                   FROM documents),
      b AS (SELECT doc_id, source, substr(md5(tok), 1, 3) AS bkt FROM tok),
      w AS (SELECT bkt,
              CAST((COUNT(CASE WHEN source = 'src0' THEN 1 END) + 1) * 1000000
                // (COUNT(*) + 1) AS BIGINT) AS w_ppm
            FROM b GROUP BY bkt),
      s AS (SELECT doc_id, CAST(SUM(w_ppm) AS BIGINT) AS score_ppm,
                   COUNT(*) AS n_tokens
            FROM b JOIN w USING (bkt) GROUP BY doc_id)"""

  /** Shared per-doc LM cross-entropy CTE (q_lm_score / q_lm_buckets) —
    * the integer bitlen staircase of Lm.lmScoreOn: bitlen via
    * length(bin(x)), vocab capped at 16 by (cnt desc, tok), Laplace +1
    * on the (possibly OOV) count. Ends with `s(doc_id, n_tokens, bits)`.
    */
  private val lmScoreSql: String = """
      WITH ref AS (SELECT unnest(string_split(text, ' ')) AS tok
                   FROM documents WHERE lang = 'en'),
      n AS (SELECT CAST(COUNT(*) AS BIGINT) AS ntot FROM ref),
      v AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM ref
            GROUP BY tok ORDER BY cnt DESC, tok LIMIT 16),
      t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents),
      s AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
              CAST(SUM(CAST(length(bin(n.ntot)) AS BIGINT)
                 - CAST(length(bin(COALESCE(v.cnt, 0) + 1)) AS BIGINT))
                AS BIGINT) AS bits
            FROM t LEFT JOIN v USING (tok) CROSS JOIN n
            GROUP BY t.doc_id)"""

  /** The NB classifier oracle (q_nb_classifier AND its stored twin
    * q_nb_classifier_idx — count merging is exact, so one SQL serves
    * both): bitlen-staircase log-odds over the vocab-16-capped
    * combined stream, division-free decision.
    */
  private val nbClassifierSql: String = """
      WITH tagged AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_pos,
                        unnest(string_split(text, ' ')) AS tok
                      FROM documents),
      tot AS (SELECT CAST(SUM(is_pos) AS BIGINT) AS np,
                     CAST(SUM(1 - is_pos) AS BIGINT) AS nn FROM tagged),
      v AS (SELECT tok, CAST(SUM(is_pos) AS BIGINT) AS cp,
                   CAST(SUM(1 - is_pos) AS BIGINT) AS cn
            FROM tagged GROUP BY tok
            ORDER BY COUNT(*) DESC, tok LIMIT 16),
      w AS (SELECT tok,
              (CAST(length(bin(nn)) AS BIGINT) - CAST(length(bin(cn + 1)) AS BIGINT))
            - (CAST(length(bin(np)) AS BIGINT) - CAST(length(bin(cp + 1)) AS BIGINT))
              AS w
            FROM v CROSS JOIN tot),
      t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents)
      SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(COALESCE(w.w, 0)) AS BIGINT) AS score,
             CAST(CASE WHEN CAST(SUM(COALESCE(w.w, 0)) AS BIGINT) * 100 >= 0
                  THEN 1 ELSE 0 END AS BIGINT) AS label_pos
      FROM t LEFT JOIN w USING (tok)
      GROUP BY t.doc_id""".stripMargin.trim

  /** Shared planted-classifier CTE (q_nb_classifier_planted /
    * q_nb_confusion) — the SQL mirror of Classifier.nbPlantedClassify
    * at vocab 64: zj-prefix drift on 0-based token positions 0,3,…
    * (1-based i%3=1) of doc_id%3 docs, NB bitlen-staircase log-odds
    * trained clean(pos)-vs-mangled(neg) over the drifted stream, every
    * doc scored. Ends with `scored(doc_id, n_tokens, score, label_pos,
    * is_mangled)`.
    */
  private val nbPlantedSql: String = """
      WITH md AS (SELECT doc_id,
                    CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS is_mangled,
                    string_split(text, ' ') AS ws
                  FROM documents),
      st AS (SELECT doc_id, is_mangled,
               CASE WHEN is_mangled = 1 AND i % 3 = 1
                    THEN 'zj' || ws[i] ELSE ws[i] END AS tok
             FROM md, (SELECT unnest(generate_series(1, len(ws))) AS i)),
      tot AS (SELECT CAST(SUM(1 - is_mangled) AS BIGINT) AS np,
                     CAST(SUM(is_mangled) AS BIGINT) AS nn FROM st),
      v AS (SELECT tok, CAST(SUM(1 - is_mangled) AS BIGINT) AS cp,
                   CAST(SUM(is_mangled) AS BIGINT) AS cn
            FROM st GROUP BY tok
            ORDER BY COUNT(*) DESC, tok LIMIT 64),
      w AS (SELECT tok,
              (CAST(length(bin(nn)) AS BIGINT) - CAST(length(bin(cn + 1)) AS BIGINT))
            - (CAST(length(bin(np)) AS BIGINT) - CAST(length(bin(cp + 1)) AS BIGINT))
              AS w
            FROM v CROSS JOIN tot),
      scored AS (SELECT st.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(COALESCE(w.w, 0)) AS BIGINT) AS score,
                   CAST(CASE WHEN CAST(SUM(COALESCE(w.w, 0)) AS BIGINT) * 100 >= 0
                        THEN 1 ELSE 0 END AS BIGINT) AS label_pos,
                   CAST(MAX(st.is_mangled) AS BIGINT) AS is_mangled
                 FROM st LEFT JOIN w USING (tok)
                 GROUP BY st.doc_id)"""

  /** Shared bigram stupid-backoff CTE (q_lm_bigram /
    * q_lm_bigram_buckets) — the SQL mirror of Lm.bigramScoreOn at the
    * driver caps (16/64). Ends with `bs(doc_id, n_tokens, bits,
    * bits_per_100)`.
    */
  private val lmBigramSql: String = """
      WITH refdocs AS (SELECT string_split(text, ' ') AS ws
                       FROM documents WHERE lang = 'en'),
      ref AS (SELECT unnest(ws) AS tok FROM refdocs),
      n AS (SELECT CAST(COUNT(*) AS BIGINT) AS ntot FROM ref),
      v AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM ref
            GROUP BY tok ORDER BY cnt DESC, tok LIMIT 16),
      bg AS (SELECT prev, tok, CAST(COUNT(*) AS BIGINT) AS bcnt
             FROM (SELECT ws[i] AS prev, ws[i + 1] AS tok
                   FROM refdocs,
                     (SELECT unnest(generate_series(1, len(ws) - 1)) AS i)
                   WHERE len(ws) >= 2) pairs
             GROUP BY prev, tok ORDER BY bcnt DESC, prev, tok LIMIT 64),
      t AS (SELECT doc_id, ws[i] AS tok,
              CASE WHEN i > 1 THEN ws[i - 1] END AS prev
            FROM (SELECT doc_id, string_split(text, ' ') AS ws
                  FROM documents) dd,
              (SELECT unnest(generate_series(1, len(ws))) AS i)),
      sc0 AS (SELECT t.doc_id,
               CASE WHEN t.prev IS NULL
                 THEN CAST(length(bin(n.ntot)) AS BIGINT)
                   - CAST(length(bin(COALESCE(v.cnt, 0) + 1)) AS BIGINT)
               WHEN bg.bcnt IS NOT NULL
                 THEN GREATEST(0,
                   CAST(length(bin(COALESCE(vp.cnt, 0) + 1)) AS BIGINT)
                     - CAST(length(bin(bg.bcnt + 1)) AS BIGINT))
               ELSE 2 + CAST(length(bin(n.ntot)) AS BIGINT)
                 - CAST(length(bin(COALESCE(v.cnt, 0) + 1)) AS BIGINT)
               END AS surprise
             FROM t LEFT JOIN v USING (tok)
                    LEFT JOIN v vp ON vp.tok = t.prev
                    LEFT JOIN bg ON bg.prev = t.prev AND bg.tok = t.tok
                    CROSS JOIN n),
      bs AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(surprise) AS BIGINT) AS bits,
               CAST(SUM(surprise) * 100 // COUNT(*) AS BIGINT) AS bits_per_100
             FROM sc0 GROUP BY doc_id)"""

  /** The q_mixture_curated oracle, shared verbatim with q_corpus_build
    * (which wraps it as a derived table before the packing window) so
    * the composed tail cannot drift from the standalone mixture.
    */
  private lazy val mixtureCuratedSql: String = ("""
      WITH t AS (SELECT d.doc_id, d.source,
                   md5(regexp_replace(trim(lower(d.text)), '\s+', ' ', 'g')) AS key
                 FROM documents d
                 JOIN (""" + pipelineOracle(
                   nearPlants = false, fuzzy = false, covPct = Some(40)) + """) led
                   ON led.doc_id = d.doc_id
                 WHERE led.outcome = 'train'),
      q AS (SELECT source,
              LEAST(COUNT(*), CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) * 4) AS quota
            FROM t GROUP BY source),
      r AS (SELECT doc_id, source,
              CAST(ROW_NUMBER() OVER (PARTITION BY source
                ORDER BY key, doc_id) AS BIGINT) AS rk
            FROM t)
      SELECT r.doc_id, r.source, r.rk
      FROM r JOIN q USING (source) WHERE r.rk <= q.quota""").stripMargin.trim

  private def pipelineOracle(nearPlants: Boolean, fuzzy: Boolean,
                             covPct: Option[Int],
                             blockTerms: Option[Seq[String]] = None,
                             verbatim: Boolean = false,
                             plantFromSql: String = "",
                             finalWhere: String = "",
                             surfaceText: Boolean = false,
                             quotePlants: Boolean = false,
                             docsWhere: String = "",
                             plants: Boolean = true,
                             extraDocsSql: String = ""): String = {
    // `docsWhere` restricts the input corpus itself (the retro oracle's
    // batch1-only rebuild); `plants = false` drops the exact-dup plant
    // too (CurateState.init judges the raw batch — no plants at all)
    // stage 1b: whole-token case-insensitive blocklist — list_has_any
    // over the lowered token list is DuckDB's spelling of Spark's
    // arrays_overlap (equivalence of the two engine spellings is
    // additionally certified by q_blocklist)
    val blockOkSql = blockTerms match {
      case None => "TRUE AS block_ok"
      case Some(terms) =>
        val lst = terms.map(t => s"'${t.toLowerCase}'").mkString(", ")
        s"(NOT list_has_any(string_split(lower(text), ' '), [$lst])) AS block_ok"
    }
    val nearPlantSql =
      if (!nearPlants) ""
      else s"""
                 UNION ALL
                 SELECT doc_id + 2000000 AS doc_id, text || ' plantedneardup' AS text
                 FROM documents WHERE doc_id % 11 = 3$plantFromSql"""
    // the quote plant: first 25 tokens of the source + the stopword
    // scaffold + 22 deterministic fillers — shares a >= 20-token run
    // with its source at 3-gram Jaccard far below 0.8 (mirrors
    // Pipeline.curateOn plantQuotes exactly; slice semantics agree:
    // Spark slice(a,1,25) == DuckDB a[1:25], both truncating)
    val quotePlantSql =
      if (!quotePlants) ""
      else s"""
                 UNION ALL
                 SELECT doc_id + 3000000 AS doc_id,
                        array_to_string(
                          list_concat(list_concat(
                            string_split(text, ' ')[1:25],
                            ['the','and','of','to','in','a','is','was']),
                            list_transform(range(1, 23),
                              j -> 'fq' || CAST(doc_id AS VARCHAR) || 'x' || CAST(j AS VARCHAR))),
                          ' ') AS text
                 FROM documents WHERE doc_id % 13 = 5$plantFromSql"""
    val shared = s"""
      WITH RECURSIVE
      d AS (SELECT doc_id, text FROM documents$docsWhere${
      if (plants) s"""
                 UNION ALL
                 SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0$plantFromSql"""
      else ""}$nearPlantSql$quotePlantSql$extraDocsSql),
      m AS (SELECT doc_id, text,
        md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_types,
        CAST(len(list_filter(string_split(text, ' '), x -> list_contains(['the','a','of','and','is'], x))) AS BIGINT) AS n_stop,
        len(list_filter(string_split(text, ' '), x -> list_contains(['le','la','les','de','et'], x))) AS h_fr,
        len(list_filter(string_split(text, ' '), x -> list_contains(['der','die','das','und','ist'], x))) AS h_de,
        len(list_filter(string_split(text, ' '), x -> list_contains(['el','los','las','y','es'], x))) AS h_es,
        CAST(len(replace(text, ' ', '')) AS BIGINT) AS char_len,
        CAST(GREATEST(len(string_split(text, ' ')) - 2, 0) AS BIGINT) AS n_grams
        FROM d),
      gg AS (SELECT doc_id,
              CAST(COUNT(DISTINCT ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS BIGINT) AS ndg
            FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM d) w,
                 (SELECT unnest(generate_series(1, len(ws) - 2)) AS i)
            WHERE len(ws) >= 3 GROUP BY doc_id),
      r AS (SELECT m.doc_id, m.text, m.fp,
              CASE
                WHEN regexp_matches(text, '[\\x{3040}-\\x{30ff}]') THEN 'ja'
                WHEN regexp_matches(text, '[\\x{ac00}-\\x{d7af}]') THEN 'ko'
                WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
                WHEN n_stop = greatest(n_stop, h_fr, h_de, h_es) AND n_stop > 0 THEN 'en'
                WHEN h_fr = greatest(n_stop, h_fr, h_de, h_es) AND h_fr > 0 THEN 'fr'
                WHEN h_de = greatest(n_stop, h_fr, h_de, h_es) AND h_de > 0 THEN 'de'
                WHEN h_es = greatest(n_stop, h_fr, h_de, h_es) AND h_es > 0 THEN 'es'
                ELSE 'und' END AS lang_guess,
              n_tokens,
              n_types * 100 // n_tokens AS ttr_pct,
              n_stop * 100 // n_tokens AS stop_pct,
              char_len * 100 // n_tokens AS mean_tok_len_x100,
              CASE WHEN n_grams > 0
                   THEN (n_grams - COALESCE(ndg, 0)) * 100 // n_grams
                   ELSE CAST(0 AS BIGINT) END AS rep_pct
            FROM m LEFT JOIN gg ON m.doc_id = gg.doc_id),
      s AS (SELECT *,
              (lang_guess = 'en') AS lang_ok,
              $blockOkSql,
              (n_tokens >= 20 AND mean_tok_len_x100 BETWEEN 300 AND 1000
                AND stop_pct >= 3 AND ttr_pct >= 40 AND rep_pct <= 2) AS quality_ok
            FROM r),
      k AS (SELECT *,
              MIN(CASE WHEN lang_ok AND block_ok AND quality_ok THEN doc_id END)
                OVER (PARTITION BY fp) AS keeper_id
            FROM s)"""
    // survivor set entering stages 4-5: exact-dedup survivors, minus the
    // near-dup cluster losers when the fuzzy stage is on
    val (survivorSql, nearJoin, nearCase) =
      if (!fuzzy)
        ("""
      sv AS (SELECT doc_id, fp, text,
               CASE WHEN fp < 'cc' THEN 'train' ELSE 'eval' END AS split
             FROM k WHERE lang_ok AND block_ok AND quality_ok AND doc_id = keeper_id)""",
          "", "")
      else
        ("""
      es AS (SELECT doc_id, fp, text FROM k
             WHERE lang_ok AND block_ok AND quality_ok AND doc_id = keeper_id),
      w2 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM es),
      g2 AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS ng
            FROM w2, (SELECT unnest(generate_series(1, len(ws) - 2)) AS i)
            WHERE len(ws) >= 3),
      sz2 AS (SELECT doc_id, COUNT(*) AS sz FROM g2 GROUP BY doc_id),
      i2 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
                FROM g2 a JOIN g2 b ON a.ng = b.ng AND a.doc_id < b.doc_id GROUP BY 1, 2),
      pr AS (SELECT doc_a, doc_b
                FROM i2 JOIN sz2 sa ON sa.doc_id = doc_a JOIN sz2 sb ON sb.doc_id = doc_b
                WHERE inter * 9 >= 4 * (sa.sz + sb.sz)),
      ed AS (SELECT doc_a AS u, doc_b AS v FROM pr
                UNION ALL SELECT doc_b AS u, doc_a AS v FROM pr),
      reach(u, lab) AS (
        SELECT u, u FROM ed
        UNION
        SELECT e.u, rr.lab FROM ed e JOIN reach rr ON rr.u = e.v),
      nd AS (SELECT u AS doc_id FROM reach GROUP BY u HAVING MIN(lab) <> u),
      sv AS (SELECT es.doc_id, es.fp, es.text,
               CASE WHEN es.fp < 'cc' THEN 'train' ELSE 'eval' END AS split
             FROM es LEFT JOIN nd ON nd.doc_id = es.doc_id
             WHERE nd.doc_id IS NULL)""",
          " LEFT JOIN nd nd2 ON k.doc_id = nd2.doc_id",
          """
                  WHEN nd2.doc_id IS NOT NULL THEN 'dropped_near_duplicate'""")
    val contamSql = covPct match {
      case None => """
      ct AS (SELECT DISTINCT doc_id FROM sg JOIN ev USING (ng) WHERE split = 'train')"""
      case Some(pct) => s"""
      szd AS (SELECT doc_id, COUNT(*) AS n_ngrams FROM sg WHERE split = 'train' GROUP BY doc_id),
      hit AS (SELECT sg.doc_id, COUNT(*) AS n_shared
              FROM sg JOIN ev USING (ng) WHERE split = 'train' GROUP BY sg.doc_id),
      ct AS (SELECT hit.doc_id FROM hit JOIN szd USING (doc_id)
             WHERE n_shared * 100 // n_ngrams >= $pct)"""
    }
    // stage 3c (verbatim=true): the q_verbatim_clean oracle spelling —
    // positional trigrams, occurrence cap, islands per (pair, diag),
    // >= 20-token spans cut from the higher-id doc after an interval
    // merge — run over the SURVIVOR set (sv) instead of documents; the
    // downstream contamination n-grams (sg) then read the CLEANED text
    val verbatimSql =
      if (!verbatim) ""
      else """
      vw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM sv),
      vg AS (SELECT doc_id, i AS pos, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS ng
             FROM vw, (SELECT unnest(generate_series(1, len(ws) - 2)) AS i)
             WHERE len(ws) >= 3),
      vf AS (SELECT ng, COUNT(*) AS occ FROM vg GROUP BY ng),
      vgc AS (SELECT vg.doc_id, vg.pos, vg.ng FROM vg JOIN vf USING (ng) WHERE occ <= 1000),
      vm AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    a.pos AS pos_a, a.pos - b.pos AS diag
             FROM vgc a JOIN vgc b ON a.ng = b.ng AND a.doc_id < b.doc_id),
      vruns AS (SELECT doc_a, doc_b, diag, pos_a,
                     pos_a - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, diag
                                                ORDER BY pos_a) AS grp
             FROM vm),
      vsp AS (SELECT doc_b AS doc_id,
                     MIN(pos_a) - 1 - diag AS s0,
                     MIN(pos_a) - 1 - diag + COUNT(*) + 2 AS e0
              FROM vruns GROUP BY doc_a, doc_b, diag, grp
              HAVING COUNT(*) + 2 >= 20),
      vo AS (SELECT doc_id, s0, e0,
                    MAX(e0) OVER (PARTITION BY doc_id ORDER BY s0, e0
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
             FROM vsp),
      vg2 AS (SELECT doc_id, s0, e0,
                     SUM(CASE WHEN pm IS NULL OR s0 > pm THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY s0, e0) AS gid
              FROM vo),
      vmrg AS (SELECT doc_id, MIN(s0) AS s0, MAX(e0) AS e0 FROM vg2 GROUP BY doc_id, gid),
      vtok AS (SELECT doc_id, ws[i] AS tok, i - 1 AS pos
               FROM vw, (SELECT unnest(generate_series(1, len(ws))) AS i)),
      vkept AS (SELECT t.doc_id, t.pos, t.tok
                FROM vtok t LEFT JOIN vmrg ON vmrg.doc_id = t.doc_id
                                          AND t.pos >= vmrg.s0 AND t.pos < vmrg.e0
                WHERE vmrg.doc_id IS NULL),
      vcln AS (SELECT sv.doc_id, sv.split,
                      COALESCE(vkc.text, '') AS text,
                      CAST(vcnt.n_toks - COALESCE(vkc.n_kept, 0) AS BIGINT) AS n_removed
               FROM sv
               JOIN (SELECT doc_id, COUNT(*) AS n_toks FROM vtok GROUP BY doc_id) vcnt
                 USING (doc_id)
               LEFT JOIN (SELECT doc_id,
                                 COALESCE(string_agg(tok, ' ' ORDER BY pos), '') AS text,
                                 COUNT(*) AS n_kept
                          FROM vkept GROUP BY doc_id) vkc USING (doc_id)),"""
    val gramSource = if (verbatim) "vcln" else "sv"
    // surfaceText: a WRAPPING stage (the full-recipe classifier/ppl)
    // needs the text its engine twin scores — the CLEANED survivor text
    // — as a ledger column it can tokenize; the wrapper must project
    // eff_text away before the final compare
    val effTextCol =
      if (!surfaceText) ""
      else if (verbatim) ",\n             COALESCE(vc2.text, '') AS eff_text"
      else ",\n             k.text AS eff_text"
    val (removedCol, removedJoin) =
      if (!verbatim) ("", "")
      else (""",
             CAST(COALESCE(vc2.n_removed, 0) AS BIGINT) AS n_tokens_removed""",
        " LEFT JOIN vcln vc2 ON k.doc_id = vc2.doc_id")
    (shared + "," + survivorSql + "," + verbatimSql + s"""
      sg AS (SELECT DISTINCT doc_id, split, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS ng
             FROM (SELECT doc_id, split, string_split(text, ' ') AS ws FROM $gramSource) w,
                  (SELECT unnest(generate_series(1, len(ws) - 2)) AS i)
             WHERE len(ws) >= 3),
      ev AS (SELECT DISTINCT ng FROM sg WHERE split = 'eval'),""" + contamSql + s"""
      SELECT k.doc_id, k.n_tokens,
             CASE WHEN NOT lang_ok THEN 'dropped_lang'
                  WHEN NOT block_ok THEN 'dropped_blocklist'
                  WHEN NOT quality_ok THEN 'dropped_quality'
                  WHEN k.doc_id <> keeper_id THEN 'dropped_duplicate'$nearCase
                  WHEN ct.doc_id IS NOT NULL THEN 'dropped_contaminated'
                  WHEN fp < 'cc' THEN 'train'
                  ELSE 'eval' END AS outcome$removedCol$effTextCol
      FROM k$nearJoin LEFT JOIN ct ON k.doc_id = ct.doc_id$removedJoin$finalWhere""").stripMargin.trim
  }

  private lazy val oracleSqlBase: Map[String, String] = Map(
    "q_grep_freq" ->
      "SELECT text AS line, count(*) AS freq FROM documents WHERE text LIKE '%spark%' GROUP BY text",
    "q_grep_regex" ->
      "SELECT text AS line, count(*) AS freq FROM documents WHERE regexp_matches(text, 've[ck]tor') GROUP BY text",
    "q_grep_ci" ->
      "SELECT text AS line, count(*) AS freq FROM documents WHERE lower(text) LIKE '%spark%' GROUP BY text",
    "q_grep_multi" ->
      "SELECT text AS line, count(*) AS freq FROM documents WHERE text LIKE '%vector%' OR text LIKE '%stream%' GROUP BY text",
    "q_grep_topk" ->
      "SELECT text AS line, count(*) AS freq FROM documents WHERE text LIKE '%spark%' GROUP BY text ORDER BY freq DESC, line ASC LIMIT 10",
    "q_grep_word" ->
      """SELECT text AS line, count(*) AS freq FROM documents WHERE regexp_matches(text, '\ba\b') GROUP BY text""",
    "q_grep_invert" ->
      "SELECT text AS line, count(*) AS freq FROM documents WHERE text NOT LIKE '%spark%' GROUP BY text",
    // per-occurrence counting: same length arithmetic both engines
    // (non-overlapping replace, integer division — exact, |pattern|
    // always divides the length delta)
    "q_grep_occ" -> ("""
      SELECT text AS line, count(*) AS freq,
             (length(text) - length(replace(text, 'spark', ''))) // 5 AS occ,
             ((length(text) - length(replace(text, 'spark', ''))) // 5) * count(*) AS total_occ
      FROM documents WHERE contains(text, 'spark') GROUP BY text""".stripMargin.trim),
    "q_grep_counts" ->
      "SELECT source AS file, count(*) FILTER (WHERE text LIKE '%vector%') AS n_match FROM documents GROUP BY source",
    "q_grep_files" ->
      "SELECT DISTINCT source AS file FROM documents WHERE text LIKE '%dup%'",
    "q_grep_context" -> ("""
      SELECT file, line_no, line, is_match FROM (
        SELECT source AS file, doc_id AS line_no, text AS line,
               CAST(CASE WHEN text LIKE '%dup%' THEN 1 ELSE 0 END AS BIGINT) AS is_match,
               max(CASE WHEN text LIKE '%dup%' THEN 1 ELSE 0 END)
                 OVER (PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS ctx
        FROM documents)
      WHERE ctx = 1""".stripMargin.trim),
    // Money/quantity sums surface as integer minor units (BIGINT): decimal
    // internally for exact associative math, *100 (or *10000) cast to
    // BIGINT at the boundary — integer outputs are representation-stable
    // across engines, DECIMAL serialization is not.
    "q_pricing_summary" -> ("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_base_price,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS sum_disc_price,
             COUNT(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      GROUP BY l_returnflag, l_linestatus""".stripMargin.trim),
    "q_revenue_by_nation" -> ("""
      SELECT n_name,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS revenue,
             COUNT(*) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name""".stripMargin.trim),
    "q_ship_priority" -> ("""
      SELECT l_orderkey, o_orderdate,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin.trim),
    "q_returned_top" -> ("""
      SELECT c_custkey, c_name, n_name,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS acctbal_cents,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1997-07-01'
      GROUP BY c_custkey, c_name, n_name, c_acctbal
      ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin.trim),
    "q_top_orders_window" -> ("""
      SELECT o_custkey, o_orderkey, rn FROM (
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders) t WHERE rn <= 2""".stripMargin.trim),
    "q_cust_no_orders" ->
      "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')",
    "q_cust_order_stats" -> ("""
      SELECT c_custkey,
             COALESCE(n_orders, CAST(0 AS BIGINT)) AS n_orders,
             COALESCE(total_cents, CAST(0 AS BIGINT)) AS total_cents
      FROM customer LEFT JOIN (
        SELECT o_custkey, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_cents
        FROM orders GROUP BY o_custkey) o ON c_custkey = o_custkey""".stripMargin.trim),
    "q_cust_activity_full" -> ("""
      WITH o AS (SELECT o_custkey AS key, COUNT(*) AS n_orders FROM orders GROUP BY 1),
      e AS (SELECT user_id AS key, COUNT(*) AS n_events FROM events GROUP BY 1)
      SELECT COALESCE(o.key, e.key) AS key,
             COALESCE(n_orders, CAST(0 AS BIGINT)) AS n_orders,
             COALESCE(n_events, CAST(0 AS BIGINT)) AS n_events
      FROM o FULL JOIN e ON o.key = e.key""".stripMargin.trim),
    "q_cust_big_orders" ->
      "SELECT c_custkey, c_mktsegment FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400.0)",
    "q_lineitem_rollup" -> ("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty,
             COUNT(*) AS n
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin.trim),
    "q_lineitem_cube" -> ("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty,
             COUNT(*) AS n
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin.trim),
    "q_active_positive" -> ("""
      SELECT o_custkey AS custkey FROM orders
      INTERSECT
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0""".stripMargin.trim),
    "q_revenue_by_region" -> ("""
      SELECT r_name,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS revenue,
             COUNT(*) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name""".stripMargin.trim),
    "q_part_type_revenue" -> ("""
      SELECT p_type,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS revenue,
             COUNT(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_type""".stripMargin.trim),
    "q_supplier_nation_volume" -> ("""
      SELECT n_name,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty,
             COUNT(*) AS n_items
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name""".stripMargin.trim),
    "q_union_big_or_debt" -> ("""
      SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000.0
      UNION
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0""".stripMargin.trim),
    "q_except_small_only" -> ("""
      SELECT o_custkey AS custkey FROM orders
      EXCEPT
      SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000.0""".stripMargin.trim),
    "q_token_freq" -> ("""
      SELECT tok, COUNT(*) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
      GROUP BY tok ORDER BY freq DESC, tok ASC LIMIT 20""".stripMargin.trim),
    "q_ngram_docfreq" -> ("""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      g AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS ng
            FROM w, (SELECT unnest(generate_series(1, len(ws) - 2)) AS i)
            WHERE len(ws) >= 3)
      SELECT ng, COUNT(*) AS df FROM g
      GROUP BY ng ORDER BY df DESC, ng ASC LIMIT 20""".stripMargin.trim),
    "q_lang_hist" -> ("""
      WITH h AS (SELECT text,
        len(list_filter(string_split(text, ' '), x -> list_contains(['the','a','of','and','is'], x))) AS h_en,
        len(list_filter(string_split(text, ' '), x -> list_contains(['le','la','les','de','et'], x))) AS h_fr,
        len(list_filter(string_split(text, ' '), x -> list_contains(['der','die','das','und','ist'], x))) AS h_de,
        len(list_filter(string_split(text, ' '), x -> list_contains(['el','los','las','y','es'], x))) AS h_es
        FROM documents),
      g AS (SELECT CASE
        WHEN regexp_matches(text, '[\x{3040}-\x{30ff}]') THEN 'ja'
        WHEN regexp_matches(text, '[\x{ac00}-\x{d7af}]') THEN 'ko'
        WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        WHEN h_en = greatest(h_en, h_fr, h_de, h_es) AND h_en > 0 THEN 'en'
        WHEN h_fr = greatest(h_en, h_fr, h_de, h_es) AND h_fr > 0 THEN 'fr'
        WHEN h_de = greatest(h_en, h_fr, h_de, h_es) AND h_de > 0 THEN 'de'
        WHEN h_es = greatest(h_en, h_fr, h_de, h_es) AND h_es > 0 THEN 'es'
        ELSE 'und' END AS lang_guess FROM h)
      SELECT lang_guess, COUNT(*) AS n FROM g GROUP BY lang_guess""".stripMargin.trim),
    "q_quality" -> ("""
      WITH m AS (SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_types,
        CAST(len(list_filter(string_split(text, ' '), x -> list_contains(['the','a','of','and','is'], x))) AS BIGINT) AS n_stop,
        CAST(len(replace(text, ' ', '')) AS BIGINT) AS char_len
        FROM documents)
      SELECT doc_id, n_tokens,
             n_types * 100 // n_tokens AS ttr_pct,
             n_stop * 100 // n_tokens AS stop_pct,
             char_len * 100 // n_tokens AS mean_tok_len_x100
      FROM m""".stripMargin.trim),
    // rule thresholds mirror TextAnalysis.qualityFilter verbatim
    "q_quality_filter" -> ("""
      WITH m AS (SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_types,
        CAST(len(list_filter(string_split(text, ' '), x -> list_contains(['the','a','of','and','is'], x))) AS BIGINT) AS n_stop,
        CAST(len(replace(text, ' ', '')) AS BIGINT) AS char_len,
        CAST(GREATEST(len(string_split(text, ' ')) - 2, 0) AS BIGINT) AS n_grams
        FROM documents),
      w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      g AS (SELECT doc_id,
              CAST(COUNT(DISTINCT ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS BIGINT) AS ndg
            FROM w, (SELECT unnest(generate_series(1, len(ws) - 2)) AS i)
            WHERE len(ws) >= 3 GROUP BY doc_id),
      r AS (SELECT m.doc_id, n_tokens,
              n_types * 100 // n_tokens AS ttr_pct,
              n_stop * 100 // n_tokens AS stop_pct,
              char_len * 100 // n_tokens AS mean_tok_len_x100,
              CASE WHEN n_grams > 0
                   THEN (n_grams - COALESCE(ndg, 0)) * 100 // n_grams
                   ELSE CAST(0 AS BIGINT) END AS rep_pct
            FROM m LEFT JOIN g ON m.doc_id = g.doc_id)
      SELECT doc_id, n_tokens, ttr_pct, stop_pct, mean_tok_len_x100, rep_pct,
             CAST(CASE WHEN n_tokens >= 20
                        AND mean_tok_len_x100 BETWEEN 300 AND 1000
                        AND stop_pct >= 3 AND ttr_pct >= 40 AND rep_pct <= 2
                  THEN 1 ELSE 0 END AS BIGINT) AS keep
      FROM r""".stripMargin.trim),
    // direct single-window spelling — the engine computes the same
    // prefix blockwise (see TextAnalysis.tokenShards; equality asserted)
    "q_token_shards" -> ("""
      WITH t AS (SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                 FROM documents),
      r AS (SELECT doc_id, n_tokens,
              COALESCE(CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                CAST(0 AS BIGINT)) AS pre
            FROM t)
      SELECT doc_id, n_tokens, CAST(pre // 5000 AS BIGINT) AS shard FROM r""".stripMargin.trim),
    "q_token_stats" -> ("""
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
             CAST(SUM(len(list_distinct(string_split(text, ' ')))) AS BIGINT) AS n_types
      FROM documents GROUP BY source""".stripMargin.trim),
    "q_fingerprint" -> ("""
      SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint
      FROM documents""".stripMargin.trim),
    // occurrence-preserving n-grams (duplicates kept): unigrams via
    // unnest(split), bigrams via a positional list comprehension — MAX of
    // count*len is value-based so ties are harmless; aggregates cast to
    // BIGINT before the integer division (SUM widens to HUGEINT). The
    // tot_chars > 0 CASE mirrors the engine's zero-denominator guard:
    // an empty doc yields one zero-length unigram → share 0 by convention
    // the engine answers this with an O(k)-state sketch + recount; the
    // oracle is the unbounded spelling both must equal exactly
    "q_heavy_hitters" -> ("""
      WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      n AS (SELECT CAST(COUNT(*) AS BIGINT) AS ntot FROM tok)
      SELECT tok, COUNT(*) AS n
      FROM tok GROUP BY tok
      HAVING COUNT(*) * 101 > (SELECT ntot FROM n)""".stripMargin.trim),
    "q_heavy_hitters_src" -> ("""
      WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok
                   FROM documents),
      n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ntot
            FROM tok GROUP BY source)
      SELECT t.source, t.tok, COUNT(*) AS n
      FROM tok t JOIN n USING (source)
      GROUP BY t.source, t.tok, n.ntot
      HAVING COUNT(*) * 101 > n.ntot""".stripMargin.trim),
    // plain per-source ROW_NUMBER — equal to the engine's banded exact
    // rank because both order by (md5 hex, doc_id)
    "q_source_cap" -> ("""
      WITH r AS (SELECT doc_id, source,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                               doc_id) AS rk
                 FROM documents)
      SELECT doc_id, source FROM r WHERE rk <= 100""".stripMargin.trim),
    // conjunctive arity via per-doc matched-term count; same integer
    // idf scaling as q_tfidf_terms
    "q_search_rank" -> ("""
      WITH nd AS (SELECT COUNT(*) AS n_docs FROM documents),
      tf AS (SELECT doc_id, tok AS term, COUNT(*) AS tf
             FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                   FROM documents)
             WHERE tok IN ('spark', 'join') GROUP BY 1, 2),
      dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      sc AS (SELECT doc_id,
                    CAST(SUM(tf * ((SELECT n_docs FROM nd) * 1000 // df)) AS BIGINT) AS score,
                    COUNT(*) AS nt
             FROM tf JOIN dfq USING (term) GROUP BY doc_id)
      SELECT doc_id, score FROM sc WHERE nt = 2
      ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin.trim),
    // BM25 milli fixed-point: every DIV (// here) truncates at the same
    // point as the engine's spelling, so scores are bit-identical
    "q_search_bm25" -> ("""
      WITH dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
                  FROM documents),
      tot AS (SELECT COUNT(*) AS n_docs,
                     (SUM(dl) * 1000) // COUNT(*) AS avgdl_milli FROM dl),
      tf AS (SELECT doc_id, tok AS term, COUNT(*) AS tf
             FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                   FROM documents)
             WHERE tok IN ('spark', 'join') GROUP BY 1, 2),
      dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      nm AS (SELECT tf.doc_id, tf.tf, dfq.df, tot.n_docs,
                    250 + (750 * ((dl.dl * 1000000) // tot.avgdl_milli)) // 1000 AS norm_milli
             FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id), tot),
      sc AS (SELECT doc_id,
                    SUM(((n_docs * 1000) // df) *
                        ((tf * 2200 * 1000) //
                         (tf * 1000 + (1200 * norm_milli) // 1000))) AS score,
                    COUNT(*) AS nt
             FROM nm GROUP BY 1)
      SELECT doc_id, CAST(score AS BIGINT) AS score FROM sc WHERE nt = 2
      ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin.trim),
    // the disjunctive spelling: same fixed-point pipeline, no arity gate
    "q_search_bm25_any" -> ("""
      WITH dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
                  FROM documents),
      tot AS (SELECT COUNT(*) AS n_docs,
                     (SUM(dl) * 1000) // COUNT(*) AS avgdl_milli FROM dl),
      tf AS (SELECT doc_id, tok AS term, COUNT(*) AS tf
             FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                   FROM documents)
             WHERE tok IN ('spark', 'join') GROUP BY 1, 2),
      dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      nm AS (SELECT tf.doc_id, tf.tf, dfq.df, tot.n_docs,
                    250 + (750 * ((dl.dl * 1000000) // tot.avgdl_milli)) // 1000 AS norm_milli
             FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id), tot),
      sc AS (SELECT doc_id,
                    SUM(((n_docs * 1000) // df) *
                        ((tf * 2200 * 1000) //
                         (tf * 1000 + (1200 * norm_milli) // 1000))) AS score
             FROM nm GROUP BY 1)
      SELECT doc_id, CAST(score AS BIGINT) AS score FROM sc
      ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin.trim),
    // adjacent-bigram phrase count: the oracle folds the same
    // start-position conjunction as a list lambda (1-based, like the
    // engine's element_at); overlapping occurrences count per start
    "q_search_phrase" -> ("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      c AS (SELECT doc_id,
                   CAST(len(list_filter(range(1, len(l)),
                     i -> l[i] = 'spark' AND l[i+1] = 'join')) AS BIGINT) AS n_occ
            FROM t)
      SELECT doc_id, n_occ FROM c WHERE n_occ > 0
      ORDER BY n_occ DESC, doc_id ASC LIMIT 10""".stripMargin.trim),
    // the stored positional twin shares the scan spelling's oracle
    "q_search_phrase_idx" -> ("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      c AS (SELECT doc_id,
                   CAST(len(list_filter(range(1, len(l)),
                     i -> l[i] = 'spark' AND l[i+1] = 'join')) AS BIGINT) AS n_occ
            FROM t)
      SELECT doc_id, n_occ FROM c WHERE n_occ > 0
      ORDER BY n_occ DESC, doc_id ASC LIMIT 10""".stripMargin.trim),
    // weighted-Jaccard similarity: the same edge bag + weighted-degree
    // frame, integer DIV at the same point
    "q_graph_sim" -> ("""
      WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS w
            FROM lines a JOIN lines b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2),
      deg AS (SELECT p, SUM(w) AS wdeg FROM
                (SELECT pa AS p, w FROM e UNION ALL SELECT pb, w FROM e)
              GROUP BY 1)
      SELECT e.pa AS part_a, e.pb AS part_b, CAST(e.w AS BIGINT) AS w,
             CAST((e.w * 1000000) // (da.wdeg + db.wdeg - e.w) AS BIGINT)
               AS sim_ppm
      FROM e JOIN deg da ON da.p = e.pa JOIN deg db ON db.p = e.pb
      ORDER BY sim_ppm DESC, part_a ASC, part_b ASC LIMIT 50""".stripMargin.trim),
    // exact components: min label over the recursive reachability
    // closure — DuckDB's WITH RECURSIVE dedups the (node, label) pair
    // stream, so the closure is component-bounded, never a path walk
    "q_graph_components" -> ("""
      WITH RECURSIVE lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      e AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
            FROM lines a JOIN lines b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      d AS (SELECT pa AS src, pb AS dst FROM e
            UNION ALL SELECT pb, pa FROM e),
      reach(node, label) AS (
        SELECT src AS node, src AS label FROM (SELECT DISTINCT src FROM d)
        UNION
        SELECT d.dst, r.label FROM reach r JOIN d ON d.src = r.node)
      SELECT node AS part, CAST(MIN(label) AS BIGINT) AS component
      FROM reach GROUP BY 1""".stripMargin.trim),
    // 5 unrolled min-label BSP rounds; self-loops fold keep-own-label
    // into the same neighbor-min aggregate — bit-identical by
    // construction (pure integer MIN)
    "q_graph_labelprop" -> ("""
      WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      e AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
            FROM lines a JOIN lines b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      d AS (SELECT pa AS src, pb AS dst FROM e
            UNION ALL SELECT pb, pa FROM e),
      n AS (SELECT DISTINCT src FROM d),
      a AS (SELECT src, dst FROM d UNION ALL SELECT src, src FROM n),
      l0 AS (SELECT src AS node, src AS label FROM n),
      l1 AS (SELECT a.dst AS node, MIN(l.label) AS label
             FROM a JOIN l0 l ON a.src = l.node GROUP BY 1),
      l2 AS (SELECT a.dst AS node, MIN(l.label) AS label
             FROM a JOIN l1 l ON a.src = l.node GROUP BY 1),
      l3 AS (SELECT a.dst AS node, MIN(l.label) AS label
             FROM a JOIN l2 l ON a.src = l.node GROUP BY 1),
      l4 AS (SELECT a.dst AS node, MIN(l.label) AS label
             FROM a JOIN l3 l ON a.src = l.node GROUP BY 1),
      l5 AS (SELECT a.dst AS node, MIN(l.label) AS label
             FROM a JOIN l4 l ON a.src = l.node GROUP BY 1)
      SELECT node, CAST(label AS BIGINT) AS label FROM l5""".stripMargin.trim),
    // the oracle builds the same co-purchase bag through an orderkey
    // equi-self-join; the engine never self-joins the fact table
    "q_graph_edges" -> ("""
      WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS w
      FROM lines a JOIN lines b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2""".stripMargin.trim),
    // 5 unrolled synchronous steps, per-edge integer truncation —
    // bit-identical to the engine's loop by construction
    "q_graph_pagerank" -> ("""
      WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS w
            FROM lines a JOIN lines b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2),
      d AS (SELECT pa AS src, pb AS dst, w FROM e
            UNION ALL SELECT pb, pa, w FROM e),
      deg AS (SELECT src, SUM(w) AS wdeg FROM d GROUP BY 1),
      r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
      r1 AS (SELECT d.dst AS node,
                    150000 + SUM((850 * r.r * d.w) // (1000 * deg.wdeg)) AS r
             FROM d JOIN r0 r ON d.src = r.node JOIN deg ON deg.src = d.src
             GROUP BY 1),
      r2 AS (SELECT d.dst AS node,
                    150000 + SUM((850 * r.r * d.w) // (1000 * deg.wdeg)) AS r
             FROM d JOIN r1 r ON d.src = r.node JOIN deg ON deg.src = d.src
             GROUP BY 1),
      r3 AS (SELECT d.dst AS node,
                    150000 + SUM((850 * r.r * d.w) // (1000 * deg.wdeg)) AS r
             FROM d JOIN r2 r ON d.src = r.node JOIN deg ON deg.src = d.src
             GROUP BY 1),
      r4 AS (SELECT d.dst AS node,
                    150000 + SUM((850 * r.r * d.w) // (1000 * deg.wdeg)) AS r
             FROM d JOIN r3 r ON d.src = r.node JOIN deg ON deg.src = d.src
             GROUP BY 1),
      r5 AS (SELECT d.dst AS node,
                    150000 + SUM((850 * r.r * d.w) // (1000 * deg.wdeg)) AS r
             FROM d JOIN r4 r ON d.src = r.node JOIN deg ON deg.src = d.src
             GROUP BY 1)
      SELECT node, CAST(r AS BIGINT) AS rank_ppm FROM r5""".stripMargin.trim),
    // id-ordered triangle enumeration (x < y < z) counts each triangle
    // once — the engine's degree-ordered orientation yields the same bag
    "q_graph_triangles" -> ("""
      WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      e AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
            FROM lines a JOIN lines b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      deg AS (SELECT node, COUNT(*) AS deg FROM
                (SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
              GROUP BY 1),
      t AS (SELECT e1.pa AS x, e1.pb AS y, e2.pb AS z
            FROM e e1
            JOIN e e2 ON e1.pa = e2.pa AND e1.pb < e2.pb
            JOIN e e3 ON e3.pa = e1.pb AND e3.pb = e2.pb),
      pn AS (SELECT node, COUNT(*) AS tri FROM
               (SELECT x AS node FROM t UNION ALL SELECT y FROM t
                UNION ALL SELECT z FROM t)
             GROUP BY 1)
      SELECT deg.node AS part, CAST(deg.deg AS BIGINT) AS deg,
             CAST(COALESCE(pn.tri, 0) AS BIGINT) AS tri,
             CAST((2 * COALESCE(pn.tri, 0) * 1000000)
                  // (deg.deg * (deg.deg - 1)) AS BIGINT) AS cc_ppm
      FROM deg LEFT JOIN pn USING (node)
      WHERE deg.deg >= 2""".stripMargin.trim),
    // per-event cents cast BEFORE the sum mirrors the engine's
    // deterministic long-sum money convention
    "q_cohort_revenue" -> ("""
      WITH wd AS (SELECT user_id, CAST(ts AS DATE) AS day,
                         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
                  FROM events),
      co AS (SELECT user_id, MIN(day) AS cohort_day FROM wd GROUP BY 1)
      SELECT co.cohort_day,
             CAST(date_diff('day', co.cohort_day, wd.day) AS BIGINT) // 7 AS week_k,
             CAST(COUNT(DISTINCT wd.user_id) AS BIGINT) AS n_users,
             COUNT(*) AS n_events,
             CAST(SUM(wd.cents) AS BIGINT) AS rev_cents
      FROM wd JOIN co USING (user_id)
      GROUP BY 1, 2""".stripMargin.trim),
    "q_graph_degrees" -> ("""
      WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      e AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
            FROM lines a JOIN lines b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      deg AS (SELECT node, COUNT(*) AS deg FROM
                (SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
              GROUP BY 1)
      SELECT CAST(length(bin(deg)) AS BIGINT) AS bucket,
             COUNT(*) AS n_nodes,
             CAST(MIN(deg) AS BIGINT) AS min_deg,
             CAST(MAX(deg) AS BIGINT) AS max_deg
      FROM deg GROUP BY 1""".stripMargin.trim),
    // lead over (key, seq) mirrors the engine's single per-key window;
    // cents fixed-point keeps the payload integer
    "q_scd2_orders" -> ("""
      WITH ch AS (SELECT o_custkey AS key, o_orderkey AS seq,
                         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
                  FROM orders),
      v AS (SELECT key, cents, seq AS valid_from,
                   LEAD(seq, 1) OVER (PARTITION BY key ORDER BY seq) AS valid_to
            FROM ch)
      SELECT key, cents, valid_to, valid_from,
             CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT)
               AS is_current
      FROM v""".stripMargin.trim),
    "q_graph_reach" -> ("""
      WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      e AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
            FROM lines a JOIN lines b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      d AS (SELECT pa AS src, pb AS dst FROM e
            UNION ALL SELECT pb, pa FROM e),
      seeds AS (SELECT DISTINCT src AS seed FROM d WHERE src % 200 = 0),
      r0 AS (SELECT seed, seed AS node FROM seeds),
      r1 AS (SELECT DISTINCT seed, node FROM (
               SELECT r0.seed, d.dst AS node FROM r0 JOIN d ON d.src = r0.node
               UNION ALL SELECT seed, node FROM r0)),
      r2 AS (SELECT DISTINCT seed, node FROM (
               SELECT r1.seed, d.dst AS node FROM r1 JOIN d ON d.src = r1.node
               UNION ALL SELECT seed, node FROM r1))
      SELECT seed AS part, CAST(1 AS BIGINT) AS hop,
             CAST(COUNT(*) - 1 AS BIGINT) AS n_reachable FROM r1 GROUP BY seed
      UNION ALL
      SELECT seed, CAST(2 AS BIGINT), CAST(COUNT(*) - 1 AS BIGINT)
      FROM r2 GROUP BY seed""".stripMargin.trim),
    "q_graph_trending" -> ("""
      WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      om AS (SELECT o_orderkey,
                    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mo
             FROM orders),
      pm AS (SELECT om.mo, a.l_partkey AS pa, b.l_partkey AS pb,
                    COUNT(*) AS w
             FROM lines a JOIN lines b
               ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             JOIN om ON om.o_orderkey = a.l_orderkey
             GROUP BY 1, 2, 3),
      dv AS (SELECT mo, pa AS part_a, pb AS part_b, w,
                    w - COALESCE(LAG(w) OVER (PARTITION BY pa, pb
                                              ORDER BY mo), 0) AS dw
             FROM pm)
      SELECT part_a, part_b, mo, CAST(w AS BIGINT) AS w,
             CAST(dw AS BIGINT) AS dw
      FROM dv
      ORDER BY dw DESC, part_a ASC, part_b ASC, mo ASC LIMIT 20""".stripMargin.trim),
    "q_graph_custrecs" -> ("""
      WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS w
            FROM lines a JOIN lines b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2),
      d AS (SELECT pa AS part, pb AS v, w FROM e
            UNION ALL SELECT pb, pa, w FROM e),
      owned AS (SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
                FROM orders o JOIN lineitem l
                  ON l.l_orderkey = o.o_orderkey),
      sd AS (SELECT cust, part FROM owned WHERE cust % 150 = 0),
      sc AS (SELECT sd.cust, d.v, SUM(d.w) AS score
             FROM sd JOIN d USING (part) GROUP BY 1, 2),
      nn AS (SELECT sc.cust, sc.v, sc.score FROM sc
             LEFT JOIN owned ON owned.cust = sc.cust AND owned.part = sc.v
             WHERE owned.cust IS NULL),
      r AS (SELECT cust, v, score,
                   CAST(ROW_NUMBER() OVER (PARTITION BY cust
                        ORDER BY score DESC, v ASC) AS BIGINT) AS rnk
            FROM nn)
      SELECT cust, v AS candidate, CAST(score AS BIGINT) AS score, rnk
      FROM r WHERE rnk <= 5""".stripMargin.trim),
    "q_graph_linkpred" -> ("""
      WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      e AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
            FROM lines a JOIN lines b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      d AS (SELECT pa AS src, pb AS dst FROM e
            UNION ALL SELECT pb, pa FROM e),
      deg AS (SELECT src AS z, COUNT(*) AS zdeg FROM d GROUP BY 1),
      se AS (SELECT src AS u, dst AS z FROM d WHERE src % 100 = 0),
      h2 AS (SELECT se.u, d2.dst AS v, deg.zdeg
             FROM se JOIN d d2 ON d2.src = se.z JOIN deg ON deg.z = se.z
             WHERE d2.dst <> se.u),
      sc AS (SELECT u, v, SUM(1000000 // zdeg) AS score_ppm
             FROM h2 GROUP BY 1, 2),
      nn AS (SELECT sc.u, sc.v, sc.score_ppm FROM sc
             LEFT JOIN d ON d.src = sc.u AND d.dst = sc.v
             WHERE d.src IS NULL),
      r AS (SELECT u, v, score_ppm,
                   CAST(ROW_NUMBER() OVER (PARTITION BY u
                        ORDER BY score_ppm DESC, v ASC) AS BIGINT) AS rnk
            FROM nn)
      SELECT u AS part, v AS candidate,
             CAST(score_ppm AS BIGINT) AS score_ppm, rnk
      FROM r WHERE rnk <= 5""".stripMargin.trim),
    "q_graph_recs" -> ("""
      WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS w
            FROM lines a JOIN lines b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2),
      d AS (SELECT pa AS part, pb AS rec, w FROM e
            UNION ALL SELECT pb, pa, w FROM e),
      r AS (SELECT part, rec, w,
                   CAST(ROW_NUMBER() OVER (PARTITION BY part
                        ORDER BY w DESC, rec ASC) AS BIGINT) AS rnk
            FROM d)
      SELECT part, rec, w, rnk FROM r WHERE rnk <= 3""".stripMargin.trim),
    "q_rep_topgram" -> ("""
      WITH t1 AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS g FROM documents),
      c1 AS (SELECT doc_id, g, COUNT(*) AS c FROM t1 GROUP BY 1, 2),
      a1 AS (SELECT doc_id,
                    CAST(MAX(c * length(g)) AS BIGINT) AS top_chars,
                    CAST(SUM(c * length(g)) AS BIGINT) AS tot_chars
             FROM c1 GROUP BY 1),
      tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      t2 AS (
        SELECT doc_id,
               unnest([tk[i] || ' ' || tk[i+1] FOR i IN range(1, len(tk))]) AS g
        FROM tk WHERE len(tk) >= 2),
      c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM t2 GROUP BY 1, 2),
      a2 AS (SELECT doc_id,
                    CAST(MAX(c * length(g)) AS BIGINT) AS top_chars,
                    CAST(SUM(c * length(g)) AS BIGINT) AS tot_chars
             FROM c2 GROUP BY 1),
      p AS (SELECT a1.doc_id,
              CASE WHEN a1.tot_chars > 0
                   THEN a1.top_chars * 100 // a1.tot_chars
                   ELSE CAST(0 AS BIGINT) END AS top1_pct,
              COALESCE(CASE WHEN a2.tot_chars > 0
                            THEN a2.top_chars * 100 // a2.tot_chars
                            ELSE CAST(0 AS BIGINT) END,
                       CAST(0 AS BIGINT)) AS top2_pct
            FROM a1 LEFT JOIN a2 ON a1.doc_id = a2.doc_id)
      SELECT doc_id, top1_pct, top2_pct,
             CAST(CASE WHEN top1_pct <= 30 AND top2_pct <= 20
                  THEN 1 ELSE 0 END AS BIGINT) AS keep
      FROM p""".stripMargin.trim),
    // sequential category redaction mirroring TextAnalysis.PiiCategories
    // verbatim: each stage counts+replaces on the previous stage's text.
    // The fixture is digit-free, so this row certifies the identity
    // path; q_pii_redact_planted below certifies actual matches.
    "q_pii_redact" -> piiRedactOracle("SELECT doc_id, text AS t0 FROM documents"),
    "q_pii_redact_planted" -> piiRedactOracle(PiiPlantedT0),
    "q_mm_asset_stats" -> ("""
      SELECT CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
               ELSE 'video/mp4' END AS mime,
             COUNT(*) AS n_assets,
             CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
      FROM documents GROUP BY 1""".stripMargin.trim),
    "q_mm_frame_stats" -> ("""
      WITH a AS (SELECT CASE CAST(doc_id % 3 AS INTEGER)
                   WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
                   ELSE 'video/mp4' END AS mime,
                 octet_length(encode(text)) AS nb
                 FROM documents),
      f AS (SELECT mime, GREATEST(LEAST(64, nb - (i-1)*128), 0) AS fl
            FROM a, (SELECT unnest(generate_series(1, GREATEST(nb // 128, 1))) AS i))
      SELECT mime, COUNT(*) AS n_frames,
             CAST(SUM(fl) AS BIGINT) AS total_frame_bytes
      FROM f GROUP BY mime""".stripMargin.trim),
    // decode-triad oracles (r20): the in-flight views wrap the ASCII
    // fixture text, so characters ARE payload bytes — DuckDB re-derives
    // every per-channel stat with ord(substr(...)) and string_aggs the
    // channels into the same CSV spelling the Spark side emits.
    // q_mm_decode: P6 (even doc_id, 3 channels interleaved RGB over the
    // first 192 bytes of rpad(text,192,'x')) / P5 (odd, 1 channel over
    // the first 64); mean = floor(sum/64) — npix is 8x8 either way.
    "q_mm_decode" -> ("""
      WITH d AS (SELECT doc_id, rpad(text, 192, 'x') AS padded FROM documents),
      px AS (SELECT doc_id,
                    CASE WHEN doc_id % 2 = 0 THEN CAST((i - 1) % 3 AS INTEGER)
                         ELSE 0 END AS ch,
                    ord(substr(padded, CAST(i AS INTEGER), 1)) AS v
             FROM d, (SELECT unnest(generate_series(
                    1, CASE WHEN doc_id % 2 = 0 THEN 192 ELSE 64 END)) AS i)),
      st AS (SELECT doc_id, ch, MIN(v) AS mn, MAX(v) AS mx,
                    CAST(SUM(v) // 64 AS INTEGER) AS me
             FROM px GROUP BY doc_id, ch),
      agg AS (SELECT doc_id,
                     string_agg(CAST(mn AS VARCHAR), ',' ORDER BY ch) AS ch_min,
                     string_agg(CAST(mx AS VARCHAR), ',' ORDER BY ch) AS ch_max,
                     string_agg(CAST(me AS VARCHAR), ',' ORDER BY ch) AS ch_mean
              FROM st GROUP BY doc_id)
      SELECT doc_id AS asset_id, TRUE AS decodable,
             CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'pgm' END AS format,
             CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
             CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS INTEGER) AS channels,
             ch_min, ch_max, ch_mean
      FROM agg""".stripMargin.trim),
    // q_mm_audio: PCM-8 re-centers bytes to [-128,127]; rms is the
    // exact integer sqrt of sum(s^2) DIV n (values <= 128, so
    // floor(sqrt(double)) is exact here)
    "q_mm_audio" -> ("""
      WITH s AS (SELECT doc_id, CAST(length(text) AS INTEGER) AS n,
                        ord(substr(text, CAST(i AS INTEGER), 1)) - 128 AS v
                 FROM documents,
                      (SELECT unnest(generate_series(1, length(text))) AS i)),
      st AS (SELECT doc_id, MAX(n) AS n, MIN(v) AS mn, MAX(v) AS mx,
                    SUM(CAST(v AS BIGINT) * v) AS sq
             FROM s GROUP BY doc_id)
      SELECT doc_id AS asset_id, TRUE AS decodable, 'wav' AS format,
             CAST(8000 AS INTEGER) AS sample_rate, CAST(1 AS INTEGER) AS channels,
             n AS n_frames,
             CAST(CAST(n AS BIGINT) * 1000 // 8000 AS BIGINT) AS duration_ms,
             CAST(mn AS VARCHAR) AS ch_min, CAST(mx AS VARCHAR) AS ch_max,
             CAST(CAST(floor(sqrt(CAST(sq // n AS DOUBLE))) AS BIGINT) AS VARCHAR) AS ch_rms
      FROM st""".stripMargin.trim),
    // q_mm_video: 4 frames x 192 bytes of cyclically repeated text,
    // disk order BGR (j%3 = 0,1,2 -> channel 2,1,0 of the R,G,B stats);
    // per-channel pixel count is 4*64 = 256; duration 4*40000us = 160ms
    "q_mm_video" -> ("""
      WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
      px AS (SELECT doc_id, CAST(2 - ((src % 192) % 3) AS INTEGER) AS ch,
                    ord(substr(text, CAST(src % n AS INTEGER) + 1, 1)) AS v
             FROM d, (SELECT unnest(generate_series(0, 767)) AS src)),
      st AS (SELECT doc_id, ch, MIN(v) AS mn, MAX(v) AS mx,
                    CAST(SUM(v) // 256 AS INTEGER) AS me
             FROM px GROUP BY doc_id, ch),
      agg AS (SELECT doc_id,
                     string_agg(CAST(mn AS VARCHAR), ',' ORDER BY ch) AS ch_min,
                     string_agg(CAST(mx AS VARCHAR), ',' ORDER BY ch) AS ch_max,
                     string_agg(CAST(me AS VARCHAR), ',' ORDER BY ch) AS ch_mean
              FROM st GROUP BY doc_id)
      SELECT doc_id AS asset_id, TRUE AS decodable, 'avi-dib' AS format,
             CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
             CAST(4 AS INTEGER) AS n_frames, CAST(160 AS BIGINT) AS duration_ms,
             ch_min, ch_max, ch_mean
      FROM agg""".stripMargin.trim),
    // q_mm_resize: the 8x8 view resized 2x to 4x4 — output pixel
    // (ox,oy,ch) = floor(mean of the 2x2 input block); stats over the
    // 16 output pixels; mean = floor(sum/16)
    "q_mm_resize" -> ("""
      WITH d AS (SELECT doc_id, rpad(text, 192, 'x') AS padded FROM documents),
      ob AS (SELECT doc_id, padded, CAST(o % 4 AS INTEGER) AS ox,
                    CAST(o // 4 AS INTEGER) AS oy, CAST(ch AS INTEGER) AS ch
             FROM d,
                  (SELECT unnest(generate_series(0, 15)) AS o),
                  (SELECT unnest(generate_series(0, 2)) AS ch)
             WHERE doc_id % 2 = 0 OR ch = 0),
      ib AS (SELECT doc_id, ch, oy, ox,
               ord(substr(padded, CAST(CASE WHEN doc_id % 2 = 0
                   THEN 1 + ((2*oy + dy) * 8 + (2*ox + dx)) * 3 + ch
                   ELSE 1 + (2*oy + dy) * 8 + (2*ox + dx) END AS INTEGER), 1)) AS b
             FROM ob,
                  (SELECT unnest(generate_series(0, 1)) AS dy),
                  (SELECT unnest(generate_series(0, 1)) AS dx)),
      opx AS (SELECT doc_id, ch, oy, ox, SUM(b) // 4 AS v
              FROM ib GROUP BY doc_id, ch, oy, ox),
      st AS (SELECT doc_id, ch, MIN(v) AS mn, MAX(v) AS mx, SUM(v) // 16 AS me
             FROM opx GROUP BY doc_id, ch),
      agg AS (SELECT doc_id,
                     string_agg(CAST(mn AS VARCHAR), ',' ORDER BY ch) AS ch_min,
                     string_agg(CAST(mx AS VARCHAR), ',' ORDER BY ch) AS ch_max,
                     string_agg(CAST(me AS VARCHAR), ',' ORDER BY ch) AS ch_mean
              FROM st GROUP BY doc_id)
      SELECT doc_id AS asset_id, TRUE AS decodable,
             CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'pgm' END AS format,
             CAST(4 AS INTEGER) AS width, CAST(4 AS INTEGER) AS height,
             CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS INTEGER) AS channels,
             ch_min, ch_max, ch_mean
      FROM agg""".stripMargin.trim),
    // q_mm_video_frames: the q_mm_video byte model PER FRAME — frame f
    // covers src = f*192 + j, per-channel pixel count 64
    "q_mm_video_frames" -> ("""
      WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
      px AS (SELECT doc_id, CAST(f AS INTEGER) AS frame_no,
                    CAST(2 - (j % 3) AS INTEGER) AS ch,
                    ord(substr(text, CAST((f * 192 + j) % n AS INTEGER) + 1, 1)) AS v
             FROM d,
                  (SELECT unnest(generate_series(0, 3)) AS f),
                  (SELECT unnest(generate_series(0, 191)) AS j)),
      st AS (SELECT doc_id, frame_no, ch, MIN(v) AS mn, MAX(v) AS mx,
                    SUM(v) // 64 AS me
             FROM px GROUP BY doc_id, frame_no, ch),
      agg AS (SELECT doc_id, frame_no,
                     string_agg(CAST(mn AS VARCHAR), ',' ORDER BY ch) AS ch_min,
                     string_agg(CAST(mx AS VARCHAR), ',' ORDER BY ch) AS ch_max,
                     string_agg(CAST(me AS VARCHAR), ',' ORDER BY ch) AS ch_mean
              FROM st GROUP BY doc_id, frame_no)
      SELECT doc_id AS asset_id, frame_no, ch_min, ch_max, ch_mean
      FROM agg""".stripMargin.trim),
    // q_mm_audio_windows: per-64-frame-window RMS, exact integer sqrt
    // (values <= 128 — floor(sqrt(double)) exact), final window short
    "q_mm_audio_windows" -> ("""
      WITH s AS (SELECT doc_id, CAST((i - 1) // 64 AS INTEGER) AS window_no,
                        ord(substr(text, CAST(i AS INTEGER), 1)) - 128 AS v
                 FROM documents,
                      (SELECT unnest(generate_series(1, length(text))) AS i)),
      st AS (SELECT doc_id, window_no, COUNT(*) AS cnt,
                    SUM(CAST(v AS BIGINT) * v) AS sq
             FROM s GROUP BY doc_id, window_no)
      SELECT doc_id AS asset_id, window_no, CAST(cnt AS INTEGER) AS n_frames,
             CAST(CAST(floor(sqrt(CAST(sq // cnt AS DOUBLE))) AS BIGINT) AS VARCHAR) AS ch_rms
      FROM st""".stripMargin.trim),
    // featureNearDups: library+spec only — the stub features are
    // non-discriminative on this fixture (see Multimodal.scaladoc);
    // exact pair set asserted vs a driver-side reimplementation in
    // MultimodalSpec.
    "q_csv_nation_region" -> ("""
      SELECT r_name, COUNT(*) AS n_nations
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name""".stripMargin.trim),
    "q_events_by_day_partitioned" -> ("""
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, COUNT(*) AS n
      FROM events GROUP BY 1""".stripMargin.trim),
    // oracle reads the original parquet — the round-trip through ORC
    // must be value-preserving for the hash to match
    "q_orc_supplier_balance" -> ("""
      SELECT s_nationkey, COUNT(*) AS n_suppliers,
             CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT) AS acctbal_cents
      FROM supplier GROUP BY s_nationkey""".stripMargin.trim),
    "q_json_customer_segments" -> ("""
      SELECT c_mktsegment, COUNT(*) AS n_cust,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT) AS acctbal_cents
      FROM customer GROUP BY c_mktsegment""".stripMargin.trim),
    "q_events_daily" -> ("""
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_value,
             COUNT(DISTINCT user_id) AS n_users
      FROM events GROUP BY event_type, CAST(ts AS DATE)""".stripMargin.trim),
    // COUNT(CASE ...) mirrors the 0-filled pivot cells exactly
    "q_events_pivot" -> ("""
      SELECT CAST(ts AS DATE) AS day,
             COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
             COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
             COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
             COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
             COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
      FROM events GROUP BY 1""".stripMargin.trim),
    "q_events_props" -> ("""
      SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, COUNT(*) AS n
      FROM events GROUP BY 1""".stripMargin.trim),
    // dense users × days matrix over the corpus-wide span; DuckDB
    // generate_series mirrors Spark's date sequence (both inclusive)
    // window sums promote to HUGEINT in DuckDB — fine, they are not
    // surfaced; the flag arithmetic stays exact on both engines and the
    // surfaced columns are BIGINT/DATE
    "q_events_anomaly" -> ("""
      WITH d AS (SELECT CAST(ts AS DATE) AS day,
                        CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
                 FROM events GROUP BY 1),
      w AS (SELECT day, cents,
              COUNT(*) OVER win AS n,
              SUM(cents) OVER win AS s,
              SUM(cents * cents) OVER win AS q
            FROM d WINDOW win AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      SELECT day, cents,
             CASE WHEN n = 7 AND (7*cents - s)*(7*cents - s) > 4*(7*q - s*s)
                  THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS is_anomaly
      FROM w""".stripMargin.trim),
    "q_events_gapfill" -> ("""
      WITH e AS (SELECT user_id, event_type, CAST(ts AS DATE) AS day FROM events),
      span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM e),
      days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
               FROM span),
      u AS (SELECT DISTINCT user_id FROM e),
      c AS (SELECT user_id, day, CAST(COUNT(*) AS BIGINT) AS n
            FROM e WHERE event_type = 'purchase' GROUP BY user_id, day)
      SELECT u.user_id, days.day, COALESCE(c.n, 0) AS n_events
      FROM u CROSS JOIN days
      LEFT JOIN c ON c.user_id = u.user_id AND c.day = days.day""".stripMargin.trim),
    // strict-order funnel: each stage's reach time gates the next
    // same chain as q_event_funnel with the per-stage 1-day gap bound
    "q_event_funnel_1d" -> ("""
      WITH u AS (SELECT DISTINCT user_id FROM events),
      s1 AS (SELECT user_id, MIN(ts) AS t FROM events
             WHERE event_type = 'view' GROUP BY user_id),
      s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
             JOIN s1 ON s1.user_id = e.user_id
             WHERE e.event_type = 'click' AND e.ts > s1.t
               AND epoch_us(e.ts) - epoch_us(s1.t) <= 86400000000 GROUP BY e.user_id),
      s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
             JOIN s2 ON s2.user_id = e.user_id
             WHERE e.event_type = 'purchase' AND e.ts > s2.t
               AND epoch_us(e.ts) - epoch_us(s2.t) <= 86400000000 GROUP BY e.user_id)
      SELECT u.user_id,
             CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                  WHEN s2.user_id IS NOT NULL THEN 2
                  WHEN s1.user_id IS NOT NULL THEN 1
                  ELSE 0 END AS BIGINT) AS funnel_stage
      FROM u LEFT JOIN s1 ON s1.user_id = u.user_id
             LEFT JOIN s2 ON s2.user_id = u.user_id
             LEFT JOIN s3 ON s3.user_id = u.user_id""".stripMargin.trim),
    "q_event_funnel" -> ("""
      WITH u AS (SELECT DISTINCT user_id FROM events),
      s1 AS (SELECT user_id, MIN(ts) AS t FROM events
             WHERE event_type = 'view' GROUP BY user_id),
      s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
             JOIN s1 ON s1.user_id = e.user_id
             WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id),
      s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
             JOIN s2 ON s2.user_id = e.user_id
             WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id)
      SELECT u.user_id,
             CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                  WHEN s2.user_id IS NOT NULL THEN 2
                  WHEN s1.user_id IS NOT NULL THEN 1
                  ELSE 0 END AS BIGINT) AS funnel_stage
      FROM u LEFT JOIN s1 ON s1.user_id = u.user_id
             LEFT JOIN s2 ON s2.user_id = u.user_id
             LEFT JOIN s3 ON s3.user_id = u.user_id""".stripMargin.trim),
    // cohorts anchored to first activity; week = day-offset DIV 7
    "q_event_retention" -> ("""
      WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      c AS (SELECT user_id, MIN(day) AS cohort_day FROM a GROUP BY user_id),
      w AS (SELECT DISTINCT a.user_id, c.cohort_day,
              CAST(date_diff('day', c.cohort_day, a.day) AS BIGINT) // 7 AS week_k
            FROM a JOIN c ON c.user_id = a.user_id)
      SELECT cohort_day, CAST(week_k AS BIGINT) AS week_k,
             CAST(COUNT(*) AS BIGINT) AS n_users
      FROM w GROUP BY cohort_day, week_k""".stripMargin.trim),
    // as-of semantics spelled as a correlated top-1 (latest order at or
    // before the event, ties to the largest orderkey) — mirrors the
    // union+window engine implementation exactly
    "q_events_asof_order" -> ("""
      SELECT e.event_id,
             (SELECT o.o_orderkey FROM orders o
              WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
              ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) AS o_orderkey
      FROM events e""".stripMargin.trim),
    // integer-microsecond arithmetic on both engines (epoch_us /
    // unix_micros both floor positive nanos), so the boundary is exact
    "q_event_session_pairs" -> ("""
      SELECT e1.event_id AS id_a, e2.event_id AS id_b
      FROM events e1 JOIN events e2
        ON e1.user_id = e2.user_id AND e1.event_id < e2.event_id
      WHERE abs(epoch_us(e1.ts) - epoch_us(e2.ts)) <= 600000000""".stripMargin.trim),
    "q_event_sessions" -> ("""
      WITH t AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
      m AS (SELECT event_id, user_id, us,
              CASE WHEN us - LAG(us) OVER w <= 600000000 THEN 0 ELSE 1 END AS new_session
            FROM t WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)),
      s AS (SELECT user_id, us,
              SUM(new_session) OVER (PARTITION BY user_id
                ORDER BY us ASC, event_id ASC
                ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM m)
      SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
             COUNT(*) AS n_events,
             MIN(us) AS start_us, MAX(us) AS end_us
      FROM s GROUP BY user_id, session_seq""".stripMargin.trim),
    "q_train_eval_split" -> ("""
      SELECT CASE WHEN md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) < 'cc'
                  THEN 'train' ELSE 'eval' END AS split,
             COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM documents GROUP BY 1""".stripMargin.trim),
    "q_train_eval_assign" -> ("""
      SELECT doc_id,
             CASE WHEN md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) < 'cc'
                  THEN 'train' ELSE 'eval' END AS split
      FROM documents""".stripMargin.trim),
    "q_orders_ranked" -> ("""
      SELECT o_orderkey, o_custkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS o_totalprice_cents
      FROM orders
      ORDER BY o_totalprice_cents DESC, o_orderkey ASC""".stripMargin.trim),
    // gap values depend only on the ordered date sequence, so equal-date
    // ties cannot perturb them (see Relational.orderGaps)
    "q_order_gaps" -> ("""
      WITH g AS (
        SELECT o_custkey,
               date_diff('day',
                 lag(o_orderdate) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey),
                 o_orderdate) AS gap_days
        FROM orders)
      SELECT o_custkey,
             COUNT(*) AS n_orders,
             COUNT(gap_days) AS n_gaps,
             CAST(COALESCE(MAX(gap_days), 0) AS BIGINT) AS max_gap_days,
             CAST(COALESCE(SUM(gap_days), 0) AS BIGINT) AS sum_gap_days
      FROM g GROUP BY 1""".stripMargin.trim),
    // ntile over the (price, orderkey) TOTAL order — deterministic bucket
    // assignment on any engine (see Relational.ntileRevenueSkewSafe)
    "q_orders_ntile" -> ("""
      WITH q AS (
        SELECT o_orderpriority, o_totalprice,
               ntile(4) OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey) AS quartile
        FROM orders)
      SELECT o_orderpriority,
             CAST(quartile AS BIGINT) AS quartile,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS revenue
      FROM q GROUP BY 1, 2""".stripMargin.trim),
    // rank-selected discrete quantiles: rn == ceil(p*n) in integer math,
    // result is an actual member value — engine-portable, no float
    // interpolation (see TextAnalysis.tokenQuantilesBySource)
    "q_token_quantiles" -> ("""
      WITH t AS (SELECT source, doc_id,
                        CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
                 FROM documents),
      r AS (SELECT source, nt,
              ROW_NUMBER() OVER (PARTITION BY source ORDER BY nt ASC, doc_id ASC) AS rn,
              COUNT(*) OVER (PARTITION BY source) AS cnt
            FROM t)
      SELECT source,
             MAX(CASE WHEN rn = (cnt + 1) // 2 THEN nt END) AS p50_tokens,
             MAX(CASE WHEN rn = (9 * cnt + 9) // 10 THEN nt END) AS p90_tokens,
             COUNT(*) AS n_docs
      FROM r GROUP BY source""".stripMargin.trim),
    // pattern mirrors TextAnalysis.BpeishPattern verbatim (portable
    // RE2/Java subset: no lookarounds)
    "q_token_bpe" -> ("""
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_ws_tokens,
             CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))) AS BIGINT) AS n_bpe_tokens
      FROM documents GROUP BY source""".stripMargin.trim),
    // thresholds must mirror TextAnalysis.stratifiedSample's default
    // rates map (r/256 encoded as a 2-hex-digit md5 prefix bound)
    "q_sample_stratified" -> ("""
      SELECT doc_id, source FROM documents
      WHERE md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) <
            CASE source WHEN 'src0' THEN '40' WHEN 'src1' THEN '80'
                        WHEN 'src2' THEN 'c0' ELSE 'g' END""".stripMargin.trim),
    "q_dedup_exact" ->
      "SELECT text, MIN(doc_id) AS doc_id, COUNT(*) AS n FROM documents GROUP BY text",
    "q_dedup_wordset" -> ("""
      SELECT array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ') AS wordset,
             MIN(doc_id) AS doc_id, COUNT(*) AS n
      FROM documents GROUP BY 1 HAVING COUNT(*) > 1""".stripMargin.trim),
    // MinHash-LSH output equals the exact >=0.8 Jaccard pair set: every
    // candidate is verified with exact integer Jaccard, and the band
    // scheme's candidate-miss probability at the planted >=0.9
    // similarities is negligible — `minHashOracleGuard` below DERIVES
    // that bound from Dedup's shared (k, bands, n) constants and fails
    // loudly if retuning ever invalidates this exact-set oracle
    // (recall 1.0 confirmed empirically at sf0.01/sf0.1; the float-free
    // integer-Jaccard verify makes the compare exact).
    "q_dedup_minhash" -> ngramJaccardOracle(num = 4, den = 5),
    "q_ngram_jaccard" -> ngramJaccardOracle(num = 1, den = 2),
    // connected components over the SAME exact >=0.8-Jaccard pair set as
    // q_dedup_minhash (valid for the same reason — see minHashOracleGuard);
    // recursive min-reachability CTE = component minimum
    // same component CTE as q_dedup_clusters + argmax keeper per
    // cluster (n_chars desc, doc_id asc); singletons keep themselves
    "q_dedup_keep_best" -> ("""
      WITH RECURSIVE
      w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      g AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS ng
            FROM w, (SELECT unnest(generate_series(1, len(ws) - 2)) AS i)
            WHERE len(ws) >= 3),
      sz AS (SELECT doc_id, COUNT(*) AS s FROM g GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
                FROM g a JOIN g b ON a.ng = b.ng AND a.doc_id < b.doc_id GROUP BY 1, 2),
      pairs AS (SELECT doc_a, doc_b
                FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
                WHERE inter * 9 >= 4 * (sa.s + sb.s)),
      edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
                UNION ALL SELECT doc_b AS u, doc_a AS v FROM pairs),
      reach(u, lab) AS (
        SELECT u, u FROM edges
        UNION
        SELECT e.u, r.lab FROM edges e JOIN reach r ON r.u = e.v),
      comp AS (SELECT u AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY u),
      lab2 AS (SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
                      d.n_chars
               FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id),
      k AS (SELECT cluster_id, doc_id AS keeper_id FROM (
              SELECT cluster_id, doc_id,
                     ROW_NUMBER() OVER (PARTITION BY cluster_id
                                        ORDER BY n_chars DESC, doc_id ASC) AS rk
              FROM lab2) WHERE rk = 1)
      SELECT l.doc_id, l.cluster_id, k.keeper_id,
             CAST(CASE WHEN l.doc_id = k.keeper_id THEN 1 ELSE 0 END AS BIGINT) AS kept
      FROM lab2 l JOIN k USING (cluster_id)""".stripMargin.trim),
    "q_dedup_clusters" -> ("""
      WITH RECURSIVE
      w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      g AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS ng
            FROM w, (SELECT unnest(generate_series(1, len(ws) - 2)) AS i)
            WHERE len(ws) >= 3),
      sz AS (SELECT doc_id, COUNT(*) AS s FROM g GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
                FROM g a JOIN g b ON a.ng = b.ng AND a.doc_id < b.doc_id GROUP BY 1, 2),
      pairs AS (SELECT doc_a, doc_b
                FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
                WHERE inter * 9 >= 4 * (sa.s + sb.s)),
      edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
                UNION ALL SELECT doc_b AS u, doc_a AS v FROM pairs),
      reach(u, lab) AS (
        SELECT u, u FROM edges
        UNION
        SELECT e.u, r.lab FROM edges e JOIN reach r ON r.u = e.v)
      SELECT u AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY u""".stripMargin.trim),
    // verbatim k-gram runs: positional 3-gram occurrences (duplicates
    // kept), occurrence-frequency cap mirrored from the engine (no-op on
    // this fixture: max occ 8 « 1000), then gaps-and-islands per
    // (pair, diagonal) — run of L consecutive shared shingles = L + 2
    // shared tokens. DuckDB's 1-based positions vs Spark's 0-based are
    // immaterial: diagonals and consecutiveness are shift-invariant.
    "q_verbatim_runs" -> ("""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      g AS (SELECT doc_id, i AS pos, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS ng
            FROM w, (SELECT unnest(generate_series(1, len(ws) - 2)) AS i)
            WHERE len(ws) >= 3),
      f AS (SELECT ng, COUNT(*) AS occ FROM g GROUP BY ng),
      gc AS (SELECT g.doc_id, g.pos, g.ng FROM g JOIN f USING (ng) WHERE occ <= 1000),
      m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.pos AS pos_a, a.pos - b.pos AS diag
            FROM gc a JOIN gc b ON a.ng = b.ng AND a.doc_id < b.doc_id),
      r AS (SELECT doc_a, doc_b, diag,
                   pos_a - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, diag
                                              ORDER BY pos_a) AS grp
            FROM m),
      runs AS (SELECT doc_a, doc_b, COUNT(*) + 2 AS run_tokens
               FROM r GROUP BY doc_a, doc_b, diag, grp)
      SELECT doc_a, doc_b, CAST(MAX(run_tokens) AS BIGINT) AS max_run_tokens
      FROM runs GROUP BY doc_a, doc_b
      HAVING MAX(run_tokens) >= 20""".stripMargin.trim),
    // span coordinates: same islands, surfacing each maximal run with its
    // 0-based start token offset on both sides (the `- 1` converts
    // DuckDB's 1-based positions; b_start = a_start - diag)
    "q_verbatim_spans" -> ("""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      g AS (SELECT doc_id, i AS pos, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS ng
            FROM w, (SELECT unnest(generate_series(1, len(ws) - 2)) AS i)
            WHERE len(ws) >= 3),
      f AS (SELECT ng, COUNT(*) AS occ FROM g GROUP BY ng),
      gc AS (SELECT g.doc_id, g.pos, g.ng FROM g JOIN f USING (ng) WHERE occ <= 1000),
      m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.pos AS pos_a, a.pos - b.pos AS diag
            FROM gc a JOIN gc b ON a.ng = b.ng AND a.doc_id < b.doc_id),
      r AS (SELECT doc_a, doc_b, diag, pos_a,
                   pos_a - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, diag
                                              ORDER BY pos_a) AS grp
            FROM m)
      SELECT doc_a, doc_b,
             CAST(MIN(pos_a) - 1 AS BIGINT) AS a_start,
             CAST(MIN(pos_a) - 1 - diag AS BIGINT) AS b_start,
             COUNT(*) + 2 AS run_tokens
      FROM r GROUP BY doc_a, doc_b, diag, grp
      HAVING COUNT(*) + 2 >= 20""".stripMargin.trim),
    // removal pass: the q_verbatim_spans islands re-keyed to the
    // higher-id doc as [s, e) cut intervals, classic interval merge
    // (running-max window), then list slicing by position anti-join —
    // a kept token joins no merged interval (disjoint, so a cut token
    // joins exactly one) and string_agg(ORDER BY pos) rebuilds the text
    "q_verbatim_clean" -> ("""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      g AS (SELECT doc_id, i AS pos, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS ng
            FROM w, (SELECT unnest(generate_series(1, len(ws) - 2)) AS i)
            WHERE len(ws) >= 3),
      f AS (SELECT ng, COUNT(*) AS occ FROM g GROUP BY ng),
      gc AS (SELECT g.doc_id, g.pos, g.ng FROM g JOIN f USING (ng) WHERE occ <= 1000),
      m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.pos AS pos_a, a.pos - b.pos AS diag
            FROM gc a JOIN gc b ON a.ng = b.ng AND a.doc_id < b.doc_id),
      r AS (SELECT doc_a, doc_b, diag, pos_a,
                   pos_a - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, diag
                                              ORDER BY pos_a) AS grp
            FROM m),
      spans AS (SELECT doc_b AS doc_id,
                       MIN(pos_a) - 1 - diag AS s,
                       MIN(pos_a) - 1 - diag + COUNT(*) + 2 AS e
                FROM r GROUP BY doc_a, doc_b, diag, grp
                HAVING COUNT(*) + 2 >= 20),
      ord2 AS (SELECT doc_id, s, e,
                      MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
               FROM spans),
      grp2 AS (SELECT doc_id, s, e,
                      SUM(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
                        OVER (PARTITION BY doc_id ORDER BY s, e) AS gid
               FROM ord2),
      mrg AS (SELECT doc_id, MIN(s) AS s, MAX(e) AS e FROM grp2 GROUP BY doc_id, gid),
      tok AS (SELECT doc_id, ws[i] AS tok, i - 1 AS pos
              FROM w, (SELECT unnest(generate_series(1, len(ws))) AS i)),
      kept AS (SELECT t.doc_id, t.pos, t.tok
               FROM tok t LEFT JOIN mrg ON mrg.doc_id = t.doc_id
                                       AND t.pos >= mrg.s AND t.pos < mrg.e
               WHERE mrg.doc_id IS NULL),
      cnt AS (SELECT doc_id, COUNT(*) AS n_toks FROM tok GROUP BY doc_id),
      kc AS (SELECT doc_id, COALESCE(string_agg(tok, ' ' ORDER BY pos), '') AS text,
                    COUNT(*) AS n_kept
             FROM kept GROUP BY doc_id)
      SELECT c.doc_id, COALESCE(kc.text, '') AS text,
             CAST(c.n_toks - COALESCE(kc.n_kept, 0) AS BIGINT) AS n_tokens_removed
      FROM cnt c LEFT JOIN kc USING (doc_id)""".stripMargin.trim),
    // cross-split verbatim runs: corpus-side positional index with the
    // corpus-computed occurrence cap, probed by batch positions — same
    // islands arithmetic as q_verbatim_runs over (batch, corpus) pairs
    "q_verbatim_incr" -> ("""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      g AS (SELECT doc_id, i AS pos, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS ng
            FROM w, (SELECT unnest(generate_series(1, len(ws) - 2)) AS i)
            WHERE len(ws) >= 3),
      f AS (SELECT ng, COUNT(*) AS occ FROM g WHERE doc_id % 10 < 8 GROUP BY ng),
      c AS (SELECT g.doc_id AS corpus_id, g.pos AS pos_c, g.ng
            FROM g JOIN f USING (ng) WHERE g.doc_id % 10 < 8 AND occ <= 1000),
      b AS (SELECT doc_id, pos, ng FROM g WHERE doc_id % 10 >= 8),
      m AS (SELECT b.doc_id, c.corpus_id, b.pos AS pos_b, b.pos - c.pos_c AS diag
            FROM b JOIN c USING (ng)),
      r AS (SELECT doc_id, corpus_id, diag,
                   pos_b - ROW_NUMBER() OVER (PARTITION BY doc_id, corpus_id, diag
                                              ORDER BY pos_b) AS grp
            FROM m),
      runs AS (SELECT doc_id, corpus_id, COUNT(*) + 2 AS run_tokens
               FROM r GROUP BY doc_id, corpus_id, diag, grp)
      SELECT doc_id, corpus_id, CAST(MAX(run_tokens) AS BIGINT) AS max_run_tokens
      FROM runs GROUP BY doc_id, corpus_id
      HAVING MAX(run_tokens) >= 20""".stripMargin.trim),
    // within-doc self-repeats: same islands arithmetic on a same-doc
    // positive-offset self-join; threshold 3 matches the harness call
    "q_self_repeats" -> ("""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      g AS (SELECT doc_id, i AS pos, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS ng
            FROM w, (SELECT unnest(generate_series(1, len(ws) - 2)) AS i)
            WHERE len(ws) >= 3),
      f AS (SELECT ng, COUNT(*) AS occ FROM g GROUP BY ng),
      gc AS (SELECT g.doc_id, g.pos, g.ng FROM g JOIN f USING (ng) WHERE occ <= 1000),
      m AS (SELECT a.doc_id, a.pos AS pos_a, a.pos - b.pos AS diag
            FROM gc a JOIN gc b
              ON a.ng = b.ng AND a.doc_id = b.doc_id AND a.pos > b.pos),
      r AS (SELECT doc_id, diag,
                   pos_a - ROW_NUMBER() OVER (PARTITION BY doc_id, diag
                                              ORDER BY pos_a) AS grp
            FROM m),
      runs AS (SELECT doc_id, COUNT(*) + 2 AS run_tokens
               FROM r GROUP BY doc_id, diag, grp)
      SELECT doc_id, CAST(MAX(run_tokens) AS BIGINT) AS max_rep_tokens
      FROM runs GROUP BY doc_id
      HAVING MAX(run_tokens) >= 3""".stripMargin.trim),
    // the planted twin at the real threshold: text doubled (t0 = text
    // || ' ' || text), so the >= 20 HAVING bites — validated: exactly
    // the 457 docs with >= 20 tokens qualify at sf0.01, runs 20..99
    "q_self_repeats_planted" -> ("""
      WITH d AS (SELECT doc_id, text || ' ' || text AS t0 FROM documents),
      w AS (SELECT doc_id, string_split(t0, ' ') AS ws FROM d),
      g AS (SELECT doc_id, i AS pos, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS ng
            FROM w, (SELECT unnest(generate_series(1, len(ws) - 2)) AS i)
            WHERE len(ws) >= 3),
      f AS (SELECT ng, COUNT(*) AS occ FROM g GROUP BY ng),
      gc AS (SELECT g.doc_id, g.pos, g.ng FROM g JOIN f USING (ng) WHERE occ <= 1000),
      m AS (SELECT a.doc_id, a.pos AS pos_a, a.pos - b.pos AS diag
            FROM gc a JOIN gc b
              ON a.ng = b.ng AND a.doc_id = b.doc_id AND a.pos > b.pos),
      r AS (SELECT doc_id, diag,
                   pos_a - ROW_NUMBER() OVER (PARTITION BY doc_id, diag
                                              ORDER BY pos_a) AS grp
            FROM m),
      runs AS (SELECT doc_id, COUNT(*) + 2 AS run_tokens
               FROM r GROUP BY doc_id, diag, grp)
      SELECT doc_id, CAST(MAX(run_tokens) AS BIGINT) AS max_rep_tokens
      FROM runs GROUP BY doc_id
      HAVING MAX(run_tokens) >= 20""".stripMargin.trim),
    // line doc-frequency strike: planted 3-line docs, lines with
    // COUNT(DISTINCT doc_id) >= 50 struck, kept lines rejoined in order
    "q_line_dedup" -> ("""
      WITH d AS (SELECT doc_id, 'shared header boilerplate' || chr(10) || text ||
                        chr(10) || 'footer group ' || CAST(doc_id % 5 AS VARCHAR) AS t0
                 FROM documents),
      w AS (SELECT doc_id, string_split(t0, chr(10)) AS ls FROM d),
      l AS (SELECT doc_id, i AS pos, ls[i] AS line
            FROM w, (SELECT unnest(generate_series(1, len(ls))) AS i)),
      f AS (SELECT line, COUNT(DISTINCT doc_id) AS df FROM l GROUP BY line),
      k AS (SELECT doc_id, pos, l.line FROM l JOIN f USING (line)
            WHERE df < 50 OR trim(line) = ''),
      kc AS (SELECT doc_id, COALESCE(string_agg(line, chr(10) ORDER BY pos), '') AS text,
                    COUNT(*) AS n_kept FROM k GROUP BY doc_id),
      cnt AS (SELECT doc_id, COUNT(*) AS n FROM l GROUP BY doc_id)
      SELECT c.doc_id, COALESCE(kc.text, '') AS text,
             CAST(c.n - COALESCE(kc.n_kept, 0) AS BIGINT) AS n_lines_removed
      FROM cnt c LEFT JOIN kc USING (doc_id)""".stripMargin.trim),
    // paragraph doc-frequency strike: same shape as q_line_dedup one
    // granularity up — split on blank-line runs, strike df >= 50
    // paragraphs, kept paragraphs rejoin under the canonical blank line
    "q_para_dedup" -> ("""
      WITH d AS (SELECT doc_id, 'shared preamble paragraph' || chr(10) || chr(10) || text ||
                        chr(10) || chr(10) || 'footer para ' || CAST(doc_id % 5 AS VARCHAR) AS t0
                 FROM documents),
      w AS (SELECT doc_id, regexp_split_to_array(t0, '\n{2,}') AS ps FROM d),
      l AS (SELECT doc_id, i AS pos, ps[i] AS para
            FROM w, (SELECT unnest(generate_series(1, len(ps))) AS i)),
      f AS (SELECT para, COUNT(DISTINCT doc_id) AS df FROM l GROUP BY para),
      k AS (SELECT doc_id, pos, l.para FROM l JOIN f USING (para)
            WHERE df < 50 OR trim(para) = ''),
      kc AS (SELECT doc_id, COALESCE(string_agg(para, chr(10) || chr(10) ORDER BY pos), '') AS text,
                    COUNT(*) AS n_kept FROM k GROUP BY doc_id),
      cnt AS (SELECT doc_id, COUNT(*) AS n FROM l GROUP BY doc_id)
      SELECT c.doc_id, COALESCE(kc.text, '') AS text,
             CAST(c.n - COALESCE(kc.n_kept, 0) AS BIGINT) AS n_paras_removed
      FROM cnt c LEFT JOIN kc USING (doc_id)""".stripMargin.trim),
    // same recursive-CTE component labeling as q_dedup_clusters, keyed
    // into the same md5-prefix threshold as q_train_eval_assign — the
    // split key is the cluster REPRESENTATIVE's fingerprint.
    // RECALL COUPLING (sharper than q_dedup_minhash's): this exact-set
    // oracle additionally relies on LSH recall because ONE missed >=0.8
    // pair flips a representative and with it the split of every cluster
    // member — a single probabilistic miss would become a many-row hash
    // mismatch rather than one. Validity rests on the same
    // minHashOracleGuard bound (miss prob < 1e-6 per pair at the
    // fixture's J >= 0.9 planted pairs) plus the hot-bucket cap being a
    // fixture no-op (max bucket « 10k, asserted in DedupSpec); if either
    // ever degrades, downgrade THIS query to rows-only first.
    "q_split_cluster_safe" -> ("""
      WITH RECURSIVE
      w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      g AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS ng
            FROM w, (SELECT unnest(generate_series(1, len(ws) - 2)) AS i)
            WHERE len(ws) >= 3),
      sz AS (SELECT doc_id, COUNT(*) AS s FROM g GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
                FROM g a JOIN g b ON a.ng = b.ng AND a.doc_id < b.doc_id GROUP BY 1, 2),
      pairs AS (SELECT doc_a, doc_b
                FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
                WHERE inter * 9 >= 4 * (sa.s + sb.s)),
      edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
                UNION ALL SELECT doc_b AS u, doc_a AS v FROM pairs),
      reach(u, lab) AS (
        SELECT u, u FROM edges
        UNION
        SELECT e.u, r.lab FROM edges e JOIN reach r ON r.u = e.v),
      cl AS (SELECT u AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY u),
      fps AS (SELECT doc_id,
                md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
              FROM documents),
      rep AS (SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS rep_id
              FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id)
      SELECT rep.doc_id,
             CASE WHEN f.fp < 'cc' THEN 'train' ELSE 'eval' END AS split
      FROM rep JOIN fps f ON f.doc_id = rep.rep_id""".stripMargin.trim),
    // integer-scaled idf surrogate keeps score/rank exact cross-engine —
    // see TextAnalysis.tfidfTopTerms scaladoc
    "q_tfidf_terms" -> ("""
      WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
      idf AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT COUNT(*) AS n_docs FROM documents),
      s AS (SELECT doc_id, term, tf, df, tf * ((n_docs * 1000) // df) AS score
            FROM tf JOIN idf USING (term) CROSS JOIN n),
      r AS (SELECT doc_id, term, tf, df, score,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                     ORDER BY score DESC, term ASC) AS rank
            FROM s)
      SELECT doc_id, term, tf, df, score, CAST(rank AS BIGINT) AS rank
      FROM r WHERE rank <= 3""".stripMargin.trim),
    // same canonical-fingerprint spelling as q_fingerprint
    "q_dedup_incremental" -> ("""
      WITH f AS (SELECT doc_id,
                   md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint
                 FROM documents)
      SELECT fingerprint, MIN(doc_id) AS doc_id, COUNT(*) AS n
      FROM f b WHERE doc_id % 10 >= 8
        AND NOT EXISTS (SELECT 1 FROM f c WHERE c.doc_id % 10 < 8
                        AND c.fingerprint = b.fingerprint)
      GROUP BY fingerprint""".stripMargin.trim),
    // exact cross-split >=0.8-Jaccard matches: valid as an exact-set
    // oracle for the LSH-probed operator for the same reason as
    // q_dedup_minhash (every candidate exact-verified; candidate-miss
    // probability negligible — see minHashOracleGuard)
    "q_dedup_incr_near" -> ("""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      g AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS ng
            FROM w, (SELECT unnest(generate_series(1, len(ws) - 2)) AS i)
            WHERE len(ws) >= 3),
      sz AS (SELECT doc_id, COUNT(*) AS s FROM g GROUP BY doc_id),
      inter AS (SELECT b.doc_id AS doc_id, c.doc_id AS corpus_id, COUNT(*) AS inter
                FROM g b JOIN g c ON b.ng = c.ng
                WHERE b.doc_id % 10 >= 8 AND c.doc_id % 10 < 8
                GROUP BY 1, 2),
      m AS (SELECT inter.doc_id AS doc_id, MIN(corpus_id) AS dup_of,
                   COUNT(*) AS n_dups
            FROM inter
            JOIN sz sa ON sa.doc_id = inter.doc_id
            JOIN sz sb ON sb.doc_id = corpus_id
            WHERE inter.inter * 9 >= 4 * (sa.s + sb.s)
            GROUP BY inter.doc_id)
      SELECT d.doc_id, dup_of,
             COALESCE(n_dups, CAST(0 AS BIGINT)) AS n_dups,
             CAST(CASE WHEN dup_of IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_new
      FROM documents d LEFT JOIN m USING (doc_id)
      WHERE d.doc_id % 10 >= 8""".stripMargin.trim),
    // the end-to-end curation ledger (Pipeline.curate): composes the
    // PROVEN oracle spellings of q_lang_hist (lang CASE), q_quality_filter
    // (metric CTEs + rule), q_train_eval_assign (md5 canonical split), and
    // q_decontaminate (distinct-3-gram join); the planted union mirrors
    // Pipeline.curate's plantDups. All three ledger variants are built by
    // [[pipelineOracle]] from ONE spelling of the shared stages, so the
    // fuzzy/coverage variants cannot drift from the base ledger.
    "q_pipeline_curate" -> pipelineOracle(
      nearPlants = false, fuzzy = false, covPct = None),
    // adds the near-dedup stage between exact dedup and split: the
    // q_split_cluster_safe recursive-CTE component spelling (exact
    // >=0.8-Jaccard pairs, min-label components) over the exact-dedup
    // survivors; near plants mirrored. RECALL COUPLING: like
    // q_split_cluster_safe, this exact-set oracle relies on LSH recall —
    // one missed pair flips a representative and many ledger rows; valid
    // under the same minHashOracleGuard bound (planted pairs sit at
    // J=(n-2)/(n-1) >= 0.94 for quality-passing docs), and if that ever
    // degrades, downgrade THIS query to rows-only first.
    "q_pipeline_curate_fuzzy" -> pipelineOracle(
      nearPlants = true, fuzzy = true, covPct = None),
    // coverage-threshold decontamination (contaminationCoverage's
    // arithmetic inside the ledger): drop at >= 40% distinct-n-gram
    // coverage instead of >= 1 shared n-gram
    "q_pipeline_curate_cov" -> pipelineOracle(
      nearPlants = false, fuzzy = false, covPct = Some(40)),
    // INCREMENTAL curation (CurateState): the oracle is the FULL-REBUILD
    // ledger over batch1 (doc_id < 250) ∪ batch2 (the rest + planted
    // cross-state dup/near-dup copies of batch1 docs), RESTRICTED to
    // batch2's rows — the CurateState equality contract re-derived in
    // DuckDB: a batch judged against the stored state must answer
    // exactly as the rebuild answers for its rows (coverage decontam at
    // 40%, the bench-SF-safe config — see the fixture note in
    // TESTDATA.md/PipelineSpec)
    "q_pipeline_curate_incr" -> pipelineOracle(
      nearPlants = true, fuzzy = true, covPct = Some(40),
      plantFromSql = " AND doc_id < 250",
      finalWhere = "\n      WHERE k.doc_id >= 250"),
    // adds the C4-style bad-words stage between lang-ID and quality
    // (the q_blocklist terms); same shared-CTE spelling, so the
    // blocklist variant cannot drift from the base ledger
    "q_pipeline_curate_block" -> pipelineOracle(
      nearPlants = false, fuzzy = false, covPct = None,
      blockTerms = Some(operators.Profile.driverBlocklist)),
    // the ExactSubstr removal stage inside the ledger: the
    // q_verbatim_clean oracle spelling run over the survivor set, the
    // contamination n-grams reading the CLEANED text, n_tokens_removed
    // surfaced (0 for docs that were not survivors when the cut ran)
    "q_pipeline_curate_verbatim" -> pipelineOracle(
      nearPlants = false, fuzzy = false, covPct = None, verbatim = true),
    // CCNet's closing perplexity stage: the base ledger as a derived
    // table, final train/eval survivors scored by the SHARED lmScoreSql
    // bitlen staircase (the q_lm_score spelling — cross-engine exact)
    // and bucketed by the q_lm_buckets tertile arithmetic over the
    // SURVIVOR distribution; dropped docs carry NULL
    "q_pipeline_curate_ppl" -> (lmScoreSql + """,
      led AS (""" + pipelineOracle(
        nearPlants = false, fuzzy = false, covPct = None) + """),
      psc AS (SELECT s.doc_id, CAST(s.bits * 100 // s.n_tokens AS BIGINT) AS bp
              FROM s JOIN led USING (doc_id)
              WHERE led.outcome IN ('train', 'eval')),
      pn AS (SELECT COUNT(*) AS n FROM psc),
      prk AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bp, doc_id) AS r FROM psc)
      SELECT led.doc_id, led.n_tokens, led.outcome,
             CASE WHEN prk.r IS NULL THEN NULL
                  WHEN prk.r <= pn.n // 3 THEN 'head'
                  WHEN prk.r <= pn.n * 2 // 3 THEN 'middle'
                  ELSE 'tail' END AS ppl_bucket
      FROM led CROSS JOIN pn
      LEFT JOIN prk ON prk.doc_id = led.doc_id""".stripMargin.trim),
    // the GPT-3-style classifier stage inside the ledger: the base
    // ledger as a derived table, NB staircase weights (en reference
    // positive, the planted corpus negative — the nbPlantedSql
    // arithmetic at vocab 16), kept train docs ranked by the
    // offset per-token score and the bottom tertile re-attributed
    // dropped_classifier (the q_lm_buckets global-rank spelling; the
    // +10000 offset keeps the division positive, where both engines'
    // integer division agree)
    "q_pipeline_curate_clf" -> ("""
      WITH led AS (""" + pipelineOracle(
        nearPlants = false, fuzzy = false, covPct = Some(40)) + """),
      cd AS (SELECT doc_id, text FROM documents
             UNION ALL
             SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0),
      cut AS (SELECT 1 AS is_pos, unnest(string_split(text, ' ')) AS tok
              FROM documents WHERE lang = 'en'
              UNION ALL
              SELECT 0, unnest(string_split(text, ' ')) FROM cd),
      ctot AS (SELECT CAST(SUM(is_pos) AS BIGINT) AS np,
                      CAST(SUM(1 - is_pos) AS BIGINT) AS nn FROM cut),
      cv2 AS (SELECT tok, CAST(SUM(is_pos) AS BIGINT) AS cp,
                     CAST(SUM(1 - is_pos) AS BIGINT) AS cn
              FROM cut GROUP BY tok ORDER BY COUNT(*) DESC, tok LIMIT 16),
      cw2 AS (SELECT tok,
                (CAST(length(bin(nn)) AS BIGINT) - CAST(length(bin(cn + 1)) AS BIGINT))
              - (CAST(length(bin(np)) AS BIGINT) - CAST(length(bin(cp + 1)) AS BIGINT))
                AS w
              FROM cv2 CROSS JOIN ctot),
      csc AS (SELECT dt.doc_id,
                CAST(SUM(COALESCE(cw2.w, 0)) AS BIGINT) AS score,
                CAST(COUNT(*) AS BIGINT) AS n
              FROM (SELECT cd.doc_id, unnest(string_split(cd.text, ' ')) AS tok
                    FROM cd JOIN led ON led.doc_id = cd.doc_id
                    WHERE led.outcome = 'train') dt
              LEFT JOIN cw2 USING (tok)
              GROUP BY dt.doc_id),
      cspt AS (SELECT doc_id, (score * 100 + 10000 * n) // n AS spt FROM csc),
      crk AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY spt, doc_id) AS r,
                     COUNT(*) OVER () AS cnt FROM cspt),
      cdrop AS (SELECT doc_id FROM crk WHERE r <= cnt // 3)
      SELECT led.doc_id, led.n_tokens,
             CASE WHEN cdrop.doc_id IS NOT NULL THEN 'dropped_classifier'
                  ELSE led.outcome END AS outcome
      FROM led LEFT JOIN cdrop USING (doc_id)""".stripMargin.trim),
    // THE FULL RECIPE in one CTE: every stage of the shared builder on
    // at once (planted exact + near dups, fuzzy clusters, verbatim cuts
    // with the CLEANED text surfaced, 40% coverage decontam), then the
    // classifier stage scoring the CLEANED train text (weights: en
    // reference positive vs the FULLY-PLANTED corpus negative — the
    // engine's exact inputs) and the perplexity tertile scoring the
    // CLEANED post-classifier survivors. Each stage's arithmetic is the
    // proven single-variant spelling; what THIS oracle adds is their
    // interactions, hash-checked end to end. Same LSH recall coupling
    // as q_pipeline_curate_fuzzy (downgrade to rows-only first if that
    // bound ever degrades).
    "q_pipeline_curate_full" -> ("""
      WITH led AS MATERIALIZED (""" + pipelineOracle(
        nearPlants = true, fuzzy = true, covPct = Some(40),
        verbatim = true, surfaceText = true, quotePlants = true) + """),
      cd AS (SELECT doc_id, text FROM documents
             UNION ALL
             SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
             UNION ALL
             SELECT doc_id + 2000000 AS doc_id, text || ' plantedneardup' AS text
             FROM documents WHERE doc_id % 11 = 3
             UNION ALL
             SELECT doc_id + 3000000 AS doc_id,
                    array_to_string(
                      list_concat(list_concat(
                        string_split(text, ' ')[1:25],
                        ['the','and','of','to','in','a','is','was']),
                        list_transform(range(1, 23),
                          j -> 'fq' || CAST(doc_id AS VARCHAR) || 'x' || CAST(j AS VARCHAR))),
                      ' ') AS text
             FROM documents WHERE doc_id % 13 = 5),
      cut AS (SELECT 1 AS is_pos, unnest(string_split(text, ' ')) AS tok
              FROM documents WHERE lang = 'en'
              UNION ALL
              SELECT 0, unnest(string_split(text, ' ')) FROM cd),
      ctot AS (SELECT CAST(SUM(is_pos) AS BIGINT) AS np,
                      CAST(SUM(1 - is_pos) AS BIGINT) AS nn FROM cut),
      cv2 AS (SELECT tok, CAST(SUM(is_pos) AS BIGINT) AS cp,
                     CAST(SUM(1 - is_pos) AS BIGINT) AS cn
              FROM cut GROUP BY tok ORDER BY COUNT(*) DESC, tok LIMIT 16),
      cw2 AS (SELECT tok,
                (CAST(length(bin(nn)) AS BIGINT) - CAST(length(bin(cn + 1)) AS BIGINT))
              - (CAST(length(bin(np)) AS BIGINT) - CAST(length(bin(cp + 1)) AS BIGINT))
                AS w
              FROM cv2 CROSS JOIN ctot),
      ctk AS (SELECT doc_id, unnest(string_split(eff_text, ' ')) AS tok
              FROM led WHERE outcome = 'train'),
      csc AS (SELECT ctk.doc_id,
                CAST(SUM(COALESCE(cw2.w, 0)) AS BIGINT) AS score,
                CAST(COUNT(*) AS BIGINT) AS n
              FROM ctk LEFT JOIN cw2 USING (tok) GROUP BY ctk.doc_id),
      cspt AS (SELECT doc_id, (score * 100 + 10000 * n) // n AS spt FROM csc),
      crk AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY spt, doc_id) AS r,
                     COUNT(*) OVER () AS cnt FROM cspt),
      cdrop AS (SELECT doc_id FROM crk WHERE r <= cnt // 3),
      led2 AS MATERIALIZED (SELECT led.doc_id, led.n_tokens, led.n_tokens_removed, led.eff_text,
                 CASE WHEN cdrop.doc_id IS NOT NULL THEN 'dropped_classifier'
                      ELSE led.outcome END AS outcome
               FROM led LEFT JOIN cdrop USING (doc_id)),
      lref AS (SELECT unnest(string_split(text, ' ')) AS tok
               FROM documents WHERE lang = 'en'),
      lv AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
             FROM lref GROUP BY tok ORDER BY cnt DESC, tok LIMIT 16),
      ln0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS ntot FROM lref),
      ptk AS (SELECT doc_id, unnest(string_split(eff_text, ' ')) AS tok
              FROM led2 WHERE outcome IN ('train', 'eval')),
      psc AS (SELECT ptk.doc_id, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CAST(length(bin(ln0.ntot)) AS BIGINT)
                  - CAST(length(bin(COALESCE(lv.cnt, 0) + 1)) AS BIGINT)) AS BIGINT) AS bits
              FROM ptk LEFT JOIN lv USING (tok) CROSS JOIN ln0
              GROUP BY ptk.doc_id),
      pbp AS (SELECT doc_id, CAST(bits * 100 // n AS BIGINT) AS bp FROM psc),
      pn AS (SELECT COUNT(*) AS n FROM pbp),
      prk AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bp, doc_id) AS r FROM pbp)
      SELECT led2.doc_id, led2.n_tokens, led2.outcome, led2.n_tokens_removed,
             CASE WHEN prk.r IS NULL THEN NULL
                  WHEN prk.r <= pn.n // 3 THEN 'head'
                  WHEN prk.r <= pn.n * 2 // 3 THEN 'middle'
                  ELSE 'tail' END AS ppl_bucket
      FROM led2 CROSS JOIN pn
      LEFT JOIN prk ON prk.doc_id = led2.doc_id""".stripMargin.trim),
    // the same ledger, aggregated — built from the q_pipeline_curate CTE
    // as a derived table (see oracleSql) so the two oracles cannot drift
    "q_pipeline_stats" -> "PLACEHOLDER_PIPELINE_STATS",
    // direct single-window spelling of the concat-and-chunk packing —
    // the engine computes the same prefix blockwise (Mixture
    // .packSequencesOn; equality asserted in MixtureSpec). The md5
    // fingerprint is the deterministic shuffle-order key; unnest(range)
    // mirrors Spark's explode(sequence) over the straddled chunk ids
    "q_pack_sequences" -> ("""
      WITH t AS (SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS key
                 FROM documents),
      r AS (SELECT doc_id, n_tokens,
              COALESCE(CAST(SUM(n_tokens) OVER (ORDER BY key, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                CAST(0 AS BIGINT)) AS strt
            FROM t),
      e AS (SELECT doc_id, n_tokens, strt,
              unnest(range(strt // 512, (strt + n_tokens - 1) // 512 + 1)) AS seq_id
            FROM r)
      SELECT doc_id, CAST(seq_id AS BIGINT) AS seq_id, n_tokens,
             CAST(LEAST((seq_id + 1) * 512, strt + n_tokens)
                - GREATEST(seq_id * 512, strt) AS BIGINT) AS tok_in_seq
      FROM e""".stripMargin.trim),
    // quota = min(n, 4*floor(sqrt(n))): sqrt is IEEE correctly rounded,
    // so the floor is bit-identical across engines (pow's 1-ulp license
    // is exactly why the alpha=0.5 temperature is spelled via sqrt)
    "q_mixture_plan" -> ("""
      WITH t AS (SELECT source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
                 FROM documents)
      SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
             LEAST(COUNT(*), CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) * 4) AS quota
      FROM t GROUP BY source""".stripMargin.trim),
    // direct per-source rank spelling — the engine ranks blockwise
    // within (source, fp-prefix) + offsets (equality via the shared rk
    // column: a wrong offset breaks the hash, not just membership)
    "q_mixture_sample" -> ("""
      WITH t AS (SELECT doc_id, source,
                   md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS key
                 FROM documents),
      q AS (SELECT source,
              LEAST(COUNT(*), CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) * 4) AS quota
            FROM t GROUP BY source),
      r AS (SELECT doc_id, source,
              CAST(ROW_NUMBER() OVER (PARTITION BY source
                ORDER BY key, doc_id) AS BIGINT) AS rk
            FROM t)
      SELECT r.doc_id, r.source, r.rk
      FROM r JOIN q USING (source) WHERE r.rk <= q.quota""".stripMargin.trim),
    // hashed-feature buckets are md5-prefix STRINGS (4096 of them) so
    // both engines spell the hash identically; weights in integer ppm
    "q_dsir_weights" -> (dsirScoreSql + """
      SELECT doc_id, n_tokens, score_ppm,
             CAST(score_ppm // n_tokens AS BIGINT) AS avg_ppm
      FROM s""".stripMargin.trim),
    // top-quartile selection from the avg_ppm histogram: values whose
    // running count fits the quota keep every doc, the crossing value
    // tie-breaks by doc_id — same arithmetic as Mixture.importanceResampleOn
    "q_dsir_resample" -> (dsirScoreSql + """,
      sc AS (SELECT doc_id, CAST(score_ppm // n_tokens AS BIGINT) AS avg_ppm FROM s),
      h AS (SELECT avg_ppm, COUNT(*) AS cnt FROM sc GROUP BY avg_ppm),
      c AS (SELECT avg_ppm, cnt,
              COALESCE(CAST(SUM(cnt) OVER (ORDER BY avg_ppm DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                CAST(0 AS BIGINT)) AS cum_before
            FROM h),
      n AS (SELECT CAST(SUM(cnt) // 4 AS BIGINT) AS quota FROM h),
      m AS (SELECT avg_ppm,
              (cum_before + cnt <= quota) AS whole,
              (quota - cum_before) AS room
            FROM c CROSS JOIN n WHERE cum_before < quota),
      rr AS (SELECT sc.doc_id, sc.avg_ppm, m.whole, m.room,
              CAST(ROW_NUMBER() OVER (PARTITION BY sc.avg_ppm
                ORDER BY sc.doc_id) AS BIGINT) AS rin
             FROM sc JOIN m USING (avg_ppm))
      SELECT doc_id, avg_ppm FROM rr WHERE whole OR rin <= room""".stripMargin.trim),
    // composed tail: the q_pipeline_curate ledger (as a derived table,
    // the q_pipeline_stats wrapping precedent — the two oracles cannot
    // drift) keeps outcome='train', re-attaches source from documents,
    // then the q_mixture_sample rank/quota arithmetic runs over the
    // survivors. Planted ledger rows never reach 'train' (they always
    // lose the keeper race), so the join back to documents is total.
    "q_mixture_curated" -> mixtureCuratedSql,
    // the full tail: mixture-picked docs (the q_mixture_curated query
    // as a derived table) fed through the q_pack_sequences direct
    // single-window spelling — curation, mixture, and packing oracles
    // composed, so none of the three can drift from its standalone twin
    "q_corpus_build" -> ("""
      WITH t AS (SELECT d.doc_id,
                   CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
                   md5(regexp_replace(trim(lower(d.text)), '\s+', ' ', 'g')) AS key
                 FROM documents d
                 JOIN (""" + mixtureCuratedSql + """) pk
                   ON pk.doc_id = d.doc_id),
      r AS (SELECT doc_id, n_tokens,
              COALESCE(CAST(SUM(n_tokens) OVER (ORDER BY key, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                CAST(0 AS BIGINT)) AS strt
            FROM t),
      e AS (SELECT doc_id, n_tokens, strt,
              unnest(range(strt // 512, (strt + n_tokens - 1) // 512 + 1)) AS seq_id
            FROM r)
      SELECT doc_id, CAST(seq_id AS BIGINT) AS seq_id, n_tokens,
             CAST(LEAST((seq_id + 1) * 512, strt + n_tokens)
                - GREATEST(seq_id * 512, strt) AS BIGINT) AS tok_in_seq
      FROM e""".stripMargin.trim),
    // CCNet-style cross-entropy in whole bits: the bitlen staircase is
    // integer-exact in both engines (log/ln carry a 1-ulp license;
    // length(bin(x)) has one spelling)
    "q_lm_score" -> (lmScoreSql + """
      SELECT doc_id, n_tokens, bits,
             CAST(bits * 100 // n_tokens AS BIGINT) AS bits_per_100
      FROM s""".stripMargin.trim),
    // the stored-model twin answers IDENTICALLY: LM count merging is
    // exact, so one SQL serves both the inline and the stored spelling
    "q_lm_score_idx" -> (lmScoreSql + """
      SELECT doc_id, n_tokens, bits,
             CAST(bits * 100 // n_tokens AS BIGINT) AS bits_per_100
      FROM s""".stripMargin.trim),
    // NB token log-odds classifier, en-vs-rest on the lang labels —
    // weights are the bitlen-staircase log-odds over the vocab-capped
    // combined stream; decision is division-free (score*100 >= 0)
    "q_nb_classifier" -> nbClassifierSql,
    // the stored-model twin answers IDENTICALLY: count merging is
    // exact, so the same oracle certifies the artifact round-trip
    "q_nb_classifier_idx" -> nbClassifierSql,
    // the planted-separable twin: zj-prefix drift on every third token
    // (0-based positions 0,3,... = 1-based i%3=1) of doc_id%3 docs,
    // trained clean-vs-mangled over the SAME drifted stream
    "q_nb_classifier_planted" -> (nbPlantedSql + """
      SELECT doc_id, n_tokens, score, label_pos, is_mangled FROM scored"""
      .stripMargin.trim),
    // its 4-cell confusion matrix
    "q_nb_confusion" -> (nbPlantedSql + """
      SELECT is_mangled, label_pos, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM scored GROUP BY is_mangled, label_pos""".stripMargin.trim),
    // direct global-rank tertile spelling — the engine assigns buckets
    // per score VALUE from the histogram and tie-breaks only the
    // boundary-straddling values (equality certified by this oracle:
    // a wrong straddle split breaks the hash)
    "q_lm_buckets" -> (lmScoreSql + """,
      sc AS (SELECT doc_id, CAST(bits * 100 // n_tokens AS BIGINT) AS bits_per_100
             FROM s),
      r2 AS (SELECT doc_id, bits_per_100,
              CAST(ROW_NUMBER() OVER (ORDER BY bits_per_100, doc_id) AS BIGINT) AS rk,
              CAST(COUNT(*) OVER () AS BIGINT) AS n
             FROM sc)
      SELECT doc_id, bits_per_100,
             CASE WHEN rk <= n // 3 THEN 'head'
                  WHEN rk <= n * 2 // 3 THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM r2""".stripMargin.trim),
    // direct global-rank spelling of the curriculum position — the
    // engine computes the same rank blockwise (Mixture.curriculumOrderOn;
    // equality asserted in MixtureSpec)
    // deterministic integer waterfilling over the source frame: full
    // rounds from the 1-row total, the partial round dealt in source-
    // name order by prefix sum (window SUM promotes to HUGEINT in
    // DuckDB — surfaced columns cast back to BIGINT per house rule)
    "q_epoch_schedule" -> ("""
      WITH s AS (SELECT source,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
                 FROM documents GROUP BY source),
      t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t_total FROM s),
      a AS (SELECT source, n_tokens,
                   LEAST(4, 60000 // t_total) AS r0,
                   CASE WHEN LEAST(4, 60000 // t_total) >= 4 THEN 0
                        ELSE 60000 - LEAST(4, 60000 // t_total) * t_total END AS rem,
                   COALESCE(SUM(n_tokens) OVER (ORDER BY source
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
            FROM s CROSS JOIN t),
      f AS (SELECT source, n_tokens,
                   r0 * n_tokens + GREATEST(0, LEAST(n_tokens, rem - bef)) AS tokens_alloc
            FROM a)
      SELECT source, n_tokens, CAST(tokens_alloc AS BIGINT) AS tokens_alloc,
             CAST(tokens_alloc * 100 // n_tokens AS BIGINT) AS epochs_x100
      FROM f""".stripMargin.trim),
    "q_curriculum" -> (lmScoreSql + """,
      g AS (SELECT doc_id, CAST(bits * 100 // n_tokens AS BIGINT) AS grade
            FROM s)
      SELECT d.doc_id, g.grade,
             CAST(ROW_NUMBER() OVER (ORDER BY g.grade,
               md5(regexp_replace(trim(lower(d.text)), '\s+', ' ', 'g')),
               d.doc_id) AS BIGINT) AS pos
      FROM documents d JOIN g ON g.doc_id = d.doc_id""".stripMargin.trim),
    // pure per-row chunk arithmetic — range/unnest mirrors Spark's
    // explode(sequence); DuckDB's 1-based inclusive list slice mirrors
    // Spark's slice(toks, start, len)
    "q_chunk_passages" -> ("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n
                 FROM documents),
      c AS (SELECT doc_id, toks, n,
              unnest(range(0, CASE WHEN n <= 32 THEN 1
                ELSE (n - 32 + 24 - 1) // 24 + 1 END)) AS cid
            FROM t)
      SELECT doc_id, CAST(cid AS BIGINT) AS chunk_id,
             CAST(cid * 24 + 1 AS BIGINT) AS start_tok,
             CAST(LEAST(32, n - cid * 24) AS BIGINT) AS n_tok,
             array_to_string(toks[(cid*24+1):(cid*24 + LEAST(32, n - cid*24))],
               ' ') AS chunk_text
      FROM c""".stripMargin.trim),
    // same fingerprint spelling as the dedup/mixture family; min(source)
    // attribution avoids any min_by/ordering license
    // the five OLS sufficient statistics in one CTE; slope NULL when
    // the denominator degenerates (single-day series)
    "q_events_trend" -> ("""
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                            COUNT(*) AS y
                     FROM events GROUP BY 1, 2),
      d0 AS (SELECT MIN(day) AS d0 FROM daily),
      pts AS (SELECT event_type,
                     CAST(datediff('day', d0, day) AS BIGINT) AS x, y
              FROM daily, d0),
      s AS (SELECT event_type, COUNT(*) AS n_days,
                   CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx
            FROM pts GROUP BY 1)
      SELECT event_type, n_days,
             CASE WHEN n_days * sxx - sx * sx <> 0
                  THEN CAST((n_days * sxy - sx * sy) * 1000000
                            // (n_days * sxx - sx * sx) AS BIGINT)
             END AS slope_ppm
      FROM s""".stripMargin.trim),
    // lag over the (ts, event_id)-ordered per-user stream; bucket =
    // length(bin(gap_us)) — the LM scorers' cross-engine staircase
    "q_event_latency_hist" -> ("""
      WITH d AS (SELECT epoch_us(ts)
                        - LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id
                                                     ORDER BY ts, event_id)
                        AS delta
                 FROM events)
      SELECT CAST(length(bin(delta)) AS BIGINT) AS bucket, COUNT(*) AS n
      FROM d WHERE delta IS NOT NULL GROUP BY 1""".stripMargin.trim),
    "q_user_growth" -> ("""
      WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS day
                 FROM events GROUP BY user_id),
      d AS (SELECT day, COUNT(*) AS n_new FROM f GROUP BY day)
      SELECT day, n_new,
             CAST(SUM(n_new) OVER (ORDER BY day
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS BIGINT) AS n_total
      FROM d""".stripMargin.trim),
    // cover-day fan-out mirrored: each active day keeps the user
    // active for the next 6, clipped at the corpus-wide last day
    "q_rolling_actives" -> ("""
      WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      last AS (SELECT MAX(day) AS d1 FROM act),
      cov AS (SELECT DISTINCT user_id, day + CAST(i AS INTEGER) AS day2
              FROM act, last, (SELECT unnest(range(0, 7)) AS i)
              WHERE day + CAST(i AS INTEGER) <= d1)
      SELECT day2 AS day, COUNT(*) AS n_active_7d
      FROM cov GROUP BY 1""".stripMargin.trim),
    // ROW_NUMBER both directions == the engine's struct arg-min/max
    // because (ts, event_id) is a total order per user
    "q_attribution" -> ("""
      WITH r AS (SELECT user_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rf,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rl
                 FROM events)
      SELECT user_id,
             MAX(CASE WHEN rf = 1 THEN event_type END) AS first_touch,
             MAX(CASE WHEN rl = 1 THEN event_type END) AS last_touch,
             COUNT(*) AS n_events
      FROM r GROUP BY user_id""".stripMargin.trim),
    // mirrors the engine's week arithmetic: global week index from the
    // corpus-wide first day, churn = no (user, week+1) activity row
    "q_user_churn" -> ("""
      WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d),
      w AS (SELECT DISTINCT user_id,
              CAST(datediff('day', d0, day) AS BIGINT) // 7 AS week_k,
              CAST(datediff('day', d0, d1) AS BIGINT) // 7 AS max_week
            FROM d, span),
      act AS (SELECT week_k, COUNT(*) AS n_active FROM w GROUP BY 1),
      gone AS (SELECT week_k, COUNT(*) AS n_churned
               FROM w
               WHERE week_k < max_week
                 AND NOT EXISTS (SELECT 1 FROM w w2
                                 WHERE w2.user_id = w.user_id
                                   AND w2.week_k = w.week_k + 1)
               GROUP BY 1)
      SELECT week_k, n_active,
             COALESCE(n_churned, CAST(0 AS BIGINT)) AS n_churned
      FROM act LEFT JOIN gone USING (week_k)""".stripMargin.trim),
    // LEAD over the (ts, event_id)-ordered user stream — the tiebreak
    // column makes the trigram stream identical on both engines
    "q_event_paths" -> ("""
      WITH s AS (SELECT event_type,
                   LEAD(event_type, 1) OVER w AS e2,
                   LEAD(event_type, 2) OVER w AS e3
                 FROM events
                 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      p AS (SELECT event_type || ' > ' || e2 || ' > ' || e3 AS path
            FROM s WHERE e3 IS NOT NULL)
      SELECT path, COUNT(*) AS n FROM p GROUP BY path
      ORDER BY n DESC, path ASC LIMIT 10""".stripMargin.trim),
    // same deterministic dirtying as Audit.lineitemAudit; SUM counts
    // cast from DuckDB's HUGEINT promotion back to BIGINT
    "q_dq_audit" -> ("""
      WITH o AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
      dirty AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 1000 = 13 THEN o_custkey + 1000000000
                    ELSE o_custkey END AS o_custkey,
               CASE WHEN o_orderkey % 1000 = 7 THEN -o_totalprice
                    ELSE o_totalprice END AS o_totalprice
        FROM o
        UNION ALL SELECT * FROM o WHERE o_orderkey % 1000 = 21),
      rowchk AS (
        SELECT 'totalprice_positive' AS check_name,
               CAST(COALESCE(SUM(CASE WHEN o_totalprice <= 0.0
                                      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_violations
        FROM dirty
        UNION ALL
        SELECT 'totalprice_not_null',
               CAST(COALESCE(SUM(CASE WHEN o_totalprice IS NULL
                                      THEN 1 ELSE 0 END), 0) AS BIGINT)
        FROM dirty),
      pk AS (SELECT 'pk_orderkey' AS check_name, COUNT(*) AS n_violations
             FROM (SELECT o_orderkey FROM dirty
                   GROUP BY 1 HAVING COUNT(*) > 1)),
      fk AS (SELECT 'fk_customer_exists' AS check_name,
                    COUNT(*) AS n_violations
             FROM dirty
             WHERE NOT EXISTS (SELECT 1 FROM customer
                               WHERE c_custkey = dirty.o_custkey))
      SELECT * FROM rowchk UNION ALL SELECT * FROM pk
      UNION ALL SELECT * FROM fk""".stripMargin.trim),
    // the oracle recomputes the rollup FROM SCRATCH over all orders;
    // the engine merges the 80/20 pre-aggregated partials — equality
    // certifies the incremental maintenance arithmetic
    "q_ivm_orders" -> ("""
      SELECT o_custkey, COUNT(*) AS n_orders,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_cents
      FROM orders GROUP BY o_custkey""".stripMargin.trim),
    // ROW_NUMBER pick == the engine's band-located exact top-k: ties
    // always co-band, so the (cents desc, custkey asc) order agrees
    "q_revenue_top1" -> ("""
      WITH rev AS (SELECT o_custkey,
                          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
                   FROM orders GROUP BY o_custkey),
      kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS nc,
                    GREATEST(COUNT(*) * 1 // 100, 1) AS k,
                    CAST(SUM(cents) AS BIGINT) AS total_cents
             FROM rev),
      r AS (SELECT cents,
                   ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey ASC) AS rk
            FROM rev),
      t AS (SELECT CAST(SUM(cents) AS BIGINT) AS top_cents
            FROM r, kk WHERE rk <= k)
      SELECT nc AS n_customers, CAST(k AS BIGINT) AS k, top_cents,
             total_cents,
             CAST(top_cents * 1000000 // total_cents AS BIGINT) AS share_ppm
      FROM kk, t""".stripMargin.trim),
    // lead over the (ts, event_id)-ordered per-user stream; p_ppm is
    // the exact integer share of the current type's outgoing edges
    "q_event_transitions" -> ("""
      WITH s AS (SELECT event_type,
                   LEAD(event_type, 1) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS next_type
                 FROM events),
      p AS (SELECT event_type, next_type, COUNT(*) AS n
            FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2),
      o AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS out_n
            FROM p GROUP BY 1)
      SELECT p.event_type, p.next_type, p.n,
             CAST(p.n * 1000000 // o.out_n AS BIGINT) AS p_ppm
      FROM p JOIN o USING (event_type)""".stripMargin.trim),
    "q_forecast_revenue" -> ("""
      SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                           * CAST(l_discount AS DECIMAL(18,2))
                           AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
        AND l_discount >= 0.02 AND l_discount <= 0.04
        AND l_quantity < 24.0""".stripMargin.trim),
    "q_promo_share" -> ("""
      WITH j AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                             AS DECIMAL(18,4)) AS rev,
                        CASE WHEN p_type = 'ECONOMY' THEN 1 ELSE 0 END AS promo
                 FROM lineitem JOIN part ON l_partkey = p_partkey
                 WHERE l_shipdate >= TIMESTAMP '1997-03-01'
                   AND l_shipdate < TIMESTAMP '1997-04-01'),
      s AS (SELECT CAST(SUM(CASE WHEN promo = 1 THEN rev
                                 ELSE CAST(0 AS DECIMAL(18,4)) END) * 10000 AS BIGINT) AS promo_rev,
                   CAST(SUM(rev) * 10000 AS BIGINT) AS total_rev
            FROM j)
      SELECT promo_rev, total_rev,
             CAST(promo_rev * 1000000 // total_rev AS BIGINT) AS promo_ppm
      FROM s""".stripMargin.trim),
    // the plain semi join IS the oracle: hash-green certifies the
    // bloom prune admits every true match (no false negatives)
    "q_bloom_semi" -> ("""
      SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty
      FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                           WHERE o_orderpriority = '1-URGENT')
      GROUP BY l_returnflag""".stripMargin.trim),
    "q_key_skew" -> ("""
      WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key_value,
                        COUNT(*) AS n_rows
                 FROM events GROUP BY 1),
      t AS (SELECT COUNT(*) AS n_total FROM events)
      SELECT key_value, n_rows,
             CAST(n_rows * 1000000 // n_total AS BIGINT) AS share_ppm
      FROM c, t ORDER BY n_rows DESC, key_value ASC LIMIT 5""".stripMargin.trim),
    // the oracle IS the A×B filter the engine must never plan: DuckDB
    // cross-joins the two ≤128-name catalogs, the engine arrives at the
    // same pairs through deletion-variant blocking
    "q_fuzzy_match" -> ("""
      WITH a AS (SELECT DISTINCT p_name AS name_a FROM part WHERE p_partkey % 2 = 0),
      b0 AS (SELECT CASE WHEN p_partkey % 3 = 0
                         THEN substr(p_name, 1, 2) || substr(p_name, 4)
                         ELSE p_name END AS name_b
             FROM part WHERE p_partkey % 2 = 1),
      b AS (SELECT DISTINCT name_b FROM b0)
      SELECT name_a, name_b,
             CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
      FROM a, b WHERE levenshtein(name_a, name_b) <= 1""".stripMargin.trim),
    // IS DISTINCT FROM mirrors the engine's null-safe <=> payload
    // compare; tombstones carry the old payload
    "q_cdc_derive" -> ("""
      WITH docs AS (SELECT doc_id, source, n_chars FROM documents),
      old AS (SELECT * FROM docs WHERE doc_id % 20 <> 3),
      nw AS (SELECT doc_id,
                    CASE WHEN doc_id % 20 = 11 THEN source || '-v2'
                         ELSE source END AS source,
                    n_chars
             FROM docs WHERE doc_id % 20 <> 7)
      SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
             CAST(1 AS BIGINT) AS seq,
             CASE WHEN o.doc_id IS NULL THEN 'I'
                  WHEN n.doc_id IS NULL THEN 'D'
                  ELSE 'U' END AS op,
             CASE WHEN n.doc_id IS NULL THEN o.source ELSE n.source END AS source,
             CASE WHEN n.doc_id IS NULL THEN o.n_chars ELSE n.n_chars END AS n_chars
      FROM old o FULL JOIN nw n ON o.doc_id = n.doc_id
      WHERE o.doc_id IS NULL OR n.doc_id IS NULL
         OR o.source IS DISTINCT FROM n.source
         OR o.n_chars IS DISTINCT FROM n.n_chars""".stripMargin.trim),
    // latest-wins arg-max spelled as ROW_NUMBER pick — equal to the
    // engine's max(struct(seq, …)) because seq (o_orderkey) is unique
    "q_cdc_apply" -> ("""
      WITH base AS (SELECT c_custkey AS key,
                           CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS last_price_cents,
                           'N' AS last_status
                    FROM customer),
      ch AS (SELECT CASE WHEN o_orderkey % 97 = 0 THEN o_custkey + 1000000 ELSE o_custkey END AS key,
                    o_orderkey AS seq,
                    CASE WHEN o_orderkey % 13 = 0 THEN 'D' ELSE 'U' END AS op,
                    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS last_price_cents,
                    o_orderstatus AS last_status
             FROM orders WHERE o_custkey % 5 <> 2),
      latest AS (SELECT key, op, last_price_cents, last_status
                 FROM (SELECT ch.*, ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
                       FROM ch)
                 WHERE rn = 1)
      SELECT COALESCE(b.key, l.key) AS key,
             CASE WHEN l.key IS NULL THEN b.last_price_cents ELSE l.last_price_cents END AS last_price_cents,
             CASE WHEN l.key IS NULL THEN b.last_status ELSE l.last_status END AS last_status
      FROM base b FULL JOIN latest l ON b.key = l.key
      WHERE COALESCE(l.op, 'U') <> 'D'""".stripMargin.trim),
    "q_snapshot_diff" -> ("""
      WITH o AS (SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
                   MIN(source) AS src, COUNT(*) AS n_docs,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_toks
                 FROM documents WHERE doc_id % 20 <> 3 GROUP BY fp),
      nw AS (SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
                   MIN(source) AS src, COUNT(*) AS n_docs,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_toks
                 FROM documents WHERE doc_id % 20 <> 7 GROUP BY fp),
      j AS (SELECT COALESCE(nw.src, o.src) AS source,
              CASE WHEN o.fp IS NULL THEN 'added'
                   WHEN nw.fp IS NULL THEN 'removed' ELSE 'retained' END AS status,
              CASE WHEN o.fp IS NULL OR nw.fp IS NOT NULL THEN nw.n_docs
                   ELSE o.n_docs END AS nd,
              CASE WHEN o.fp IS NULL OR nw.fp IS NOT NULL THEN nw.n_toks
                   ELSE o.n_toks END AS nt
            FROM o FULL OUTER JOIN nw USING (fp))
      SELECT source, status, COUNT(*) AS n_fps, CAST(SUM(nd) AS BIGINT) AS n_docs,
             CAST(SUM(nt) AS BIGINT) AS n_tokens
      FROM j GROUP BY source, status""".stripMargin.trim),
    // per-source data card; avg and ppm via integer DIV (// here), top
    // language by (docs desc, lang asc) — same tie-break both engines
    "q_corpus_card" -> ("""
      WITH b AS (SELECT source, lang, n_chars,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
                 FROM documents),
      sl AS (SELECT source, lang, COUNT(*) AS docs,
               CAST(SUM(n_toks) AS BIGINT) AS toks,
               CAST(SUM(n_chars) AS BIGINT) AS chars,
               MIN(n_chars) AS mn, MAX(n_chars) AS mx
             FROM b GROUP BY source, lang),
      s AS (SELECT source, CAST(SUM(docs) AS BIGINT) AS n_docs,
              CAST(SUM(toks) AS BIGINT) AS n_tokens,
              MIN(mn) AS min_chars, MAX(mx) AS max_chars,
              CAST(SUM(chars) AS BIGINT) AS sum_chars,
              CAST(COUNT(*) AS BIGINT) AS n_langs
            FROM sl GROUP BY source),
      t AS (SELECT source, lang AS top_lang, docs AS tl_docs,
              ROW_NUMBER() OVER (PARTITION BY source
                ORDER BY docs DESC, lang) AS rn
            FROM sl)
      SELECT s.source, s.n_docs, s.n_tokens, s.min_chars, s.max_chars,
             CAST(s.sum_chars // s.n_docs AS BIGINT) AS avg_chars,
             s.n_langs, t.top_lang,
             CAST(t.tl_docs * 1000000 // s.n_docs AS BIGINT) AS top_lang_ppm
      FROM s JOIN t ON t.source = s.source AND t.rn = 1""".stripMargin.trim),
    // one UNION ALL branch per profiled column; doubles render through
    // DECIMAL(18,2) — the one string spelling both engines share
    "q_profile_orders" -> (Seq(
        ("o_orderkey", "CAST(o_orderkey AS VARCHAR)"),
        ("o_custkey", "CAST(o_custkey AS VARCHAR)"),
        ("o_orderstatus", "CAST(o_orderstatus AS VARCHAR)"),
        ("o_totalprice", "CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)"),
        ("o_orderdate", "CAST(o_orderdate AS VARCHAR)"),
        ("o_orderpriority", "CAST(o_orderpriority AS VARCHAR)"))
      .map { case (c, fmt) =>
        s"""SELECT '$c' AS col_name,
             CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
             MIN($fmt) AS min_value, MAX($fmt) AS max_value
           FROM orders"""
      }.mkString("\nUNION ALL\n")),
    // whole-token case-insensitive blocklist hits under the corpus'
    // single-space tokenization; kept = zero hits
    "q_blocklist" -> ("""
      WITH h AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
                 FROM (SELECT doc_id,
                         unnest(string_split(lower(text), ' ')) AS tok
                       FROM documents) t
                 WHERE tok IN ('dup', 'spamword')
                 GROUP BY doc_id)
      SELECT d.doc_id, COALESCE(h.n, 0) AS n_hits,
             h.doc_id IS NULL AS kept
      FROM documents d LEFT JOIN h ON h.doc_id = d.doc_id""".stripMargin.trim),
    // same fingerprint + plant spellings as the Scala side; containment
    // is ppm of the SMALLER side's distinct-content size
    "q_source_overlap" -> ("""
      WITH d AS (SELECT text, source FROM documents
                 UNION ALL
                 SELECT text,
                   'src' || CAST((doc_id % 20 + 1) % 20 AS VARCHAR) AS source
                 FROM documents WHERE doc_id % 9 = 1),
      f AS (SELECT DISTINCT source,
              md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
            FROM d),
      tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
              FROM f GROUP BY source),
      p AS (SELECT a.source AS src_a, b.source AS src_b,
              CAST(COUNT(*) AS BIGINT) AS shared_fps
            FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
            GROUP BY a.source, b.source)
      SELECT p.src_a, p.src_b, p.shared_fps, ta.n AS n_a, tb.n AS n_b,
             CAST(p.shared_fps * 1000000 // LEAST(ta.n, tb.n) AS BIGINT)
               AS containment_ppm
      FROM p JOIN tot ta ON ta.source = p.src_a
             JOIN tot tb ON tb.source = p.src_b""".stripMargin.trim),
    // adjacent-char pairs via 1-based substr sliding over the distinct
    // word table, weighted by corpus word frequency; top 20 by
    // (cnt desc, lsym, rsym) — the first-merge tie-break rule
    "q_bpe_pairs" -> ("""
      WITH wf AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
                  FROM (SELECT unnest(string_split(text, ' ')) AS word
                        FROM documents) w
                  GROUP BY word),
      p AS (SELECT substr(word, i, 1) AS lsym, substr(word, i + 1, 1) AS rsym,
              freq
            FROM wf, (SELECT unnest(generate_series(1, length(word) - 1)) AS i)
            WHERE length(word) >= 2)
      SELECT lsym, rsym, CAST(SUM(freq) AS BIGINT) AS cnt
      FROM p GROUP BY lsym, rsym
      ORDER BY cnt DESC, lsym, rsym LIMIT 20""".stripMargin.trim),
    // same distinct-shingle spelling as the decontamination oracles;
    // sub-3-token docs surface 0 grams and a NULL ppm
    "q_novelty" -> ("""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      g AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS ng
            FROM w, (SELECT unnest(generate_series(1, len(ws) - 2)) AS i)
            WHERE len(ws) >= 3),
      df AS (SELECT ng, CAST(COUNT(*) AS BIGINT) AS df FROM g GROUP BY ng),
      per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS g,
                CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS u
              FROM g JOIN df USING (ng) GROUP BY doc_id)
      SELECT d.doc_id, COALESCE(p.g, 0) AS n_grams,
             COALESCE(p.u, 0) AS n_unique,
             CAST(CASE WHEN p.g > 0 THEN p.u * 1000000 // p.g END AS BIGINT)
               AS novelty_ppm
      FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id""".stripMargin.trim),
    // bigram stupid-backoff staircase: pos-1 unigram bits, known bigram
    // max(0, bitlen(c_uni(prev)+1) - bitlen(c_bi+1)), else 2 + unigram
    // bits — caps and tie-breaks identical to the Scala side
    "q_lm_bigram" -> (lmBigramSql + """
      SELECT doc_id, n_tokens, bits, bits_per_100 FROM bs""".stripMargin.trim),
    // the q_lm_buckets direct global-rank spelling over the BIGRAM
    // scores — certifying the shared histogram split composes
    "q_lm_bigram_buckets" -> (lmBigramSql + """,
      r2 AS (SELECT doc_id, bits_per_100,
              CAST(ROW_NUMBER() OVER (ORDER BY bits_per_100, doc_id) AS BIGINT) AS rk,
              CAST(COUNT(*) OVER () AS BIGINT) AS n
             FROM bs)
      SELECT doc_id, bits_per_100,
             CASE WHEN rk <= n // 3 THEN 'head'
                  WHEN rk <= n * 2 // 3 THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM r2""".stripMargin.trim),
    // same shingle + split spellings as ngramJaccardOracle / q_train_eval_assign
    "q_decontaminate" -> ("""
      WITH w AS (SELECT doc_id,
                   md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) < 'cc' AS is_train,
                   string_split(text, ' ') AS ws
                 FROM documents),
      g AS (SELECT DISTINCT doc_id, is_train, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS ng
            FROM w, (SELECT unnest(generate_series(1, len(ws) - 2)) AS i)
            WHERE len(ws) >= 3),
      e AS (SELECT DISTINCT ng FROM g WHERE NOT is_train)
      SELECT doc_id, COUNT(*) AS n_shared_ngrams
      FROM g JOIN e USING (ng) WHERE is_train
      GROUP BY doc_id""".stripMargin.trim),
    // coverage-ratio extension: integer-percent of each train doc's
    // distinct n-grams found in the eval split, + the >=50% decision bit
    "q_decontaminate_cov" -> ("""
      WITH w AS (SELECT doc_id,
                   md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) < 'cc' AS is_train,
                   string_split(text, ' ') AS ws
                 FROM documents),
      g AS (SELECT DISTINCT doc_id, is_train, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS ng
            FROM w, (SELECT unnest(generate_series(1, len(ws) - 2)) AS i)
            WHERE len(ws) >= 3),
      sz AS (SELECT doc_id, COUNT(*) AS n_ngrams FROM g WHERE is_train GROUP BY doc_id),
      e AS (SELECT DISTINCT ng FROM g WHERE NOT is_train),
      s AS (SELECT doc_id, COUNT(*) AS n_shared_ngrams
            FROM g JOIN e USING (ng) WHERE is_train
            GROUP BY doc_id)
      SELECT s.doc_id, n_shared_ngrams, n_ngrams,
             CAST(n_shared_ngrams * 100 // n_ngrams AS BIGINT) AS cov_pct,
             CAST(CASE WHEN n_shared_ngrams * 100 // n_ngrams >= 50
                  THEN 1 ELSE 0 END AS BIGINT) AS contaminated
      FROM s JOIN sz USING (doc_id)""".stripMargin.trim),
    // eval-side mirror: percent of each eval doc's n-grams found in train
    "q_decontaminate_eval_cov" -> ("""
      WITH w AS (SELECT doc_id,
                   md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) < 'cc' AS is_train,
                   string_split(text, ' ') AS ws
                 FROM documents),
      g AS (SELECT DISTINCT doc_id, is_train, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS ng
            FROM w, (SELECT unnest(generate_series(1, len(ws) - 2)) AS i)
            WHERE len(ws) >= 3),
      sz AS (SELECT doc_id, COUNT(*) AS n_ngrams FROM g WHERE NOT is_train GROUP BY doc_id),
      t AS (SELECT DISTINCT ng FROM g WHERE is_train),
      s AS (SELECT doc_id, COUNT(*) AS n_shared_ngrams
            FROM g JOIN t USING (ng) WHERE NOT is_train
            GROUP BY doc_id)
      SELECT s.doc_id, n_shared_ngrams, n_ngrams,
             CAST(n_shared_ngrams * 100 // n_ngrams AS BIGINT) AS cov_pct,
             CAST(CASE WHEN n_shared_ngrams * 100 // n_ngrams >= 50
                  THEN 1 ELSE 0 END AS BIGINT) AS contaminated
      FROM s JOIN sz USING (doc_id)""".stripMargin.trim),
    // q_embed_neardup / q_embed_ann select on FLOAT comparisons (cosine
    // threshold / rank-by-sim) while surfacing only ids; the exact-set
    // oracle is valid because the data keeps a margin >= 1e-6 around
    // every decision boundary at sf0.01 AND sf0.1 — ASSERTED in
    // SimilaritySpec "oracle float margins". If that test ever fails on
    // a new fixture, downgrade these two to rows-only.
    "q_embed_neardup" -> ("""
      WITH v AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                        unnest(generate_series(1, len(embedding))) AS i FROM embeddings),
      n AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM v GROUP BY vec_id),
      d AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.x*b.x) AS dt
            FROM v a JOIN v b ON a.i = b.i AND a.vec_id < b.vec_id GROUP BY 1, 2)
      SELECT id_a, id_b FROM d
      JOIN n na ON na.vec_id = id_a JOIN n nb ON nb.vec_id = id_b
      WHERE dt / (na.nrm * nb.nrm) >= 0.45""".stripMargin.trim),
    "q_embed_ann" -> ("""
      WITH v AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                        unnest(generate_series(1, len(embedding))) AS i FROM embeddings),
      n AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM v GROUP BY vec_id),
      d AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, sum(q.x*c.x) AS dt
            FROM v q JOIN v c ON q.i = c.i AND q.vec_id <> c.vec_id
            WHERE q.vec_id < 10 GROUP BY 1, 2),
      s AS (SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY dt / (nq.nrm * nc.nrm) DESC, neighbor_id ASC) AS rank
            FROM d JOIN n nq ON nq.vec_id = query_id JOIN n nc ON nc.vec_id = neighbor_id)
      SELECT query_id, neighbor_id, rank FROM s WHERE rank <= 5""".stripMargin.trim),
    // q_dedup_simhash, q_embed_ann_lsh: not SQL-expressible (xxhash64 /
    // seeded hyperplanes) — rows-only check; semantics verified in
    // DedupSpec / SimilaritySpec against in-Spark brute force.
  )

  /** Oracle-validity guard for q_dedup_minhash, derived from the SAME
    * constants the implementation uses: with r = k/bands rows per band,
    * a true Jaccard-J pair is missed by every band with probability
    * (1 - J^r)^bands. The fixture's qualifying pairs sit at J >= 0.9;
    * the exact-set oracle is only honest while that miss probability is
    * negligible, and the SQL oracle hard-codes 3-gram shingles. Runs at
    * object load (Verify/Bench/tests) — retune Dedup and this throws.
    */
  private val minHashOracleGuard: Unit = {
    import graft.operators.Dedup
    val r = Dedup.MinHashK / Dedup.MinHashBands
    val missProb = math.pow(1.0 - math.pow(0.9, r), Dedup.MinHashBands)
    require(missProb < 1e-6,
      s"q_dedup_minhash exact-set oracle invalid: miss prob $missProb at " +
        s"(k=${Dedup.MinHashK}, bands=${Dedup.MinHashBands}) — retune or " +
        "downgrade the query to rows-only")
    require(Dedup.ShingleN == 3,
      s"ngramJaccardOracle SQL hard-codes 3-gram shingles but Dedup.ShingleN=${Dedup.ShingleN}")
  }

  /** Planted-PII t0 construction for q_pii_redact_planted: deterministic
    * synthetic email/IP/phone/9-digit-ID appended to every doc's
    * (digit-free) text, derived only from doc_id so the Spark side can
    * build the byte-identical string. This makes the DuckDB oracle
    * certify Java-regex vs RE2 parity on ACTUAL matches and
    * replacements — the round-7 advisor gap: q_pii_redact alone only
    * certified the identity path.
    */
  private val PiiPlantedT0 =
    "SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR) || " +
      "'@example.com via 10.0.' || CAST(doc_id % 256 AS VARCHAR) || " +
      "'.7 tel 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || " +
      "'-4242 ref 90000' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') " +
      "AS t0 FROM documents"

  /** The q_pii_redact oracle body over any (doc_id, t0) source select —
    * shared by the identity-path and planted-PII rows so the category
    * patterns/order cannot fork between them.
    */
  private def piiRedactOracle(t0Select: String): String = s"""
    WITH s0 AS ($t0Select),
    s1 AS (SELECT doc_id,
             CAST(len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
             regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
           FROM s0),
    s2 AS (SELECT doc_id, n_email,
             CAST(len(regexp_extract_all(t1, '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}')) AS BIGINT) AS n_ip,
             regexp_replace(t1, '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}', '<IP>', 'g') AS t2
           FROM s1),
    s3 AS (SELECT doc_id, n_email, n_ip,
             CAST(len(regexp_extract_all(t2, '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}')) AS BIGINT) AS n_phone,
             regexp_replace(t2, '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}', '<PHONE>', 'g') AS t3
           FROM s2),
    s4 AS (SELECT doc_id, n_email, n_ip, n_phone,
             CAST(len(regexp_extract_all(t3, '[0-9]{9,}')) AS BIGINT) AS n_id,
             regexp_replace(t3, '[0-9]{9,}', '<ID>', 'g') AS t4
           FROM s3)
    SELECT doc_id, t4 AS redacted, n_email, n_ip, n_phone, n_id,
           n_email + n_ip + n_phone + n_id AS n_pii
    FROM s4""".stripMargin.trim

  /** Exact word-3-gram Jaccard pairs at threshold num/den, in DuckDB SQL.
    * Integer-threshold arithmetic: j >= num/den ⇔ (den+num)*inter >=
    * num*(szA+szB) — identical to the Spark side, no float boundaries.
    */
  private def ngramJaccardOracle(num: Int, den: Int): String = s"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    g AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS ng
          FROM w, (SELECT unnest(generate_series(1, len(ws) - 2)) AS i)
          WHERE len(ws) >= 3),
    sz AS (SELECT doc_id, COUNT(*) AS s FROM g GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
              FROM g a JOIN g b ON a.ng = b.ng AND a.doc_id < b.doc_id GROUP BY 1, 2)
    SELECT doc_a, doc_b, inter, sa.s + sb.s - inter AS uni
    FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
    WHERE inter * ${den + num} >= ${num} * (sa.s + sb.s)""".stripMargin.trim
}
