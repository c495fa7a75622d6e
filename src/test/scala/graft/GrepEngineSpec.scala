package graft

import graft.engine.GrepEngine
import graft.engine.GrepEngine._

class GrepEngineSpec extends SparkSpec {
  import spark.implicits._

  val iliad = "/root/reference/ILIAD_1STBOOK_IT_ALTERED"

  test("reference-parity golden: 'Achille' on the Iliad fixture") {
    // Ground truth measured on the fixture (FIXTURES.md §1): 34 matching
    // lines pre-dedup; top duplicates ×6, ×5, ×4.
    val out = GrepEngine.distGrep(spark, iliad, "Achille").collect()
    assert(out.map(_.getLong(1)).sum === 34L)
    val byLine = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLine("il re de' prodi Atride e il divo Achille.") === 6L)
    assert(byLine("Cantami, o Diva, del Pelìde Achille") === 5L)
    assert(byLine("levossi Achille piè-veloce, e disse:") === 4L)
    assert(out.forall(_.getString(0).contains("Achille")))
  }

  test("per-line counting: a line containing the pattern twice counts 1") {
    // SURVEY.md §2.1 counting note / §2.4(b).
    val df = Seq("xx yy xx", "xx", "yy").toDF("value")
    val out = GrepEngine.grepFreq(df, "value", "xx").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("xx yy xx" -> 1L, "xx" -> 1L))
  }

  test("duplicate lines aggregate to their count") {
    val df = Seq("a b", "a b", "a b", "zzz", "a c").toDF("value")
    val out = GrepEngine.grepFreq(df, "value", "a ").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a b" -> 3L, "a c" -> 1L))
  }

  test("zero matches and empty input produce empty results (§2.4(g))") {
    val df = Seq("aaa", "bbb").toDF("value")
    assert(GrepEngine.grepFreq(df, "value", "zzz").count() === 0L)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      df.schema)
    assert(GrepEngine.grepFreq(empty, "value", "x").count() === 0L)
  }

  test("case sensitivity: substring mode is case-sensitive; ci mode is not") {
    val df = Seq("Spark", "spark", "SPARK").toDF("value")
    assert(GrepEngine.grepFreq(df, "value", "spark").count() === 1L)
    assert(GrepEngine.grepFreq(df, "value", "spark", SubstringIgnoreCase).count() === 3L)
  }

  test("regex mode matches patterns substring mode cannot") {
    val df = Seq("vector", "vecktor", "victor").toDF("value")
    val out = GrepEngine.grepFreq(df, "value", "ve[ck]{1,2}tor", Regex).collect()
    assert(out.map(_.getString(0)).toSet === Set("vector", "vecktor"))
  }

  test("whole-word mode (-w): boundary-anchored, pattern stays literal") {
    val df = Seq("a cat", "scatter", "cat", "the cat.", "concatenate").toDF("value")
    val out = GrepEngine.grepFreq(df, "value", "cat", WholeWord).collect()
    assert(out.map(_.getString(0)).toSet === Set("a cat", "cat", "the cat."))
    // the pattern is QUOTED — regex metachars match literally in -w
    val meta = Seq("a+b here", "aab here", "ab").toDF("value")
    assert(GrepEngine.grepFreq(meta, "value", "a+b", WholeWord).collect()
      .map(_.getString(0)).toSet === Set("a+b here"))
  }

  test("invert (-v) complements grepFreq: together they partition the distinct lines") {
    val df = Seq("xx a", "xx a", "yy", "zz xx", "yy").toDF("value")
    val hit = GrepEngine.grepFreq(df, "value", "xx")
    val miss = GrepEngine.grepInvert(df, "value", "xx")
    val all = hit.unionByName(miss).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(all === Map("xx a" -> 2L, "zz xx" -> 1L, "yy" -> 2L))
    assert(hit.count() + miss.count() === 3L) // disjoint, no overlap
  }

  test("per-occurrence counting (-o): occ counts non-overlapping hits, total_occ weights by freq") {
    val df = Seq("ab ab ab", "ab ab ab", "xx ab", "none").toDF("value")
    val out = GrepEngine.grepOccurrences(df, "value", "ab").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map("ab ab ab" -> ((2L, 3L, 6L)), "xx ab" -> ((1L, 1L, 1L))))
  }

  test("per-file counts (-c) include zero-match files; files-with-matches (-l) excludes them") {
    val df = Seq(("f1", "has xx"), ("f1", "nope"), ("f2", "clean"), ("f3", "xx xx"))
      .toDF("file", "line")
    val counts = GrepEngine.grepFileCounts(df, "file", "line", "xx").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("f1" -> 1L, "f2" -> 0L, "f3" -> 1L))
    assert(GrepEngine.grepFilesWithMatches(df, "file", "line", "xx").collect()
      .map(_.getString(0)).toSet === Set("f1", "f3"))
  }

  test("context grep (-C): n rows either side, merged overlaps, file-boundary clamped") {
    val df = Seq(
      ("f1", 0L, "zero"), ("f1", 1L, "MATCH one"), ("f1", 2L, "two"),
      ("f1", 3L, "MATCH three"), ("f1", 4L, "four"), ("f1", 5L, "five"),
      ("f2", 0L, "other file"), ("f2", 1L, "MATCH last")
    ).toDF("file", "line_no", "line")
    val out = GrepEngine.contextGrep(df, "file", "line_no", "line", "MATCH", 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    // f1: lines 0-4 emitted ONCE each (overlapping windows merge); 5 not;
    // f2: context clamps at the file start, f1's line 5 never bleeds in
    assert(out === Set(
      ("f1", 0L, 0L), ("f1", 1L, 1L), ("f1", 2L, 0L), ("f1", 3L, 1L),
      ("f1", 4L, 0L), ("f2", 0L, 0L), ("f2", 1L, 1L)))
    // n=0 degenerates to matches only
    assert(GrepEngine.contextGrep(df, "file", "line_no", "line", "MATCH", 0)
      .count() === 3L)
  }

  test("multiGrep is a single disjunctive filter (any-of semantics)") {
    val df = Seq("has foo", "has bar", "has both foo bar", "neither").toDF("value")
    val out = GrepEngine.multiGrep(df, "value", Seq("foo", "bar")).collect()
    assert(out.length === 3)
    assert(out.map(_.getLong(1)).sum === 3L) // "both" counted once, not twice
  }

  test("grepTopK is deterministic under ties (tie-break by line)") {
    val df = Seq("pa", "pb", "pc", "pb").toDF("value")
    val out = GrepEngine.grepTopK(df, "value", "p", 2).collect()
    assert(out.map(_.getString(0)).toSeq === Seq("pb", "pa"))
  }

  test("SQL front door: the same query runs via spark.sql over a temp view") {
    // the engine is fully usable from plain SQL — temp view + spark.sql
    // with the session extensions' functions available; identical result
    // to the DataFrame spelling
    Tables.documents(spark, TestSpark.sf0001).createOrReplaceTempView("documents_v")
    val viaSql = spark.sql("""
      SELECT text AS line, count(*) AS freq
      FROM documents_v WHERE contains(text, 'spark')
      GROUP BY text""")
      .as[(String, Long)].collect().toSet
    val viaApi = GrepEngine
      .grepFreq(Tables.documents(spark, TestSpark.sf0001), "text", "spark")
      .as[(String, Long)].collect().toSet
    assert(viaSql === viaApi && viaSql.nonEmpty)
  }

  test("highlight modes match the reference client (client/client.go:69-79)") {
    assert(GrepEngine.highlight("a foo b", "foo", "asterisks") === "a *foo* b")
    assert(GrepEngine.highlight("a foo b", "foo", "none") === "a foo b")
    // classic = bold + red FOREGROUND (client.go bold+colorRed), not background
    assert(GrepEngine.highlight("a foo b", "foo", "classic") ===
      s"a ${Console.BOLD}${Console.RED}foo${Console.RESET} b")
  }

  test("formatOutput matches the reference's header, ruler, and row format") {
    val out = GrepEngine.formatOutput(
      Seq(("alpha foo", 3L), ("beta", 1L)), "foo", "asterisks")
    val lines = out.split("\n").toSeq
    assert(lines(0) === "Freq.\tLine")
    assert(lines(1) === "-" * 41, "41-dash ruler (client/client.go:80)")
    assert(lines(2) === "3\talpha *foo*")
    assert(lines(3) === "1\tbeta")
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key exists in queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  /** The round-10 regression mode: nine queries vanished from the
    * correctness artifact because they threw at runtime and nothing
    * pinned the surface. This FLOOR makes any shrink a named red test —
    * removing or renaming a driver query now requires editing this
    * list, which is exactly the explicit note the round-10 advice asked
    * for. Grow-only by design: add new names when queries ship.
    */
  test("the driver query surface never silently shrinks") {
    val floor = Set(
      "q_grep_freq", "q_grep_regex", "q_grep_ci", "q_grep_multi", "q_grep_topk",
      "q_grep_freq_idx", "q_grep_regex_idx", "q_grep_ci_idx", "q_grep_multi_idx",
      "q_grep_topk_idx", "q_grep_word_idx",
      "q_grep_word", "q_grep_invert", "q_grep_occ", "q_grep_counts",
      "q_grep_files", "q_grep_context",
      "q_pricing_summary", "q_revenue_by_nation", "q_revenue_by_region",
      "q_ship_priority", "q_returned_top",
      "q_cust_big_orders", "q_cust_no_orders", "q_cust_order_stats",
      "q_cust_activity_full", "q_part_type_revenue", "q_supplier_nation_volume",
      "q_lineitem_rollup", "q_lineitem_cube", "q_top_orders_window",
      "q_order_gaps", "q_orders_ntile", "q_orders_ranked",
      "q_active_positive", "q_union_big_or_debt", "q_except_small_only",
      "q_events_daily", "q_events_pivot", "q_events_props",
      "q_events_asof_order", "q_events_approx_users",
      "q_events_by_day_partitioned", "q_event_sessions", "q_event_session_pairs",
      "q_csv_nation_region", "q_json_customer_segments", "q_orc_supplier_balance",
      "q_token_freq", "q_ngram_docfreq", "q_lang_hist", "q_quality",
      "q_quality_filter", "q_token_shards", "q_token_stats", "q_fingerprint",
      "q_rep_topgram", "q_pii_redact", "q_pii_redact_planted",
      "q_token_quantiles", "q_token_quantiles_approx", "q_token_bpe",
      "q_tfidf_terms", "q_sample_stratified", "q_sample_weighted",
      "q_train_eval_split",
      "q_train_eval_assign", "q_split_cluster_safe",
      "q_dedup_exact", "q_dedup_wordset", "q_dedup_minhash", "q_dedup_simhash",
      "q_ngram_jaccard", "q_dedup_clusters", "q_dedup_incremental",
      "q_dedup_incr_near", "q_dedup_incr_near_idx", "q_line_dedup",
      "q_line_dedup_hash", "q_para_dedup", "q_verbatim_runs", "q_verbatim_spans",
      "q_verbatim_clean", "q_verbatim_incr", "q_verbatim_incr_idx",
      "q_self_repeats", "q_self_repeats_planted",
      "q_decontaminate", "q_decontaminate_cov", "q_decontaminate_eval_cov",
      "q_embed_neardup", "q_embed_ann", "q_embed_ann_lsh", "q_embed_ann_ivf",
      "q_embed_ivf_recall",
      "q_embed_pca_recall", "q_embed_lsh_recall", "q_embed_pq_rerank",
      "q_embed_ivfsq_recall", "q_embed_ivfpq_recall",
      "q_embed_ann_sq", "q_embed_ann_sq_idx",
      "q_embed_ann_ivfsq", "q_embed_ann_ivfsq_idx",
      "q_embed_ann_ivf_idx", "q_embed_ann_lsh_idx",
      "q_embed_cluster_profile", "q_embed_cluster_prune",
      "q_semantic_dedup", "q_semantic_dedup_idx",
      "q_mm_asset_stats", "q_mm_frame_stats",
      "q_pipeline_curate", "q_pipeline_curate_full",
      "q_pipeline_curate_fuzzy", "q_pipeline_curate_cov",
      "q_pipeline_curate_incr", "q_pipeline_retro_contam",
      "q_pipeline_retro_neardup",
      "q_nb_classifier", "q_nb_classifier_idx",
      "q_nb_classifier_planted", "q_nb_confusion", "q_logreg_planted",
      "q_embed_ann_pq", "q_embed_ann_pq_idx",
      "q_embed_ann_ivfpq", "q_embed_ann_ivfpq_idx",
      "q_embed_pca", "q_embed_ann_pca",
      "q_embed_pca_idx", "q_embed_ann_pca_idx",
      "q_pipeline_curate_block", "q_pipeline_curate_verbatim",
      "q_pipeline_curate_clf",
      "q_pipeline_curate_ppl", "q_pipeline_stats", "q_pipeline_stats_verbatim",
      "q_epoch_schedule",
      "q_events_gapfill", "q_event_funnel", "q_event_retention",
      "q_pack_sequences", "q_mixture_plan", "q_mixture_sample",
      "q_dsir_weights", "q_dsir_resample", "q_mixture_curated",
      "q_corpus_build",
      "q_lm_score", "q_lm_score_idx", "q_lm_buckets", "q_chunk_passages",
      "q_snapshot_diff",
      "q_curriculum",
      "q_corpus_card", "q_profile_orders", "q_blocklist",
      "q_source_overlap", "q_lm_bigram", "q_lm_bigram_buckets",
      "q_bpe_pairs", "q_bpe_merges", "q_novelty",
      "q_heavy_hitters", "q_cdc_apply", "q_events_anomaly",
      "q_fuzzy_match", "q_user_churn", "q_event_paths", "q_dq_audit",
      "q_ivm_orders", "q_key_skew", "q_events_trend",
      "q_event_latency_hist", "q_search_rank", "q_rolling_actives",
      "q_attribution", "q_cdc_derive", "q_source_cap", "q_bloom_semi",
      "q_forecast_revenue", "q_promo_share", "q_heavy_hitters_src",
      "q_user_growth", "q_revenue_top1", "q_event_transitions",
      "q_sample_weighted_src", "q_event_funnel_1d", "q_dedup_keep_best")
    val missing = floor -- SparkEntry.queries.keySet
    assert(missing.isEmpty,
      s"driver queries DISAPPEARED from the surface (round-10 failure mode): " +
        s"${missing.toSeq.sorted.mkString(", ")}")
  }
}
