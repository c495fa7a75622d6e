package graft

/** Global physical-plan invariants over EVERY registered query: the
  * properties that keep a plan 100×-scalable are asserted for the whole
  * surface, not just the queries someone remembered to test.
  */
class PlanInvariantsSpec extends SparkSpec {
  val sf = TestSpark.sf0001

  /** Brute-force ANN deliberately streams every vector past a broadcast
    * of the ~10 query vectors, and tf-idf cross-joins a broadcast 1-ROW
    * corpus-count frame — a BroadcastNestedLoopJoin whose build side is
    * constant-size is linear, not quadratic, and IS the intended plan.
    * Everything else must stay equi-join shaped.
    */
  private val intendedBnlj = Set("q_embed_ann", "q_tfidf_terms",
    // the SQ8 coarse pass streams every code row past the same ~10-row
    // broadcast query frame as q_embed_ann — constant build side
    // (stored twin shares the probe)
    "q_embed_ann_sq", "q_embed_ann_sq_idx",
    // the recall-curve tuning run composes the brute ground truth (the
    // q_embed_ann coarse BNLJ) with per-nprobe 1-row × 1-row crossJoins
    // of its hit/scanned aggregates and one 1-row totals frame — every
    // build side constant-size
    "q_embed_ivf_recall",
    // the r17 serving-curve family shares that exact composition: the
    // brute ground truth's constant-build BNLJ plus per-step 1-row ×
    // 1-row hit/scanned crossJoins and the 1-row totals frame — and
    // the PCA / PQ / SQ8 curves' coarse passes are the SAME
    // constant-build BNLJ their probes run (q_embed_ann_pca /
    // q_embed_ann_pq precedents)
    "q_embed_pca_recall", "q_embed_lsh_recall", "q_embed_pq_rerank",
    "q_embed_ivfsq_recall", "q_embed_ivfpq_recall",
    // the PQ ADC coarse pass streams the 16-byte code rows past the
    // same ~10-row broadcast query frame (with its precomputed lookup
    // tables riding along) — constant build side, stored twin shares
    // the probe
    "q_embed_ann_pq", "q_embed_ann_pq_idx",
    // the PCA coarse pass streams the reduced (k'-double) rows past the
    // same ~10-row broadcast projected-query frame — constant build side
    // (the stored twin probes the materialized reduced table through
    // the same constant-build-side plan)
    "q_embed_ann_pca", "q_embed_ann_pca_idx",
    // importance resampling crossJoins a broadcast 1-ROW quota frame
    // into the score histogram (Mixture.importanceResampleOn) — same
    // constant-build-side shape as tf-idf's corpus count
    "q_dsir_resample",
    // the LM scorer crossJoins the broadcast 1-ROW reference token
    // total N into the scoring join (Lm.lmScoreOn); buckets and the
    // curriculum compose it — and lm_buckets additionally crossJoins
    // the 1-ROW tertile-bounds frame into the score histogram; the
    // stored twin scores through the same plan with the 1-ROW total
    // read from the model artifact
    "q_lm_score", "q_lm_score_idx", "q_lm_buckets", "q_curriculum",
    // the bigram scorer crossJoins the same broadcast 1-ROW reference
    // token total (Lm.bigramScoreOn); its buckets composition adds the
    // 1-ROW tertile-bounds crossJoin (Lm.bucketsFromScores)
    "q_lm_bigram", "q_lm_bigram_buckets",
    // gap-fill crossJoins the broadcast span-sized day axis into the
    // user axis — the dense users × days matrix IS the operator's
    // output contract (EventAnalytics.dailyGapFillOn)
    "q_events_gapfill",
    // the column profiler recombines its two aggregate passes (nulls/
    // min/max and the distinct counts) by crossJoining two broadcast
    // 1-ROW frames (Profile.profileColumns — split to keep both passes
    // hash-aggregated; the fused spelling sort-aggregates 7x the table)
    "q_profile_orders",
    // churn crossJoins the broadcast 1-ROW (min, max) day span into the
    // activity frame (EventAnalytics.weeklyChurnOn)
    "q_user_churn",
    // key-skew rides the broadcast 1-ROW total; trend the 1-ROW day-0
    // anchor; search the 1-ROW corpus count (tf-idf's shape); rolling
    // actives the 1-ROW last-day clip — all constant build sides
    "q_key_skew", "q_events_trend", "q_search_rank", "q_rolling_actives",
    // BM25 rides the same broadcast 1-ROW (n_docs, avgdl) totals frame
    // as q_search_rank's corpus count — constant build side (the
    // stored-postings twin shares the bm25Rank core)
    "q_search_bm25", "q_search_bm25_idx", "q_search_bm25_any",
    // the bloom prune crossJoins the broadcast 1-ROW filter frame —
    // the whole point is the constant build side
    "q_bloom_semi",
    // the pipeline's ppl stage composes lmScoreOn's 1-ROW reference
    // total and bucketsFromScores' 1-ROW tertile-bounds crossJoins
    "q_pipeline_curate_ppl",
    // the classifier stage composes bucketsFromScores' 1-ROW
    // tertile-bounds crossJoin (scores themselves are a scan-fused
    // map-literal fold — no join at all)
    "q_pipeline_curate_clf",
    // the full recipe composes BOTH of the above
    "q_pipeline_curate_full",
    // the epoch schedule crossJoins the broadcast 1-ROW corpus token
    // total into the bounded source frame (the tf-idf shape)
    "q_epoch_schedule",
    // the NB classifier crossJoins the broadcast 1-ROW class-totals
    // frame into the vocab-capped weight table (Classifier.nbWeightsOn
    // — lmScoreOn's reference-total shape; the stored twin derives
    // weights through the same 1-ROW merged-totals crossJoin)
    "q_nb_classifier", "q_nb_classifier_idx",
    "q_nb_classifier_planted", "q_nb_confusion",
    // concentration crossJoins three broadcast 1-ROW frames (stats,
    // full-band sum, boundary sum) into the one-row report
    "q_revenue_top1")

  test("no query plans a cartesian product or unintended nested-loop join") {
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct") ||
          (plan.contains("BroadcastNestedLoopJoin") && !intendedBnlj(name)))
        Some(name)
      else None
    }
    assert(offenders.isEmpty,
      s"quadratic join operators in: ${offenders.mkString(", ")}")
  }

  /** q_bpe_merges RETURNS the learned merge table — a control-plane
    * LocalRelation assembled from k 1-row TakeOrdered decisions; the
    * distributed work (word-freq pass + per-step pair aggregates) runs
    * inside Bpe.learnMergesOn with codegen, before the table exists.
    */
  private val controlPlaneResult = Set("q_bpe_merges")

  test("every query participates in whole-stage codegen somewhere") {
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val df = fn(spark, sf)
      df.collect() // AQE only materializes codegen stages in the FINAL plan
      val plan = df.queryExecution.executedPlan.toString
      if (plan.contains("*(") || controlPlaneResult(name)) None else Some(name)
    }
    assert(offenders.isEmpty, s"no codegen stage in: ${offenders.mkString(", ")}")
  }

  test("lineitem scans prune columns: no query reads the full 11-column schema") {
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      val scans = plan.linesIterator.filter(l =>
        l.contains("FileScan parquet") && l.contains("lineitem"))
      // every lineitem ReadSchema must be a strict subset of the table
      val bad = scans.exists { l =>
        val schema = l.substring(l.indexOf("ReadSchema:"))
        schema.count(_ == ',') >= 10 // 11 columns -> 10 commas inside struct
      }
      if (bad) Some(name) else None
    }
    assert(offenders.isEmpty, s"unpruned lineitem scan in: ${offenders.mkString(", ")}")
  }

  /** tokenShards' block-offset window runs over corpus/blockSize rows —
    * a deliberately bounded side input (see its scaladoc), not the
    * corpus. Every other window must carry a partition key, or one task
    * serializes the whole dataset at scale.
    */
  private val intendedGlobalWindow = Set("q_token_shards",
    // packSequences' block-offset window runs over the ≤256-row
    // fp-prefix block sums (Mixture.packSequencesOn — the tokenShards
    // pattern); dsir_resample's runs over the bounded-cardinality
    // avg_ppm histogram, never the corpus
    // lm_buckets' tertile-boundary window (score-value histogram) and
    // curriculum's block-offset window ((grade, fp-prefix) counts) run
    // over bounded side frames, never the per-doc corpus
    "q_pack_sequences", "q_dsir_resample", "q_lm_buckets", "q_curriculum",
    // bigram buckets inherit lm_buckets' bounded histogram window
    // through the shared bucketsFromScores spelling
    "q_lm_bigram_buckets",
    // the classifier stage inherits bucketsFromScores' bounded
    // histogram-frame window (score-value histogram, never the corpus)
    "q_pipeline_curate_clf",
    // the pipeline's ppl stage inherits the same bounded
    // score-histogram window through bucketsFromScores
    "q_pipeline_curate_ppl",
    // the full recipe composes both bounded-histogram windows
    "q_pipeline_curate_full",
    // the epoch schedule's partial-round prefix sum runs over the
    // |sources|-row frame, never the corpus
    "q_epoch_schedule",
    // the corpus-build tail composes packSequences' block-offset window
    // (bounded block-sum frame, never the corpus)
    "q_corpus_build",
    // the anomaly detector's trailing-7-day window runs over the
    // post-aggregate per-DAY frame (~span-of-days rows, never events)
    "q_events_anomaly",
    // the growth curve's cumulative sum runs over the same bounded
    // per-day frame (first-appearance counts, never events)
    "q_user_growth",
    // the concentration cut's offset window runs over the bounded
    // VALUE-BAND frame (band counts, never customers)
    "q_revenue_top1")

  test("no window function runs without a partition key (single-task serialization)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val hasGlobal = fn(spark, sf).queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }.nonEmpty
      if (hasGlobal && !intendedGlobalWindow(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"partitionless window (whole-data single task) in: ${offenders.mkString(", ")}")
  }
}
