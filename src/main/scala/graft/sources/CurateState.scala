package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Pipeline, TextOps}

/** INCREMENTAL CURATION — the batch-append spelling of
  * [[graft.operators.Pipeline.curateOn]]: a corpus is built batch by
  * batch, each batch judged against the STORED identity of everything
  * committed before it, with the full curate ledger (lang / quality /
  * exact dup / near dup / split / decontamination) as the per-batch
  * output. At 100 TB this is the only viable corpus-build shape — a
  * daily delivery cannot re-curate the world, so each batch must pay
  * only batch-sized work plus index-bounded probes of the state.
  *
  * State layout under `path/` (every corpus-derived table
  * ingest-labeled, the [[DedupIndexes]] maintenance contract):
  *   - `meta`                    — one row (lang, split_threshold,
  *     contam_n, contam_min_pct): the pipeline config pinned at init so
  *     a later batch can never fork it;
  *   - `fps/ingest=<label>`     — the distinct canonical fingerprints
  *     this batch ADDED to the exact-dedup identity (fingerprints of
  *     its lang+quality survivors not already known) — the state the
  *     exact stage probes;
  *   - `neardup/`               — a [[DedupIndexes.writeNearDupIndex]]
  *     MinHash index over every committed batch's EXACT-DEDUP SURVIVORS
  *     (near-dup losers included — see below), appended per batch;
  *   - `evalgrams/ingest=<label>` — the distinct word `contam_n`-grams
  *     of this batch's final EVAL docs — the decontamination state;
  *   - `ledger/ingest=<label>`  — the batch's curate ledger
  *     (doc_id, n_tokens, outcome), written LAST: a batch is committed
  *     iff its ledger exists, and every earlier artifact of a crashed
  *     commit is healed by replaying the same (batch, label) —
  *     overwrite-on-own-label everywhere, all derivations
  *     deterministic, and every state read excludes the batch's own
  *     label so a replay judges against exactly what the first attempt
  *     saw (the [[graft.streaming.StreamingOps.curateBatch]] contract).
  *
  * EQUALITY CONTRACT (what "incremental" promises): for batches whose
  * doc_ids are ordered by arrival (batch N's ids all below batch
  * N+1's), a batch's incremental ledger EQUALS the full-rebuild
  * [[Pipeline.curateOn]] ledger over the union corpus RESTRICTED TO
  * THAT BATCH's rows — PipelineSpec asserts it and the
  * q_pipeline_curate_incr oracle re-derives it in DuckDB. The stage
  * arguments:
  *   - exact: a full rebuild keeps the min doc_id per fingerprint among
  *     lang+quality survivors; with ordered ids that keeper is the
  *     FIRST batch that saw the fingerprint — exactly the stored-fps
  *     probe plus the in-batch min-id window over unknown fps;
  *   - near-dup: the full rebuild drops every member of a connected
  *     component except its min id. A batch doc's component contains a
  *     committed doc iff the doc's IN-BATCH cluster has ≥ 1 member with
  *     a verified state-index hit — in that case the component's rep is
  *     a committed id (ordered ids) and ALL in-batch members drop;
  *     otherwise the component is entirely in-batch and the min-id rule
  *     applies locally. This is why the index holds ALL exact-dedup
  *     survivors, losers included: the rebuild's dedup graph spans
  *     them, so dropping a batch doc may hinge on a committed doc that
  *     itself lost (the bridge through a loser);
  *   - decontamination: the eval n-gram universe is the union of every
  *     committed batch's eval grams and this batch's own — the stored
  *     `evalgrams` plus the in-batch set.
  *
  * HONEST ASYMMETRIES (documented, not hidden): committed outcomes are
  * immutable. (1) A later batch's eval docs cannot retro-drop an
  * earlier batch's committed train docs the way a full rebuild would —
  * run the rebuild at audit cadence if retro-decontamination matters.
  * (2) A batch doc near-dup-bridging TWO committed survivors merges
  * their components in a full rebuild (dropping one committed rep);
  * incrementally both stay. Both asymmetries affect only COMMITTED
  * rows — the per-batch restricted equality above is exact.
  *
  * 100 TB design: the batch pays [[Pipeline.stageBits]] (scan-fused
  * projections) + one fp exchange; the exact probe is a join against
  * the fps table (fingerprints only — bytes per committed DOC, not per
  * token); the near-dup probe inherits the banded stored-index join
  * with the hot-bucket cap and verifies only band-collision candidates;
  * decontamination joins the batch's train grams against the stored
  * eval-gram set (bounded by the EVAL corpus — the small split). No
  * step re-reads committed text; the corpus text never leaves the
  * batch.
  */
object CurateState {

  /** The label [[init]] commits under. */
  val BaseLabel: String = DedupIndexes.BaseLabel

  /** Initialize the state at `path` from the FIRST batch: any previous
    * state is removed, the config is pinned in `meta`, the batch is
    * judged against the EMPTY state — which degrades every stage to
    * exactly [[Pipeline.curateOn]]'s in-batch rule (PipelineSpec
    * asserts ledger equality) — and committed under `base`. Returns the
    * batch ledger (read back from the committed artifact).
    */
  def init(batch: DataFrame, path: String,
           lang: String = "en", splitThreshold: String = "cc",
           contamN: Int = 3, contamMinPct: Long = 0L): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    DedupIndexes.assertTargetNotOverInputs(batch, path)
    DedupIndexes.delete(spark, path)
    Seq((lang, splitThreshold, contamN, contamMinPct))
      .toDF("lang", "split_threshold", "contam_n", "contam_min_pct")
      .write.mode("overwrite").parquet(s"$path/meta")
    judgeAndCommit(batch, path, BaseLabel)
  }

  /** Judge `batch` against the committed state and commit it under
    * `label` — config from the state's own meta (a batch can never fork
    * it). Replaying the same (batch, label) after a crash at ANY point
    * rewrites identical artifacts (own label excluded from every state
    * read, derivations deterministic). Returns the batch ledger.
    */
  def increment(batch: DataFrame, path0: String, label: String): DataFrame = {
    require(label.nonEmpty && label != BaseLabel,
      s"increment label must not collide with the init label '$BaseLabel'")
    val path = DedupIndexes.resolveIndex(batch.sparkSession, path0)
    judgeAndCommit(batch, path, label)
  }

  /** The assembled corpus ledger across every committed batch. */
  def ledger(spark: SparkSession, path0: String): DataFrame = {
    val path = DedupIndexes.resolveIndex(spark, path0)
    spark.read.parquet(s"$path/ledger").drop("ingest")
  }

  /** RETRO-DECONTAMINATION REPORT — the documented asymmetry made
    * queryable (the [[SimilarityIndexes.ivfRefitDue]] precedent: "when
    * is a rebuild due" should be a measured fact, not a judgment
    * call). Committed train outcomes are immutable, but the eval
    * n-gram universe only GROWS with later batches — so a committed
    * train doc's coverage can cross the contamination threshold after
    * the fact, and a full rebuild would drop it where the incremental
    * state keeps it. This report scores the committed TRAIN docs
    * (caller-supplied (doc_id, text) — the state stores identity, not
    * text; the kept corpus is the natural source) against the FULL
    * stored eval-gram universe under the state's own pinned config:
    * one row per train doc — docs too short to shingle surface as
    * (0, 0, 0, unflagged) rows rather than vanishing —
    * (doc_id, n_shared, n_ngrams,
    * cov_pct, flagged) — where `flagged = 1` marks exactly the docs a
    * rebuild would now attribute `dropped_contaminated`. A doc flagged
    * here is NEWLY contaminated by construction: had its coverage
    * reached the threshold at judge time, it would never have committed
    * as train. Non-zero `sum(flagged)` is the rebuild-due signal.
    *
    * Scale: one shingle pass over the TRAIN slice the caller asks
    * about (run it on a batch's slice at audit cadence, not the world),
    * joined against the stored eval-gram set — the decontamination
    * stage's own bounded shape, no state text read.
    */
  def retroContamination(trainDocs: DataFrame, path0: String): DataFrame = {
    val spark = trainDocs.sparkSession
    val path = DedupIndexes.resolveIndex(spark, path0)
    val (_, _, contamN, contamMinPct) = readMeta(spark, path)
    // ONE shingle pass: the distinct eval-gram set carries a hit marker
    // and joins LEFT OUTER (1:≤1 — the set is distinct), so unshared
    // docs report 0 from the same aggregate instead of a second scan +
    // right-join-back. Per-doc shingles are distinct (TextOps.shingles),
    // so sum(hit) IS the distinct shared-gram count.
    val evalGrams = spark.read.parquet(s"$path/evalgrams")
      .drop("ingest").distinct().withColumn("__graft_hit", lit(1L))
    // explode_OUTER: a sub-contamN-token doc has no shingles, and a
    // plain explode would drop it from the report entirely — a caller
    // auditing short docs would get no row and no flag (r13 ADVICE).
    // The null gram row never joins a real eval gram, so the doc
    // surfaces as (0 shared, 0 ngrams, unflagged); cov_pct guards the
    // 0-denominator with greatest(n_ngrams, 1).
    trainDocs
      .select(col("doc_id"), TextOps.shingles(col("text"), contamN).as("ngs"))
      .select(col("doc_id"),
        size(col("ngs")).cast("long").as("n_ngrams"), explode_outer(col("ngs")).as("ng"))
      .join(evalGrams, Seq("ng"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("__graft_hit"), lit(0L))).as("n_shared"),
        max(col("n_ngrams")).as("n_ngrams"))
      .withColumn("cov_pct", expr("n_shared * 100 DIV greatest(n_ngrams, 1)"))
      .withColumn("flagged",
        (if (contamMinPct <= 0L) col("n_shared") > 0L
         else col("cov_pct") >= contamMinPct).cast("long"))
  }

  /** RETRO-NEAR-DUP REPORT — the OTHER documented asymmetry made
    * queryable (the [[retroContamination]] precedent, closing the last
    * documented-but-unmeasured honesty gap): committed outcomes are
    * immutable, but a later batch's doc can near-dup-BRIDGE two
    * committed survivors that were never near-dups of each other — a
    * full rebuild merges their components and keeps only the min id,
    * dropping one committed rep, where the incremental state kept
    * both. This report recomputes the FULL rebuild dedup graph from
    * the stored MinHash index ALONE
    * ([[graft.operators.Dedup.selfNearDupPairsFromIndex]]: banded
    * self-join + exact verification over the stored shingle frames —
    * the index holds every batch's exact-dedup survivors, which is
    * exactly the vertex set the rebuild's near-dup stage spans),
    * labels components, and scores every committed KEPT doc (ledger
    * outcome train/eval) against its component's rebuild
    * representative. Output: one row per kept doc —
    * (doc_id, rebuild_rep, flagged) — where `flagged = 1` marks
    * exactly the kept docs whose full-rebuild component rep is a
    * DIFFERENT doc: the committed reps a rebuild would now drop.
    * Non-zero `sum(flagged)` is the rebuild-due signal on the
    * near-dup axis, completing the two-axis audit
    * ([[retroContamination]] covers the eval-gram axis).
    *
    * Scale: one banded self-join over the stored band rows (hot-bucket
    * capped, the probe contract) + candidate-bounded verification over
    * the stored shingles + [[graft.operators.Dedup.clusterPairs]] on
    * the verified pair list (the SMALL artifact) — committed text is
    * never re-read; run at audit cadence like the contamination twin.
    */
  def retroNearDup(spark: SparkSession, path0: String,
                   maxBucket: Int = 10000): DataFrame = {
    val path = DedupIndexes.resolveIndex(spark, path0)
    val kept = ledger(spark, path)
      .filter(col("outcome").isin("train", "eval"))
      .select(col("doc_id"))
    val ndDir = s"$path/neardup"
    if (!DedupIndexes.hasCompleteIndex(spark, ndDir) ||
        !DedupIndexes.hasData(spark, s"$ndDir/bands"))
      // an empty identity has no pair graph: every kept doc is its own rep
      return kept.select(col("doc_id"), col("doc_id").as("rebuild_rep"),
        lit(0L).as("flagged"))
    val (sh, idx) = DedupIndexes.readNearDupIndex(spark, ndDir)
    val labels = Dedup.clusterPairs(
      Dedup.selfNearDupPairsFromIndex(sh, idx, maxBucket = maxBucket))
    kept
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("rebuild_rep"))
      .withColumn("flagged",
        (col("doc_id") =!= col("rebuild_rep")).cast("long"))
  }

  /** The compaction-time retro verdict — what [[compactTo]] returns so
    * the rebuild-due signal rides in the operator's face (the
    * refit-at-compaction precedent, r13 ask #7 → r14 ask #7): flagged
    * counts per audit axis. `contamFlagged` is None when the caller
    * passed no train text — the state stores no text, so the eval-gram
    * axis is only measurable when the caller supplies the committed
    * TRAIN slice to audit (the [[retroContamination]] contract).
    */
  case class RetroAudit(contamFlagged: Option[Long], nearDupFlagged: Long) {
    /** True when a full rebuild would change at least one committed
      * outcome — the maintenance scheduler's one boolean. */
    def rebuildDue: Boolean = contamFlagged.exists(_ > 0) || nearDupFlagged > 0
  }

  /** Compact a long-appended state into `dst`: meta carried verbatim,
    * fps / evalgrams / ledger rewritten under a single `ingest=base`,
    * the near-dup index compacted via
    * [[DedupIndexes.compactNearDupTo]] — reading ONLY the stored state
    * (committed text does not exist in it, and nothing is re-judged).
    * Same crash contract as every compaction here: `dst` is complete or
    * visibly unfinished, and the caller owns the src→dst pointer flip
    * ([[DedupIndexes.flipPointer]]).
    *
    * Compaction is the audit cadence: before anything is rewritten —
    * while the per-ingest labels still exist, the [[graft.sources
    * .SimilarityIndexes.compactPqTo]] measure-then-compact contract —
    * the TWO-AXIS retro drift audit runs and its verdict is RETURNED
    * (and warned on, never silently dropped): [[retroNearDup]] from
    * the stored index alone, [[retroContamination]] over `trainDocs`
    * when the caller supplies the committed train slice's text. A
    * non-zero count means a full rebuild would change committed
    * outcomes — compaction proceeds (it only reorganizes files; the
    * rebuild decision belongs to the caller), with the signal in hand.
    */
  def compactTo(spark: SparkSession, src0: String, dst: String,
                trainDocs: Option[DataFrame] = None): RetroAudit = {
    val src = DedupIndexes.resolveIndex(spark, src0)
    require(!DedupIndexes.pathsOverlap(spark, src, dst),
      "compaction rewrites into a NEW, non-overlapping path")
    def flaggedSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("flagged")), lit(0L))).head.getLong(0)
    val audit = RetroAudit(
      trainDocs.map(td => flaggedSum(retroContamination(td, src))),
      flaggedSum(retroNearDup(spark, src)))
    if (audit.rebuildDue)
      System.err.println(s"[graft] curate-state compaction of $src: retro " +
        s"audit flags rebuild-due (contam=${audit.contamFlagged.getOrElse(-1L)}, " +
        s"neardup=${audit.nearDupFlagged}) — compacting anyway; committed " +
        "outcomes stay immutable until a full rebuild")
    DedupIndexes.delete(spark, dst)
    spark.read.parquet(s"$src/meta")
      .write.mode("overwrite").parquet(s"$dst/meta")
    spark.read.parquet(s"$src/fps").drop("ingest").distinct()
      .write.mode("overwrite").parquet(s"$dst/fps/ingest=$BaseLabel")
    spark.read.parquet(s"$src/evalgrams").drop("ingest").distinct()
      .write.mode("overwrite").parquet(s"$dst/evalgrams/ingest=$BaseLabel")
    DedupIndexes.compactNearDupTo(spark, s"$src/neardup", s"$dst/neardup")
    spark.read.parquet(s"$src/ledger").drop("ingest")
      .write.mode("overwrite").parquet(s"$dst/ledger/ingest=$BaseLabel")
    audit
  }

  private def readMeta(spark: SparkSession,
                       path: String): (String, String, Int, Long) = {
    val row = spark.read.parquet(s"$path/meta").head()
    (row.getAs[String]("lang"), row.getAs[String]("split_threshold"),
      row.getAs[Int]("contam_n"), row.getAs[Long]("contam_min_pct"))
  }

  /** A state table read that tolerates the not-yet-written case (init,
    * or the first replay of a crashed init) and excludes the judging
    * batch's own label.
    */
  private def readState(spark: SparkSession, dir: String, label: String,
                        emptySchema: String): DataFrame =
    if (!DedupIndexes.hasData(spark, dir))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(emptySchema))
    else spark.read.parquet(dir).filter(col("ingest") =!= label).drop("ingest")

  /** DRY-RUN: the ledger `batch` WOULD get if committed under `label` —
    * the what-if admission preview, and the Plans-tracked spelling of
    * the judge (the committing entry points return the committed
    * artifact's read-back, whose plan is a bare parquet scan; this
    * frame's plan IS the work the commit executes). State reads exclude
    * `label`, so judging a batch under its own committed label
    * reproduces its commit-time verdicts (the replay view). No writes;
    * persisted intermediates are caller-cleaned (the
    * [[Pipeline.curateOn]] cache contract).
    */
  def judge(batch: DataFrame, path0: String,
            label: String = "preview"): DataFrame = {
    require(label.nonEmpty, "judge needs a non-empty label to exclude")
    judgeFrames(batch, DedupIndexes.resolveIndex(batch.sparkSession, path0),
      label).ledger
  }

  private case class Judged(judged: DataFrame, exactSurvivors: DataFrame,
                            batchEvalGrams: DataFrame, ledger: DataFrame)

  private def judgeAndCommit(batch: DataFrame, path: String,
                             label: String): DataFrame = graft.CacheScope.scoped {
    val spark = batch.sparkSession
    val j = judgeFrames(batch, path, label)
    // COMMIT — identity artifacts first, ledger LAST (the committed
    // marker); own-label overwrite everywhere makes any crash point
    // replay-healable
    j.judged.filter(col("survives_lq") && col("is_known").isNull)
      .select(col("fp")).distinct()
      .write.mode("overwrite").parquet(s"$path/fps/ingest=$label")
    val cand = j.exactSurvivors.select(col("doc_id"), col("text"))
    if (label == BaseLabel) DedupIndexes.writeNearDupIndex(cand, s"$path/neardup")
    else DedupIndexes.appendNearDup(cand, s"$path/neardup", label)
    j.batchEvalGrams
      .write.mode("overwrite").parquet(s"$path/evalgrams/ingest=$label")
    j.ledger.write.mode("overwrite").parquet(s"$path/ledger/ingest=$label")
    spark.read.parquet(s"$path/ledger")
      .filter(col("ingest") === label).drop("ingest")
  }

  private def judgeFrames(batch: DataFrame, path: String,
                          label: String): Judged = {
    val spark = batch.sparkSession
    val (lang, splitThreshold, contamN, contamMinPct) = readMeta(spark, path)

    // stages 1–2 + the exact gate: stored fps (every committed batch,
    // own label excluded) decide "already owned"; unknown fps race on
    // the in-batch min-id window — Pipeline.curateOn's keeper rule
    val known = readState(spark, s"$path/fps", label, "fp STRING")
      .withColumn("is_known", lit(1L))
    val judged = graft.CacheScope.track(
      Pipeline.stageBits(batch, lang)
        .withColumn("survives_lq",
          col("lang_ok") === 1L && col("quality_ok") === 1L)
        .join(known, Seq("fp"), "left")
        .withColumn("keeper_id",
          min(when(col("survives_lq") && col("is_known").isNull, col("doc_id")))
            .over(Window.partitionBy(col("fp"))))
        .persist())
    val exactSurvivors = graft.CacheScope.track(judged
      .filter(col("survives_lq") && col("is_known").isNull &&
        col("doc_id") === col("keeper_id"))
      .select(col("doc_id"), col("fp"), col("text"))
      .persist())

    // near-dup: verified state-index hits + in-batch clusters; a
    // cluster with ANY state hit drops WHOLE (its rebuild component
    // contains a committed id, which is smaller), a hit-free cluster
    // keeps its min id
    val cand = exactSurvivors.select(col("doc_id"), col("text"))
    val ndDir = s"$path/neardup"
    val stateHits: DataFrame =
      // bands is PARTITIONED BY band: a zero-survivor init writes a
      // fileless dir (no partitions materialize), which parquet cannot
      // schema-infer — an empty identity is the same as no identity
      if (!DedupIndexes.hasCompleteIndex(spark, ndDir) ||
          !DedupIndexes.hasData(spark, s"$ndDir/bands"))
        spark.range(0).select(col("id").as("doc_id"))
      else {
        val (n, k, bands) = DedupIndexes.readNearDupMeta(spark, ndDir)
        val (sh, idx) = DedupIndexes.readNearDupIndex(spark, ndDir,
          excludeIngest = Some(label))
        Dedup.incrementalNearDupFromIndex(sh, idx, cand, n, k, bands)
          .filter(col("is_new") === 0L)
          .select(col("doc_id"))
      }
    val clusters = Dedup.clusterPairs(
      Dedup.minHashNearDupsOn(cand).select(col("doc_a"), col("doc_b")))
    val clusterHit = clusters
      .join(stateHits.withColumn("hit", lit(1L)), Seq("doc_id"), "left")
      .groupBy(col("cluster_id")).agg(max(col("hit")).as("chit"))
    val nearLosers = graft.CacheScope.track(clusters.join(clusterHit, Seq("cluster_id"))
      .filter(col("chit") === 1L || col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"))
      .unionByName(stateHits)
      .distinct()
      .withColumn("is_near_dup", lit(1L))
      .persist())

    // split + decontamination: the eval n-gram universe is stored
    // eval grams ∪ this batch's eval grams
    val survivors = exactSurvivors
      .join(nearLosers.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .withColumn("split",
        when(col("fp") < lit(splitThreshold), lit("train")).otherwise(lit("eval")))
    // shingle REUSE: when the pinned contamN equals the dedup shingle
    // width (the driver config: both 3), this projection is spelled to
    // canonically match the near-dup stage's persisted shingle frame
    // (same source frame, same alias/filter shape as Dedup's
    // docShingles), so Spark's cache manager serves it from memory —
    // one shingle pass over the batch feeds dedup AND decontamination
    // instead of two (r19 verdict #4 profiling: the gram pass was a
    // full re-shingle of the survivor text). Sort order is irrelevant
    // post-explode; docs with zero shingles contribute no gram rows in
    // either spelling. A contamN ≠ ShingleN config keeps the direct
    // per-survivor spelling.
    val gramSrc =
      if (contamN == Dedup.ShingleN)
        cand.select(col("doc_id"),
            sort_array(TextOps.shingles(col("text"), contamN)).as("sh"))
          .withColumn("sz", size(col("sh")))
          .filter(col("sz") > 0)
          .join(survivors.select(col("doc_id"), col("split")), Seq("doc_id"))
          .select(col("doc_id"), col("split"),
            col("sz").cast("long").as("n_ngrams"), explode(col("sh")).as("ng"))
      else survivors
        .select(col("doc_id"), col("split"),
          TextOps.shingles(col("text"), contamN).as("ngs"))
        .select(col("doc_id"), col("split"),
          size(col("ngs")).cast("long").as("n_ngrams"), explode(col("ngs")).as("ng"))
    val grams = graft.CacheScope.track(gramSrc.persist())
    val batchEvalGrams = grams.filter(col("split") === "eval")
      .select(col("ng")).distinct()
    val evalUnion = batchEvalGrams
      .unionByName(readState(spark, s"$path/evalgrams", label, "ng STRING"))
      .distinct()
    val trainHits = grams.filter(col("split") === "train").join(evalUnion, "ng")
    val contaminated = (
      if (contamMinPct <= 0L) trainHits.select(col("doc_id")).distinct()
      else trainHits
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shared"), max(col("n_ngrams")).as("n_ngrams"))
        .filter(expr("n_shared * 100 DIV n_ngrams") >= contamMinPct)
        .select(col("doc_id")))
      .withColumn("is_contaminated", lit(1L))

    val ledgerOut = judged
      .join(nearLosers, Seq("doc_id"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        when(col("lang_ok") === 0L, lit("dropped_lang"))
          .when(col("quality_ok") === 0L, lit("dropped_quality"))
          .when(col("is_known") === 1L || col("doc_id") =!= col("keeper_id"),
            lit("dropped_duplicate"))
          .when(col("is_near_dup") === 1L, lit("dropped_near_duplicate"))
          .when(col("is_contaminated") === 1L, lit("dropped_contaminated"))
          .when(col("fp") < lit(splitThreshold), lit("train"))
          .otherwise(lit("eval")).as("outcome"))
    Judged(judged, exactSurvivors, batchEvalGrams, ledgerOut)
  }

  // -- driver-query harness (q_pipeline_curate_incr): state from the
  // first 250 docs (writeOnce fixture work, the stored-index scratch
  // precedent), then ONE incremental batch = the remaining docs plus
  // planted cross-state classes — an exact copy of every batch-1
  // doc_id % 7 == 0 doc (exercises the stored-fps gate) and a
  // one-token-appended copy of every batch-1 doc_id % 11 == 3 doc
  // (exercises the stored near-dup probe); both planted id ranges
  // follow the Pipeline.curateOn plant contract. The SQL oracle is the
  // FULL-REBUILD pipeline CTE over batch1 ∪ batch2 restricted to
  // batch2's rows — the equality contract, re-derived in DuckDB. --

  private[graft] val IncrSplitId = 250L

  /** The driver harness's deterministic (batch1, batch2) split — shared
    * by the committing query, the Plans judge spelling, and the retro
    * report so they can never disagree on the corpus.
    */
  private def incrBatches(spark: SparkSession,
                          sfDir: String): (DataFrame, DataFrame) = {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val batch1 = docs.filter(col("doc_id") < IncrSplitId)
    val batch2 = docs.filter(col("doc_id") >= IncrSplitId)
      .unionByName(batch1.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text")))
      .unionByName(batch1.filter(col("doc_id") % 11 === 3)
        .select((col("doc_id") + lit(2000000L)).as("doc_id"),
          concat(col("text"), lit(" plantedneardup")).as("text")))
    (batch1, batch2)
  }

  private def incrStatePath(spark: SparkSession, sfDir: String,
                            batch1: DataFrame, contamMinPct: Long): String = {
    val path = DedupIndexes.scratch("target/curate_state", "incr", sfDir)
    DedupIndexes.writeOnce(path)(
      init(batch1, path, contamMinPct = contamMinPct))
    path
  }

  def curateIncrDocs(spark: SparkSession, sfDir: String,
                     contamMinPct: Long = 40L): DataFrame = {
    val (batch1, batch2) = incrBatches(spark, sfDir)
    val path = incrStatePath(spark, sfDir, batch1, contamMinPct)
    // the b2 COMMIT is fixture work, memoized on its ledger dir — the
    // retroContamDocs/retroNearDupDocs precedent made symmetric (r18
    // verdict #4): the committed artifacts (fps, near-dup append, eval
    // grams, ledger) are deterministic functions of the writeOnce'd
    // state + batch, and re-overwriting them per bench rep charged
    // every rep for a replay. The QUERY itself stays the live JUDGE of
    // batch2 against the stored state — batch-sized stages plus
    // index-bounded probes, the serving path of incremental curation —
    // and its ledger equals the committed one by the same determinism
    // (the replay-idempotence spec pins commit == recommit).
    DedupIndexes.writeOnce(s"$path/ledger/ingest=b2")(
      increment(batch2, path, "b2"))
    judge(batch2, path, "b2")
  }

  /** The retro-decontamination report over the q_pipeline_curate_incr
    * corpus (q_pipeline_retro_contam): both batches committed (the
    * b2 commit is fixture work here, memoized on its ledger dir —
    * replay-idempotent if the committing query already ran), then every
    * committed TRAIN doc scored against the full stored eval-gram
    * universe. Hash-checked since r19 (a first-principles DuckDB
    * re-derivation of both committed ledgers + the coverage report);
    * additionally (the flagged set's equality with
    * "rebuild-dropped minus already-dropped" is asserted in
    * PipelineSpec); every quality-passing train doc has >= 18 n-grams,
    * so the report covers each committed train doc exactly once —
    * non-vacuous at every SF by construction.
    */
  def retroContamDocs(spark: SparkSession, sfDir: String,
                      contamMinPct: Long = 40L): DataFrame = {
    val (batch1, batch2) = incrBatches(spark, sfDir)
    val path = incrStatePath(spark, sfDir, batch1, contamMinPct)
    DedupIndexes.writeOnce(s"$path/ledger/ingest=b2")(
      increment(batch2, path, "b2"))
    val train = ledger(spark, path)
      .filter(col("outcome") === "train").select(col("doc_id"))
    retroContamination(
      batch1.unionByName(batch2).join(train, Seq("doc_id")), path)
  }

  // -- q_pipeline_retro_neardup harness: a DEDICATED two-batch state
  // with planted CROSS-BATCH BRIDGE TRIOS, built from token slices of
  // every base doc with doc_id % 50 == 7 and >= 54 tokens (M = tokens
  // 1..40, X = 41..48, Y = 49..54):
  //   - B1a = X ++ M (id 5_000_000 + 2d) and B1b = M ++ Y
  //     (id 5_000_001 + 2d) commit with batch 1: they share M's ~38
  //     internal shingles but each adds ~8/~6 of its own, so
  //     J(B1a, B1b) ≈ 38/52 ≈ 0.73 < 0.8 — NOT near-dups, both kept;
  //   - the bridge C = M alone (id 6_000_000 + d) arrives in batch 2:
  //     J(C, B1a) ≈ 38/46 ≈ 0.83 and J(C, B1b) ≈ 38/44 ≈ 0.86, both
  //     >= 0.8 — C drops against the stored index (a state hit on
  //     either committed doc), but a FULL REBUILD's component
  //     {B1a, B1b, C} keeps only B1a: B1b is a committed rep the
  //     rebuild would drop, which is exactly what the report flags.
  // Decontamination is disabled for this state (contamMinPct = 101 —
  // cov_pct can never reach it) so the near-dup axis is isolated: every
  // exact+near-dup survivor is KEPT and B1b's flag cannot be masked by
  // a split-dependent contamination drop. Hash-checked since r19 (the
  // oracle re-derives batch1's rebuild, batch2's INCREMENTAL judge —
  // the unordered plant ids break the union-restriction shortcut — and
  // the rebuild component graph from the exact pair set); the
  // flagged == rebuild-merged equality is additionally asserted in
  // PipelineSpec on a controlled trio. --

  private def retroNdBatches(spark: SparkSession,
                             sfDir: String): (DataFrame, DataFrame) = {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val toks = TextOps.tokens(col("text"))
    val src = docs.filter(col("doc_id") % 50 === 7 && size(toks) >= 54)
    val b1a = src.select((col("doc_id") * 2 + lit(5000000L)).as("doc_id"),
      array_join(concat(slice(toks, 41, 8), slice(toks, 1, 40)), " ").as("text"))
    val b1b = src.select((col("doc_id") * 2 + lit(5000001L)).as("doc_id"),
      array_join(concat(slice(toks, 1, 40), slice(toks, 49, 6)), " ").as("text"))
    val bridge = src.select((col("doc_id") + lit(6000000L)).as("doc_id"),
      array_join(slice(toks, 1, 40), " ").as("text"))
    (docs.filter(col("doc_id") < IncrSplitId)
       .unionByName(b1a).unionByName(b1b),
     docs.filter(col("doc_id") >= IncrSplitId).unionByName(bridge))
  }

  /** The retro-near-dup report over the bridge-trio corpus
    * (q_pipeline_retro_neardup): both batches committed as fixture
    * work (writeOnce on the last artifact), then every committed kept
    * doc scored against the rebuild component graph recomputed from
    * the stored index alone.
    */
  def retroNearDupDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val (batch1, batch2) = retroNdBatches(spark, sfDir)
    val path = DedupIndexes.scratch("target/curate_state", "retro_nd", sfDir)
    DedupIndexes.writeOnce(path)(
      init(batch1, path, contamMinPct = 101L))
    DedupIndexes.writeOnce(s"$path/ledger/ingest=b2")(
      increment(batch2, path, "b2"))
    retroNearDup(spark, path)
  }

  /** [[curateIncrDocs]]'s judge WITHOUT the commit — the Plans-tracked
    * spelling: the registered query returns the committed ledger's
    * read-back (a bare parquet scan as a plan), while this frame's plan
    * is the state-probing work the commit actually executes.
    */
  def curateIncrJudgeDocs(spark: SparkSession, sfDir: String,
                          contamMinPct: Long = 40L): DataFrame = {
    val (batch1, batch2) = incrBatches(spark, sfDir)
    judge(batch2, incrStatePath(spark, sfDir, batch1, contamMinPct), "b2")
  }
}
