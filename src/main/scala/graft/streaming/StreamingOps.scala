package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.engine.GrepEngine
import graft.engine.GrepEngine.{Mode, Substring}

/** Typed event row for the custom-state operators. */
case class UserEvent(user_id: Long, event_id: Long, us: Long)

/** [[UserEvent]] plus the event-time column the watermark is declared
  * on — the expiring-state operators need the timestamp to survive into
  * the grouped Dataset.
  */
case class UserEventTs(user_id: Long, event_id: Long, us: Long,
                       ts: java.sql.Timestamp)

/** Running per-user profile: the feature-store shape a streaming
  * pipeline maintains (count + last activity so far).
  */
case class UserProfile(user_id: Long, n_events: Long, last_us: Long)

/** Typed event row for the streaming funnel (event_type carried). */
case class TypedEvent(user_id: Long, event_type: String, us: Long)

/** Running funnel state: the stage reached so far and the event time
  * that reached it.
  */
case class FunnelState(user_id: Long, funnel_stage: Long, reach_us: Long)

/** Structured Streaming counterparts of the batch operators (SURVEY.md
  * §7.2 M3). The transforms are the SAME declarative plans as the batch
  * versions — on a streaming DataFrame Spark plans them as incremental
  * stateful aggregations instead; nothing is reimplemented. Excluded
  * from the DuckDB oracle set (not SQL-expressible there); driven by
  * memory-source/memory-sink tests in StreamingSpec.
  *
  * Scale notes: state is partitioned by the aggregation key exactly like
  * the batch shuffle; watermarks bound state size for event-time windows
  * (without one, a windowed aggregation's state grows forever at 100 TB/
  * day ingest). Sinks should be idempotent or transactional; file/kafka
  * sinks give exactly-once with checkpointing.
  */
object StreamingOps {

  /** Streaming grep: distinct matching lines with occurrence counts,
    * continuously updated. Identical semantics to the reference's one
    * query, unbounded input. Use outputMode("update"/"complete") — a
    * global aggregate without watermark cannot append.
    */
  def grepFreq(lines: DataFrame, lineCol: String, pattern: String,
               mode: Mode = Substring): DataFrame =
    GrepEngine.grepFreq(lines, lineCol, pattern, mode)

  /** Text-directory streaming source: each new file dropped into `dir`
    * becomes a micro-batch of lines — the streaming upgrade of the
    * reference's whole-file ingestion.
    */
  def textDirStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.text(dir)

  /** Event-time tumbling-window counts per event type with a watermark —
    * the streaming counterpart of [[graft.operators.Relational.eventsDaily]].
    * The watermark lets Spark finalize + emit windows (append mode) and
    * garbage-collect their state once event time passes window end +
    * `watermark`; late rows behind the watermark are dropped.
    */
  def windowedEventCounts(events: DataFrame, tsCol: String = "ts",
                          watermark: String = "10 minutes",
                          windowLen: String = "15 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Streaming gap-based sessionization via Spark's native
    * `session_window` — the incremental counterpart of
    * [[graft.operators.AsOf.sessionizeSalted]]: state per open session,
    * merged as events arrive, finalized (append mode) once the watermark
    * passes session end + gap. The Spark-first answer to streaming
    * sessions — no hand-rolled state.
    */
  def sessionWindowCounts(events: DataFrame, tsCol: String = "ts",
                          gap: String = "10 minutes",
                          watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col("user_id"), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Streaming exact dedup on a canonical fingerprint — the streaming
    * counterpart of [[graft.operators.Dedup.exact]]: first occurrence
    * wins, later duplicates are suppressed across micro-batches.
    *
    * STATE CAVEAT: this spelling keeps one state entry per distinct
    * fingerprint FOREVER (no watermark), which is correct only for
    * bounded key universes or short-lived queries. The production shape
    * for unbounded ingest is [[dedupStreamWithinWatermark]], which
    * evicts a fingerprint's state once the watermark passes its arrival
    * time + the dedup horizon.
    */
  def dedupStream(lines: DataFrame, textCol: String = "value"): DataFrame =
    lines
      .withColumn("fingerprint",
        md5(regexp_replace(trim(lower(col(textCol))), "\\s+", " ")))
      .dropDuplicates("fingerprint")

  /** Bounded-state streaming dedup: duplicates of a fingerprint are
    * suppressed while they arrive within `watermark` of the first
    * occurrence's event time; once the watermark passes, the state entry
    * is dropped — so a re-occurrence far later is emitted again. That is
    * the deliberate contract for 100 TB/day ingest: state size is
    * O(distinct keys per horizon), not O(distinct keys ever), and
    * upstream batch dedup ([[graft.operators.Dedup.exact]]) owns
    * cross-horizon duplicates. Append-mode-safe (emits on arrival).
    */
  def dedupStreamWithinWatermark(lines: DataFrame, tsCol: String = "ts",
                                 textCol: String = "value",
                                 watermark: String = "10 minutes"): DataFrame =
    lines
      .withColumn("fingerprint",
        md5(regexp_replace(trim(lower(col(textCol))), "\\s+", " ")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Stream-static enrichment: every micro-batch joined to a static
    * dimension table — the canonical "label events with reference data"
    * shape. The dim side is explicitly broadcast (it is a true
    * dimension), so each micro-batch plans a broadcast hash join with no
    * shuffle of the stream and NO join state: the static side is simply
    * re-planned per batch. Stateless ⇒ watermark-free and append-safe.
    */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
                    key: String): DataFrame =
    stream.join(broadcast(dim), key)

  /** Stream-stream interval join (the attribution shape): each click
    * joined to the same user's impression at-or-before it within
    * `windowSec`. BOTH sides carry watermarks and the join condition
    * bounds event-time distance — that pair is what lets Spark expire
    * join state (an unbounded stream-stream join would buffer both
    * streams forever). Inner join ⇒ matches emit as soon as both rows
    * arrive; state for a row is dropped once the watermark passes its
    * time + window.
    */
  def attributeClicks(impressions: DataFrame, clicks: DataFrame,
                      watermark: String = "10 minutes",
                      windowSec: Long = 600): DataFrame =
    impressions.withWatermark("imp_ts", watermark)
      .join(clicks.withWatermark("click_ts", watermark),
        expr(s"""imp_user = click_user AND
                 click_ts >= imp_ts AND
                 click_ts <= imp_ts + interval $windowSec seconds"""))

  /** Streaming INCREMENTAL INGEST via foreachBatch — the streaming front
    * door to [[graft.operators.Dedup.incrementalNew]]: each micro-batch
    * is collapsed on the canonical content fingerprint, anti-joined
    * against the fingerprints already in the corpus directory, and ONLY
    * corpus-new rows are appended. foreachBatch is the right tool when a
    * sink needs full batch-DataFrame semantics (an arbitrary join against
    * batch data + a table append) that no built-in streaming sink offers.
    *
    * Scale notes: the anti-join reads only the corpus `fingerprint`
    * column (parquet column pruning); at 100 TB that column is the
    * ingest index, kept compacted. The append is idempotent per
    * fingerprint by construction (a re-delivered batch re-anti-joins
    * against the corpus it already extended, finding nothing new), so
    * failure-replay cannot duplicate rows — stronger than relying on the
    * sink's exactly-once log.
    */
  def ingestNewDocs(lines: DataFrame, corpusDir: String,
                    textCol: String = "value"): org.apache.spark.sql.streaming.StreamingQuery =
    lines.writeStream.foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
      val spark = batch.sparkSession
      val fp = md5(regexp_replace(trim(lower(col(textCol))), "\\s+", " "))
      val deduped = batch
        .select(fp.as("fingerprint"), col(textCol).as("text"))
        .groupBy(col("fingerprint"))
        .agg(min(col("text")).as("text"))
      // bootstrap: day 0 has no corpus DATA yet — the first batch IS the
      // corpus. Checked for actual data files (not bare path existence:
      // a failed first write or an empty batch can leave a directory
      // holding only _SUCCESS/_temporary, and read.parquet on that would
      // wedge every subsequent batch). Flat layout — this op's own
      // appends — so a top-level listing suffices; Hadoop FS API keeps
      // it store-agnostic.
      val path = new org.apache.hadoop.fs.Path(corpusDir)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val hasData = fs.exists(path) && fs.listStatus(path).exists { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      val fresh =
        if (hasData)
          deduped.join(spark.read.parquet(corpusDir).select("fingerprint"),
            Seq("fingerprint"), "left_anti")
        else deduped
      fresh.write.mode("append").parquet(corpusDir)
      ()
    }.start()

  /** Streaming CURATION ingest via foreachBatch — the streaming front
    * door to [[graft.operators.Pipeline]]: each micro-batch passes the
    * batch-pipeline's EXACT gate ([[graft.operators.Pipeline.stageBits]]
    * — same lang-ID, quality-rule, and canonical-fingerprint spellings,
    * so batch and streaming curation cannot disagree on which docs
    * pass), is exact-deduped against the corpus, and lands in TWO
    * sinks: accepted docs append to the corpus, and EVERY input doc
    * gets a per-batch LEDGER row recording its outcome
    * (`dropped_lang` / `dropped_quality` / `dropped_duplicate` /
    * `ingested`) — the streaming counterpart of the batch audit ledger
    * (q_pipeline_curate), so "why did the corpus not grow?" is a query
    * over the ledger, not a log dive.
    *
    * Replay idempotence is LABEL-BASED, stronger than
    * [[ingestNewDocs]]'s anti-join-only contract, because the ledger
    * forces it: corpus rows and ledger rows both land under their
    * batch's own `ingest=<batchId>` partition with overwrite-on-own-
    * label, and the duplicate check reads the corpus EXCLUDING the
    * current label. A crashed-and-replayed batch therefore recomputes
    * the SAME outcomes (its own half-written append is invisible to
    * the dup check) and overwrites its own partitions — outcomes can
    * never flip to `dropped_duplicate` against the batch's own prior
    * attempt, and nothing lands twice.
    *
    * Scale notes: the gate is a pure per-row projection; the dup check
    * reads only the corpus `fingerprint` column (parquet pruning); the
    * in-batch exact collapse is the same fingerprint groupBy every
    * ingest sink starts with.
    *
    * `nearDupIndexDir = Some(dir)` switches the NEAR-DUP admission
    * stage on, so the streaming gate matches batch
    * `Pipeline.curate(nearDedup = true)` outcome-for-outcome: quality-
    * passing, exact-new docs probe the corpus's STORED MinHash band
    * index ([[graft.sources.DedupIndexes]], under the index's own
    * pinned (n, k, bands) meta — the [[ingestNewDocsNearDup]]
    * contract, self-heal bootstrap included), corpus near-dups ledger
    * as `dropped_near_duplicate`, in-batch near-dup clusters among the
    * corpus-new docs keep their min-doc_id representative (the
    * batch-pipeline keeper rule), and the sink MAINTAINS the index
    * with each delivery's accepted docs. Replay stays label-based on
    * ALL THREE artifacts: the dup check, the index probe, and the
    * index maintenance each exclude the current label, so a crashed
    * replay re-judges against every OTHER ingest and overwrites its
    * own partitions. Without the flag, near-dup/verbatim admission
    * stays the job of the sibling sinks — this one owns the quality
    * gate and the audit trail.
    *
    * `blocklistTerms = Some(terms)` switches the batch pipeline's
    * stage 1b on (C4-style bad-words rule, between lang-ID and quality
    * in outcome precedence): any whole-token case-insensitive hit
    * ledgers as `dropped_blocklist`. The broadcast-join spelling
    * ([[graft.operators.Profile.blocklistVerdictOn]]) — production
    * blocklists are hundreds of terms — and a pure per-row projection:
    * replay idempotence needs only that the caller keep the terms
    * frame stable across a replay (the stored-model-generation rule).
    */
  def ingestCuratedDocs(lines: DataFrame, corpusDir: String,
                        ledgerDir: String,
                        textCol: String = "value",
                        lang: String = "en",
                        nearDupIndexDir: Option[String] = None,
                        clfModelDir: Option[String] = None,
                        pplModelDir: Option[String] = None,
                        verbatimIndexDir: Option[String] = None,
                        blocklistTerms: Option[DataFrame] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    // qualified-path overlap, not raw startsWith: sibling dirs sharing a
    // name prefix (/data/corpus vs /data/corpus-ledger) are fine, while
    // trailing-slash/relative/`..` respellings of the SAME dir are not —
    // the DedupIndexes.pathsOverlap idiom (r11 ADVICE)
    require(!graft.sources.DedupIndexes.pathsOverlap(
        lines.sparkSession, corpusDir, ledgerDir),
      s"corpusDir and ledgerDir must be disjoint: $corpusDir vs $ledgerDir")
    nearDupIndexDir.foreach { d =>
      assertIndexDisjointFromCorpus(lines.sparkSession, corpusDir, d)
      require(!graft.sources.DedupIndexes.pathsOverlap(
          lines.sparkSession, ledgerDir, d),
        s"nearDupIndexDir and ledgerDir must be disjoint: $d vs $ledgerDir")
    }
    Seq(("clfModelDir", clfModelDir), ("pplModelDir", pplModelDir),
        ("verbatimIndexDir", verbatimIndexDir)).foreach {
      case (name, opt) => opt.foreach { d =>
        Seq(("corpusDir", corpusDir), ("ledgerDir", ledgerDir)).foreach {
          case (what, dir) =>
            require(!graft.sources.DedupIndexes.pathsOverlap(
                lines.sparkSession, dir, d),
              s"$name and $what must be disjoint: $d vs $dir")
        }
      }
    }
    lines.writeStream.foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      curateBatch(batch.toDF(), corpusDir, ledgerDir, batchId.toString,
        textCol, lang, nearDupIndexDir, clfModelDir, pplModelDir,
        verbatimIndexDir, blocklistTerms)
    }.start()
  }

  /** One curation-ingest delivery — [[ingestCuratedDocs]]'s batch body,
    * factored so the same-label crash-replay contract is directly
    * spec-drivable (StreamingSpec re-runs a label and asserts identical
    * outcomes and no growth).
    */
  private[graft] def curateBatch(batch: DataFrame, corpusDir: String,
                                 ledgerDir: String, label: String,
                                 textCol: String = "value",
                                 lang: String = "en",
                                 nearDupIndexDir: Option[String] = None,
                                 clfModelDir: Option[String] = None,
                                 pplModelDir: Option[String] = None,
                                 verbatimIndexDir: Option[String] = None,
                                 blocklistTerms: Option[DataFrame] = None): Unit =
    graft.CacheScope.scoped {
      val spark = batch.sparkSession
      // in-batch exact collapse on the canonical fingerprint (the
      // same groupBy every ingest sink starts with); doc ids are
      // xxhash64(fingerprint) — stable across batches and replays
      val fp = md5(regexp_replace(trim(lower(col(textCol))), "\\s+", " "))
      val collapsed = batch
        .select(fp.as("fingerprint"), col(textCol).as("text"))
        .groupBy(col("fingerprint"))
        .agg(min(col("text")).as("text"))
        .withColumn("doc_id", xxhash64(col("fingerprint")))
      // the batch pipeline's gate, verbatim (fp recomputed by
      // stageBits == the collapse fingerprint: same spelling)
      val gated = graft.CacheScope.track(
        graft.operators.Pipeline.stageBits(
          collapsed.select(col("doc_id"), col("text")), lang)
          .persist())
      // duplicate check against every OTHER ingest's corpus rows —
      // excluding the current label so a failure replay recomputes
      // identical outcomes instead of flagging its own prior attempt
      val hasCorpus = graft.sources.DedupIndexes.hasData(spark, corpusDir)
      val known =
        if (hasCorpus)
          spark.read.parquet(corpusDir)
            .filter(col("ingest") =!= label)
            .select(col("fp")).distinct()
            .withColumn("is_known", lit(1L))
        else spark.range(0)
          .select(lit("").as("fp"), lit(1L).as("is_known"))
      val judgedExact = gated.join(known, Seq("fp"), "left")
      // optional C4-style BLOCKLIST stage (the batch pipeline's stage
      // 1b, between lang-ID and quality in outcome precedence): the
      // broadcast-join spelling ([[graft.operators.Profile
      // .blocklistVerdictOn]]) — production blocklists are hundreds of
      // terms, never a codegen'd literal. A pure per-row projection
      // against the caller's term frame: no state read or written, so
      // replay idempotence is free (the terms frame is the caller's to
      // keep stable across a replay, like the model generations below)
      // verdict computed ONLY over lang-passing docs: outcome precedence
      // puts dropped_lang first, so a lang-dropped doc's block verdict
      // is never read — tokenizing + joining it per micro-batch is
      // wasted work (the null it gets from the left join below is
      // already the not-blocked spelling downstream expects)
      val judgedBlock = blocklistTerms.fold(
          judgedExact.withColumn("is_blocked", lit(null).cast("long"))) { terms =>
        judgedExact.join(
          graft.operators.Profile.blocklistVerdictOn(
              gated.filter(col("lang_ok") === 1L)
                .select(col("doc_id"), col("text")), terms)
            .filter(col("n_hits") > 0L)
            .select(col("doc_id"))
            .withColumn("is_blocked", lit(1L)),
          Seq("doc_id"), "left")
      }
      // optional near-dup admission: quality-passing, exact-new docs
      // against the corpus near-dup identity (stored band index, own
      // label excluded from probe AND corpus on replay), then the
      // in-batch cluster collapse among corpus-new docs — the
      // batch-pipeline keeper rule, in the ingestNewDocsNearDup
      // ordering (corpus probe FIRST, so admission never depends on
      // what shared a micro-batch; see that sink's comment)
      val idxLabel = s"b$label"
      val nearLosers: Option[DataFrame] = nearDupIndexDir.map { dir =>
        val candidates = judgedBlock
          .filter(col("lang_ok") === 1L && col("is_blocked").isNull &&
            col("quality_ok") === 1L && col("is_known").isNull)
          .select(col("doc_id"), col("text"))
        val corpusNear: DataFrame =
          if (!hasCorpus)
            spark.range(0).select(col("id").as("doc_id"))
          else {
            val corpusOther = spark.read.parquet(corpusDir)
              .filter(col("ingest") =!= label)
              .select(col("doc_id"), col("text"))
            // manifest-last self-heal bootstrap, from every OTHER
            // ingest's rows (a replay must not index its own crashed
            // attempt into the identity it then probes)
            if (!graft.sources.DedupIndexes.hasCompleteIndex(spark, dir))
              graft.sources.DedupIndexes.rebuildNearDupIndex(corpusOther, dir)
            val (n, k, bands) =
              graft.sources.DedupIndexes.readNearDupMeta(spark, dir)
            val (sh, idx) = graft.sources.DedupIndexes
              .readNearDupIndex(spark, dir, excludeIngest = Some(idxLabel))
            graft.operators.Dedup.incrementalNearDupFromIndex(sh, idx,
                candidates, n, k, bands)
              .filter(col("is_new") === 0L)
              .select(col("doc_id"))
          }
        val corpusNew = candidates.join(corpusNear, Seq("doc_id"), "left_anti")
        val inBatchLosers = graft.operators.Dedup.clusterPairs(
            graft.operators.Dedup.minHashNearDupsOn(corpusNew)
              .select(col("doc_a"), col("doc_b")))
          .filter(col("cluster_id") =!= col("doc_id"))
          .select(col("doc_id"))
        corpusNear.unionByName(inBatchLosers).distinct()
          .withColumn("is_near_dup", lit(1L))
      }
      val judgedNear = nearLosers
        .fold(judgedBlock.withColumn("is_near_dup", lit(null).cast("long")))(
          nl => judgedBlock.join(nl, Seq("doc_id"), "left"))
      // optional VERBATIM-SPAN removal (the batch pipeline's stage 3c,
      // the ExactSubstr pass) against STORED state: every doc that
      // survived the earlier gates has its >= 20-token runs cut — both
      // runs shared with COMMITTED corpus text (probe of the stored
      // positional index, [[graft.operators.Dedup
      // .incrementalVerbatimSpansFromIndex]], own label excluded so a
      // crashed replay never self-matches) and runs shared WITHIN the
      // delivery ([[graft.operators.Dedup.verbatimRunSpansOn]], the
      // batch higher-id rule). Docs are cleaned, never dropped; the
      // classifier/ppl stages below score the CLEANED text (the batch
      // ordering) and the corpus lands the CLEANED text while fp/dedup
      // identity stay pinned to the ORIGINAL text (the batch split
      // rule). ONE deliberate asymmetry vs batch, pinned in
      // StreamingSpec: committed text is immutable, so a cross run with
      // the corpus always cuts from the ARRIVING doc regardless of id
      // order, where the batch bidirectional rule cuts the higher id.
      val survivorsOrig = judgedNear
        .filter(col("lang_ok") === 1L && col("is_blocked").isNull &&
          col("quality_ok") === 1L && col("is_known").isNull &&
          (col("is_near_dup").isNull || col("is_near_dup") =!= 1L))
        .select(col("doc_id"), col("text"))
      val cleaned: Option[DataFrame] = verbatimIndexDir.map { dir =>
        val crossSpans: DataFrame =
          if (!hasCorpus)
            spark.range(0).select(col("id").as("doc_b"),
              col("id").as("b_start"), col("id").as("run_tokens"))
          else {
            val corpusOther = spark.read.parquet(corpusDir)
              .filter(col("ingest") =!= label)
              .select(col("doc_id"), col("text"))
            // manifest-last self-heal bootstrap from every OTHER
            // ingest's rows (the near-dup index contract: a replay must
            // not index its own crashed attempt into the state it probes)
            if (!graft.sources.DedupIndexes.hasCompleteIndex(spark, dir))
              graft.sources.DedupIndexes.writeVerbatimIndex(corpusOther, dir)
            val (pos, occ) = graft.sources.DedupIndexes
              .readVerbatimIndex(spark, dir, excludeIngest = Some(idxLabel))
            graft.operators.Dedup.incrementalVerbatimSpansFromIndex(
              pos, occ, survivorsOrig)
          }
        val inBatchSpans = graft.operators.Dedup
          .verbatimRunSpansOn(survivorsOrig)
        graft.operators.Dedup.applyVerbatimCuts(survivorsOrig,
          crossSpans.select(col("doc_b"), col("b_start"), col("run_tokens"))
            .unionByName(inBatchSpans
              .select(col("doc_b"), col("b_start"), col("run_tokens"))))
      }
      // the text every later consumer (classifier, ppl, the corpus
      // sink) sees: cleaned when the verbatim stage ran, original
      // otherwise
      val survivorText: DataFrame = cleaned
        .fold(survivorsOrig.withColumn("n_tokens_removed", lit(0L)))(
          cl => cl.select(col("doc_id"), col("text"),
            col("n_tokens_removed")))
      // optional CLASSIFIER admission (the batch pipeline's stage 5b,
      // the GPT-3-style reference-similarity filter) from STORED
      // calibration state: docs that survived every earlier stage are
      // scored under the stored NB model's derived weights
      // ([[graft.sources.ClassifierModels.readNbWeights]], broadcast
      // join — the production-vocabulary spelling) and drop as
      // `dropped_classifier` when their per-100-token score sits at or
      // below the PINNED tertile boundary
      // ([[graft.sources.ClassifierModels.readNbCutoff]]). This is the
      // batch distributional rule re-expressed as score-vs-stored-
      // cutoff — the only per-batch-computable spelling: a micro-batch
      // has no corpus distribution to rank against, so the boundary is
      // calibrated once at fit time and applied as a scalar (equal to
      // the batch head-tertile whenever no off-tertile doc ties the
      // boundary value — the inherent rank-vs-value residual, and the
      // batch gate's eval-split docs are exempt where streaming has no
      // split; StreamingSpec pins both). No calibrated cutoff ⇒ the
      // stage admits everything. The gate only READS the model —
      // calibration/maintenance is out-of-band, and replay idempotence
      // assumes the model generation is stable across the replay (the
      // pointer-resolved read makes that a deliberate operator act).
      val clfLosers: Option[DataFrame] = clfModelDir.flatMap { dir =>
        graft.sources.ClassifierModels.readNbCutoff(spark, dir).map {
          case (cutoff, vocab) =>
            val candidates = survivorText.select(col("doc_id"), col("text"))
            graft.operators.Classifier.nbScoreOn(candidates,
                graft.sources.ClassifierModels.readNbWeights(spark, dir, vocab))
              .select(col("doc_id"),
                expr("(score * 100 + 10000 * n_tokens) DIV n_tokens")
                  .as("bits_per_100"))
              .filter(col("bits_per_100") <= cutoff)
              .select(col("doc_id"))
              .withColumn("is_clf_drop", lit(1L))
        }
      }
      val judged = graft.CacheScope.track(clfLosers
        .fold(judgedNear.withColumn("is_clf_drop", lit(null).cast("long")))(
          cl => judgedNear.join(cl, Seq("doc_id"), "left"))
        .withColumn("outcome",
          when(col("lang_ok") === 0L, lit("dropped_lang"))
            .when(col("is_blocked") === 1L, lit("dropped_blocklist"))
            .when(col("quality_ok") === 0L, lit("dropped_quality"))
            .when(col("is_known") === 1L, lit("dropped_duplicate"))
            .when(col("is_near_dup") === 1L, lit("dropped_near_duplicate"))
            .when(col("is_clf_drop") === 1L, lit("dropped_classifier"))
            .otherwise(lit("ingested")))
        .persist())
      // own-label overwrite on both sinks: replay heals every crash
      // point (ledger-then-crash, corpus-then-crash, both-then-crash)
      // ingested rows land with the FINAL text (cleaned when the
      // verbatim stage ran); fp stays the ORIGINAL fingerprint — the
      // exact-dup identity is pre-cut, the batch split rule
      val ingestedRows = graft.CacheScope.track(
        judged.filter(col("outcome") === "ingested")
          .select(col("doc_id"), col("fp"))
          .join(survivorText.select(col("doc_id"), col("text")), Seq("doc_id"))
          .persist())
      ingestedRows.select(col("doc_id"), col("fp"), col("text"))
        .write.mode("overwrite").parquet(s"$corpusDir/ingest=$label")
      // optional PERPLEXITY annotation (the batch pipeline's stage 6,
      // CCNet's head/middle/tail) from stored calibration state:
      // ingested docs are scored under the STORED unigram LM
      // ([[graft.sources.LmModels.lmScoreStoredOn]], same broadcast
      // plan as the batch scorer) and bucketed against the PINNED
      // tertile boundaries ([[graft.sources.LmModels.readLmCutoffs]])
      // — like the batch stage it annotates, never drops; dropped docs
      // carry NULL. Same score-vs-stored-cutoff residual as the
      // classifier gate (StreamingSpec pins it); no calibrated
      // boundaries ⇒ the column stays NULL.
      val ledgerBase = pplModelDir
        .flatMap(dir => graft.sources.LmModels.readLmCutoffs(spark, dir)
          .map(dir -> _)) match {
        case None => judged.select(col("doc_id"), col("outcome"))
        case Some((dir, (q1, q2, vocab))) =>
          val buckets = graft.sources.LmModels.lmScoreStoredOn(
              ingestedRows.select(col("doc_id"), col("text")), dir, vocab)
            .select(col("doc_id"),
              when(col("bits_per_100") <= q1, lit("head"))
                .when(col("bits_per_100") <= q2, lit("middle"))
                .otherwise(lit("tail")).as("ppl_bucket"))
          judged.select(col("doc_id"), col("outcome"))
            .join(buckets, Seq("doc_id"), "left")
      }
      // the verbatim stage's cut measure rides the ledger like the
      // batch pipeline's: nonzero only for docs that were survivors
      // when the cut ran (including ones the classifier then dropped —
      // the cut happened; the ledger records what happened)
      val ledgerRows = cleaned.fold(ledgerBase)(cl =>
        ledgerBase.join(cl.select(col("doc_id"), col("n_tokens_removed")),
            Seq("doc_id"), "left")
          .withColumn("n_tokens_removed",
            coalesce(col("n_tokens_removed"), lit(0L))))
      ledgerRows.write.mode("overwrite").parquet(s"$ledgerDir/ingest=$label")
      // verbatim index MAINTENANCE: the accepted docs' CLEANED text
      // (what the corpus holds IS what future arrivals must be compared
      // against) appends under the own label — bootstrap reads
      // other-ingest rows only, so own-label exclusion stays sound at
      // every crash point (the near-dup maintenance contract below)
      verbatimIndexDir.foreach { dir =>
        if (!graft.sources.DedupIndexes.hasCompleteIndex(spark, dir))
          graft.sources.DedupIndexes.writeVerbatimIndex(
            spark.read.parquet(corpusDir)
              .filter(col("ingest") =!= label)
              .select(col("doc_id"), col("text")), dir)
        if (!ingestedRows.isEmpty)
          graft.sources.DedupIndexes.appendVerbatim(
            ingestedRows.select(col("doc_id"), col("text")), dir, idxLabel)
      }
      // index MAINTENANCE (the maintainIndex contract, ledger-sink
      // spelling). The bootstrap build deliberately reads every OTHER
      // ingest's corpus rows and the current batch's accepted docs then
      // land under the OWN label: a full build over the whole corpus
      // would file this batch's docs under `base`, where the replay
      // exclusion cannot remove them — the replay would find its own
      // docs at Jaccard 1.0 and flip its ledger outcomes to
      // dropped_near_duplicate. With the split, every row of the index
      // is attributable to the ingest that wrote it, and own-label
      // exclusion stays sound at every crash point.
      nearDupIndexDir.foreach { dir =>
        val accepted = judged.filter(col("outcome") === "ingested")
          .select(col("doc_id"), col("text"))
        if (!graft.sources.DedupIndexes.hasCompleteIndex(spark, dir)) {
          graft.sources.DedupIndexes.rebuildNearDupIndex(
            spark.read.parquet(corpusDir)
              .filter(col("ingest") =!= label)
              .select(col("doc_id"), col("text")), dir)
          if (!accepted.isEmpty)
            graft.sources.DedupIndexes.appendNearDup(accepted, dir, idxLabel)
        } else {
          val toIndex = accepted
            .join(graft.sources.DedupIndexes.indexedDocIds(spark, dir,
              excludeLabel = Some(idxLabel)), Seq("doc_id"), "left_anti")
          if (!toIndex.isEmpty)
            graft.sources.DedupIndexes.appendNearDup(toIndex, dir, idxLabel)
        }
      }
      ()
    }

  /** Streaming NEAR-dup ingest via foreachBatch — the streaming front
    * door to [[graft.operators.Dedup.incrementalNearDup]]: each
    * micro-batch is collapsed on the exact content fingerprint, probed
    * against the corpus's MinHash band index, and finally collapsed on
    * in-batch near-duplicate clusters AMONG THE CORPUS SURVIVORS
    * (min-doc_id representative per cluster — two non-identical
    * near-dups arriving together must not both enter the corpus, but a
    * doc must not be lost just because a near-dup of it that is ALSO a
    * corpus near-dup shared its micro-batch; see the ordering comment in
    * the body). The near-dup probe alone would miss sub-n-token docs
    * (no shingles → trivially "new"), so the exact fingerprint anti-join
    * stays in the pipeline as the backstop — the append condition is
    * fingerprint-new AND near-dup-new.
    *
    * Idempotent under failure replay like [[ingestNewDocs]]: a
    * re-delivered batch finds each of its docs at Jaccard 1.0 against
    * the copy it already appended (or fingerprint-caught when too short
    * to shingle), so nothing is appended twice.
    *
    * doc ids are synthesized as xxhash64(fingerprint) — stable across
    * batches and engines, so the corpus table needs no id column and
    * re-deliveries map to the same id.
    *
    * `indexDir = Some(dir)` is the production spelling: the batch
    * probes the corpus's STORED band index
    * ([[graft.sources.DedupIndexes]]) instead of re-deriving it from
    * the corpus text per batch — under the index's OWN meta config, so
    * a sink attached to a non-default (n, k, bands) index cannot fork
    * the scheme — and after the corpus append the sink MAINTAINS the
    * index: the delivery's accepted docs are appended under
    * `ingest=<batchId>`. The index delta is derived replay-stably as
    * (batch docs ⋉ corpus ids) ⋉̸ (docs other ingests already
    * indexed), so every crash point heals: a crash between the corpus
    * append and the index append replays into the same delta (the docs
    * ARE in the corpus, and the current batchId's own half-written
    * ingest is excluded from the "already indexed" set and simply
    * overwritten). Per-delivery maintenance never scans corpus text —
    * only its doc_id column (the same per-batch id-column economy as
    * the fingerprint anti-join). With NO complete index at `dir`
    * (manifest absent — a virgin index, a build that crashed
    * half-written, or a sink pointed at a pre-existing corpus), the
    * sink SELF-BOOTSTRAPS the full build from the corpus before
    * probing: the one unavoidable corpus scan, after which maintenance
    * is forward-only. `indexDir = None` keeps the
    * derive-inline-per-batch spelling for corpora small enough that
    * the index build is cheaper than the bookkeeping.
    *
    * Either way each batch body runs inside a [[graft.CacheScope]]:
    * the operator-internal persist()s register with the scope and are
    * unpersisted — targeted, never `clearCache()` — once the batch's
    * writes land, so frames a co-resident caller persisted survive the
    * ingest (round-9 contract, asserted in StreamingSpec).
    */
  def ingestNewDocsNearDup(lines: DataFrame, corpusDir: String,
                           textCol: String = "value",
                           indexDir: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    indexDir.foreach(assertIndexDisjointFromCorpus(lines.sparkSession, corpusDir, _))
    lines.writeStream.foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      graft.CacheScope.scoped {
      val spark = batch.sparkSession
      val fp = md5(regexp_replace(trim(lower(col(textCol))), "\\s+", " "))
      // persisted: feeds the probe, the survivors join, the in-batch
      // collapse, and the index-maintenance delta — scope-tracked so
      // the batch body's exit unpersists it
      val exactDeduped = graft.CacheScope.track(batch
        .select(fp.as("fingerprint"), col(textCol).as("text"))
        .groupBy(col("fingerprint"))
        .agg(min(col("text")).as("text"))
        .withColumn("doc_id", xxhash64(col("fingerprint")))
        .persist())
      val hasData = flatDirHasData(spark, corpusDir)
      // Corpus probe FIRST, in-batch collapse among corpus SURVIVORS
      // second. Collapsing first would discard a cluster's losers even
      // when their representative is itself rejected as a corpus
      // near-dup — near-dup similarity is not transitive, so a loser can
      // be corpus-new while its representative is not, and whether a doc
      // entered the corpus would again depend on what shared its
      // micro-batch. This ordering appends a doc iff (a) it is not an
      // exact or >= 0.8 near-duplicate of the corpus and (b) it is not a
      // near-dup loser to another doc that ALSO passed (a) — both
      // conditions independent of arrival batching. Cost: the corpus is
      // probed with the pre-collapse batch (bounded by delivery size).
      val survivors =
        if (hasData) {
          val corpus = spark.read.parquet(corpusDir)
          val nearNewIds = indexDir match {
            case Some(dir) =>
              // the manifest is written LAST by every build and append,
              // so its absence means no COMPLETE index exists — whether
              // because this batch's own bootstrap crashed mid-write or
              // because the sink was pointed at a pre-existing corpus
              // without one. Either way the self-heal is the same: build
              // the full index from the corpus (the unavoidable initial
              // build, one corpus scan), then probe it. Silently probing
              // nothing here would admit every near-dup of the corpus.
              if (!graft.sources.DedupIndexes.hasCompleteIndex(spark, dir))
                // rebuild, not write: a crashed custom-(n, k, bands)
                // build leaves its meta behind (meta before manifest),
                // and the self-heal must reproduce that pinned scheme,
                // not silently revert the index to defaults
                graft.sources.DedupIndexes.rebuildNearDupIndex(
                  corpus.select(col("doc_id"), col("text")), dir)
              // production probe: the stored index IS the corpus's
              // near-dup identity — no text re-shingle, no re-banding;
              // config from the index's own meta, so a sink attached to
              // a non-default index probes under the index's scheme
              val (n, k, bands) = graft.sources.DedupIndexes.readNearDupMeta(spark, dir)
              val (sh, idx) = graft.sources.DedupIndexes.readNearDupIndex(spark, dir)
              graft.operators.Dedup.incrementalNearDupFromIndex(sh, idx,
                exactDeduped.select(col("doc_id"), col("text")), n, k, bands)
                .filter(col("is_new") === 1L)
                .select(col("doc_id"))
            case None =>
              graft.operators.Dedup.incrementalNearDup(
                  corpus.select(col("doc_id"), col("text")),
                  exactDeduped.select(col("doc_id"), col("text")))
                .filter(col("is_new") === 1L)
                .select(col("doc_id"))
          }
          exactDeduped
            .join(nearNewIds, "doc_id")
            .join(corpus.select(col("fingerprint")), Seq("fingerprint"), "left_anti")
        } else exactDeduped
      // IN-BATCH near-dup collapse: the corpus probe alone can't see two
      // non-identical near-duplicates that arrive in the SAME micro-batch
      // (neither is in the corpus yet), so both would be appended
      // permanently. Keep each surviving cluster's min-doc_id
      // representative (same canonicalization as
      // [[graft.operators.Dedup.clusterPairs]] consumers).
      val inBatchPairs = graft.operators.Dedup.minHashNearDupsOn(
          survivors.select(col("doc_id"), col("text")))
        .select(col("doc_a"), col("doc_b"))
      val inBatchLosers = graft.operators.Dedup.clusterPairs(inBatchPairs)
        .filter(col("cluster_id") =!= col("doc_id"))
        .select(col("doc_id"))
      survivors.join(inBatchLosers, Seq("doc_id"), "left_anti")
        .select(col("fingerprint"), col("text"), col("doc_id"))
        .write.mode("append").parquet(corpusDir)
      indexDir.foreach(maintainIndex(spark, exactDeduped, corpusDir, _, batchId,
        graft.sources.DedupIndexes.appendNearDup(_, _, _),
        graft.sources.DedupIndexes.rebuildNearDupIndex(_, _)))
      }
      ()
    }.start()
  }

  /** The sinks' misconfiguration guard: an `indexDir` that equals,
    * contains, or sits inside `corpusDir` (relative-vs-absolute
    * spellings included) would hand the index builders' destructive
    * `delete(indexDir)` the corpus itself — the self-heal bootstrap
    * reads the corpus LAZILY, so the delete wins. Checked once at sink
    * construction, before any stream starts.
    */
  private def assertIndexDisjointFromCorpus(spark: SparkSession,
                                            corpusDir: String,
                                            indexDir: String): Unit =
    require(!graft.sources.DedupIndexes.pathsOverlap(spark, corpusDir, indexDir),
      s"indexDir=$indexDir overlaps corpusDir=$corpusDir — the index " +
        "build deletes its target before lazily reading the corpus, so " +
        "an overlapping spelling would destroy corpus data; point the " +
        "index at a disjoint directory")

  /** Shared flat-layout data check for the corpus/flags directories
    * (this op's own appends): a failed first write or an empty batch can
    * leave a directory holding only _SUCCESS/_temporary, and
    * read.parquet on that would wedge every subsequent batch. Hadoop FS
    * API keeps it store-agnostic.
    */
  private def flatDirHasData(spark: SparkSession, dir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(path) && fs.listStatus(path).exists { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** Stored-index maintenance step shared by the ingest sinks. With no
    * COMPLETE index at `indexDir` (manifest absent — every build and
    * append writes it last, and [[graft.sources.DedupIndexes.hasData]]
    * sees through `_temporary`-only wreckage), run `writeFull` over the
    * corpus: that is batch 0 creating the index for the corpus it just
    * created, the self-heal for a build that crashed half-written, and
    * the bootstrap for a sink pointed at a pre-existing corpus. An
    * append on a virgin index would have no meta to derive its config
    * from — the full build is what pins it.
    *
    * Otherwise append under `ingest=<batchId>` exactly the delivery
    * docs that (a) ARE in the corpus — accepted now, or by a crashed
    * earlier attempt of this same batch — and (b) no OTHER ingest has
    * indexed (re-delivered content that a previous batch already
    * indexed drops out; this batchId's own possibly-half-written ingest
    * is excluded from the check and overwritten whole). Both reads are
    * id-columns only; `append` owns the storage layout.
    */
  private def maintainIndex(spark: SparkSession, delivery: DataFrame,
                            corpusDir: String, indexDir: String, batchId: Long,
                            append: (DataFrame, String, String) => Unit,
                            writeFull: (DataFrame, String) => Unit): Unit = {
    if (!graft.sources.DedupIndexes.hasCompleteIndex(spark, indexDir)) {
      writeFull(spark.read.parquet(corpusDir)
        .select(col("doc_id"), col("text")), indexDir)
    } else {
      val label = s"b$batchId"
      // scope-tracked persist: the delta feeds an emptiness probe and
      // (when non-empty) two index writes — derived once either way
      val toIndex = graft.CacheScope.track(delivery
        .join(spark.read.parquet(corpusDir).select(col("doc_id")),
          Seq("doc_id"), "left_semi")
        .join(graft.sources.DedupIndexes.indexedDocIds(spark, indexDir, Some(label)),
          Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("text"))
        .persist())
      // a pure re-delivery batch derives an EMPTY delta — skip the
      // append entirely rather than accumulate one vacant ingest label
      // per steady-state batch until compaction. Replay idempotence is
      // unaffected: a replayed batch re-derives the same delta (own
      // label excluded), so a non-empty original can never replay empty
      if (!toIndex.isEmpty) append(toIndex, indexDir, label)
    }
  }

  /** Streaming VERBATIM-quote ingest via foreachBatch — the streaming
    * front door to [[graft.operators.Dedup.incrementalVerbatimRuns]] and
    * the last piece of the ingest family ([[ingestNewDocs]] = exact,
    * [[ingestNewDocsNearDup]] = near-dup, this = verbatim): each
    * micro-batch is collapsed on the exact content fingerprint,
    * fingerprint-new docs PROBE the corpus positional index for shared
    * verbatim runs of at least `minRunTokens` tokens, and every
    * quote-heavy arrival is FLAGGED to `flagsDir` with its corpus
    * sources — (doc_id, corpus_id, max_run_tokens) — before the batch
    * is appended to `corpusDir`. Flagging, not dropping: a long shared
    * span is a removal decision for a downstream
    * [[graft.operators.Dedup.applyVerbatimCuts]] pass, not grounds to
    * lose the rest of the document at the door.
    *
    * Idempotent under failure replay at every crash point: a
    * re-delivered doc is fingerprint-caught (already in the corpus), so
    * it neither re-appends nor re-probes; a crash BETWEEN the flag write
    * and the corpus append re-derives the same flags on replay, and the
    * (doc_id, corpus_id) anti-join against the flags already on disk
    * drops them — flags and corpus rows each land exactly once.
    *
    * Within-batch quote pairs (two docs arriving together, one quoting
    * the other) are out of scope by design — neither is in the corpus
    * when the batch probes, and the compaction-time
    * [[graft.operators.Dedup.verbatimRunPairs]] pass over the corpus is
    * the operator that owns same-delivery pairs. Scale contract matches
    * [[ingestNewDocsNearDup]]: the corpus NEVER self-joins, and
    * `indexDir = Some(dir)` is the production spelling — the batch
    * probes the STORED positional index + merge-on-read occurrence
    * table ([[graft.sources.DedupIndexes.readVerbatimIndex]]) at the
    * index's own stored shingle width and, after the corpus append,
    * appends its accepted docs to the index under `ingest=<batchId>`
    * with the same replay-stable delta derivation as the near-dup sink
    * (corpus-id semi-join + other-ingest manifest anti-join; own-label
    * overwrite). With NO complete index at `dir` (manifest absent) the
    * sink SELF-BOOTSTRAPS the full build from the corpus before
    * probing — covering the virgin index, the half-written crashed
    * build, and the pre-existing-corpus attach in one contract.
    * `indexDir = None` derives the corpus index inline per batch
    * (small-corpus spelling). Each batch body runs inside a
    * [[graft.CacheScope]] — targeted unpersists of the detector's own
    * handles, never `clearCache()`, so a co-resident caller's persisted
    * frames survive the ingest (round-9 contract, asserted in
    * StreamingSpec).
    */
  def ingestFlagVerbatim(lines: DataFrame, corpusDir: String, flagsDir: String,
                         textCol: String = "value",
                         minRunTokens: Int = 20,
                         maxOccFreq: Int = 1000,
                         indexDir: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    indexDir.foreach(assertIndexDisjointFromCorpus(lines.sparkSession, corpusDir, _))
    lines.writeStream.foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      graft.CacheScope.scoped {
      val spark = batch.sparkSession
      val fp = md5(regexp_replace(trim(lower(col(textCol))), "\\s+", " "))
      // persisted: feeds the fresh derivation and the index-maintenance
      // delta — scope-tracked like the near-dup sink's
      val exactDeduped = graft.CacheScope.track(batch
        .select(fp.as("fingerprint"), col(textCol).as("text"))
        .groupBy(col("fingerprint"))
        .agg(min(col("text")).as("text"))
        .withColumn("doc_id", xxhash64(col("fingerprint")))
        .persist())
      // scope-tracked like exactDeduped: a batch-body exception must not
      // leak the cache entry (a manual unpersist after the writes would
      // be skipped on every failing replay, accumulating leaked copies)
      val fresh =
        if (flatDirHasData(spark, corpusDir))
          graft.CacheScope.track(exactDeduped.join(
            spark.read.parquet(corpusDir).select("fingerprint"),
            Seq("fingerprint"), "left_anti").persist())
        else exactDeduped // already persisted and tracked
      if (flatDirHasData(spark, corpusDir)) {
        val flags = indexDir match {
          case Some(dir) =>
            // manifest absent ⇒ no COMPLETE index (this batch's own
            // bootstrap crashed, or the sink was pointed at a
            // pre-existing corpus without one) — self-heal with the
            // full build from the corpus, then probe it; silently
            // probing nothing would skip every flag against the
            // existing corpus. Probe params (minRunTokens, maxOccFreq)
            // stay caller-owned; the shingle width comes from the
            // index's meta.
            if (!graft.sources.DedupIndexes.hasCompleteIndex(spark, dir))
              // rebuild: honors a crashed custom build's pinned shingle
              // width (see the near-dup sink's bootstrap comment)
              graft.sources.DedupIndexes.rebuildVerbatimIndex(
                spark.read.parquet(corpusDir).select(col("doc_id"), col("text")), dir)
            val n = graft.sources.DedupIndexes.readVerbatimMeta(spark, dir)
            require(minRunTokens >= n,
              s"sink minRunTokens=$minRunTokens is below the stored index's " +
                s"shingle width n=$n at $dir — raise minRunTokens, or rebuild " +
                "the index at a narrower n")
            val (pos, occ) = graft.sources.DedupIndexes.readVerbatimIndex(spark, dir)
            graft.operators.Dedup.incrementalVerbatimRunsFromIndex(pos, occ,
              fresh.select(col("doc_id"), col("text")), n,
              minRunTokens = minRunTokens, maxOccFreq = maxOccFreq)
          case None =>
            graft.operators.Dedup.incrementalVerbatimRuns(
              spark.read.parquet(corpusDir).select(col("doc_id"), col("text")),
              fresh.select(col("doc_id"), col("text")),
              minRunTokens = minRunTokens, maxOccFreq = maxOccFreq)
        }
        // flags BEFORE corpus append + anti-join against flags already
        // written: exactly-once for both artifacts whichever side a
        // crash lands on (see scaladoc)
        val freshFlags =
          if (flatDirHasData(spark, flagsDir))
            flags.join(spark.read.parquet(flagsDir)
                .select(col("doc_id"), col("corpus_id")),
              Seq("doc_id", "corpus_id"), "left_anti")
          else flags
        freshFlags.write.mode("append").parquet(flagsDir)
      }
      fresh.select(col("fingerprint"), col("text"), col("doc_id"))
        .write.mode("append").parquet(corpusDir)
      indexDir.foreach(maintainIndex(spark, exactDeduped, corpusDir, _, batchId,
        graft.sources.DedupIndexes.appendVerbatim(_, _, _),
        graft.sources.DedupIndexes.rebuildVerbatimIndex(_, _)))
      }
      ()
    }.start()
  }

  /** Streaming EMBEDDING ingest via foreachBatch — the vector-side
    * member of the ingest family, completing the symmetry: every
    * materialized index ([[graft.sources.DedupIndexes]] near-dup +
    * verbatim, [[graft.sources.SimilarityIndexes]] IVF) is now both
    * PROBED and MAINTAINED by a streaming sink. Each micro-batch is
    * collapsed to one embedding per vec_id (deterministic min-by-hash,
    * so replays and cross-partition duplicates pick the same row),
    * anti-joined against the corpus id column, appended to the
    * embeddings table, and the IVF index is maintained:
    *
    *   - virgin index (no manifest): the sink BOOTSTRAPS the full build
    *     from the corpus ([[graft.sources.SimilarityIndexes.writeIvfIndex]]
    *     — fit + assign + manifest-last). Gating on the MANIFEST, which
    *     every build writes last, makes the bootstrap crash-healing: a
    *     build that died half-written left no manifest and is simply
    *     re-run from scratch on replay. This is also the documented
    *     story for pointing the sink at a pre-existing corpus — the
    *     first batch pays one corpus scan (the unavoidable initial
    *     build), then maintenance is forward-only;
    *   - established index: the delivery's vectors that ARE in the
    *     corpus and that no OTHER ingest has indexed are assigned with
    *     the STORED centroids and appended under `ingest=<batchId>`
    *     ([[graft.sources.SimilarityIndexes.appendIvf]] — fit once,
    *     assign forever; both reads are id-columns only). Own-label
    *     exclusion + overwrite makes every crash point replay-stable,
    *     exactly the near-dup/verbatim sinks' delta derivation.
    *
    * A re-delivered vec_id is dropped by the corpus anti-join — first
    * write wins. Re-EMBEDDING an existing id (same vec_id, new vector)
    * is deliberately NOT an update: vector identity is the id, and
    * replacing embeddings under a fitted quantizer is a rebuild
    * decision ([[graft.sources.SimilarityIndexes.writeIvfIndex]] at
    * re-fit cadence), not an append — same reasoning as the quantizer
    * memo's data-fingerprint key (Similarity.scala).
    *
    * Centroid drift is the operational caveat: appends assign against
    * the bootstrap-time centroids, so recall on appended vectors
    * degrades as the arriving distribution drifts from the fitted one.
    * That is inherent to IVF serving (the FAISS production posture);
    * the re-fit rebuild at compaction cadence is the cure, and
    * [[graft.sources.SimilarityIndexes.compactIvfTo]] covers the
    * no-drift merge case.
    *
    * `pcaIndexDir` (optional) keeps a PCA serving index
    * ([[graft.sources.SimilarityIndexes.writePcaIndex]]) current under
    * the same deliveries: manifest-gated bootstrap, then
    * fit-once/project-forever appends
    * ([[graft.sources.SimilarityIndexes.appendPcaIndex]]) whose
    * per-ingest moments feed the drift audit
    * ([[graft.sources.SimilarityIndexes.pcaDriftStats]]) — basis drift
    * is PCA's spelling of the centroid-drift caveat above, and
    * `compactPcaTo` its re-fit checkpoint.
    */
  def ingestEmbeddings(vectors: DataFrame, corpusDir: String, indexDir: String,
                       idCol: String = "vec_id", embCol: String = "embedding",
                       nlist: Int = 16, nassign: Int = 1,
                       pcaIndexDir: Option[String] = None,
                       pcaK: Int = 32): org.apache.spark.sql.streaming.StreamingQuery =
    ingestEmbeddingsIndexed(vectors, corpusDir,
      Seq(IndexMaintenance.Ivf(indexDir, nlist, nassign)) ++
        pcaIndexDir.map(IndexMaintenance.Pca(_, pcaK)),
      idCol, embCol)

  /** [[ingestEmbeddings]] generalized to ANY set of stored ANN families
    * (r16): each [[IndexMaintenance]] descriptor names one index dir
    * plus its build params, and the sink runs the SAME maintenance
    * contract for every one of them per micro-batch —
    *
    *   1. no complete index (manifest-gated): refuse if a crashed
    *      build's surviving meta pins different params, else bootstrap
    *      the full build from the corpus once it holds vectors (an
    *      empty first micro-batch must not hand zero rows to a fit:
    *      that throws and the SAME empty batch replays forever);
    *   2. established index: refuse if the sink's params differ from
    *      the stored config (changing a layout is a rebuild, not a
    *      restart — and the append would silently assign under the
    *      stored meta anyway), else append the delivery's
    *      corpus-member vectors that no OTHER ingest has claimed
    *      (own-label exclusion keeps crash replays judging against
    *      exactly what the first attempt saw), skipping the append
    *      entirely on a pure re-delivery (no vacant ingest labels).
    *
    * One corpus, N serving artifacts: at 100 TB the corpus append is
    * the only full-width write, and each family's append is
    * batch-sized work against its own fit-once artifact (centroids /
    * codebooks / basis / planes — none move outside a rebuild). Drift
    * is measured per family (ivf/pq/pcaDriftStats) and re-fit happens
    * at compaction cadence, never in the sink.
    */
  def ingestEmbeddingsIndexed(vectors: DataFrame, corpusDir: String,
                              maintain: Seq[IndexMaintenance],
                              idCol: String = "vec_id",
                              embCol: String = "embedding"): org.apache.spark.sql.streaming.StreamingQuery = {
    require(maintain.nonEmpty, "ingestEmbeddingsIndexed needs at least one index to maintain")
    maintain.foreach(m =>
      assertIndexDisjointFromCorpus(vectors.sparkSession, corpusDir, m.dir))
    for (Seq(a, b) <- maintain.combinations(2))
      require(!graft.sources.DedupIndexes.pathsOverlap(vectors.sparkSession, a.dir, b.dir),
        s"${a.family} dir ${a.dir} must not overlap ${b.family} dir ${b.dir} — " +
          "each family owns its tree (their base builds delete their own path)")
    vectors.writeStream.foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      graft.CacheScope.scoped {
      val spark = batch.sparkSession
      // persisted: feeds the corpus append and every family's delta;
      // scope-tracked so the batch body's exit unpersists it
      val deduped = graft.CacheScope.track(batch
        .select(col(idCol).as("vec_id"), col(embCol).as("embedding"))
        .groupBy(col("vec_id"))
        .agg(min_by(col("embedding"), xxhash64(col("embedding"))).as("embedding"))
        .persist())
      val fresh =
        if (flatDirHasData(spark, corpusDir))
          deduped.join(spark.read.parquet(corpusDir).select(col("vec_id")),
            Seq("vec_id"), "left_anti")
        else deduped
      fresh.write.mode("append").parquet(corpusDir)
      // the corpus-member slice of this delivery, shared by every
      // family's delta derivation (one semi-join, not N)
      lazy val inCorpus = graft.CacheScope.track(deduped
        .join(spark.read.parquet(corpusDir).select(col("vec_id")),
          Seq("vec_id"), "left_semi")
        .persist())
      val label = s"b$batchId"
      maintain.foreach { m =>
        if (!graft.sources.DedupIndexes.hasCompleteIndex(spark, m.dir)) {
          m.checkCrashed(spark)
          if (flatDirHasData(spark, corpusDir) &&
              !spark.read.parquet(corpusDir).isEmpty)
            m.bootstrap(spark.read.parquet(corpusDir))
        } else {
          m.checkStored(spark)
          // scope-tracked persist: emptiness probe + (when non-empty)
          // the append's artifact and manifest writes share one
          // derivation
          val delta = graft.CacheScope.track(inCorpus
            .join(graft.sources.SimilarityIndexes.indexedVecIds(spark, m.dir, Some(label)),
              Seq("vec_id"), "left_anti")
            .persist())
          // pure re-delivery ⇒ empty delta ⇒ no vacant ingest=b<N>
          // label accumulating per steady-state batch
          if (!delta.isEmpty) m.append(delta, label)
        }
      }
      }
      ()
    }.start()
  }

  /** Streaming ORDER-LINE ingest maintaining the stored co-purchase
    * graph ledger ([[graft.sources.GraphIndexes]]) — the GRAPH member
    * of the ingest family, so the PageRank/recs serving twins never go
    * stale under a live order stream.
    *
    * Contract: each delivery carries COMPLETE orders (every line of
    * every order it claims) — co-purchase pairing is within-order, so
    * a split order would under-count its edges; order id is the
    * content identity (a re-delivered order is anti-joined away at
    * both the corpus and the ledger, the vec_id contract of the
    * embeddings sink). Exactly-once story: raw lines land in
    * `corpusDir` first (fresh orders only); the ledger bootstraps FROM
    * the corpus when no complete index exists — which self-heals a
    * build that crashed before its manifest — and otherwise appends
    * this batch's genuinely-new orders under `ingest=b<batchId>`,
    * overwrite-on-own-label so a replay rewrites instead of
    * double-counting. A pure re-delivery produces an empty delta and
    * no vacant ingest label.
    */
  def ingestOrderLinesGraph(lines: DataFrame, corpusDir: String,
                            indexDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    assertIndexDisjointFromCorpus(lines.sparkSession, corpusDir, indexDir)
    lines.writeStream.foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      graft.CacheScope.scoped {
        val spark = batch.sparkSession
        // persisted: feeds the corpus append and the ledger delta;
        // scope-tracked so the batch body's exit unpersists it
        val b = graft.CacheScope.track(batch
          .select(col("l_orderkey"), col("l_partkey")).distinct().persist())
        val fresh =
          if (flatDirHasData(spark, corpusDir))
            b.join(spark.read.parquet(corpusDir)
                .select(col("l_orderkey")).distinct(),
              Seq("l_orderkey"), "left_anti")
          else b
        fresh.write.mode("append").parquet(corpusDir)
        val label = s"b$batchId"
        if (!graft.sources.DedupIndexes.hasCompleteIndex(spark, indexDir)) {
          // the bootstrap waits for data — an empty first delivery must
          // neither wedge the stream on an unreadable corpus dir nor
          // claim an empty manifest (the embeddings-sink contract)
          if (flatDirHasData(spark, corpusDir) &&
              !spark.read.parquet(corpusDir).isEmpty)
            graft.sources.GraphIndexes.writeGraphIndex(
              spark.read.parquet(corpusDir), indexDir)
        } else {
          val delta = graft.CacheScope.track(b
            .join(graft.sources.GraphIndexes.indexedOrderIds(
                spark, indexDir, excludeLabel = Some(label)),
              Seq("l_orderkey"), "left_anti")
            .persist())
          if (!delta.isEmpty)
            graft.sources.GraphIndexes.appendGraph(delta, indexDir, label)
        }
      }
      ()
    }.start()
  }

  /** Streaming DOCUMENT ingest maintaining the stored BM25 postings
    * index ([[graft.sources.SearchIndexes]]) — the ranked-search
    * member of the ingest family, so the q_search_bm25_idx serving
    * path never goes stale under live document arrival.
    *
    * Identity and exactly-once mirror [[ingestOrderLinesGraph]]:
    * doc_id is the content identity (a re-delivered or tampered doc is
    * anti-joined away at the corpus and dropped by the index's own
    * novel-only append discipline), raw docs land in `corpusDir`
    * first, the index bootstraps FROM the corpus when no complete one
    * exists (self-healing a crashed build), and steady-state batches
    * append under `ingest=b<batchId>` with overwrite-on-own-label
    * replay idempotence. A pure re-delivery leaves no vacant label:
    * the sink skips the append when nothing novel remains.
    */
  def ingestDocsSearchIndex(docs: DataFrame, corpusDir: String,
                            indexDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    assertIndexDisjointFromCorpus(docs.sparkSession, corpusDir, indexDir)
    docs.writeStream.foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      graft.CacheScope.scoped {
        val spark = batch.sparkSession
        val b = graft.CacheScope.track(batch
          .select(col("doc_id"), col("text"))
          .groupBy(col("doc_id"))
          .agg(min_by(col("text"), xxhash64(col("text"))).as("text"))
          .persist())
        val fresh =
          if (flatDirHasData(spark, corpusDir))
            b.join(spark.read.parquet(corpusDir).select(col("doc_id")),
              Seq("doc_id"), "left_anti")
          else b
        fresh.write.mode("append").parquet(corpusDir)
        val label = s"b$batchId"
        if (!graft.sources.DedupIndexes.hasCompleteIndex(spark, indexDir)) {
          if (flatDirHasData(spark, corpusDir) &&
              !spark.read.parquet(corpusDir).isEmpty)
            graft.sources.SearchIndexes.writeSearchIndex(
              spark.read.parquet(corpusDir), indexDir)
        } else {
          // the index's own manifest anti-join inside appendSearch
          // drops non-novel docs; skip entirely when the whole batch
          // is a re-delivery so no vacant label accumulates
          val novel = graft.CacheScope.track(b
            .join(spark.read.parquet(s"${graft.sources.DedupIndexes.resolveIndex(spark, indexDir)}/manifest")
                .filter(col("ingest") =!= label).select(col("doc_id")),
              Seq("doc_id"), "left_anti")
            .persist())
          if (!novel.isEmpty)
            graft.sources.SearchIndexes.appendSearch(novel, indexDir, label)
        }
      }
      ()
    }.start()
  }

  /** Streaming LINE ingest into a stored trigram grep index
    * ([[graft.sources.TextIndexes]]) — the text-QUERY member of the
    * ingest family, completing the symmetry: every stored index family
    * (dedup, embedding, grep) is maintained by a streaming sink. Here
    * the INDEX IS THE STORE: grep frequency counts every occurrence, so
    * nothing is deduped or rejected — the lines table holds each
    * distinct line once with merge-on-read freq deltas, which is the
    * corpus deduplicated plus its query structure; probe any time with
    * [[graft.engine.GrepEngine.grepFreqFromIndex]] over
    * [[graft.sources.TextIndexes.readGrepIndex]].
    *
    * Exactly-once story — DIFFERENT from the dedup sinks, which heal
    * replays through content identity: line OCCURRENCES have no
    * identity (a re-delivered batch is indistinguishable from genuine
    * duplicate lines by content), so idempotence comes entirely from
    * the ingest-label machinery. The base build is a deterministic
    * EMPTY index (schema only), and EVERY delivered line lives in its
    * batch's overwrite-on-own-label append — a data-carrying base
    * would double count its own batch when that batch replays after
    * the bootstrap. Crash windows: a bootstrap that dies before any
    * append is rebuilt (empty, cheap) next batch; an append that dies
    * mid-write is overwritten by its replay; a surviving meta from a
    * crashed build pins nbuckets and is honored over the sink's own
    * parameter, like the sibling sinks' self-heal.
    */
  def ingestLinesGrepIndex(lines: DataFrame, indexDir: String,
                           textCol: String = "value",
                           nbuckets: Int = graft.sources.TextIndexes.DefaultBuckets): org.apache.spark.sql.streaming.StreamingQuery =
    lines.writeStream.foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      graft.CacheScope.scoped {
      val spark = batch.sparkSession
      val b = batch.select(col(textCol).as("line"))
      if (!graft.sources.DedupIndexes.hasCompleteIndex(spark, indexDir)) {
        val nb =
          if (graft.sources.DedupIndexes.hasData(spark, s"$indexDir/meta"))
            graft.sources.TextIndexes.readGrepMeta(spark, indexDir)
          else nbuckets
        graft.sources.TextIndexes.writeGrepIndex(b.limit(0), "line", indexDir, nb)
      }
      // an empty recovery replay appends no vacant ingest label (the
      // same steady-state contract as maintainIndex's delta skip)
      if (!b.isEmpty)
        graft.sources.TextIndexes.appendGrep(b, "line", indexDir, s"b$batchId")
      }
      ()
    }.start()

  /** Streaming CORPUS-STATS maintenance — the incremental twin of the
    * batch data card ([[graft.operators.Profile.corpusCardOn]]): each
    * micro-batch of (text, lang, source, n_chars) docs writes its
    * (source, lang) partial stats under its own `ingest=b<batchId>`
    * partition; [[graft.operators.Profile.corpusCardFromStats]] merges
    * the partials on read (sums add, min/max fold — every card measure
    * is a decomposable aggregate, which is the whole design). The card
    * over a growing corpus is thereby O(batch) per trigger and never
    * re-reads earlier text — the trigram-index freq-delta pattern
    * applied to governance stats.
    *
    * Replay idempotence: overwrite-on-own-label (a crashed-and-replayed
    * batch replaces its own partition, so nothing double-counts); an
    * empty recovery replay appends no vacant label, matching the
    * sibling ingests' steady-state contract.
    */
  def ingestCorpusStats(docs: DataFrame, statsDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      corpusStatsBatch(batch.toDF(), statsDir, s"b$batchId")
    }.start()

  /** One stats delivery — [[ingestCorpusStats]]'s batch body, factored
    * so the same-label crash-replay contract is directly spec-drivable.
    */
  private[graft] def corpusStatsBatch(batch: DataFrame, statsDir: String,
                                      label: String): Unit = {
    if (!batch.isEmpty)
      graft.operators.Profile.langStatsOn(batch)
        .write.mode("overwrite").parquet(s"$statsDir/ingest=$label")
    ()
  }

  /** Streaming CLUSTER-STATS maintenance — the incremental twin of the
    * batch cluster profile
    * ([[graft.operators.Clustering.clusterProfileOn]]): each micro-batch
    * of (vec_id, embedding) vectors is assigned to its nearest cell of
    * the FIXED `centroids` (the stored coarse quantizer — pass the
    * centroids the IVF index was built with, so the streaming profile
    * and the ANN index agree on what "a cluster" is) and writes its
    * per-cell integer partials under its own `ingest=b<batchId>`
    * partition; [[graft.operators.Clustering.clusterProfileFromStats]]
    * merges them on read. Every measure is a long sum/min/max over
    * per-row ppm floors, so the merged profile equals the batch profile
    * over the union of deliveries EXACTLY — not approximately — and
    * each trigger costs O(batch) with no corpus re-read.
    *
    * Centroids are deliberately NOT re-fit per batch: a profile only
    * means something against a stable cell decomposition. When the
    * stored index's drift stats say the quantizer is stale
    * (ivfRefitDue), re-fit and REBUILD the stats dir from the corpus —
    * a batch job, like the index re-fit itself.
    *
    * Replay idempotence: overwrite-on-own-label; an empty recovery
    * replay appends no vacant label (the sibling ingests' contract).
    */
  def ingestClusterStats(vectors: DataFrame, statsDir: String,
                         centroids: Seq[Seq[Double]]): org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream.foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      clusterStatsBatch(batch.toDF(), statsDir, s"b$batchId", centroids)
    }.start()

  /** [[ingestClusterStats]] against the STORED IVF index's centroids
    * (pointer-resolved, one driver-side control-plane read at stream
    * start) — the production wiring: the streaming profile counts by
    * exactly the cells the ANN index serves, so the stats answer "how
    * are the index's cells filling up" and drift in them corroborates
    * [[graft.sources.SimilarityIndexes.ivfDriftStats]]'s re-fit signal.
    */
  def ingestClusterStatsFromIndex(vectors: DataFrame, statsDir: String,
                                  indexDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val (centroids, _) = graft.sources.SimilarityIndexes
      .readIvfIndex(vectors.sparkSession, indexDir)
    ingestClusterStats(vectors, statsDir, centroids)
  }

  /** One stats delivery — [[ingestClusterStats]]'s batch body, factored
    * so the same-label crash-replay contract is directly spec-drivable.
    */
  private[graft] def clusterStatsBatch(batch: DataFrame, statsDir: String,
                                       label: String,
                                       centroids: Seq[Seq[Double]]): Unit = {
    if (!batch.isEmpty)
      graft.operators.Clustering.cellStats(
          graft.operators.Clustering.assignWithSim(batch, centroids))
        .write.mode("overwrite").parquet(s"$statsDir/ingest=$label")
    ()
  }

  /** Custom keyed state via mapGroupsWithState (the
    * KeyValueGroupedDataset surface): a running per-user profile —
    * cumulative event count and last-seen time — updated each
    * micro-batch. State is one fixed-size row per user, partitioned by
    * the grouping key exactly like a batch shuffle; use update output
    * mode. Demonstrates route (d) custom state where no built-in
    * aggregation fits (the profile must SURVIVE across triggers and
    * emit its running value each batch).
    *
    * STATE CAVEAT: NoTimeout keeps one profile row per user forever —
    * fine for a bounded user universe, wrong for unbounded ingest. The
    * production shape is [[runningUserProfilesExpiring]], which evicts a
    * user's state once the event-time watermark passes their last
    * activity + a TTL.
    */
  def runningUserProfiles(events: Dataset[UserEvent]): Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserProfile, UserProfile](GroupStateTimeout.NoTimeout) {
        (uid, evs, state) =>
          val prev = state.getOption.getOrElse(UserProfile(uid, 0L, Long.MinValue))
          var n = prev.n_events
          var last = prev.last_us
          evs.foreach { e => n += 1; if (e.us > last) last = e.us }
          val next = UserProfile(uid, n, last)
          state.update(next)
          next
      }
  }

  /** STREAMING FUNNEL — the incremental twin of
    * [[graft.operators.EventAnalytics.funnelOn]]: one fixed-size state
    * row per user (stage reached + the event time that reached it),
    * advanced per micro-batch by scanning the user's events in event-
    * time order and stepping the stage whenever the NEXT stage's event
    * type arrives strictly after the current reach time — the same
    * strictly-after gate as the batch operator, so an out-of-order
    * purchase cannot advance past a later click.
    *
    * EQUALITY CONTRACT: greedy first-qualifying-event advancement
    * equals the batch min-reach-time chain whenever each user's events
    * are delivered in event-time order ACROSS micro-batches (the
    * at-ingest common case; within a batch, arrival order is irrelevant
    * — events are sorted here). Cross-batch REGRESSIONS (a late view
    * older than the recorded one) can only under-advance, never
    * mis-advance; the healing path is the batch recompute, exactly the
    * streaming-ingest house contract.
    *
    * 100 TB shape: state is one fixed-size row per user partitioned by
    * the grouping key; each trigger touches only the batch's users.
    */
  def streamingFunnel(events: Dataset[TypedEvent],
                      stages: Seq[String]): Dataset[FunnelState] = {
    require(stages.nonEmpty, "streamingFunnel needs at least one stage")
    import events.sparkSession.implicits._
    val stageArr = stages.toArray
    events.groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelState](GroupStateTimeout.NoTimeout) {
        (uid, evs, state) =>
          val prev = state.getOption.getOrElse(
            FunnelState(uid, 0L, Long.MinValue))
          var stage = prev.funnel_stage
          var reach = prev.reach_us
          evs.toArray.sortBy(_.us).foreach { e =>
            if (stage < stageArr.length &&
                e.event_type == stageArr(stage.toInt) && e.us > reach) {
              stage += 1
              reach = e.us
            }
          }
          val next = FunnelState(uid, stage, reach)
          state.update(next)
          next
      }
  }

  /** [[runningUserProfiles]] with bounded state: a user's profile is
    * evicted once the event-time watermark passes their last activity +
    * `ttlMs`. Uses flatMapGroupsWithState + EventTimeTimeout — the
    * timeout callback (empty input, hasTimedOut) removes the state and
    * emits nothing, so an expired user who returns starts a FRESH
    * profile. That is the 100 TB contract: state is O(users active
    * within the TTL horizon), and long-horizon profiles belong to the
    * batch side (e.g. [[graft.operators.AsOf.sessionizeSalted]] runs).
    */
  def runningUserProfilesExpiring(events: Dataset[UserEvent],
                                  watermark: String = "10 minutes",
                                  ttlMs: Long = 3600000L): Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    val marked = events
      .withColumn("ts", timestamp_micros(col("us")))
      .withWatermark("ts", watermark)
      .as[UserEventTs]
    marked.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserProfile, UserProfile](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (uid, evs, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(UserProfile(uid, 0L, Long.MinValue))
            var n = prev.n_events
            var last = prev.last_us
            evs.foreach { e => n += 1; if (e.us > last) last = e.us }
            val next = UserProfile(uid, n, last)
            state.update(next)
            // expire at last activity + TTL (micros → millis); Spark
            // clamps nothing — the timestamp must sit past the current
            // watermark, which last-event-time + positive TTL always does
            state.setTimeoutTimestamp(last / 1000L + ttlMs)
            Iterator.single(next)
          }
      }
  }

  /** Streaming CDC ingest via foreachBatch — the streaming front door
    * to [[graft.operators.Snapshot.applyChangelogOn]]: each micro-batch
    * of change rows (key, seq, op, payload…) is compacted WITHIN the
    * batch to one winner row per touched key (the same
    * `max(struct(seq, …))` arg-max — unique (key, seq) is the
    * changelog-position contract) and appended to the state store under
    * its own `ingest=<batchId>` label, TOMBSTONES INCLUDED — a delete
    * must out-rank older upserts at read time, so it is state, not
    * absence. Readers collapse the store with [[changelogState]]
    * (merge-on-read: global latest-wins per key, then drop tombstone
    * winners); [[compactChangelogTo]] rewrites a long-appended store to
    * one row per key, dropping tombstone winners for good — safe
    * because future seqs exceed all compacted seqs by the same
    * changelog-position contract.
    *
    * Replay idempotence: own-label overwrite (the curation-sink
    * contract) — a crashed-and-replayed batch recomputes the same
    * winner rows and overwrites its own partition; and because
    * merge-on-read keys on seq, even a DOUBLE-delivered change row in
    * two labels collapses to one winner. Scale: per-batch work is
    * O(batch); merge-on-read is one key-keyed aggregate over
    * state-sized (not history-sized) data once compaction runs.
    */
  def ingestChangelog(changes: DataFrame, stateDir: String,
                      keyCol: String = "key", seqCol: String = "seq",
                      opCol: String = "op",
                      checkpointDir: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = changes.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        changelogBatch(batch.toDF(), stateDir, batchId.toString,
          keyCol, seqCol, opCol)
    }
    // a durable checkpoint is how batch ids resume monotonically across
    // restarts — labels stay unique and a replayed epoch overwrites its
    // own label (the e2e restart spec drives both properties). It
    // therefore DEFAULTS to `_checkpoint` under the state dir (the
    // leading underscore hides it from every parquet read of the
    // store), because a checkpoint-less restart would restart batch ids
    // at 0 and the own-label overwrite would silently destroy the
    // previous run's ingest=0,1,… partitions — restart safety must be
    // the default, not opt-in (r12 ADVICE).
    writer.option("checkpointLocation",
      checkpointDir.getOrElse(s"$stateDir/_checkpoint")).start()
  }

  /** One CDC delivery — [[ingestChangelog]]'s batch body, factored so
    * the same-label crash-replay contract is directly spec-drivable.
    */
  private[graft] def changelogBatch(batch: DataFrame, stateDir: String,
                                    label: String, keyCol: String,
                                    seqCol: String, opCol: String): Unit = {
    val rest = batch.columns.filterNot(_ == keyCol).toSeq
    val winner = batch
      .groupBy(col(keyCol))
      .agg(max(struct((Seq(seqCol, opCol) ++
        rest.filterNot(c => c == seqCol || c == opCol)).map(col): _*)).as("w"))
      .select(col(keyCol) +: rest.map(c => col(s"w.$c").as(c)): _*)
    winner.write.mode("overwrite").parquet(s"$stateDir/ingest=$label")
    ()
  }

  /** Merge-on-read current state of a changelog store: latest seq per
    * key across every appended label, tombstone winners dropped. The
    * `ingest` partition column is shed — state identity is the key,
    * not which delivery last touched it.
    */
  def changelogState(spark: SparkSession, stateDir: String,
                     keyCol: String = "key", seqCol: String = "seq",
                     opCol: String = "op"): DataFrame = {
    val all = spark.read.parquet(stateDir).drop("ingest")
    val rest = all.columns.filterNot(_ == keyCol).toSeq
    all.groupBy(col(keyCol))
      .agg(max(struct((Seq(seqCol, opCol) ++
        rest.filterNot(c => c == seqCol || c == opCol)).map(col): _*)).as("w"))
      .select(col(keyCol) +: rest.map(c => col(s"w.$c").as(c)): _*)
      .filter(col(opCol) =!= "D")
  }

  /** Rewrite a long-appended changelog store as ONE compacted base
    * label holding one live row per key (tombstones gone). Reads only
    * the store — never any upstream source; refuses dst inside src and
    * vice versa (the DedupIndexes qualified-path idiom).
    */
  def compactChangelogTo(spark: SparkSession, srcDir: String, dstDir: String,
                         keyCol: String = "key", seqCol: String = "seq",
                         opCol: String = "op"): Unit = {
    val qa = new org.apache.hadoop.fs.Path(srcDir).toUri.normalize.getPath
    val qb = new org.apache.hadoop.fs.Path(dstDir).toUri.normalize.getPath
    require(qa != qb && !qa.startsWith(qb + "/") && !qb.startsWith(qa + "/"),
      s"compaction target $dstDir overlaps source $srcDir")
    changelogState(spark, srcDir, keyCol, seqCol, opCol)
      .write.mode("overwrite").parquet(s"$dstDir/ingest=base")
  }
}
