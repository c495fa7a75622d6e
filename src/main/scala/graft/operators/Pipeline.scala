package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-data CURATION PIPELINE — the flagship composition
  * query: every stage is an operator this engine already ships and
  * oracle-verifies individually (lang-ID, Gopher-style quality rules,
  * canonical exact dedup, train/eval split, benchmark decontamination),
  * chained in the order a production corpus build runs them (the CCNet /
  * Gopher / Pile curation recipe from the public literature). The output
  * is a per-document AUDIT LEDGER: one row per input doc with the stage
  * that dropped it, or its final split — the artifact a data engineer
  * actually inspects when a corpus shrinks unexpectedly.
  *
  * Stage order and attribution (first failing stage wins):
  *   1. lang      — [[TextAnalysis.langGuess]] != target → `dropped_lang`
  *   2. quality   — [[TextAnalysis.qualityKeepRule]] fails → `dropped_quality`
  *   3. dedup     — canonical-fingerprint duplicate of a lower-doc_id
  *                  survivor → `dropped_duplicate` (same md5-of-
  *                  canonicalized-text spelling as
  *                  [[TextAnalysis.trainEvalAssign]], so dedup and split
  *                  agree on what "the same text" means — an exact dup
  *                  can never land in both splits)
  *   4. split     — fingerprint < threshold → `train` else `eval`
  *   5. decontam  — train doc sharing ≥1 word 3-gram with any eval doc →
  *                  `dropped_contaminated` (eval docs are never dropped:
  *                  the benchmark stays, the leaking training doc goes —
  *                  same rule as [[TextAnalysis.contamination]])
  *
  * 100 TB design: stages 1–2 and 4 are pure per-row projections fused
  * into the scan (no shuffle). Stage 3 is ONE exchange keyed on the
  * 32-char fingerprint — the doc text rides it once; at production scale
  * key it on xxhash64(fp) to shrink shuffle keys to 8 bytes (the
  * [[Dedup.exact]] hash-key flag precedent). Stage 5 collapses the eval
  * side to a DISTINCT n-gram set before the join, so matches are bounded
  * by the train inverted index, never train×eval quadratic
  * ([[TextAnalysis.contamination]]'s proven shape); with a fixed
  * benchmark suite the eval set is broadcast and the join is
  * shuffle-free. Nothing in the pipeline is corpus-quadratic and no
  * stage re-reads the corpus — the ledger is produced in one pass plus
  * key-bounded exchanges. Plan audit (formatted explain, sf0.001):
  * scans prune to struct&lt;doc_id,text&gt;, ONE Window exchange on fp
  * reused by all three consumers, the eval n-gram set and the
  * contaminated-id set both arrive as BroadcastExchange — no sort-merge
  * join, no cartesian, nothing shuffles the corpus text twice.
  *
  * `plantDups`: re-appends every doc_id % 7 == 0 document under doc_id +
  * 1_000_000 (exact text copy). Identical text ⇒ identical lang/quality
  * verdicts ⇒ the copy reaches the dedup stage whenever the original
  * does and ALWAYS loses the min-doc_id keeper race — guaranteeing the
  * `dropped_duplicate` class is exercised non-vacuously even on a
  * fixture with no natural exact dups (the q_line_dedup /
  * q_pii_redact_planted precedent; the DuckDB oracle mirrors the plant).
  */
object Pipeline {

  /** Canonical content fingerprint — ONE spelling shared with
    * [[TextAnalysis.trainEvalAssign]] / [[TextAnalysis.contamination]] /
    * the streaming dedup fingerprints.
    */
  private def canonicalFp(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** The pipeline's GATE projection over a (doc_id, text) frame:
    * (doc_id, text, fp, lang_ok, quality_ok) — stages 1–2 plus the
    * canonical fingerprint, fused into one scan-side select. Public so
    * the streaming curation ingest applies the IDENTICAL gate per
    * micro-batch (same spellings ⇒ batch and streaming curation cannot
    * disagree on which docs pass). Pure per-row projection: no shuffle.
    */
  def stageBits(docs: DataFrame, lang: String = "en"): DataFrame =
    docs
      .select(TextAnalysis.rawQualityCounts ++ TextAnalysis.qualityGramCounts ++ Seq(
        col("text"),
        (TextAnalysis.langGuess(col("text")) === lit(lang)).cast("long").as("lang_ok"),
        canonicalFp(col("text")).as("fp")): _*)
      .select(Seq(col("doc_id"), col("text"), col("fp"), col("lang_ok"),
        col("n_tokens")) ++ TextAnalysis.qualityPcts :+ TextAnalysis.qualityRepPct: _*)
      .withColumn("quality_ok", TextAnalysis.qualityKeepRule.cast("long"))
      .select(col("doc_id"), col("text"), col("fp"), col("n_tokens"),
        col("lang_ok"), col("quality_ok"))

  def curate(spark: SparkSession, sfDir: String,
             lang: String = "en",
             splitThreshold: String = "cc",
             contamN: Int = 3,
             plantDups: Boolean = true): DataFrame =
    curateOn(Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      lang, splitThreshold, contamN, plantDups)

  /** [[curate]] over any (doc_id, text) frame — the library entry point
    * (and the ScaleSmoke sweep surface). */
  def curateOn(base: DataFrame,
               lang: String = "en",
               splitThreshold: String = "cc",
               contamN: Int = 3,
               plantDups: Boolean = false): DataFrame = {
    val docs =
      if (!plantDups) base
      else base.unionByName(
        base.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text")))

    // stages 1–2 + fingerprint: one fused projection over the scan
    val staged = stageBits(docs, lang)
      .withColumn("survives_lq", col("lang_ok") === 1L && col("quality_ok") === 1L)

    // stage 3: keeper = min doc_id among lang+quality survivors per
    // fingerprint — one exchange on fp; text rides it once. The frame is
    // consumed TWICE (the survivor branch and the final ledger join), so
    // it persists — caller-owned cleanup (Bench/Verify clearCache between
    // queries), CacheScope-tracked for composing pipelines. At 100 TB
    // swap the in-memory persist for a checkpoint to parquet (the frame
    // carries the corpus text); the plan shape is unchanged.
    val withKeeper = graft.CacheScope.track(
      staged.withColumn("keeper_id",
        min(when(col("survives_lq"), col("doc_id")))
          .over(Window.partitionBy(col("fp"))))
        .persist())

    // stages 4–5 over the deduped survivor set
    val survivors = withKeeper
      .filter(col("survives_lq") && col("doc_id") === col("keeper_id"))
      .withColumn("split",
        when(col("fp") < lit(splitThreshold), lit("train")).otherwise(lit("eval")))
    val grams = survivors.select(col("doc_id"), col("split"),
      explode(TextOps.shingles(col("text"), contamN)).as("ng"))
    val evalSet = grams.filter(col("split") === "eval").select(col("ng")).distinct()
    val contaminated = grams.filter(col("split") === "train")
      .join(evalSet, "ng")
      .select(col("doc_id")).distinct()
      .withColumn("is_contaminated", lit(1L))

    withKeeper
      .join(contaminated, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        when(col("lang_ok") === 0L, lit("dropped_lang"))
          .when(col("quality_ok") === 0L, lit("dropped_quality"))
          .when(col("doc_id") =!= col("keeper_id"), lit("dropped_duplicate"))
          .when(col("is_contaminated") === 1L, lit("dropped_contaminated"))
          .when(col("fp") < lit(splitThreshold), lit("train"))
          .otherwise(lit("eval")).as("outcome"))
  }

  /** [[curate]] ledger rolled up per outcome with DOC and TOKEN totals —
    * the one-line health summary of a corpus build. Token-weighting is
    * the number corpus engineers actually watch: a stage that drops 5%
    * of docs but 40% of tokens (long docs dying to a length rule) reads
    * completely differently from the doc count alone. */
  def curateStats(spark: SparkSession, sfDir: String): DataFrame =
    curate(spark, sfDir)
      .groupBy(col("outcome"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
}
