package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Lm, TextOps}

/** STORED unigram reference LMs — the CCNet scorer's model artifact
  * ([[Lm.lmScoreOn]]), completing the trained-artifact inventory: the
  * NB classifier stores mergeable counts, logreg stores warm-startable
  * weights, and the LM is the NB case again — its sufficient statistics
  * (per-token reference counts + the total token count) are ADDITIVE,
  * so the artifact stores FULL pre-cap counts per ingest and derives
  * the capped vocabulary at read over the MERGED counts. Init-then-
  * append therefore equals a fresh [[Lm.vocabOn]] of the union EXACTLY
  * (integer counts, deterministic (cnt desc, tok asc) cap), which is
  * why the stored-twin driver query (q_lm_score_idx) hash-checks
  * against the SAME DuckDB oracle as the inline q_lm_score.
  *
  * Layout under `path` (pointer-resolved like every stored family):
  *   - `counts/ingest=<label>` = (tok, cnt) — the ingest's reference
  *     token counts, FULL (pre-cap: the cap must apply over the merge,
  *     or an early frequent-then-rare token could be capped out of one
  *     ingest and silently undercounted);
  *   - `totals/ingest=<label>` = 1 row (ntot) — the ingest's total
  *     reference token count (the staircase denominator CCNet
  *     normalizes by — includes beyond-cap tokens), written LAST as
  *     the ingest's commit marker.
  * Crash contract: totals-last — [[readLmVocab]]/[[readLmNtot]] read
  * ONLY ingests present in `totals`, so a half-written append is
  * invisible until its label replays (the ClassifierModels rule).
  *
  * 100 TB shape: counts are vocabulary-sized (token TYPES); the read
  * is one sum aggregate over them plus a TakeOrdered cap; the scorer
  * sees the same broadcast-sized vocab frame as the inline path. A
  * reference LM in production grows with each trusted-corpus delivery
  * — this is the artifact that growth appends to without ever
  * re-reading earlier reference text.
  */
object LmModels {

  val BaseLabel: String = DedupIndexes.BaseLabel

  private def writeIngest(refTexts: DataFrame, path: String,
                          label: String): Unit = {
    refTexts
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(s"$path/counts/ingest=$label")
    refTexts
      .select(coalesce(sum(size(TextOps.tokens(col("text"))).cast("long")),
        lit(0L)).as("ntot"))
      .write.mode("overwrite").parquet(s"$path/totals/ingest=$label")
  }

  /** Write the model from scratch: any previous artifact removed, the
    * reference slice's counts under `ingest=base`. */
  def writeLmModel(refTexts: DataFrame, path: String): Unit = {
    DedupIndexes.assertTargetNotOverInputs(refTexts, path)
    DedupIndexes.delete(refTexts.sparkSession, path)
    writeIngest(refTexts, path, BaseLabel)
  }

  /** APPEND a reference batch: counts under `ingest=<label>`,
    * overwrite-on-own-label replay idempotence, totals-last. The
    * statistics MERGE — the model after this append IS the model a
    * fresh fit of the union would produce (spec-asserted exactly). */
  def appendLm(refTexts: DataFrame, path0: String, label: String): Unit = {
    require(label.nonEmpty && label != BaseLabel,
      s"append label must not collide with the full-build label '$BaseLabel'")
    writeIngest(refTexts,
      DedupIndexes.resolveIndex(refTexts.sparkSession, path0), label)
  }

  private def committedCounts(spark: SparkSession, path: String): DataFrame = {
    val committed = spark.read.parquet(s"$path/totals")
      .select(col("ingest")).distinct()
    spark.read.parquet(s"$path/counts")
      .join(committed, Seq("ingest"), "left_semi")
      .groupBy(col("tok")).agg(sum(col("cnt")).as("cnt"))
  }

  /** The capped (tok, cnt) vocabulary over every COMMITTED ingest's
    * merged counts — [[Lm.vocabOn]]'s exact cap arithmetic. */
  def readLmVocab(spark: SparkSession, path0: String,
                  vocabSize: Int = 4096): DataFrame = {
    require(vocabSize > 0, s"readLmVocab needs a positive vocabSize, got $vocabSize")
    committedCounts(spark, DedupIndexes.resolveIndex(spark, path0))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(vocabSize)
  }

  /** The merged total reference token count (the staircase
    * denominator), committed ingests only. */
  def readLmNtot(spark: SparkSession, path0: String): DataFrame = {
    val path = DedupIndexes.resolveIndex(spark, path0)
    spark.read.parquet(s"$path/totals")
      .agg(coalesce(sum(col("ntot")), lit(0L)).as("ntot"))
  }

  /** [[Lm.lmScoreOn]] FROM the stored model: identical scoring plan —
    * broadcast capped vocab, 1-row ntot crossJoin, one doc-keyed
    * map-side-combined aggregate — with the model read from storage
    * instead of re-derived from reference text. */
  def lmScoreStoredOn(docs: DataFrame, path: String,
                      vocabSize: Int = 4096): DataFrame =
    Lm.lmScoreFromModel(docs,
      readLmVocab(docs.sparkSession, path, vocabSize),
      readLmNtot(docs.sparkSession, path))

  /** Store the TERTILE BOUNDARIES next to the counts — the
    * threshold-from-state spelling for the CCNet bucket rule (the
    * [[ClassifierModels.writeNbCutoff]] precedent, here with BOTH
    * boundaries because the ppl stage ANNOTATES head/middle/tail
    * rather than dropping): q1/q2 are the bits_per_100 values at
    * ranks floor(n/3) and floor(2n/3) of the fit distribution. A
    * per-batch consumer assigns head (bp <= q1), middle (bp <= q2),
    * tail (above) — equal to [[graft.operators.Lm.bucketsFromScores]]
    * whenever no off-tertile doc ties a boundary value (the inherent
    * rank-vs-value residual, pinned in StreamingSpec). Degenerate fits
    * (n < 3) store NULLs: consumers annotate nothing.
    */
  def writeLmCutoffs(fitDocs: DataFrame, path0: String,
                     vocabSize: Int = 4096): Unit = {
    val spark = fitDocs.sparkSession
    val path = DedupIndexes.resolveIndex(spark, path0)
    val scored = lmScoreStoredOn(
      fitDocs.select(col("doc_id"), col("text")), path, vocabSize)
      .select(col("doc_id"), col("bits_per_100"))
    // global window over the VALUE histogram, not the corpus — and the
    // histogram is HARD-BOUNDED independent of corpus size (r14
    // ADVICE): per-token surprise is the whole-bit staircase
    // bitlen(N) − bitlen(c+1) ∈ [0, bitlen(N)] and bitlen of a Long is
    // ≤ 63, so bits_per_100 = bits·100 DIV n_tokens ∈ [0, 6300] —
    // at most 6301 distinct rows through the single-partition sort at
    // ANY corpus size (LmSpec pins the range on the fixture)
    val h = scored.groupBy(col("bits_per_100")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("bits_per_100"))))
    val qs = h.agg((sum(col("cnt")) / 3).cast("long").as("q1"),
      (sum(col("cnt")) * 2 / 3).cast("long").as("q2"))
    val hq = h.crossJoin(broadcast(qs))
    def boundary(rank: org.apache.spark.sql.Column) = hq
      .filter(col("q1") > 0L && col("cum") >= rank)
      .orderBy(col("bits_per_100")).limit(1)
      .select(col("bits_per_100"))
    boundary(col("q1")).select(col("bits_per_100").as("q1_bp100"))
      .crossJoin(boundary(col("q2")).select(col("bits_per_100").as("q2_bp100")))
      .select(col("q1_bp100"), col("q2_bp100"), lit(vocabSize).as("vocab_size"))
      .write.mode("overwrite").parquet(s"$path/cutoffs")
  }

  /** Some((q1_bp100, q2_bp100, vocabSize)) or None when no boundaries
    * were calibrated — consumers annotate nothing then. */
  def readLmCutoffs(spark: SparkSession,
                    path0: String): Option[(Long, Long, Int)] = {
    val path = DedupIndexes.resolveIndex(spark, path0)
    if (!DedupIndexes.hasData(spark, s"$path/cutoffs")) None
    else spark.read.parquet(s"$path/cutoffs")
      .collect().headOption
      .map(r => (r.getAs[Long]("q1_bp100"), r.getAs[Long]("q2_bp100"),
        r.getAs[Int]("vocab_size")))
  }

  /** The q_lm_score stored twin (q_lm_score_idx): the reference LM
    * trained INCREMENTALLY — init on the en docs with doc_id < 250,
    * append the rest — then every doc scored from the stored model.
    * Counts merge exactly, so the result hash-checks against the
    * inline query's own DuckDB oracle (the q_nb_classifier_idx
    * precedent — the exact stored-twin contract).
    */
  def lmScoreStoredDocs(spark: SparkSession, sfDir: String,
                        refLang: String = "en",
                        vocabSize: Int = 16): DataFrame = {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"))
    val ref = docs.filter(col("lang") === refLang)
    val path = DedupIndexes.scratch("target/lm_model", "unigram", sfDir)
    DedupIndexes.writeOnce(path) {
      writeLmModel(ref.filter(col("doc_id") < 250L).select(col("text")), path)
      appendLm(ref.filter(col("doc_id") >= 250L).select(col("text")), path, "b2")
    }
    lmScoreStoredOn(docs.select(col("doc_id"), col("text")), path, vocabSize)
  }
}
