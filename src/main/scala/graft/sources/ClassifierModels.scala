package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Classifier, TextOps}

/** STORED NB classifier models — the classifier counterpart of the
  * stored dedup/ANN/trigram indexes: train once at ingest, ship the
  * artifact, score from storage. The key property making this one
  * special: NB's sufficient statistics are ADDITIVE — per-token class
  * counts and class totals merge by plain summation — so the stored
  * artifact holds COUNTS, not weights, and incremental training is
  * exact by construction: `append` lands a labeled batch's counts
  * under its own ingest label, and weight derivation at read merges
  * all ingests before the vocabulary cap and the bitlen-staircase
  * arithmetic ([[Classifier.nbWeightsOn]]'s spelling on the merged
  * counts). Init-then-append therefore equals a fresh fit of the
  * union EXACTLY — integer counts, deterministic cap — which is why
  * the stored-twin driver query (q_nb_classifier_idx) hash-checks
  * against the SAME DuckDB oracle as the inline query. (Contrast the
  * IVF/PQ fits, where appends reuse the STORED fit and only a rebuild
  * re-trains: a k-means fit is not mergeable; count tables are.)
  *
  * Layout under `path` (pointer-resolved like every stored family):
  *   - `counts/ingest=<label>`  = (tok, cp, cn) — per-token class
  *     occurrence counts of that ingest's labeled streams;
  *   - `totals/ingest=<label>`  = one row (np, nn) — the ingest's
  *     class token totals (the staircase normalizers), written LAST as
  *     the ingest's commit marker.
  * Crash contract: totals-last means a half-written ingest has counts
  * but no totals row — [[readNbWeights]] reads ONLY ingests present in
  * `totals`, so an interrupted append is invisible until replayed, and
  * the own-label overwrite heals any crash point.
  *
  * 100 TB shape: counts are vocabulary-sized (token TYPES, not
  * occurrences — bounded in practice even on web corpora), merge-on-
  * read is one sum aggregate over them, and the derived weight table
  * is vocab-capped control plane exactly as the inline path.
  */
object ClassifierModels {

  val BaseLabel: String = DedupIndexes.BaseLabel

  private def countsOf(pos: DataFrame, neg: DataFrame): (DataFrame, DataFrame) = {
    val tagged = pos.select(lit(1L).as("is_pos"), col("text"))
      .unionByName(neg.select(lit(0L).as("is_pos"), col("text")))
      .select(col("is_pos"), explode(TextOps.tokens(col("text"))).as("tok"))
    (tagged.groupBy(col("tok"))
       .agg(sum(col("is_pos")).as("cp"), sum(lit(1L) - col("is_pos")).as("cn")),
     tagged.agg(coalesce(sum(col("is_pos")), lit(0L)).as("np"),
       coalesce(sum(lit(1L) - col("is_pos")), lit(0L)).as("nn")))
  }

  private def writeIngest(pos: DataFrame, neg: DataFrame,
                          path: String, label: String): Unit = {
    val (counts, totals) = countsOf(pos, neg)
    counts.write.mode("overwrite").parquet(s"$path/counts/ingest=$label")
    totals.write.mode("overwrite").parquet(s"$path/totals/ingest=$label")
  }

  /** Write the model from scratch: any previous artifact removed, the
    * labeled slices' counts under `ingest=base`. */
  def writeNbModel(pos: DataFrame, neg: DataFrame, path: String): Unit = {
    DedupIndexes.assertTargetNotOverInputs(pos, path)
    DedupIndexes.delete(pos.sparkSession, path)
    writeIngest(pos, neg, path, BaseLabel)
  }

  /** APPEND a labeled batch: its counts land under `ingest=<label>`
    * with overwrite-on-own-label replay idempotence + totals-last.
    * No re-fit, no stored-fit reuse — the statistics MERGE, so the
    * model after this append IS the model a fresh fit of the union
    * would produce (spec-asserted exactly).
    */
  def appendNb(pos: DataFrame, neg: DataFrame, path0: String,
               label: String): Unit = {
    require(label.nonEmpty && label != BaseLabel,
      s"append label must not collide with the full-build label '$BaseLabel'")
    val path = DedupIndexes.resolveIndex(pos.sparkSession, path0)
    writeIngest(pos, neg, path, label)
  }

  /** Derive the (tok, w) weight table from the stored counts: merge
    * every COMMITTED ingest (counts joined to the totals table's
    * ingest set — the crash-visibility rule), apply the vocabulary cap
    * over the MERGED counts, then [[Classifier.nbWeightsOn]]'s exact
    * staircase arithmetic. */
  def readNbWeights(spark: SparkSession, path0: String,
                    vocabSize: Int = 4096): DataFrame = {
    require(vocabSize > 0, s"readNbWeights needs a positive vocabSize, got $vocabSize")
    val path = DedupIndexes.resolveIndex(spark, path0)
    val committed = spark.read.parquet(s"$path/totals")
      .select(col("ingest")).distinct()
    val counts = spark.read.parquet(s"$path/counts")
      .join(committed, Seq("ingest"), "left_semi")
      .groupBy(col("tok"))
      .agg(sum(col("cp")).as("cp"), sum(col("cn")).as("cn"))
    val totals = spark.read.parquet(s"$path/totals")
      .agg(coalesce(sum(col("np")), lit(0L)).as("np"),
        coalesce(sum(col("nn")), lit(0L)).as("nn"))
    def bitlen(x: org.apache.spark.sql.Column) = length(bin(x)).cast("long")
    counts
      .orderBy((col("cp") + col("cn")).desc, col("tok"))
      .limit(vocabSize)
      .crossJoin(broadcast(totals))
      .select(col("tok"),
        ((bitlen(col("nn")) - bitlen(col("cn") + 1))
          - (bitlen(col("np")) - bitlen(col("cp") + 1))).as("w"))
  }

  /** Store the DECISION CUTOFF next to the counts — the
    * threshold-from-state spelling that lets a per-batch consumer (the
    * streaming curation gate) apply the batch pipeline's DISTRIBUTIONAL
    * classifier rule without seeing a distribution: the batch stage
    * drops the bottom reference-similarity tertile of its train
    * survivors ([[graft.operators.Pipeline.curateOn]] `clfRef`), which
    * a micro-batch cannot recompute, so the tertile boundary is
    * CALIBRATED ONCE here over a fit corpus (production: the corpus the
    * batch pipeline last curated) and pinned as a scalar. The stored
    * row is (cutoff_bp100, n_fit, vocab_size): `vocab_size` rides along
    * because the cutoff is only meaningful against weights derived at
    * the SAME cap — readers must score with it.
    *
    * cutoff_bp100 = the bits_per_100 value at rank floor(n/3) of the
    * fit distribution (ascending), i.e. the largest score in
    * [[graft.operators.Lm.bucketsFromScores]]'s head tertile. The
    * downstream drop rule `bits_per_100 <= cutoff` equals the batch
    * head bucket exactly when no doc ranked above n/3 ties the boundary
    * value — the residual gap between a rank rule and a value rule,
    * inherent to any pinned-threshold spelling and called out on the
    * gate. n == 0 or n/3 == 0 stores NULL: nothing drops.
    *
    * Scale: scoring is the broadcast-weight join, the boundary pick is
    * one sort-limit over the value histogram (score-cardinality-sized).
    * Calibration cadence is the operator's choice — recompute when the
    * corpus distribution drifts (the pqRefitDue precedent).
    */
  def writeNbCutoff(fitDocs: DataFrame, path0: String,
                    vocabSize: Int = 4096): Unit = {
    val spark = fitDocs.sparkSession
    val path = DedupIndexes.resolveIndex(spark, path0)
    val scored = Classifier.nbScoreOn(
        fitDocs.select(col("doc_id"), col("text")),
        readNbWeights(spark, path, vocabSize))
      .select(col("doc_id"),
        expr("(score * 100 + 10000 * n_tokens) DIV n_tokens").as("bits_per_100"))
    // value histogram → cumulative rank → smallest value whose
    // cumulative count reaches q1 = floor(n/3); bounded frame, so the
    // global window is the lmBuckets histogram idiom — and the bound is
    // HARD, corpus-size-independent (r14 ADVICE): the NB per-token
    // score is a difference of bitlen staircases, each ∈ [0, 63] whole
    // bits, so bits_per_100 = 10000 + score·100 DIV n ∈
    // [10000 − 6300, 10000 + 6300] — ≤ 12601 distinct rows through the
    // single-partition sort at ANY corpus size (ClassifierSpec pins
    // the range on the fixture)
    val h = scored.groupBy(col("bits_per_100")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("bits_per_100"))))
    val q1 = h.agg((sum(col("cnt")) / 3).cast("long").as("q1"))
    h.crossJoin(broadcast(q1))
      .filter(col("q1") > 0L && col("cum") >= col("q1"))
      .orderBy(col("bits_per_100"))
      .limit(1)
      .select(col("bits_per_100").as("cutoff_bp100"), col("q1").as("n_head"),
        lit(vocabSize).as("vocab_size"))
      .write.mode("overwrite").parquet(s"$path/cutoff")
  }

  /** Read the pinned decision boundary: Some((cutoff_bp100, vocabSize))
    * or None when no cutoff was calibrated (or the fit was too small
    * for a head tertile) — consumers drop nothing in that case.
    */
  def readNbCutoff(spark: SparkSession, path0: String): Option[(Long, Int)] = {
    val path = DedupIndexes.resolveIndex(spark, path0)
    if (!DedupIndexes.hasData(spark, s"$path/cutoff")) None
    else spark.read.parquet(s"$path/cutoff")
      .select(col("cutoff_bp100"), col("vocab_size"))
      .collect().headOption
      .map(r => (r.getLong(0), r.getInt(1)))
  }

  // -------------------------------------------------------------------
  // STORED LOGISTIC-REGRESSION weights — the storage lifecycle for the
  // ITERATIVE trained classifier ([[Classifier.fitLogRegOn]]), closing
  // the one trained artifact that had none (r13 verdict #4-missing).
  // Unlike NB, GD weights do NOT merge: the incremental contract is
  // WARM-START CONTINUATION — `appendLogReg` resumes descent from the
  // stored vector for k more full-batch steps over the new labeled
  // frame, so init-then-append over the SAME frame IS one continuous
  // fit (spec-asserted trace equality), and over a new batch it is the
  // honest production semantics: continue training on fresh labels.
  //
  // Layout under `path` (pointer-resolved like every stored family):
  //   - `meta`                    = 1 row (dim, lr, l2) — written FIRST
  //     at init; appends REQUIRE the same dim and reuse the stored
  //     rate/strength (a resumed descent under different hyperparams
  //     is a different experiment, not a continuation);
  //   - `weights/ingest=<label>`  = (i, w), dim+1 rows per generation;
  //   - `gens`                    = (gen, label, iters) — appended
  //     LAST as the generation's commit marker; readers take max(gen),
  //     so a crash after weights but before the gens row leaves an
  //     orphan generation that is invisible until its label replays
  //     (the totals-last rule above, the manifest-last rule everywhere).
  //
  // 100 TB shape: weights are feature-dim-bounded (dim+1 rows) —
  // control plane; each append pays iters × (one corpus pass + one
  // dim-row aggregate), identical to the inline fit; nothing
  // corpus-sized is ever stored or re-read.
  // -------------------------------------------------------------------

  /** Init the stored model: meta first, a `base` generation fit from
    * zeros. */
  def writeLogRegModel(labeled: DataFrame, path: String, dim: Int = 1024,
                       iters: Int = 20, lr: Double = 4.0,
                       l2: Double = 1e-4): Unit = {
    val spark = labeled.sparkSession
    DedupIndexes.assertTargetNotOverInputs(labeled, path)
    DedupIndexes.delete(spark, path)
    import spark.implicits._
    Seq((dim, lr, l2)).toDF("dim", "lr", "l2")
      .write.mode("overwrite").parquet(s"$path/meta")
    commitGen(labeled, path, BaseLabel, iters, init = None)
  }

  /** Warm-start continuation: `iters` more GD steps over `labeled`,
    * starting from the latest committed generation's weights, committed
    * under `label`. Own-label overwrite + gens-last = replay heals any
    * crash point (a replayed append re-reads the SAME predecessor
    * weights — max(gen) never points at its own orphan — and
    * re-commits deterministically modulo float partial-sum order).
    */
  def appendLogReg(labeled: DataFrame, path0: String, label: String,
                   iters: Int = 20): Unit = {
    require(label.nonEmpty && label != BaseLabel,
      s"append label must not collide with the full-build label '$BaseLabel'")
    val spark = labeled.sparkSession
    val path = DedupIndexes.resolveIndex(spark, path0)
    commitGen(labeled, path, label, iters,
      init = Some(readLogRegWeights(spark, path)._1))
  }

  private def commitGen(labeled: DataFrame, path: String, label: String,
                        iters: Int, init: Option[Seq[Double]]): Unit = {
    val spark = labeled.sparkSession
    import spark.implicits._
    val (dim, lr, l2) = readLogRegMeta(spark, path)
    val (w, _) = Classifier.fitLogRegOn(labeled, dim, iters, lr, l2,
      trace = false, init = init)
    w.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "w")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/weights/ingest=$label")
    val nextGen =
      if (!DedupIndexes.hasData(spark, s"$path/gens")) 1L
      else spark.read.parquet(s"$path/gens")
        .agg(max(col("gen"))).head.getLong(0) + 1L
    Seq((nextGen, label, iters.toLong)).toDF("gen", "label", "iters")
      .write.mode("append").parquet(s"$path/gens")
  }

  /** (dim, lr, l2) — the pinned hyperparams every generation trains
    * under. */
  def readLogRegMeta(spark: SparkSession, path0: String): (Int, Double, Double) = {
    val path = DedupIndexes.resolveIndex(spark, path0)
    val r = spark.read.parquet(s"$path/meta").head
    (r.getAs[Int]("dim"), r.getAs[Double]("lr"), r.getAs[Double]("l2"))
  }

  /** The latest COMMITTED generation's weight vector (dim+1, bias
    * last) plus its generation number. */
  def readLogRegWeights(spark: SparkSession, path0: String): (Seq[Double], Long) = {
    val path = DedupIndexes.resolveIndex(spark, path0)
    val latest = spark.read.parquet(s"$path/gens")
      .orderBy(col("gen").desc).limit(1)
      .select(col("gen"), col("label")).head
    val (gen, label) = (latest.getLong(0), latest.getString(1))
    val w = spark.read.parquet(s"$path/weights")
      .filter(col("ingest") === label)
      .orderBy(col("i"))
      .select(col("w")).collect().map(_.getDouble(0)).toSeq
    (w, gen)
  }

  /** Score (doc_id, text) rows under the stored model — the read-side
    * one-liner a production consumer calls. */
  def scoreLogRegStored(docs: DataFrame, path: String): DataFrame = {
    val spark = docs.sparkSession
    val (dim, _, _) = readLogRegMeta(spark, path)
    Classifier.scoreLogRegOn(docs, readLogRegWeights(spark, path)._1, dim)
  }

  /** The q_logreg_planted driver harness: the stored lifecycle
    * end-to-end on the planted-separable corpus — init fit (20 steps)
    * + warm-start append (20 more steps each) as writeOnce fixture work,
    * then every doc scored FROM STORAGE with its truth bit. Rows-only
    * by design (float margins are engine-specific); ClassifierSpec
    * asserts the separation bound and the stored-resume ==
    * continuous-fit contract. Deliberately low-iteration: the bench
    * times the scoring pass, not an 80-job fit (the fit is memoized
    * fixture work, and 40 total steps at unit-norm features already
    * separate the planted drift — spec-asserted).
    */
  def logRegPlantedStoredDocs(spark: SparkSession, sfDir: String,
                              dim: Int = 256): DataFrame = {
    val planted = Classifier.mangled(
      graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text")))
    val labeled = planted.select(col("doc_id"), col("text"),
      (lit(1L) - col("is_mangled")).as("y"))
    val path = DedupIndexes.scratch("target/logreg_model", "planted", sfDir)
    DedupIndexes.writeOnce(path) {
      writeLogRegModel(labeled.filter(col("doc_id") % 2 === 0), path, dim,
        iters = 20)
      appendLogReg(labeled.filter(col("doc_id") % 2 === 1), path, "b2",
        iters = 20)
    }
    scoreLogRegStored(planted.select(col("doc_id"), col("text")), path)
      .join(planted.select(col("doc_id"), col("is_mangled")), Seq("doc_id"))
  }

  /** The q_nb_classifier stored twin (q_nb_classifier_idx): the model
    * trained INCREMENTALLY — init on the doc_id < 250 slice, append
    * the rest — then every doc scored from the derived weights. Counts
    * merge exactly, so the result hash-checks against the inline
    * query's own DuckDB oracle: the strongest stored-twin contract in
    * the repo (the ANN twins settle for rows-only).
    */
  def nbClassifyStoredDocs(spark: SparkSession, sfDir: String,
                           refLang: String = "en",
                           vocabSize: Int = 16): DataFrame = {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"))
    val path = DedupIndexes.scratch("target/nb_model", "nb", sfDir)
    DedupIndexes.writeOnce(path) {
      val lo = docs.filter(col("doc_id") < 250L)
      writeNbModel(lo.filter(col("lang") === refLang).select(col("text")),
        lo.filter(col("lang") =!= refLang).select(col("text")), path)
      val hi = docs.filter(col("doc_id") >= 250L)
      appendNb(hi.filter(col("lang") === refLang).select(col("text")),
        hi.filter(col("lang") =!= refLang).select(col("text")), path, "b2")
    }
    Classifier.nbScoreOn(docs.select(col("doc_id"), col("text")),
      readNbWeights(spark, path, vocabSize))
  }
}
