package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bootstrap CORPUS CLASSIFIER — the "train a cheap model on labeled
  * reference slices, apply it to the whole crawl" stage of a production
  * data pipeline (public literature: GPT-3's quality classifier scoring
  * Common Crawl against a WebText-positive/crawl-negative split, CCNet's
  * fastText language ID, LLaMA's Wikipedia-reference filter). The model
  * here is Naive Bayes token log-odds — the linear classifier those
  * systems reduce to for bag-of-words features — spelled in the
  * integer bitlen staircase ([[Lm]]'s house rule) so every surfaced
  * column is cross-engine exact and oracle-checks bit-for-bit:
  *
  *   w(tok) = [bitlen(Nneg) - bitlen(cneg + 1)]
  *          - [bitlen(Npos) - bitlen(cpos + 1)]
  *
  * is the whole-bit staircase of `log2 (P(tok|pos) / P(tok|neg))` with
  * Laplace +1 smoothing (each bracket is [[Lm.lmScoreOn]]'s surprise
  * under the class unigram LM — a token's weight is literally "bits of
  * surprise under the negative model minus bits under the positive
  * model"). A document's score sums its token-stream weights; the
  * decision avoids integer division entirely (Spark `DIV` truncates
  * toward zero, DuckDB `//` floors — they disagree on negatives):
  * positive iff `score * 100 >= minPer100 * n_tokens`.
  *
  * 100 TB shape (identical to [[Lm.lmScoreOn]]): the weight table is
  * one aggregate over the LABELED slices capped to `vocabSize` rows via
  * TakeOrdered (control-plane-sized), and arrives at the scorer as a
  * BroadcastExchange; scoring is explode → broadcast left-join →
  * doc-keyed partial agg — the only corpus-sized shuffle is the per-doc
  * count-sum, which map-side combines to one row per doc per partition.
  * Labels are needed only for the (small) training slices; the scored
  * corpus needs no labels at all.
  */
object Classifier {

  /** Whole bits of `x >= 1` (`floor(log2 x) + 1`) — exact in both
    * engines ([[Lm]]'s staircase primitive). */
  private def bitlen(x: Column): Column = length(bin(x)).cast("long")

  /** Per-token integer log-odds weights from a positive and a negative
    * reference slice (each a `text` frame): (tok, w), capped to the
    * `vocabSize` most frequent tokens of the COMBINED stream by
    * (count desc, tok asc) — the deterministic cap that makes the
    * vocabulary reproducible across engines. Class totals Npos/Nneg
    * count the full streams (pre-cap), mirroring [[Lm.lmScoreOn]]'s
    * normalizer. One pass: the two slices union under a class tag, one
    * hash aggregate keyed on the token, TakeOrdered to the cap, and the
    * 1-row totals frame crossJoins in broadcast (house precedent).
    * A degenerate empty class makes every weight lean one way (bitlen
    * of 0 is 1) — still deterministic; callers wanting a hard failure
    * should `require` non-emptiness at composition time.
    */
  def nbWeightsOn(pos: DataFrame, neg: DataFrame,
                  vocabSize: Int = 4096): DataFrame = {
    require(vocabSize > 0, s"nbWeightsOn needs a positive vocabSize, got $vocabSize")
    val tagged = pos.select(lit(1L).as("is_pos"), col("text"))
      .unionByName(neg.select(lit(0L).as("is_pos"), col("text")))
      .select(col("is_pos"), explode(TextOps.tokens(col("text"))).as("tok"))
    val totals = tagged.agg(
      coalesce(sum(col("is_pos")), lit(0L)).as("np"),
      coalesce(sum(lit(1L) - col("is_pos")), lit(0L)).as("nn"))
    tagged.groupBy(col("tok"))
      .agg(sum(col("is_pos")).as("cp"), sum(lit(1L) - col("is_pos")).as("cn"))
      .orderBy((col("cp") + col("cn")).desc, col("tok"))
      .limit(vocabSize)
      .crossJoin(broadcast(totals))
      .select(col("tok"),
        ((bitlen(col("nn")) - bitlen(col("cn") + 1))
          - (bitlen(col("np")) - bitlen(col("cp") + 1))).as("w"))
  }

  /** Score every (doc_id, text) row under a (tok, w) weight table:
    * (doc_id, n_tokens, score, label_pos) with `score` the token-stream
    * weight sum (out-of-vocabulary tokens neutral at 0 — the capped
    * vocabulary IS the feature set) and `label_pos` the
    * division-free threshold decision documented on the object.
    */
  def nbScoreOn(docs: DataFrame, weights: DataFrame,
                minPer100: Long = 0L): DataFrame =
    docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .join(broadcast(weights), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("w"), lit(0L))).as("score"))
      .withColumn("label_pos",
        (col("score") * 100 >= lit(minPer100) * col("n_tokens")).cast("long"))

  /** Train-on-labels, score-everything composition over any labeled
    * frame: weights from the rows where `isPos` is true vs false,
    * then every row scored — label columns never leave the training
    * aggregate. */
  def nbClassifyOn(docs: DataFrame, isPos: Column,
                   vocabSize: Int = 4096, minPer100: Long = 0L): DataFrame = {
    val w = nbWeightsOn(docs.filter(isPos).select(col("text")),
      docs.filter(!isPos).select(col("text")), vocabSize)
    nbScoreOn(docs.select(col("doc_id"), col("text")), w, minPer100)
  }

  /** The fastText-language-ID shape on the documents table: train
    * `lang == refLang` vs the rest, score every doc
    * (q_nb_classifier). On this fixture the vocabulary is shared
    * across languages, so scores hover near zero — the honest output
    * of a linear model on non-separable classes, and every surfaced
    * integer still oracle-checks exactly. [[nbPlantedClassify]] is the
    * separable twin.
    */
  def nbLangClassify(spark: SparkSession, sfDir: String,
                     refLang: String = "en",
                     vocabSize: Int = 4096): DataFrame =
    nbClassifyOn(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text"), col("lang")),
      col("lang") === refLang, vocabSize)

  /** Deterministic position-mangled token stream: in docs where
    * `doc_id % 3 == 0`, every third token (0-based positions 0, 3, …)
    * gets a `zj` prefix — a vocabulary drift large enough that the
    * trained weights separate the classes, planted by arithmetic both
    * engines can replicate. */
  private[graft] def mangled(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      (col("doc_id") % 3 === 0).cast("long").as("is_mangled"),
      when(col("doc_id") % 3 === 0,
        array_join(transform(TextOps.tokens(col("text")),
          (t, j) => when(j % 3 === 0, concat(lit("zj"), t)).otherwise(t)), " "))
        .otherwise(col("text")).as("text"))

  /** The planted-separable classifier (q_nb_classifier_planted): the
    * corpus with [[mangled]] drift, trained clean-vs-mangled, every doc
    * scored and carrying its truth bit — the query a curator runs to
    * SEE a classifier separate (score margins, per-doc) before trusting
    * it on unlabeled data. Truth is `is_mangled` (the negative class).
    */
  def nbPlantedClassify(spark: SparkSession, sfDir: String,
                        vocabSize: Int = 4096): DataFrame = {
    val planted = mangled(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")))
    nbClassifyOn(planted.withColumn("is_pos", col("is_mangled") === 0L),
        col("is_pos"), vocabSize)
      .join(planted.select(col("doc_id"), col("is_mangled")), Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("score"),
        col("label_pos"), col("is_mangled"))
  }

  /** The 4-cell confusion matrix of [[nbPlantedClassify]]
    * (q_nb_confusion): (is_mangled, label_pos, n_docs) — the off-
    * diagonal counts are the classifier's planted-class errors, in a
    * frame small enough to eyeball. */
  def nbPlantedConfusion(spark: SparkSession, sfDir: String,
                         vocabSize: Int = 4096): DataFrame =
    nbPlantedClassify(spark, sfDir, vocabSize)
      .groupBy(col("is_mangled"), col("label_pos"))
      .agg(count(lit(1)).as("n_docs"))

  // -------------------------------------------------------------------
  // TRAINED linear classifier — full-batch logistic regression by
  // gradient descent, the fastText-without-embeddings shape (hashed
  // bag-of-words features, a weight per hash slot + bias). Where the
  // NB weights above are a closed-form one-aggregate fit, this is the
  // ITERATIVE spelling production quality classifiers actually use —
  // and the demonstration that model training itself fits the engine's
  // execution model: the feature frame is built once and persisted,
  // every iteration is ONE pass over it (margins scan-fused against
  // the broadcast weight literal) plus ONE feature-dim-bounded
  // aggregate for the gradient (map-side combined; `dim + 1` output
  // rows, control-plane sized, collected to update the weights — the
  // IVF centroid-collect precedent). Nothing corpus-sized ever sits on
  // the driver; iterations × (scan + dim-row shuffle) is the whole
  // cost. Float path + nondeterministic partial-sum order → engine-
  // specific scores → rows-only driver check; ClassifierSpec asserts
  // the training contract (loss strictly falls, planted classes
  // separate) instead.
  // -------------------------------------------------------------------

  /** Hashed bag-of-words presence features, L2-NORMALIZED: (doc_id, y,
    * feats) with `feats` an array of (i, v = 1/√(k+1)) over the doc's k
    * DISTINCT token-hash slots `i = pmod(xxhash64(tok), dim)` plus the
    * bias slot (i = dim) — every feature vector has unit norm. Not
    * tf-weights (gradients ~n_tokens× smaller per slot — separable
    * fixtures took hundreds of epochs, measured) and not raw presence
    * (unbounded ‖x‖ makes fixed-step GD overshoot on its first steps,
    * measured): with ‖x‖₂ = 1 the logistic loss is ¼-smooth, so any
    * rate below 8 descends MONOTONICALLY — the spec asserts the
    * strictly-falling loss trace this guarantees.
    */
  private def hashedFeatures(labeled: DataFrame, dim: Int): DataFrame =
    labeled
      .select(col("doc_id"), col("y"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), col("y"),
        pmod(xxhash64(col("tok")), lit(dim.toLong)).cast("int").as("i"))
      .distinct()
      .groupBy(col("doc_id"), col("y"))
      .agg(collect_list(col("i")).as("slots"))
      .select(col("doc_id"), col("y"),
        transform(concat(col("slots"), array(lit(dim))),
          i => struct(i.cast("int").as("i"),
            (lit(1.0) / sqrt(size(col("slots")) + 1)).as("v"))).as("feats"))

  /** Margin of a feature row against a weight literal: one fold, m
    * lookups — scan-fused, no join. Native since r21 (guide §4): the
    * composed `aggregate(feats, 0.0, acc + element_at(typedlit(w),
    * e.i + 1) * e.v)` was an interpreted HOF paying a literal-array
    * probe per feature per doc, ×iters at fit time
    * (NativeHofParitySpec pins native == composed parity). */
  private def marginCol(w: Seq[Double]): Column =
    graft.functions.LogRegMargin.logRegMargin(col("feats"), w)

  /** Fit logistic regression on a labeled (doc_id, text, y ∈ {0,1})
    * frame: `iters` full-batch GD steps at rate `lr` with L2 strength
    * `l2`. Returns (weights[dim+1] — last slot is the bias, per-iter
    * mean-log-loss trace in nats × 1e6, empty when `trace = false` —
    * the trace is a second aggregate job per iteration, so production
    * fits skip it). The default rate sits at the ¼-smoothness descent
    * guarantee for the unit-norm features (see [[hashedFeatures]]):
    * the loss trace falls MONOTONICALLY, which the spec asserts. */
  def fitLogRegOn(labeled: DataFrame, dim: Int = 1024, iters: Int = 80,
                  lr: Double = 4.0, l2: Double = 1e-4,
                  trace: Boolean = true,
                  init: Option[Seq[Double]] = None): (Seq[Double], Seq[Long]) = {
    require(dim > 0 && iters > 0, s"need positive dim/iters, got $dim/$iters")
    // warm start: `init` resumes GD from a stored weight vector — the
    // storage-lifecycle append ([[graft.sources.ClassifierModels
    // .appendLogReg]]) IS k more steps of the same descent, so
    // init-then-append equals one continuous fit by construction
    require(init.forall(_.size == dim + 1),
      s"init weight vector must have dim+1 = ${dim + 1} slots, got ${init.map(_.size)}")
    val feats = graft.CacheScope.track(
      hashedFeatures(labeled, dim).persist())
    val n = feats.count().toDouble
    var w: Array[Double] = init.map(_.toArray).getOrElse(Array.fill(dim + 1)(0.0))
    val losses = Seq.newBuilder[Long]
    for (_ <- 0 until iters) {
      // one pass: per-doc p = sigmoid(margin) against the CURRENT
      // weight literal; gradient rows = explode(feats) keyed by slot —
      // dim+1 rows out, map-side combined
      val scored = feats.select(col("doc_id"), col("y"), col("feats"),
        (lit(1.0) / (lit(1.0) + exp(-marginCol(w.toSeq)))).as("p"))
      if (trace) {
        val lossRow = scored.agg(
          avg(-(col("y") * log(greatest(col("p"), lit(1e-12))) +
            (lit(1.0) - col("y")) * log(greatest(lit(1.0) - col("p"), lit(1e-12)))))
            .as("loss")).head()
        losses += (lossRow.getDouble(0) * 1e6).toLong
      }
      val grad = scored
        .select(col("y"), col("p"), explode(col("feats")).as("e"))
        .groupBy(col("e.i"))
        .agg(sum((col("p") - col("y")) * col("e.v")).as("g"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      // the intercept (slot dim) is excluded from L2 shrinkage —
      // standard logistic regression regularizes feature weights only;
      // shrinking the bias biases the decision threshold on imbalanced
      // classes (r13 ADVICE)
      w = Array.tabulate(dim + 1)(j =>
        w(j) - lr * (grad.getOrElse(j, 0.0) / n +
          (if (j == dim) 0.0 else l2 * w(j))))
    }
    feats.unpersist()
    (w.toSeq, losses.result())
  }

  /** Score (doc_id, text) rows under a fitted weight vector: scan-fused
    * margin fold against the weight literal, probability surfaced as
    * integer ppm, decision at 1/2 (margin >= 0). */
  def scoreLogRegOn(docs: DataFrame, w: Seq[Double], dim: Int = 1024): DataFrame =
    hashedFeatures(docs.withColumn("y", lit(0L)), dim)
      .select(col("doc_id"), marginCol(w).as("m"))
      .select(col("doc_id"),
        floor(lit(1e6) / (lit(1.0) + exp(-col("m")))).cast("long").as("p_ppm"),
        (col("m") >= 0.0).cast("long").as("label_pos"))

  /** The trained twin of [[nbPlantedClassify]]: fit on the [[mangled]]
    * drift labels, score every doc with its truth bit. A LIBRARY
    * operator, not a driver query — an 80-iteration fit is ~80 Spark
    * jobs, which would dominate the bench suite for no oracle value
    * (the float path is rows-only anyway); ClassifierSpec asserts the
    * planted classes separate perfectly and the loss trace strictly
    * falls, which is the training contract worth pinning. */
  def logRegPlantedClassify(spark: SparkSession, sfDir: String,
                            dim: Int = 256, iters: Int = 80): DataFrame = {
    val planted = mangled(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")))
    val (w, _) = fitLogRegOn(
      planted.select(col("doc_id"), col("text"),
        (lit(1L) - col("is_mangled")).as("y")), dim, iters, trace = false)
    scoreLogRegOn(planted.select(col("doc_id"), col("text")), w, dim)
      .join(planted.select(col("doc_id"), col("is_mangled")), Seq("doc_id"))
  }
}
