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
  private def mangled(docs: DataFrame): DataFrame =
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
}
