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
