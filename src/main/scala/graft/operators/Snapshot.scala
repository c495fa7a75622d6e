package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CORPUS SNAPSHOT DIFF — the audit artifact of an iterating corpus
  * build: given two generations of a document set (yesterday's ingest
  * and today's), report per (source, status) what changed at the
  * CONTENT level — `added` (fingerprints only in the new snapshot),
  * `removed` (only in the old), `retained` (both) — with fingerprint,
  * document, and token totals. Content-level means the diff is keyed by
  * the canonical md5 fingerprint (the [[graft.operators.Pipeline]] /
  * [[Mixture]] dedup-key spelling), so a re-crawled duplicate or a
  * re-assigned doc_id does not masquerade as churn; a fingerprint's
  * source attribution is `min(source)` over its carriers on the
  * deciding side (deterministic, engine-portable — no min_by float or
  * ordering license).
  *
  * 100 TB shape: one scan-fused (fp, source, n_tokens) aggregate per
  * side — the text never survives the scan — then a fingerprint-keyed
  * full outer join of two fp-sized frames and a final small
  * (source, status) rollup. No corpus-sized shuffle carries payload;
  * both join inputs are already one row per distinct fingerprint.
  */
object Snapshot {

  private def fpOf(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** One row per distinct fingerprint: (fp, src, n_docs, n_tokens). */
  private def summarize(docs: DataFrame): DataFrame =
    docs
      .select(fpOf(col("text")).as("fp"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_toks"))
      .groupBy(col("fp"))
      .agg(min(col("source")).as("src"),
        count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))

  /** Driver spelling: two deterministic overlapping snapshots carved
    * from the documents fixture (old drops doc_id ≡ 3, new drops
    * doc_id ≡ 7 mod 20), so all three statuses are non-vacuous.
    */
  def snapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("source"))
    snapshotDiffOn(docs.filter(col("doc_id") % 20 =!= 3),
      docs.filter(col("doc_id") % 20 =!= 7))
  }

  /** [[snapshotDiff]] over any pair of (doc_id, text, source) frames.
    * Emits (source, status, n_fps, n_docs, n_tokens); doc and token
    * totals come from the side that defines the status (`removed` →
    * old side, otherwise new side — the counts a build dashboard
    * charts as lost / gained / carried volume).
    */
  def snapshotDiffOn(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val o = summarize(oldDocs)
      .select(col("fp"), col("src").as("o_src"),
        col("n_docs").as("o_docs"), col("n_tokens").as("o_toks"))
    val n = summarize(newDocs)
      .select(col("fp"), col("src").as("n_src"),
        col("n_docs").as("n_docs2"), col("n_tokens").as("n_toks"))
    o.join(n, Seq("fp"), "full_outer")
      .select(
        coalesce(col("n_src"), col("o_src")).as("source"),
        when(col("o_src").isNull, lit("added"))
          .when(col("n_src").isNull, lit("removed"))
          .otherwise(lit("retained")).as("status"),
        when(col("o_src").isNull || col("n_src").isNotNull, col("n_docs2"))
          .otherwise(col("o_docs")).as("nd"),
        when(col("o_src").isNull || col("n_src").isNotNull, col("n_toks"))
          .otherwise(col("o_toks")).as("nt"))
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("n_fps"),
        sum(col("nd")).as("n_docs"), sum(col("nt")).as("n_tokens"))
  }
}
