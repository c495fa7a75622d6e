package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Materialized dedup indexes: the write-once-at-ingest, probe-per-
  * delivery storage layout behind [[graft.operators.Dedup
  * .incrementalNearDupFromIndex]] and
  * [[Dedup.incrementalVerbatimRunsFromIndex]].
  *
  * At 100 TB the incremental operators' scale story is that the corpus
  * NEVER re-derives its index per delivery: the banded MinHash index,
  * the sorted shingle frame, the positional k-gram index, and its
  * occurrence table are built once when docs are ingested and probed
  * from storage by every subsequent batch. This object is that claim as
  * code — plain parquet (columnar, predicate-pushdown-able), with the
  * band index PARTITIONED BY band so a band-restricted probe or a
  * per-band compaction touches 1/bands of the files (the layout
  * assertion lives in DedupIndexSpec).
  */
object DedupIndexes {

  /** Write the [[Dedup.incrementalNearDup]] corpus artifacts:
    * `path/shingles` = (doc_id, sh, sz), `path/bands` = (doc_id, band,
    * key) partitioned by band.
    */
  def writeNearDupIndex(corpus: DataFrame, path: String,
                        n: Int = Dedup.ShingleN, k: Int = Dedup.MinHashK,
                        bands: Int = Dedup.MinHashBands): Unit = {
    val (sh, _) = Dedup.nearDupIndexFrames(corpus, n, k, bands)
    sh.write.mode("overwrite").parquet(s"$path/shingles")
    // the band index derives from the shingle frame JUST WRITTEN rather
    // than re-shingling text — the same single-derivation economy the
    // inline path gets from persist()
    val stored = corpus.sparkSession.read.parquet(s"$path/shingles")
    Dedup.bandIndexOf(stored, k, bands)
      .write.mode("overwrite").partitionBy("band").parquet(s"$path/bands")
  }

  /** Read back what [[writeNearDupIndex]] wrote. `band` returns as its
    * partition-column string spelling (type inference is off in
    * Sessions); cast restores the probe's integer key.
    */
  def readNearDupIndex(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/shingles"),
      spark.read.parquet(s"$path/bands")
        .withColumn("band", col("band").cast("int")))

  /** Write the [[Dedup.incrementalVerbatimRuns]] corpus artifacts:
    * `path/positions` = (doc_id, pos, ng), `path/occ` = (ng, occ). The
    * occurrence table derives from the just-written positions file, not
    * a second text scan.
    */
  def writeVerbatimIndex(corpus: DataFrame, path: String,
                         n: Int = Dedup.ShingleN): Unit = {
    val (pos, _) = Dedup.verbatimIndexFrames(corpus, n)
    pos.write.mode("overwrite").parquet(s"$path/positions")
    val spark = corpus.sparkSession
    spark.read.parquet(s"$path/positions")
      .groupBy(col("ng")).agg(count(lit(1)).as("occ"))
      .write.mode("overwrite").parquet(s"$path/occ")
  }

  /** Read back what [[writeVerbatimIndex]] wrote. */
  def readVerbatimIndex(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/positions"),
      spark.read.parquet(s"$path/occ"))

  // -- driver-query harnesses: same deterministic corpus/batch split as
  // Dedup.incrementalNewDocs, probing the STORED index so the green
  // CORRECTNESS row certifies the parquet round-trip end to end (the
  // oracles are shared with the inline q_dedup_incr_near /
  // q_verbatim_incr queries — identical results is the contract) --

  private def scratch(kind: String, sfDir: String): String = {
    val tag = sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
    s"target/dedup_index/$kind/$tag"
  }

  /** Index build is fixture work (write once at "ingest"), not probe
    * work — memoized per JVM like [[Roundtrip]]'s format bounces so the
    * bench charges queries only for the probe.
    */
  private val written = scala.collection.concurrent.TrieMap.empty[String, Unit]

  private def writeOnce(path: String)(write: => Unit): Unit =
    written.getOrElseUpdate(path, write)

  /** [[Dedup.incrementalNearDupDocs]] probing the materialized index. */
  def nearDupProbeDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val path = scratch("neardup", sfDir)
    writeOnce(path)(writeNearDupIndex(docs.filter(col("doc_id") % 10 < 8), path))
    val (sh, idx) = readNearDupIndex(spark, path)
    Dedup.incrementalNearDupFromIndex(sh, idx,
      docs.filter(col("doc_id") % 10 >= 8))
  }

  /** [[Dedup.incrementalVerbatimRunsDocs]] probing the materialized
    * index.
    */
  def verbatimProbeDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val path = scratch("verbatim", sfDir)
    writeOnce(path)(writeVerbatimIndex(docs.filter(col("doc_id") % 10 < 8), path))
    val (pos, occ) = readVerbatimIndex(spark, path)
    Dedup.incrementalVerbatimRunsFromIndex(pos, occ,
      docs.filter(col("doc_id") % 10 >= 8))
  }
}
