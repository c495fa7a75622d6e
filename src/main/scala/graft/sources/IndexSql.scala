package graft.sources

import org.apache.spark.sql.SparkSession
import graft.operators.{Dedup, Similarity}

/** SQL front door for the stored-index probes: one registration call
  * per probe binds an index path (pointer-resolved) and a SQL-visible
  * input table into a temp view, after which a `spark.sql` user (JDBC,
  * notebook SQL cell, thrift server) reaches the index with plain
  * `SELECT` — no Scala at query time. The views hold the SAME lazy
  * plans the Scala entry points build ([[DedupIndexes]],
  * [[SimilarityIndexes]], the `FromIndex` probe cores), so SQL and
  * Scala callers cannot fork semantics; each probe derives its config
  * from the index's own meta exactly like the Scala spelling.
  *
  * Registration snapshots the index's FILE LISTING (a Spark read): a
  * maintenance append or compaction pointer flip after registration is
  * picked up by RE-REGISTERING the view — the same re-resolve cadence
  * any long-lived reader of a rewritten table needs.
  */
object IndexSql {

  /** `SELECT * FROM <viewName>` = the near-dup verdict frame of
    * probing the stored index at `indexPath` with the docs in
    * `batchTable` (needs doc_id, text) — the SQL spelling of
    * [[Dedup.incrementalNearDupFromIndex]] at the index's pinned
    * (n, k, bands).
    */
  def registerNearDupProbe(spark: SparkSession, viewName: String,
                           indexPath: String, batchTable: String): Unit = {
    val (n, k, bands) = DedupIndexes.readNearDupMeta(spark, indexPath)
    val (sh, idx) = DedupIndexes.readNearDupIndex(spark, indexPath)
    Dedup.incrementalNearDupFromIndex(sh, idx,
        spark.table(batchTable).select("doc_id", "text"), n, k, bands)
      .createOrReplaceTempView(viewName)
  }

  /** `SELECT * FROM <viewName>` = the shared-verbatim-run flags of
    * probing the stored positional index with `batchTable`'s docs —
    * the SQL spelling of [[Dedup.incrementalVerbatimRunsFromIndex]] at
    * the index's pinned shingle width.
    */
  def registerVerbatimProbe(spark: SparkSession, viewName: String,
                            indexPath: String, batchTable: String,
                            minRunTokens: Int = 20,
                            maxOccFreq: Int = 1000): Unit = {
    val n = DedupIndexes.readVerbatimMeta(spark, indexPath)
    val (pos, occ) = DedupIndexes.readVerbatimIndex(spark, indexPath)
    Dedup.incrementalVerbatimRunsFromIndex(pos, occ,
        spark.table(batchTable).select("doc_id", "text"), n,
        minRunTokens = minRunTokens, maxOccFreq = maxOccFreq)
      .createOrReplaceTempView(viewName)
  }

  /** `SELECT * FROM <viewName>` = (query_id, neighbor_id, rank) top-k
    * over the stored IVF index for the queries in `queriesTable`
    * (needs query_id, eq) — [[Similarity.annTopKIvfFromIndex]].
    */
  def registerIvfAnn(spark: SparkSession, viewName: String,
                     indexPath: String, queriesTable: String,
                     k: Int = 5, nprobe: Int = 12): Unit = {
    val (centroids, cells) = SimilarityIndexes.readIvfIndex(spark, indexPath)
    Similarity.annTopKIvfFromIndex(centroids, cells,
        spark.table(queriesTable).select("query_id", "eq"), k, nprobe)
      .createOrReplaceTempView(viewName)
  }

  /** `SELECT * FROM <viewName>` = (query_id, neighbor_id, rank) top-k
    * over the stored LSH sketch index — [[Similarity.annTopKLshFromIndex]]
    * at the index's pinned (ntables, bits, dim).
    */
  def registerLshAnn(spark: SparkSession, viewName: String,
                     indexPath: String, queriesTable: String,
                     k: Int = 5, maxBucket: Int = 10000): Unit = {
    val (sketches, vectors, (nTables, bits, dim)) =
      SimilarityIndexes.readLshIndex(spark, indexPath)
    Similarity.annTopKLshFromIndex(sketches, vectors,
        spark.table(queriesTable).select("query_id", "eq"),
        k, nTables, bits, maxBucket, dim)
      .createOrReplaceTempView(viewName)
  }

  /** `SELECT * FROM <viewName>` = (vec_id, rep_id, is_rep) semantic
    * dedup verdicts over the stored multi-assign cell table —
    * [[Similarity.semanticDedupFromIndex]].
    */
  def registerSemanticDedup(spark: SparkSession, viewName: String,
                            indexPath: String,
                            threshold: Double = 0.45): Unit = {
    val (_, cells) = SimilarityIndexes.readIvfIndex(spark, indexPath)
    Similarity.semanticDedupFromIndex(cells, threshold)
      .createOrReplaceTempView(viewName)
  }

  /** `SELECT * FROM <viewName>` = [[SimilarityIndexes.ivfDriftStats]] —
    * the re-fit signal as a SQL-queryable table (maintenance dashboards
    * poll `WHERE refit_due`).
    */
  def registerIvfDriftStats(spark: SparkSession, viewName: String,
                            indexPath: String): Unit =
    SimilarityIndexes.ivfDriftStats(spark, indexPath)
      .createOrReplaceTempView(viewName)

  /** `SELECT * FROM <viewName>` = the measured nprobe → recall/scan
    * curve of the STORED index for the queries in `queriesTable`
    * (needs query_id, eq) — [[Similarity.ivfRecallCurveFromIndex]];
    * the serving-knob dashboard twin of [[registerIvfDriftStats]]
    * (drift says when to re-fit, this says where to set nprobe).
    * The exact full-scan endpoint laws (recall_ppm = scan_ppm = 10^6
    * at nprobe = nlist) assume `queriesTable`'s query_ids are drawn
    * from the INDEXED corpus — non-member queries have no own-cell
    * exclusion, so their scan_ppm can exceed 10^6 at full fan-out.
    */
  def registerIvfRecallCurve(spark: SparkSession, viewName: String,
                             indexPath: String, queriesTable: String,
                             k: Int = 5,
                             nprobes: Seq[Int] = Seq(1, 2, 4, 8, 12, 16)): Unit = {
    val (centroids, cells) = SimilarityIndexes.readIvfIndex(spark, indexPath)
    Similarity.ivfRecallCurveFromIndex(centroids, cells,
        spark.table(queriesTable).select("query_id", "eq"), k, nprobes)
      .createOrReplaceTempView(viewName)
  }

  /** `SELECT * FROM <viewName>` = the measured nprobe → recall/scan
    * curve of the STORED IVF-SQ8 index —
    * [[Similarity.ivfSqRecallCurveFromIndex]]; `scanned` counts the
    * int8 code rows the probed cells hold. Same corpus-member-queries
    * assumption as the IVF curve.
    */
  def registerIvfSqRecallCurve(spark: SparkSession, viewName: String,
                               indexPath: String, queriesTable: String,
                               k: Int = 5,
                               nprobes: Seq[Int] = Seq(1, 2, 4, 8, 12, 16),
                               rerank: Int = 20): Unit = {
    val (centroids, codes, vectors) = SimilarityIndexes.readIvfSqIndex(spark, indexPath)
    Similarity.ivfSqRecallCurveFromIndex(centroids, codes, vectors,
        spark.table(queriesTable).select("query_id", "eq"), k, nprobes, rerank)
      .createOrReplaceTempView(viewName)
  }

  /** `SELECT * FROM <viewName>` = the measured nprobe → recall/scan
    * curve of the STORED IVF-PQ index —
    * [[Similarity.ivfPqRecallCurveFromIndex]]; `scanned` counts the
    * 16-byte PQ code rows the probed cells hold. Same
    * corpus-member-queries assumption as the IVF curve.
    */
  def registerIvfPqRecallCurve(spark: SparkSession, viewName: String,
                               indexPath: String, queriesTable: String,
                               k: Int = 5,
                               nprobes: Seq[Int] = Seq(1, 2, 4, 8, 12, 16),
                               rerank: Int = 64): Unit = {
    val (centroids, books, codes, vectors) =
      SimilarityIndexes.readIvfPqIndex(spark, indexPath)
    Similarity.ivfPqRecallCurveFromIndex(centroids, books, codes, vectors,
        spark.table(queriesTable).select("query_id", "eq"), k, nprobes, rerank)
      .createOrReplaceTempView(viewName)
  }

  /** `SELECT * FROM <viewName>` = the measured k′ → recall/byte curve
    * of the STORED PCA index for the queries in `queriesTable` —
    * [[Similarity.pcaRecallCurveFromIndex]]; the
    * [[registerIvfRecallCurve]] contract for the PCA family's width
    * knob (ladder steps bounded by the stored basis width). Same
    * corpus-member-queries assumption as the IVF curve.
    */
  def registerPcaRecallCurve(spark: SparkSession, viewName: String,
                             indexPath: String, queriesTable: String,
                             k: Int = 5, rerank: Int = 40,
                             kprimes: Seq[Int] = Seq(8, 16, 32)): Unit = {
    val (basis, reduced, vectors) = SimilarityIndexes.readPcaIndex(spark, indexPath)
    Similarity.pcaRecallCurveFromIndex(basis, reduced, vectors,
        spark.table(queriesTable).select("query_id", "eq"), k, rerank, kprimes)
      .createOrReplaceTempView(viewName)
  }

  /** `SELECT * FROM <viewName>` = the measured nTables → recall/scan
    * curve of the STORED LSH sketch index —
    * [[Similarity.lshRecallCurveFromIndex]] at the index's pinned
    * (bits, dim); ladder steps bounded by the index's stored table
    * count. Same corpus-member-queries assumption as the IVF curve.
    */
  def registerLshRecallCurve(spark: SparkSession, viewName: String,
                             indexPath: String, queriesTable: String,
                             k: Int = 5, nTabless: Seq[Int] = Seq(1, 2, 4, 8, 16),
                             maxBucket: Int = 10000): Unit = {
    val (sketches, vectors, (nTables, bits, dim)) =
      SimilarityIndexes.readLshIndex(spark, indexPath)
    require(nTabless.forall(_ <= nTables),
      s"ladder step exceeds the stored index's nTables=$nTables")
    Similarity.lshRecallCurveFromIndex(sketches, vectors,
        spark.table(queriesTable).select("query_id", "eq"),
        k, nTabless, bits, maxBucket, dim)
      .createOrReplaceTempView(viewName)
  }

  /** `SELECT * FROM <viewName>` = the measured rerank depth →
    * recall/scan curve of the STORED PQ index —
    * [[Similarity.pqRerankCurveFromIndex]] under the index's stored
    * codebooks. Same corpus-member-queries assumption as the IVF
    * curve.
    */
  def registerPqRerankCurve(spark: SparkSession, viewName: String,
                            indexPath: String, queriesTable: String,
                            k: Int = 5,
                            reranks: Seq[Int] = Seq(8, 64, 512)): Unit = {
    val (books, codes, vectors) = SimilarityIndexes.readPqIndex(spark, indexPath)
    Similarity.pqRerankCurveFromIndex(books, codes, vectors,
        spark.table(queriesTable).select("query_id", "eq"), k, reranks)
      .createOrReplaceTempView(viewName)
  }

  /** `SELECT * FROM <viewName>` = (query_id, neighbor_id, rank) top-k
    * over the stored PCA serving index —
    * [[Similarity.annTopKPcaFromIndex]] under the index's STORED basis.
    */
  def registerPcaAnn(spark: SparkSession, viewName: String,
                     indexPath: String, queriesTable: String,
                     k: Int = 5, rerank: Int = 40): Unit = {
    val (basis, reduced, vectors) = SimilarityIndexes.readPcaIndex(spark, indexPath)
    Similarity.annTopKPcaFromIndex(basis, reduced, vectors,
        spark.table(queriesTable).select("query_id", "eq"), k, rerank)
      .createOrReplaceTempView(viewName)
  }

  /** `SELECT * FROM <viewName>` = [[SimilarityIndexes.pcaDriftStats]] —
    * the basis-drift re-fit signal, the [[registerIvfDriftStats]]
    * contract for the PCA family.
    */
  def registerPcaDriftStats(spark: SparkSession, viewName: String,
                            indexPath: String): Unit =
    SimilarityIndexes.pcaDriftStats(spark, indexPath)
      .createOrReplaceTempView(viewName)

  /** `SELECT * FROM <viewName>` = the (line, freq) grep result of
    * probing the stored trigram index at `indexPath` for `pattern` —
    * the SQL spelling of [[graft.engine.GrepEngine.grepFreqFromIndex]].
    * `mode`: "substring" (default), "ci", or "regex" (distinct-lines
    * scan — no trigram algebra for a regex).
    */
  def registerGrepProbe(spark: SparkSession, viewName: String,
                        indexPath: String, pattern: String,
                        mode: String = "substring"): Unit = {
    import graft.engine.GrepEngine
    val m: GrepEngine.Mode = mode match {
      case "substring" => GrepEngine.Substring
      case "ci"        => GrepEngine.SubstringIgnoreCase
      case "regex"     => GrepEngine.Regex
      case "word"      => GrepEngine.WholeWord
      case other => throw new IllegalArgumentException(
        s"unknown grep mode '$other' (substring | ci | regex | word)")
    }
    val (lines, postings, gramdf) = TextIndexes.readGrepIndex(spark, indexPath)
    GrepEngine.grepFreqFromIndex(lines, postings, gramdf, pattern, m)
      .createOrReplaceTempView(viewName)
  }

  /** `SELECT * FROM <viewName>` = the end-to-end curation audit ledger
    * (doc_id, outcome) over the docs in `docsTable` (needs doc_id,
    * text) — the SQL spelling of
    * [[graft.operators.Pipeline.curateOn]]. Not an index probe, but
    * the same front-door contract: the view holds the SAME lazy plan
    * the Scala entry point builds, so SQL and Scala callers cannot
    * fork on gate thresholds or stage order.
    */
  def registerCurationLedger(spark: SparkSession, viewName: String,
                             docsTable: String, lang: String = "en",
                             splitThreshold: String = "cc"): Unit =
    graft.operators.Pipeline.curateOn(
        spark.table(docsTable).select("doc_id", "text"),
        lang, splitThreshold)
      .createOrReplaceTempView(viewName)

  /** `SELECT * FROM <viewName>` = the merge-on-read CURRENT STATE of a
    * streaming changelog store ([[graft.streaming.StreamingOps
    * .ingestChangelog]]) — global latest-wins per key, tombstone
    * winners dropped. Same re-register-after-maintenance cadence as
    * the other stored views.
    */
  def registerChangelogState(spark: SparkSession, viewName: String,
                             stateDir: String, keyCol: String = "key",
                             seqCol: String = "seq",
                             opCol: String = "op"): Unit =
    graft.streaming.StreamingOps
      .changelogState(spark, stateDir, keyCol, seqCol, opCol)
      .createOrReplaceTempView(viewName)

  /** `SELECT * FROM <viewName>` = (part, rec, w, rnk) top-k "also
    * bought" neighbors over a stored co-purchase ledger
    * ([[GraphIndexes]]) — [[graft.operators.Graph.itemRecsOn]] over
    * the merge-on-read reconciled edge set.
    */
  def registerGraphRecs(spark: SparkSession, viewName: String,
                        indexPath: String, k: Int = 3): Unit =
    graft.operators.Graph
      .itemRecsOn(GraphIndexes.readGraphEdges(spark, indexPath), k)
      .createOrReplaceTempView(viewName)

  /** `SELECT * FROM <viewName>` = (node, rank_ppm) fixed-point
    * PageRank over a stored co-purchase ledger —
    * [[graft.operators.Graph.pageRankOn]], same integer contract as
    * the driver query.
    */
  def registerGraphPageRank(spark: SparkSession, viewName: String,
                            indexPath: String, iters: Int = 5): Unit =
    graft.operators.Graph
      .pageRankOn(GraphIndexes.readGraphEdges(spark, indexPath), iters)
      .createOrReplaceTempView(viewName)

  /** `SELECT * FROM <viewName>` = (doc_id, score) BM25 top-k over a
    * stored postings index ([[SearchIndexes]]) for a fixed conjunctive
    * query — bucket-pruned postings through the same
    * [[graft.operators.TextAnalysis.bm25Rank]] core as the scan
    * spelling.
    */
  def registerBm25Search(spark: SparkSession, viewName: String,
                         indexPath: String, terms: Seq[String],
                         k: Int = 10): Unit =
    SearchIndexes.searchBm25FromIndex(spark, indexPath, terms, k)
      .createOrReplaceTempView(viewName)

  /** Positional phrase search over the same stored postings —
    * [[registerBm25Search]]'s contract for the adjacency member.
    */
  def registerPhraseSearch(spark: SparkSession, viewName: String,
                           indexPath: String, phrase: Seq[String],
                           k: Int = 10): Unit =
    SearchIndexes.searchPhraseFromIndex(spark, indexPath, phrase, k)
      .createOrReplaceTempView(viewName)
}
