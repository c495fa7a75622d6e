package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.GrepEngine

/** Materialized TRIGRAM text index: grep ([[GrepEngine]]) without the
  * corpus scan — the text-side member of the stored-index family
  * ([[DedupIndexes]] for dedup, [[SimilarityIndexes]] for embeddings).
  * At 100 TB a per-query corpus scan is the cost model of the reference
  * (one file, one grep); an interactive query surface wants the scan
  * paid ONCE at ingest and each query priced by its result, which is
  * exactly what the classic character-trigram inverted index of the
  * substring-search literature does (public: PostgreSQL pg_trgm; Cox,
  * "Regular Expression Matching with a Trigram Index", 2012 — pattern
  * only matches lines containing all its trigrams; candidates from a
  * few rarest trigrams' postings, exact verify restores precision).
  *
  * Layout at `path` (all parquet, all ingest-labeled like the sibling
  * index families — overwrite-on-own-label replay idempotence,
  * manifest written LAST, generation pointer honored):
  *
  *   - `lines`    = (line_hash = xxhash64(line), line, freq): one row
  *     per DISTINCT line per ingest with its occurrence count — the
  *     whole corpus deduplicated; freq rows are per-ingest DELTAS,
  *     merge-on-read by summation (the verbatim occ-table trick), so a
  *     re-ingested duplicate line costs ONE tiny row, not text bytes;
  *   - `postings` = (gram, line_hash) PARTITIONED BY bucket =
  *     [[bucketOf]](gram): stored only for lines NOVEL to the index
  *     (manifest-checked), so postings grow with distinct content, not
  *     with deliveries — the duplication-heavy ingest a training-data
  *     pipeline sees appends freq deltas and near-zero postings. The
  *     bucket partitioning is the probe's file-pruning lever: a probe
  *     touches ≤ probeGrams buckets of nbuckets ([[DefaultBuckets]]);
  *   - `gramdf`   = (gram, df, bucket): per-ingest distinct-line counts
  *     per trigram (additive across ingests because postings are
  *     novel-only) PLUS each gram's posting bucket — one driver-side
  *     read of ≤|pattern| rows hands the probe both the rarest-trigram
  *     ranking and its partition-pruning values, control-plane like an
  *     IVF centroid read;
  *   - `meta`     = (nbuckets): pins the bucket domain the postings
  *     layout was written with — probes derive their pruning predicate
  *     from it, appends write the same layout, configs cannot fork;
  *   - `manifest` = (line_hash): the claimed distinct lines, novelty
  *     gate for appends.
  *
  * Trigrams are stored LOWERCASED: one index serves both case modes
  * (case-sensitive probes over-generate candidates through lowercase
  * trigrams and the exact verify restores precision; case-insensitive
  * probes verify on lower(line)) — see the probe cores
  * ([[GrepEngine.grepFreqFromIndex]]/[[GrepEngine.multiGrepFromIndex]]).
  * Line identity is xxhash64 like every hashKey spelling in this repo:
  * 8-byte shuffle/join keys, the text payload rides once.
  */
object TextIndexes {

  /** Bucket count the postings partitioning defaults to: enough dirs
    * that a ≤3-trigram probe prunes to ~5% of the posting files, few
    * enough that small indexes don't shatter into empty partitions.
    */
  val DefaultBuckets = 64

  /** The postings partition key: a trigram's bucket. One spelling,
    * used verbatim by the write AND by the probe's pruning predicate
    * ([[GrepEngine]] evaluates it over a tiny local frame) — the
    * pair must agree bit-for-bit or pruning silently drops matches.
    */
  def bucketOf(gram: org.apache.spark.sql.Column, nbuckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(gram), lit(nbuckets)).cast("int")

  /** (line_hash, line, freq) for the distinct lines of `src` — the
    * shared head of the write and append paths.
    */
  private def distinctLines(src: DataFrame, lineCol: String): DataFrame =
    src.select(col(lineCol).as("line"))
      .groupBy(xxhash64(col("line")).as("line_hash"))
      .agg(max(col("line")).as("line"), count(lit(1)).as("freq"))

  /** (line_hash, gram) — one row per distinct (line, trigram). */
  private def gramRows(lines: DataFrame): DataFrame =
    lines.select(col("line_hash"),
        explode(GrepEngine.lowerTrigrams(col("line"))).as("gram"))
      .distinct()

  private def writePostings(grams: DataFrame, dir: String, nbuckets: Int): Unit =
    grams.withColumn("bucket", bucketOf(col("gram"), nbuckets))
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)

  /** (gram, df, bucket) for a grams frame — the bucket rides gramdf so
    * a probe's ONE driver-side gramdf read hands it both the rarity
    * ranking and the partition-pruning values, with no second job and
    * no re-derivation of the layout hash.
    */
  private def writeGramDf(grams: DataFrame, dir: String, nbuckets: Int): Unit =
    grams.groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .withColumn("bucket", bucketOf(col("gram"), nbuckets))
      .write.mode("overwrite").parquet(dir)

  /** Build the index from scratch over `src(lineCol)`. Any previous
    * index at `path` is removed; same input-overlap guard and
    * meta-first/manifest-last crash contract as the sibling families.
    */
  def writeGrepIndex(src: DataFrame, lineCol: String, path: String,
                     nbuckets: Int = DefaultBuckets): Unit = {
    require(nbuckets > 0, s"nbuckets=$nbuckets must be positive")
    DedupIndexes.assertTargetNotOverInputs(src, path)
    val spark = src.sparkSession
    import spark.implicits._
    DedupIndexes.delete(spark, path)
    Seq(nbuckets).toDF("nbuckets").write.mode("overwrite").parquet(s"$path/meta")
    val dl = distinctLines(src, lineCol).persist()
    try {
      dl.write.mode("overwrite").parquet(s"$path/lines/ingest=${DedupIndexes.BaseLabel}")
      val grams = gramRows(dl).persist()
      try {
        writePostings(grams, s"$path/postings/ingest=${DedupIndexes.BaseLabel}", nbuckets)
        writeGramDf(grams, s"$path/gramdf/ingest=${DedupIndexes.BaseLabel}", nbuckets)
      } finally { grams.unpersist(); () }
      dl.select(col("line_hash")).write.mode("overwrite")
        .parquet(s"$path/manifest/ingest=${DedupIndexes.BaseLabel}")
    } finally { dl.unpersist(); () }
  }

  /** APPEND a delivery: every distinct batch line lands a freq DELTA
    * under `ingest=<label>` (duplicate content = one tiny row), but
    * postings/gramdf rows are written only for lines NOVEL to the index
    * (absent from the manifest, own label excluded) — replay rewrites
    * its own directories and derives the same novel set, so a
    * failure-replayed append is idempotent; manifest (the novel claims)
    * is written last.
    */
  def appendGrep(batch: DataFrame, lineCol: String, path0: String,
                 label: String): Unit = {
    require(label.nonEmpty && label != DedupIndexes.BaseLabel,
      s"append label must not collide with the full-build label '${DedupIndexes.BaseLabel}'")
    val spark = batch.sparkSession
    val path = DedupIndexes.resolveIndex(spark, path0)
    val nbuckets = readGrepMeta(spark, path)
    val dl = distinctLines(batch, lineCol).persist()
    try {
      dl.write.mode("overwrite").parquet(s"$path/lines/ingest=$label")
      // missing manifest (virgin or crashed build) reads as empty —
      // every batch line is novel, matching the sibling families
      val known =
        if (!DedupIndexes.hasData(spark, s"$path/manifest"))
          spark.range(0).select(col("id").as("line_hash"))
        else spark.read.parquet(s"$path/manifest")
          .filter(col("ingest") =!= label).select(col("line_hash"))
      val novel = dl.join(known, Seq("line_hash"), "left_anti").persist()
      try {
        val grams = gramRows(novel).persist()
        try {
          writePostings(grams, s"$path/postings/ingest=$label", nbuckets)
          writeGramDf(grams, s"$path/gramdf/ingest=$label", nbuckets)
        } finally { grams.unpersist(); () }
        novel.select(col("line_hash")).write.mode("overwrite")
          .parquet(s"$path/manifest/ingest=$label")
      } finally { novel.unpersist(); () }
    } finally { dl.unpersist(); () }
  }

  /** Compact a long-appended index into `dst`: freq deltas summed into
    * one row per distinct line, postings/gramdf/manifest rewritten
    * under a single `ingest=base` — reading ONLY the stored index
    * (corpus text never re-read; the lines table IS the text, already
    * deduplicated). Same complete-or-absent dst + pointer-flip contract
    * as the sibling compactions.
    */
  def compactGrepTo(spark: SparkSession, src0: String, dst: String): Unit = {
    val src = DedupIndexes.resolveIndex(spark, src0)
    require(!DedupIndexes.pathsOverlap(spark, src, dst),
      "compaction rewrites into a NEW, non-overlapping path; an equal or nested src/dst would read and delete the same files")
    DedupIndexes.delete(spark, dst)
    val nbuckets = readGrepMeta(spark, src)
    import spark.implicits._
    Seq(nbuckets).toDF("nbuckets").write.mode("overwrite").parquet(s"$dst/meta")
    spark.read.parquet(s"$src/lines").groupBy(col("line_hash"))
      .agg(max(col("line")).as("line"), sum(col("freq")).as("freq"))
      .write.mode("overwrite").parquet(s"$dst/lines/ingest=${DedupIndexes.BaseLabel}")
    // postings are disjoint across ingests by the novel-only discipline:
    // a plain rewrite re-partitions them into base without dedup work
    writePostings(
      spark.read.parquet(s"$src/postings").select(col("gram"), col("line_hash")),
      s"$dst/postings/ingest=${DedupIndexes.BaseLabel}", nbuckets)
    spark.read.parquet(s"$src/gramdf").groupBy(col("gram"))
      .agg(sum(col("df")).as("df"))
      .withColumn("bucket", bucketOf(col("gram"), nbuckets))
      .write.mode("overwrite").parquet(s"$dst/gramdf/ingest=${DedupIndexes.BaseLabel}")
    spark.read.parquet(s"$src/manifest").select(col("line_hash")).distinct()
      .write.mode("overwrite").parquet(s"$dst/manifest/ingest=${DedupIndexes.BaseLabel}")
  }

  /** The nbuckets the stored postings layout was written with
    * (pointer-resolved).
    */
  def readGrepMeta(spark: SparkSession, path0: String): Int = {
    val path = DedupIndexes.resolveIndex(spark, path0)
    require(DedupIndexes.hasData(spark, s"$path/meta"),
      s"index at $path has no meta table pinning its bucket count — " +
        "rebuild it with writeGrepIndex to make it probe/append-safe")
    spark.read.parquet(s"$path/meta").head().getAs[Int]("nbuckets")
  }

  /** Read back (linesRaw, postings, gramdf) for the probe cores.
    * `linesRaw` keeps the per-ingest freq DELTAS — the probe aggregates
    * AFTER its candidate join so the merge shuffle is candidate-sized;
    * gramdf merges df across ingests (bucket is a function of the gram
    * and the pinned nbuckets, identical in every ingest); postings lose
    * only the maintenance-label column.
    */
  def readGrepIndex(spark: SparkSession, path0: String): (DataFrame, DataFrame, DataFrame) = {
    val path = DedupIndexes.resolveIndex(spark, path0)
    (spark.read.parquet(s"$path/lines").drop("ingest"),
      spark.read.parquet(s"$path/postings")
        .withColumn("bucket", col("bucket").cast("int")).drop("ingest"),
      spark.read.parquet(s"$path/gramdf").groupBy(col("gram"))
        .agg(sum(col("df")).as("df"), max(col("bucket")).as("bucket")))
  }

  // -- driver-query harness: stored-probe twins of the q_grep family.
  // Index build is fixture work, memoized per JVM like the sibling
  // families' scratch builds so the bench charges the probe only. --

  private def scratch(sfDir: String): String =
    DedupIndexes.scratch("target/text_index", "grep", sfDir)

  /** [[GrepEngine.grepFreq]] over `documents.text` probing the stored
    * trigram index — the q_grep_freq / q_grep_ci stored twins.
    */
  def grepProbeDocs(spark: SparkSession, sfDir: String, pattern: String,
                    mode: GrepEngine.Mode = GrepEngine.Substring): DataFrame = {
    val path = scratch(sfDir)
    DedupIndexes.writeOnce(path)(
      writeGrepIndex(graft.Tables.documents(spark, sfDir), "text", path))
    val (lines, postings, gramdf) = readGrepIndex(spark, path)
    GrepEngine.grepFreqFromIndex(lines, postings, gramdf, pattern, mode)
  }

  /** [[GrepEngine.multiGrep]] probing the stored index — the
    * q_grep_multi stored twin.
    */
  def multiGrepProbeDocs(spark: SparkSession, sfDir: String,
                         patterns: Seq[String]): DataFrame = {
    val path = scratch(sfDir)
    DedupIndexes.writeOnce(path)(
      writeGrepIndex(graft.Tables.documents(spark, sfDir), "text", path))
    val (lines, postings, gramdf) = readGrepIndex(spark, path)
    GrepEngine.multiGrepFromIndex(lines, postings, gramdf, patterns)
  }

  /** [[GrepEngine.grepTopK]] probing the stored index — the q_grep_topk
    * stored twin.
    */
  def grepTopKProbeDocs(spark: SparkSession, sfDir: String, pattern: String,
                        k: Int): DataFrame = {
    val path = scratch(sfDir)
    DedupIndexes.writeOnce(path)(
      writeGrepIndex(graft.Tables.documents(spark, sfDir), "text", path))
    val (lines, postings, gramdf) = readGrepIndex(spark, path)
    GrepEngine.grepTopKFromIndex(lines, postings, gramdf, pattern, k)
  }
}
