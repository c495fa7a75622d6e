package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Materialized dedup indexes: the write-once-at-ingest, probe-per-
  * delivery, APPEND-per-accepted-batch storage layout behind
  * [[graft.operators.Dedup.incrementalNearDupFromIndex]] and
  * [[Dedup.incrementalVerbatimRunsFromIndex]].
  *
  * At 100 TB the incremental operators' scale story is that the corpus
  * NEVER re-derives its index per delivery: the banded MinHash index,
  * the sorted shingle frame, the positional k-gram index, and its
  * occurrence table are built once when docs are ingested, probed from
  * storage by every subsequent batch, and EXTENDED (not rebuilt) as
  * batches are accepted. This object is that claim as code — plain
  * parquet (columnar, predicate-pushdown-able), laid out for both
  * maintenance modes:
  *
  *   - every component carries an `ingest=<label>` directory level, one
  *     per append. An append OVERWRITES its own label's directories, so
  *     a failure-replayed append is idempotent by directory ownership —
  *     the replay rewrites the same rows instead of duplicating them
  *     (the same determinism contract foreachBatch gives batchIds);
  *   - the band index is additionally PARTITIONED BY band inside each
  *     ingest, so a band-restricted probe or per-band compaction touches
  *     1/bands of the files (layout + pruning asserted in
  *     DedupIndexSpec);
  *   - a `manifest/ingest=<label>` table of bare doc_ids (written LAST,
  *     after the index rows) records which docs each append indexed —
  *     the cheap authoritative "already indexed" set that ingest
  *     maintenance anti-joins against (O(docs) ids, not O(tokens) index
  *     rows), including docs too short to produce any shingle/position
  *     rows;
  *   - the verbatim occurrence table is MERGE-ON-READ: each append
  *     writes its batch's (ng, occ) delta, and [[readVerbatimIndex]]
  *     reconciles with one sum over the OCC TABLE (distinct-n-gram
  *     scale — never a re-aggregation of the corpus index). When delta
  *     count grows, [[compactVerbatimTo]] collapses them — reading only
  *     the stored index, never the corpus text;
  *   - a one-row `meta` table pins the shingling config the index was
  *     built with; appends and the streaming sinks' probes derive
  *     theirs from it, so an index built at non-default (n, k, bands)
  *     can never be probed or extended under a different scheme.
  */
object DedupIndexes {

  /** The label the full-build writers use for their single ingest. */
  val BaseLabel = "base"

  /** The generation-pointer file name a pointered index root carries —
    * see [[flipPointer]]/[[resolveIndex]]. Underscore-prefixed so Spark
    * file listings (and [[hasData]]) treat it as hidden metadata.
    */
  val PointerFile = "_current"

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Does `dir` hold at least one actual DATA FILE — a non-hidden file
    * whose every path component below `dir` is non-hidden? Nested
    * layouts put files below ingest= label dirs, so a bare top-level
    * file check would read a populated index as empty; and a crash
    * mid-write can leave a label dir holding only `_temporary` — an
    * entry-existence check would read that as data, wedging every
    * replay on an unreadable parquet path instead of letting the
    * overwrite heal it (the crash-healing contract the streaming sinks
    * document).
    */
  def hasData(spark: SparkSession, dir: String): Boolean = {
    def hidden(n: String) = n.startsWith("_") || n.startsWith(".")
    val f = fs(spark, dir)
    val root = f.makeQualified(new Path(dir))
    f.exists(root) && {
      val it = f.listFiles(root, true)
      var found = false
      while (!found && it.hasNext) {
        val st = it.next()
        var ok = st.isFile && !hidden(st.getPath.getName)
        var pp = st.getPath.getParent
        while (ok && pp != null && pp.toUri.getPath != root.toUri.getPath) {
          if (hidden(pp.getName)) ok = false
          pp = pp.getParent
        }
        found = ok
      }
      found
    }
  }

  private[sources] def delete(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val f = fs(spark, dir)
    if (f.exists(p)) { f.delete(p, true); () }
  }

  /** Guard a full index (re)build against deleting its own input: the
    * build's first act is `delete(target)`, and its source frame is
    * LAZY — if any of the frame's input files sit at, under, or above
    * `target` (a misconfigured sink whose indexDir equals or contains
    * its corpusDir, relative-vs-absolute spellings included), the
    * delete would destroy the data before the build reads it. Checked
    * over the DISTINCT PARENT DIRECTORIES of the frame's input files
    * (driver-side strings, a handful of partition dirs — never a
    * per-file filesystem walk); an in-memory frame has no input files
    * and passes vacuously.
    */
  private[graft] def assertTargetNotOverInputs(df: DataFrame, target: String): Unit = {
    val spark = df.sparkSession
    val parents = df.inputFiles.map(f => new Path(f).getParent.toString).distinct
    parents.find(p => pathsOverlap(spark, p, target)).foreach { p =>
      throw new IllegalArgumentException(
        s"index build at $target would delete its own input data under $p " +
          "before reading it — the index path must not equal, contain, or " +
          "sit inside the source data directory")
    }
  }

  // -- generation pointer: the compaction contract says "the caller
  // owns the src→dst pointer flip" — this is that flip as a first-class
  // helper, so callers stop reinventing the atomic-swap step the design
  // depends on. A POINTERED index root holds generation directories
  // (e.g. root/gen-0, root/gen-1) plus a one-line `_current` file naming
  // the live one; probes address the ROOT and [[resolveIndex]] follows
  // the pointer. The flip is temp-write + atomic rename, so a reader
  // sees the old target or the new one, never a torn pointer — and
  // [[flipPointer]] REFUSES to name a dst without a manifest (every
  // build/compact writes it last), so a crashed compaction can never be
  // pointed at: the old generation keeps serving until a COMPLETE new
  // one exists. An unpointered path resolves to itself, so the flat
  // single-directory layout keeps working unchanged. --

  /** Atomically point the index root's `_current` file at `target`
    * (an absolute path, or a name relative to `root`). Refuses a
    * target with no complete manifest — the pointer must never name a
    * half-written generation.
    */
  def flipPointer(spark: SparkSession, root: String, target: String): Unit = {
    val abs = resolveChild(root, target)
    require(hasData(spark, s"$abs/manifest"),
      s"refusing to point $root at $abs: no complete index there (the " +
        "manifest is written last — an absent one means the build or " +
        "compaction has not finished)")
    val conf = spark.sparkContext.hadoopConfiguration
    val tmp = new Path(root, s"$PointerFile.tmp")
    val dst = new Path(root, PointerFile)
    val f = fs(spark, root)
    val out = f.create(tmp, true)
    try out.write(target.getBytes("UTF-8")) finally out.close()
    // FileContext rename carries OVERWRITE semantics (plain
    // FileSystem.rename refuses an existing dst) — the atomic commit
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      f.makeQualified(dst).toUri, conf)
    fc.rename(f.makeQualified(tmp), f.makeQualified(dst),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Follow `path`'s `_current` pointer if one exists, else `path`
    * itself. One level only — a generation directory is a plain index,
    * not another pointered root. Every read/probe/append entry point
    * in this object and [[SimilarityIndexes]] resolves through this,
    * so callers address the stable root and compactions swap
    * generations underneath them.
    */
  def resolveIndex(spark: SparkSession, path: String): String = {
    val ptr = new Path(path, PointerFile)
    val f = fs(spark, path)
    if (!f.exists(ptr)) path
    else {
      val in = f.open(ptr)
      val raw =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      require(raw.nonEmpty, s"$ptr is empty — the pointer names no generation")
      resolveChild(path, raw)
    }
  }

  /** `target` as an absolute path: returned verbatim when already
    * absolute/qualified, else joined under `root`.
    */
  private def resolveChild(root: String, target: String): String =
    if (target.startsWith("/") || target.contains("://")) target
    else s"$root/$target"

  /** Does a COMPLETE index live at `path` (pointer-resolved)? Keyed on
    * the manifest, which every build and append writes LAST — the
    * bootstrap gate the streaming sinks use.
    */
  def hasCompleteIndex(spark: SparkSession, path: String): Boolean =
    hasData(spark, s"${resolveIndex(spark, path)}/manifest")

  /** Write the [[Dedup.incrementalNearDup]] corpus artifacts from
    * scratch: `path/shingles` = (doc_id, sh, sz), `path/bands` =
    * (doc_id, band, key) partitioned by band, `path/manifest` =
    * (doc_id), all under `ingest=base`. Any previous index at `path`
    * is removed — this is the full-(re)build from text; for merging a
    * long-appended index without re-reading the corpus, use
    * [[compactNearDupTo]].
    */
  def writeNearDupIndex(corpus: DataFrame, path: String,
                        n: Int = Dedup.ShingleN, k: Int = Dedup.MinHashK,
                        bands: Int = Dedup.MinHashBands): Unit = {
    assertTargetNotOverInputs(corpus, path)
    delete(corpus.sparkSession, path)
    writeNearDupMeta(corpus.sparkSession, path, n, k, bands)
    val sh = Dedup.nearDupIndexFrames(corpus, n, k, bands)._1
    sh.write.mode("overwrite").parquet(s"$path/shingles/ingest=$BaseLabel")
    // the band index derives from the shingle frame JUST WRITTEN rather
    // than re-shingling text — the same single-derivation economy the
    // inline path gets from persist()
    val stored = corpus.sparkSession.read
      .parquet(s"$path/shingles/ingest=$BaseLabel")
    Dedup.bandIndexOf(stored, k, bands)
      .write.mode("overwrite").partitionBy("band")
      .parquet(s"$path/bands/ingest=$BaseLabel")
    writeManifest(corpus, s"$path/manifest/ingest=$BaseLabel")
  }

  /** APPEND an accepted batch's rows to a stored near-dup index: the
    * batch's shingle frame and band keys land under `ingest=<label>`
    * with OVERWRITE semantics on that label — re-running the same
    * (batch, label) append (a failure replay) rewrites identical
    * directories instead of duplicating index rows. The manifest row
    * set is written LAST so a crash mid-append leaves the doc "not yet
    * indexed" for reconciliation, never half-claimed. The shingling
    * config comes from the index's own meta — an append can never fork
    * (n, k, bands) from what the index was built with.
    *
    * The caller owns WHICH docs to append (typically: this delivery's
    * docs that entered the corpus and are absent from
    * [[indexedDocIds]]); this method is pure storage.
    */
  def appendNearDup(batch: DataFrame, path0: String, label: String): Unit = {
    require(label.nonEmpty && label != BaseLabel,
      s"append label must not collide with the full-build label '$BaseLabel'")
    val path = resolveIndex(batch.sparkSession, path0)
    val (n, k, bands) = readNearDupMeta(batch.sparkSession, path)
    val (sh, bandIdx) = Dedup.nearDupIndexFrames(batch, n, k, bands)
    // batch-scale: persist so the band derivation reuses the shingle
    // explode instead of re-shingling (the full build gets the same
    // economy from its just-written parquet)
    val shP = sh.persist()
    shP.write.mode("overwrite").parquet(s"$path/shingles/ingest=$label")
    bandIdx.write.mode("overwrite").partitionBy("band")
      .parquet(s"$path/bands/ingest=$label")
    shP.unpersist()
    writeManifest(batch, s"$path/manifest/ingest=$label")
  }

  /** Read back a stored near-dup index (any number of ingests). `band`
    * returns as its partition-column string spelling (type inference is
    * off in Sessions); cast restores the probe's integer key; the
    * ingest label is maintenance metadata, not probe input.
    *
    * `excludeIngest = Some(label)`: leave that ingest's rows out of the
    * returned frames — the REPLAY spelling for a ledgered sink: a
    * crashed batch that already appended its own docs to the index must
    * re-judge them against every OTHER ingest, not find itself at
    * Jaccard 1.0 and flip its own outcomes to dropped_near_duplicate
    * (the [[indexedDocIds]] exclusion contract, applied to the probe).
    */
  def readNearDupIndex(spark: SparkSession, path0: String,
                       excludeIngest: Option[String] = None): (DataFrame, DataFrame) = {
    val path = resolveIndex(spark, path0)
    def rd(sub: String) = {
      val d = spark.read.parquet(s"$path/$sub")
      excludeIngest.fold(d)(l => d.filter(col("ingest") =!= l)).drop("ingest")
    }
    (rd("shingles"), rd("bands").withColumn("band", col("band").cast("int")))
  }

  /** Write the [[Dedup.incrementalVerbatimRuns]] corpus artifacts from
    * scratch: `path/positions` = (doc_id, pos, ng), `path/occ` =
    * (ng, occ), `path/manifest` = (doc_id), under `ingest=base`; any
    * previous index is removed. This is the full rebuild from text;
    * [[compactVerbatimTo]] merges occ deltas without re-reading the
    * corpus.
    * The occurrence table derives from the just-written positions file,
    * not a second text scan.
    */
  def writeVerbatimIndex(corpus: DataFrame, path: String,
                         n: Int = Dedup.ShingleN): Unit = {
    assertTargetNotOverInputs(corpus, path)
    delete(corpus.sparkSession, path)
    writeVerbatimMeta(corpus.sparkSession, path, n)
    val pos = Dedup.verbatimIndexFrames(corpus, n)._1
    pos.write.mode("overwrite").parquet(s"$path/positions/ingest=$BaseLabel")
    val spark = corpus.sparkSession
    spark.read.parquet(s"$path/positions/ingest=$BaseLabel")
      .groupBy(col("ng")).agg(count(lit(1)).as("occ"))
      .write.mode("overwrite").parquet(s"$path/occ/ingest=$BaseLabel")
    writeManifest(corpus, s"$path/manifest/ingest=$BaseLabel")
  }

  /** APPEND an accepted batch to a stored verbatim index: positional
    * rows plus the batch's (ng, occ) DELTA under `ingest=<label>`,
    * overwrite-on-own-label for replay idempotence, manifest last —
    * same contract as [[appendNearDup]]. The occ delta makes the
    * stored occ table merge-on-read; [[readVerbatimIndex]] reconciles.
    */
  def appendVerbatim(batch: DataFrame, path0: String, label: String): Unit = {
    require(label.nonEmpty && label != BaseLabel,
      s"append label must not collide with the full-build label '$BaseLabel'")
    val path = resolveIndex(batch.sparkSession, path0)
    val n = readVerbatimMeta(batch.sparkSession, path)
    val pos = Dedup.verbatimIndexFrames(batch, n)._1
    val posP = pos.persist()
    posP.write.mode("overwrite").parquet(s"$path/positions/ingest=$label")
    posP.groupBy(col("ng")).agg(count(lit(1)).as("occ"))
      .write.mode("overwrite").parquet(s"$path/occ/ingest=$label")
    posP.unpersist()
    writeManifest(batch, s"$path/manifest/ingest=$label")
  }

  /** Read back a stored verbatim index. The occurrence table is the
    * MERGE-ON-READ reconciliation of the per-ingest deltas — one sum
    * over the occ table itself (distinct n-grams × ingests), never a
    * re-aggregation of the positional index.
    */
  def readVerbatimIndex(spark: SparkSession, path0: String,
                        excludeIngest: Option[String] = None): (DataFrame, DataFrame) = {
    val path = resolveIndex(spark, path0)
    // excludeIngest: the streaming gate's replay contract — a crashed
    // batch may have appended its own positional rows before the replay,
    // and an arriving doc probing its OWN prior rows would self-match at
    // full length and cut its whole text (the readNearDupIndex rule);
    // the occ deltas exclude the label too, merge-on-read makes it free
    def rd(sub: String) = {
      val d = spark.read.parquet(s"$path/$sub")
      excludeIngest.fold(d)(l => d.filter(col("ingest") =!= l)).drop("ingest")
    }
    (rd("positions"),
      rd("occ").groupBy(col("ng")).agg(sum(col("occ")).as("occ")))
  }

  /** Compact a long-appended near-dup index: rewrite every ingest's
    * rows into a single `ingest=base` at `dst`, reading ONLY the stored
    * index — columnar, index-sized I/O; the corpus text is never
    * re-read and nothing is re-shingled, which is the point of
    * compacting at 100 TB (the alternative, [[writeNearDupIndex]],
    * re-derives the index from text). Results are row-identical by
    * construction: compaction only moves rows between ingest labels,
    * and the probes drop the label on read (equality spec-certified in
    * DedupIndexSpec).
    *
    * Crash safety by destination atomicity: `dst` is deleted first and
    * the manifest is written LAST, so `dst` is either a complete index
    * or visibly unfinished — never a half-merged one double-counting
    * rows (the in-place alternative, deleting source ingest dirs after
    * writing their union alongside them, has exactly that window). The
    * caller owns the `src`→`dst` pointer flip — at scale that's a
    * catalog/metastore location swap, the same contract every
    * rewrite-based table compaction (e.g. snapshot-pointer table
    * formats) uses.
    */
  def compactNearDupTo(spark: SparkSession, src0: String, dst: String): Unit = {
    val src = resolveIndex(spark, src0)
    require(!pathsOverlap(spark, src, dst),
      "compaction rewrites into a NEW, non-overlapping path; an equal or nested src/dst would read and delete the same files")
    delete(spark, dst)
    val (n, k, bands0) = readNearDupMeta(spark, src)
    writeNearDupMeta(spark, dst, n, k, bands0)
    val (sh, bands) = readNearDupIndex(spark, src)
    sh.write.mode("overwrite").parquet(s"$dst/shingles/ingest=$BaseLabel")
    bands.write.mode("overwrite").partitionBy("band")
      .parquet(s"$dst/bands/ingest=$BaseLabel")
    spark.read.parquet(s"$src/manifest").select(col("doc_id"))
      .write.mode("overwrite").parquet(s"$dst/manifest/ingest=$BaseLabel")
  }

  /** Compact a long-appended verbatim index into `dst` — same contract
    * as [[compactNearDupTo]] (index-sized I/O, complete-or-absent dst,
    * caller flips the pointer). The merge-on-read occ deltas COLLAPSE:
    * the reconciled sum ([[readVerbatimIndex]]'s spelling) is written
    * as the single stored table, one row per distinct n-gram, so
    * post-compaction probes skip the per-read reconciliation until
    * appends accumulate again.
    */
  def compactVerbatimTo(spark: SparkSession, src0: String, dst: String): Unit = {
    val src = resolveIndex(spark, src0)
    require(!pathsOverlap(spark, src, dst),
      "compaction rewrites into a NEW, non-overlapping path; an equal or nested src/dst would read and delete the same files")
    delete(spark, dst)
    writeVerbatimMeta(spark, dst, readVerbatimMeta(spark, src))
    val (pos, occ) = readVerbatimIndex(spark, src)
    pos.write.mode("overwrite").parquet(s"$dst/positions/ingest=$BaseLabel")
    occ.write.mode("overwrite").parquet(s"$dst/occ/ingest=$BaseLabel")
    spark.read.parquet(s"$src/manifest").select(col("doc_id"))
      .write.mode("overwrite").parquet(s"$dst/manifest/ingest=$BaseLabel")
  }

  /** Every doc_id any ingest of the index at `path` has claimed,
    * `excludeLabel`'s ingest left out. Ingest maintenance anti-joins
    * its delivery against this (excluding its OWN label) so the delta
    * it writes is stable across failure replays: docs indexed by
    * EARLIER batches drop out, while the current label's own (possibly
    * half-written) claim is ignored — the overwrite re-asserts it.
    * Missing manifest (virgin index) reads as empty.
    */
  def indexedDocIds(spark: SparkSession, path0: String,
                    excludeLabel: Option[String] = None): DataFrame = {
    val path = resolveIndex(spark, path0)
    if (!hasData(spark, s"$path/manifest"))
      spark.range(0).select(col("id").as("doc_id"))
    else {
      val m = spark.read.parquet(s"$path/manifest")
      excludeLabel.fold(m)(l => m.filter(col("ingest") =!= l))
        .select(col("doc_id"))
    }
  }

  private def writeManifest(docs: DataFrame, dir: String): Unit =
    docs.select(col("doc_id")).write.mode("overwrite").parquet(dir)

  // -- config meta: every index pins the shingling parameters it was
  // built with, and appends/probes derive THEIRS from it — a sink
  // attached to an index built at non-default (n, k, bands) can neither
  // probe under a different scheme (silently admitting every near-dup:
  // mismatched band keys never collide) nor mix differently-shingled
  // rows into one index. Same fork-prevention [[SimilarityIndexes]]'
  // meta gives the IVF/LSH families. --

  private def writeNearDupMeta(spark: SparkSession, path: String,
                               n: Int, k: Int, bands: Int): Unit = {
    import spark.implicits._
    Seq((n, k, bands)).toDF("n", "k", "bands")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** The (n, k, bands) a stored near-dup index was built with. */
  def readNearDupMeta(spark: SparkSession, path0: String): (Int, Int, Int) = {
    val path = resolveIndex(spark, path0)
    require(hasData(spark, s"$path/meta"),
      s"index at $path has no meta table pinning its (n, k, bands) — " +
        "rebuild it with writeNearDupIndex to make it probe/append-safe")
    val row = spark.read.parquet(s"$path/meta").head()
    (row.getAs[Int]("n"), row.getAs[Int]("k"), row.getAs[Int]("bands"))
  }

  private def writeVerbatimMeta(spark: SparkSession, path: String, n: Int): Unit = {
    import spark.implicits._
    Seq(n).toDF("n").write.mode("overwrite").parquet(s"$path/meta")
  }

  /** The shingle width `n` a stored verbatim index was built with. */
  def readVerbatimMeta(spark: SparkSession, path0: String): Int = {
    val path = resolveIndex(spark, path0)
    require(hasData(spark, s"$path/meta"),
      s"index at $path has no meta table pinning its shingle width — " +
        "rebuild it with writeVerbatimIndex to make it probe/append-safe")
    spark.read.parquet(s"$path/meta").head().getAs[Int]("n")
  }

  /** Full rebuild that HONORS a surviving meta table: a build that
    * crashed between its meta write and its manifest (meta present,
    * manifest absent) left the operator's intended (n, k, bands) pinned
    * on disk — the streaming sinks' self-heal bootstrap goes through
    * here so that rebuild reproduces the pinned scheme instead of
    * silently reverting a custom-config index to defaults (the config
    * the meta table exists to protect). A truly virgin path (no meta)
    * builds at the defaults.
    */
  def rebuildNearDupIndex(corpus: DataFrame, path0: String): Unit = {
    val spark = corpus.sparkSession
    val path = resolveIndex(spark, path0)
    if (hasData(spark, s"$path/meta")) {
      val (n, k, bands) = readNearDupMeta(spark, path)
      writeNearDupIndex(corpus, path, n, k, bands)
    } else writeNearDupIndex(corpus, path)
  }

  /** [[rebuildNearDupIndex]]'s verbatim-index twin: a surviving meta
    * pins the shingle width the rebuild must reproduce.
    */
  def rebuildVerbatimIndex(corpus: DataFrame, path0: String): Unit = {
    val spark = corpus.sparkSession
    val path = resolveIndex(spark, path0)
    if (hasData(spark, s"$path/meta"))
      writeVerbatimIndex(corpus, path, readVerbatimMeta(spark, path))
    else writeVerbatimIndex(corpus, path)
  }

  /** Compaction's in-place guard: the paths OVERLAP when their
    * filesystem-qualified, normalized spellings are equal OR one is an
    * ancestor of the other — a relative vs absolute spelling, a `..`
    * route, or a dst that CONTAINS the src would each let
    * `delete(dst)` destroy the source before it is read.
    */
  private[graft] def pathsOverlap(spark: SparkSession, a: String, b: String): Boolean = {
    // compare the normalized PATH component: qualified URIs of one
    // directory can differ only in authority spelling (file:/x vs
    // file:///x), and a cross-filesystem false positive merely refuses
    // a compaction harmlessly
    def q(s: String) =
      fs(spark, s).makeQualified(new Path(s)).toUri.normalize().getPath
        .stripSuffix("/")
    val (qa, qb) = (q(a), q(b))
    qa == qb || qa.startsWith(qb + "/") || qb.startsWith(qa + "/")
  }

  // -- driver-query harnesses: same deterministic corpus/batch split as
  // Dedup.incrementalNewDocs, probing the STORED index so the green
  // CORRECTNESS row certifies the parquet round-trip end to end (the
  // oracles are shared with the inline q_dedup_incr_near /
  // q_verbatim_incr queries — identical results is the contract) --

  /** Scratch path for a driver-query harness's fixture index — shared
    * with [[SimilarityIndexes]] so the tag sanitization cannot drift
    * between the families.
    */
  private[graft] def scratch(root: String, kind: String, sfDir: String): String = {
    // stripPrefix: a tag starting with "_" names a directory Spark's
    // path filter treats as HIDDEN (InMemoryFileIndex
    // .shouldFilterOutPathName) — every read of such a scratch dir
    // logged the "All paths were ignored" WARN (3× per query in the
    // bench tail, r13 verdict #2) even though the explicit-path read
    // still succeeded. Leading-separator sfDirs ("/root/...") always
    // produced exactly that.
    val tag = sfDir.replaceAll("[^A-Za-z0-9.]+", "_").stripPrefix("_")
    s"$root/$kind/$tag"
  }

  /** Index build is fixture work (write once at "ingest"), not probe
    * work — memoized per JVM like [[Roundtrip]]'s format bounces so the
    * bench charges queries only for the probe. Shared with
    * [[SimilarityIndexes]]' harnesses.
    *
    * The memo records "done" ONLY after the target verifiably holds at
    * least one data file: a write that silently produced nothing (a
    * crashed job, an empty source frame, a misdirected path) would
    * otherwise pin this JVM to reading an empty fixture for every
    * probe — the bench would then time empty scans and report them as
    * speedups (the r11 `All paths were ignored` artifact class). The
    * check is one recursive listing of a scratch dir, paid once per
    * JVM per fixture, never in a timed rep.
    */
  private val written = scala.collection.concurrent.TrieMap.empty[String, Unit]

  private[graft] def writeOnce(path: String)(write: => Unit): Unit =
    written.getOrElseUpdate(path, {
      write
      if (!hasData(SparkSession.active, path))
        throw new IllegalStateException(
          s"writeOnce at $path completed without producing any data file " +
            "— refusing to memoize an empty fixture")
    })

  /** [[Dedup.incrementalNearDupDocs]] probing the materialized index. */
  def nearDupProbeDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val path = scratch("target/dedup_index", "neardup", sfDir)
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
    val path = scratch("target/dedup_index", "verbatim", sfDir)
    writeOnce(path)(writeVerbatimIndex(docs.filter(col("doc_id") % 10 < 8), path))
    val (pos, occ) = readVerbatimIndex(spark, path)
    Dedup.incrementalVerbatimRunsFromIndex(pos, occ,
      docs.filter(col("doc_id") % 10 >= 8))
  }
}
