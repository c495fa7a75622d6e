package graft

import java.io.File

import graft.operators.Dedup
import graft.sources.DedupIndexes
import org.apache.spark.sql.functions.{col, count, lit}

class DedupIndexSpec extends SparkSpec {
  import spark.implicits._
  val sf = TestSpark.sf0001

  private def docs = Tables.documents(spark, sf).select($"doc_id", $"text")
  private def corpus = docs.filter($"doc_id" % 10 < 8)
  private def batch = docs.filter($"doc_id" % 10 >= 8)

  test("stored near-dup index probe equals the inline derivation") {
    val path = "target/dedup_index_spec/neardup"
    DedupIndexes.writeNearDupIndex(corpus, path)
    val (sh, idx) = DedupIndexes.readNearDupIndex(spark, path)
    val stored = Dedup.incrementalNearDupFromIndex(sh, idx, batch)
      .as[(Long, Option[Long], Long, Long)].collect().toSet
    val inline = Dedup.incrementalNearDup(corpus, batch)
      .as[(Long, Option[Long], Long, Long)].collect().toSet
    spark.catalog.clearCache()
    assert(stored.nonEmpty, "fixture batch must produce verdicts")
    assert(stored === inline,
      "probing the parquet-materialized index must equal deriving it inline")
  }

  test("near-dup band index lands partitioned by band on disk") {
    val path = "target/dedup_index_spec/neardup"
    DedupIndexes.writeNearDupIndex(corpus, path)
    val dirs = new File(s"$path/bands/ingest=${DedupIndexes.BaseLabel}").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("band=")).sorted
    assert(dirs.length === Dedup.MinHashBands,
      s"expected ${Dedup.MinHashBands} band= partition dirs, got ${dirs.mkString(",")}")
  }

  test("a band-restricted probe of the stored band index prunes to 1/bands of the files") {
    val path = "target/dedup_index_spec/neardup"
    DedupIndexes.writeNearDupIndex(corpus, path)
    val oneBand = spark.read.parquet(s"$path/bands").filter(col("band") === "3")
    // the band predicate must land in PartitionFilters (file-level
    // elision at planning time), not a post-scan Filter
    val plan = oneBand.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), s"plan:\n$plan")
    assert(plan.replaceAll("#\\d+", "").contains("(band = 3)"),
      s"band predicate must reach partition pruning, plan:\n$plan")
    // and the actually-scanned files are exactly the band=3 directory
    val scan = oneBand.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    val files = scan.selectedPartitions.toPartitionArray
      .map(_.filePath.toString)
    assert(files.nonEmpty, "band 3 must hold data")
    assert(files.forall(_.contains("/band=3/")),
      s"scan must touch only band=3 files, got ${files.take(3).mkString(",")}")
  }

  test("appending a batch yields a near-dup index equal to a fresh full build") {
    val appended = "target/dedup_index_spec/neardup_append"
    val fresh = "target/dedup_index_spec/neardup_fresh"
    DedupIndexes.writeNearDupIndex(corpus, appended)
    DedupIndexes.appendNearDup(batch, appended, "b1")
    DedupIndexes.writeNearDupIndex(corpus.union(batch), fresh)
    val (shA, idxA) = DedupIndexes.readNearDupIndex(spark, appended)
    val (shF, idxF) = DedupIndexes.readNearDupIndex(spark, fresh)
    assert(shA.as[(Long, Seq[String], Int)].collect().toSet ===
      shF.as[(Long, Seq[String], Int)].collect().toSet,
      "appended shingle frame must equal the full rebuild's")
    assert(idxA.as[(Long, Long, Int)].collect().toSet ===
      idxF.as[(Long, Long, Int)].collect().toSet,
      "appended band index must equal the full rebuild's")
    // a REPLAYED append (same label) overwrites its own ingest rather
    // than duplicating rows — exactly-once by directory ownership
    DedupIndexes.appendNearDup(batch, appended, "b1")
    val (shR, _) = DedupIndexes.readNearDupIndex(spark, appended)
    assert(shR.count() === shF.count(), "replayed append must not duplicate index rows")
  }

  test("appending a batch yields a verbatim index equal to a fresh full build") {
    val appended = "target/dedup_index_spec/verbatim_append"
    val fresh = "target/dedup_index_spec/verbatim_fresh"
    DedupIndexes.writeVerbatimIndex(corpus, appended)
    DedupIndexes.appendVerbatim(batch, appended, "b1")
    DedupIndexes.writeVerbatimIndex(corpus.union(batch), fresh)
    val (posA, occA) = DedupIndexes.readVerbatimIndex(spark, appended)
    val (posF, occF) = DedupIndexes.readVerbatimIndex(spark, fresh)
    assert(posA.as[(Long, Int, String)].collect().toSet ===
      posF.as[(Long, Int, String)].collect().toSet,
      "appended positional index must equal the full rebuild's")
    assert(occA.as[(String, Long)].collect().toMap ===
      occF.as[(String, Long)].collect().toMap,
      "merge-on-read occ reconciliation must equal the rebuilt occ table")
    // replayed append: merge-on-read must NOT double-count the delta
    DedupIndexes.appendVerbatim(batch, appended, "b1")
    val (_, occR) = DedupIndexes.readVerbatimIndex(spark, appended)
    assert(occR.as[(String, Long)].collect().toMap ===
      occF.as[(String, Long)].collect().toMap,
      "own-label overwrite keeps occ deltas exactly-once")
  }

  test("manifest tracks indexed docs across ingests; exclusion skips one label") {
    val path = "target/dedup_index_spec/manifest"
    DedupIndexes.writeNearDupIndex(corpus, path)
    DedupIndexes.appendNearDup(batch, path, "b7")
    val all = DedupIndexes.indexedDocIds(spark, path).as[Long].collect().toSet
    val expected = corpus.union(batch).select($"doc_id").as[Long].collect().toSet
    assert(all === expected,
      "manifest must claim every ingested doc — including shingle-free ones")
    val without = DedupIndexes.indexedDocIds(spark, path, Some("b7"))
      .as[Long].collect().toSet
    assert(without === corpus.select($"doc_id").as[Long].collect().toSet,
      "excluding a label must hide exactly that ingest's claims")
  }

  test("compaction merges a multi-ingest near-dup index from the index alone") {
    val src = "target/dedup_index_spec/neardup_compact_src"
    val dst = "target/dedup_index_spec/neardup_compact_dst"
    val half = corpus.filter($"doc_id" % 2 === 0)
    val rest = corpus.filter($"doc_id" % 2 === 1)
    DedupIndexes.writeNearDupIndex(half, src)
    DedupIndexes.appendNearDup(rest, src, "b1")
    DedupIndexes.compactNearDupTo(spark, src, dst)
    // every component collapses to the single base ingest, and the
    // band partitioning (the probe's file-pruning lever) is preserved
    for (comp <- Seq("shingles", "bands", "manifest")) {
      val ingests = new File(s"$dst/$comp").listFiles()
        .filter(_.isDirectory).map(_.getName).toSeq
      assert(ingests === Seq(s"ingest=${DedupIndexes.BaseLabel}"),
        s"$comp must hold exactly the compacted base ingest, got $ingests")
    }
    val bandDirs = new File(s"$dst/bands/ingest=${DedupIndexes.BaseLabel}")
      .listFiles().filter(_.isDirectory).map(_.getName).filter(_.startsWith("band="))
    assert(bandDirs.length === Dedup.MinHashBands,
      "compaction must preserve the band partitioning")
    // probes and the manifest cannot tell src and dst apart
    val (shS, idxS) = DedupIndexes.readNearDupIndex(spark, src)
    val (shD, idxD) = DedupIndexes.readNearDupIndex(spark, dst)
    val probeS = Dedup.incrementalNearDupFromIndex(shS, idxS, batch)
      .as[(Long, Option[Long], Long, Long)].collect().toSet
    val probeD = Dedup.incrementalNearDupFromIndex(shD, idxD, batch)
      .as[(Long, Option[Long], Long, Long)].collect().toSet
    spark.catalog.clearCache()
    assert(probeS.nonEmpty, "fixture batch must produce verdicts")
    assert(probeD === probeS,
      "probing the compacted index must equal probing the appended one")
    assert(DedupIndexes.indexedDocIds(spark, dst).as[Long].collect().toSet ===
      DedupIndexes.indexedDocIds(spark, src).as[Long].collect().toSet,
      "compaction must carry every manifest claim over")
    // in-place compaction would read and delete the same files — refused
    intercept[IllegalArgumentException](
      DedupIndexes.compactNearDupTo(spark, src, src))
  }

  test("compaction collapses verbatim occ deltas to one stored row per n-gram") {
    val src = "target/dedup_index_spec/verbatim_compact_src"
    val dst = "target/dedup_index_spec/verbatim_compact_dst"
    val half = corpus.filter($"doc_id" % 2 === 0)
    val rest = corpus.filter($"doc_id" % 2 === 1)
    DedupIndexes.writeVerbatimIndex(half, src)
    DedupIndexes.appendVerbatim(rest, src, "b1")
    DedupIndexes.compactVerbatimTo(spark, src, dst)
    // the stored occ table is the RECONCILED sum after compaction: one
    // ingest, one row per distinct n-gram — probes skip the
    // merge-on-read work until appends accumulate again
    val rawOcc = spark.read.parquet(s"$dst/occ")
    assert(rawOcc.select($"ingest").distinct().as[String].collect().toSeq ===
      Seq(DedupIndexes.BaseLabel))
    assert(rawOcc.count() === rawOcc.select($"ng").distinct().count(),
      "occ deltas must merge to exactly one stored row per n-gram")
    val (posS, occS) = DedupIndexes.readVerbatimIndex(spark, src)
    val (posD, occD) = DedupIndexes.readVerbatimIndex(spark, dst)
    assert(occD.as[(String, Long)].collect().toMap ===
      occS.as[(String, Long)].collect().toMap,
      "compacted occ table must equal the merge-on-read reconciliation")
    val probeS = Dedup.incrementalVerbatimRunsFromIndex(posS, occS, batch,
        minRunTokens = 3).as[(Long, Long, Long)].collect().toSet
    val probeD = Dedup.incrementalVerbatimRunsFromIndex(posD, occD, batch,
        minRunTokens = 3).as[(Long, Long, Long)].collect().toSet
    spark.catalog.clearCache()
    assert(probeS.nonEmpty, "fixture batch must share spans with the corpus")
    assert(probeD === probeS,
      "probing the compacted index must equal probing the appended one")
  }

  test("hasData sees through _temporary-only wreckage; a real nested data file flips it") {
    def rm(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    val root = new File("target/dedup_index_spec/hasdata")
    rm(root)
    // a crash mid-first-write leaves only _temporary below the label dir
    val tmp = new File(root, "shingles/ingest=b0/_temporary/0")
    assert(tmp.mkdirs())
    assert(new File(tmp, "part-000").createNewFile())
    assert(!DedupIndexes.hasData(spark, s"${root.getPath}/shingles"),
      "_temporary-only wreckage must read as NO data — an existence check " +
        "here wedges every replay on an unreadable parquet path")
    // hidden top-level markers don't count either
    assert(new File(root, "shingles/ingest=b0/_SUCCESS").createNewFile())
    assert(!DedupIndexes.hasData(spark, s"${root.getPath}/shingles"))
    // one committed data file below the label flips it
    assert(new File(root, "shingles/ingest=b0/part-0000.parquet").createNewFile())
    assert(DedupIndexes.hasData(spark, s"${root.getPath}/shingles"))
  }

  test("appends derive the index's stored (n, k, bands) — configs cannot fork") {
    val path = "target/dedup_index_spec/neardup_custom"
    val fresh = "target/dedup_index_spec/neardup_custom_fresh"
    DedupIndexes.writeNearDupIndex(corpus, path, n = 4, k = 32, bands = 8)
    assert(DedupIndexes.readNearDupMeta(spark, path) === ((4, 32, 8)))
    // the append takes NO config — it must pick up (4, 32, 8) from meta
    DedupIndexes.appendNearDup(batch, path, "b1")
    DedupIndexes.writeNearDupIndex(corpus.union(batch), fresh, n = 4, k = 32, bands = 8)
    val (shA, idxA) = DedupIndexes.readNearDupIndex(spark, path)
    val (shF, idxF) = DedupIndexes.readNearDupIndex(spark, fresh)
    assert(shA.as[(Long, Seq[String], Int)].collect().toSet ===
      shF.as[(Long, Seq[String], Int)].collect().toSet,
      "meta-derived append must equal a full rebuild at the same custom config")
    assert(idxA.as[(Long, Long, Int)].collect().toSet ===
      idxF.as[(Long, Long, Int)].collect().toSet)
    val bandDirs = new File(s"$path/bands/ingest=b1").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("band="))
    assert(bandDirs.length === 8,
      "appended band fanout must follow the stored config, not the default")
    // compaction carries the config over
    val dst = "target/dedup_index_spec/neardup_custom_compact"
    DedupIndexes.compactNearDupTo(spark, path, dst)
    assert(DedupIndexes.readNearDupMeta(spark, dst) === ((4, 32, 8)))
  }

  test("compact-in-place is refused across path spellings of one directory") {
    val path = "target/dedup_index_spec/guard"
    DedupIndexes.writeNearDupIndex(corpus, path)
    // every refusal must fire BEFORE delete(dst) — assert survival
    // after each one, since a post-delete failure would also throw
    def refused(src: String, dst: String): Unit = {
      intercept[IllegalArgumentException](
        DedupIndexes.compactNearDupTo(spark, src, dst))
      assert(DedupIndexes.hasData(spark, s"$path/shingles"),
        s"guard for src=$src dst=$dst must refuse before touching disk")
    }
    refused(path, new File(path).getAbsolutePath)
    refused(path, "target/dedup_index_spec/../dedup_index_spec/guard")
    // nesting in either direction would also delete-before-read
    refused(path, s"$path/nested")
    refused(s"$path/shingles", path)
  }

  test("stored verbatim index probe equals the inline derivation") {
    val path = "target/dedup_index_spec/verbatim"
    DedupIndexes.writeVerbatimIndex(corpus, path)
    val (pos, occ) = DedupIndexes.readVerbatimIndex(spark, path)
    // minRunTokens = n: report EVERY shared span, so the equality is
    // exercised on a non-trivial result set at sf0.001
    val stored = Dedup.incrementalVerbatimRunsFromIndex(pos, occ, batch,
        minRunTokens = 3).as[(Long, Long, Long)].collect().toSet
    val inline = Dedup.incrementalVerbatimRuns(corpus, batch,
        minRunTokens = 3).as[(Long, Long, Long)].collect().toSet
    spark.catalog.clearCache()
    assert(stored.nonEmpty, "fixture batch must share spans with the corpus")
    assert(stored === inline,
      "probing the parquet-materialized index must equal deriving it inline")
  }

  private def rmTree(f: File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmTree)
    f.delete(); ()
  }

  test("an index build refuses a target that would delete its own input") {
    val dataDir = "target/dedup_index_spec/selfguard/data"
    corpus.write.mode("overwrite").parquet(dataDir)
    val stored = spark.read.parquet(dataDir)
    // target == the input dir
    intercept[IllegalArgumentException](
      DedupIndexes.writeNearDupIndex(stored, dataDir))
    // target CONTAINS the input dir — the misconfigured-sink spelling
    // (indexDir above corpusDir) the r9 advice flagged
    intercept[IllegalArgumentException](
      DedupIndexes.writeNearDupIndex(stored, "target/dedup_index_spec/selfguard"))
    // relative-vs-absolute spellings of the same dir must not slip by
    intercept[IllegalArgumentException](
      DedupIndexes.writeVerbatimIndex(stored, new File(dataDir).getAbsolutePath))
    assert(spark.read.parquet(dataDir).count() === corpus.count(),
      "every refusal must fire BEFORE the destructive delete")
    // a disjoint sibling target still builds
    DedupIndexes.writeNearDupIndex(stored, "target/dedup_index_spec/selfguard_ok")
    assert(DedupIndexes.hasData(spark, "target/dedup_index_spec/selfguard_ok/manifest"))
  }

  test("self-heal rebuild honors a crashed build's pinned config (meta present, manifest absent)") {
    val path = "target/dedup_index_spec/rebuild_meta"
    DedupIndexes.writeNearDupIndex(corpus, path, n = 4, k = 32, bands = 8)
    // the crash window the advice named: meta lands first, manifest last
    rmTree(new File(s"$path/manifest"))
    assert(!DedupIndexes.hasCompleteIndex(spark, path))
    DedupIndexes.rebuildNearDupIndex(corpus, path)
    assert(DedupIndexes.readNearDupMeta(spark, path) === ((4, 32, 8)),
      "the rebuild must reproduce the pinned scheme, not revert to defaults")
    assert(DedupIndexes.hasCompleteIndex(spark, path))
    val bandDirs = new File(s"$path/bands/ingest=${DedupIndexes.BaseLabel}")
      .listFiles().filter(_.isDirectory).map(_.getName).filter(_.startsWith("band="))
    assert(bandDirs.length === 8, "rebuilt band fanout must follow the pinned config")
    // verbatim twin honors its pinned shingle width the same way
    val vp = "target/dedup_index_spec/rebuild_meta_v"
    DedupIndexes.writeVerbatimIndex(corpus, vp, n = 5)
    rmTree(new File(s"$vp/manifest"))
    DedupIndexes.rebuildVerbatimIndex(corpus, vp)
    assert(DedupIndexes.readVerbatimMeta(spark, vp) === 5)
    // a truly virgin path (no meta) rebuilds at the defaults
    val virgin = "target/dedup_index_spec/rebuild_virgin"
    rmTree(new File(virgin))
    DedupIndexes.rebuildVerbatimIndex(corpus, virgin)
    assert(DedupIndexes.readVerbatimMeta(spark, virgin) === Dedup.ShingleN)
  }

  test("generation pointer: probes follow the flip; an incomplete dst can never be pointed at") {
    val root = "target/dedup_index_spec/pointered"
    rmTree(new File(root))
    DedupIndexes.writeNearDupIndex(corpus, s"$root/gen-0")
    // no pointer yet: the root resolves to itself (flat layout intact)
    assert(DedupIndexes.resolveIndex(spark, root) === root)
    DedupIndexes.flipPointer(spark, root, "gen-0")
    assert(DedupIndexes.resolveIndex(spark, root) === s"$root/gen-0")
    assert(DedupIndexes.hasCompleteIndex(spark, root))
    // reads AND appends addressed at the root land in the live generation
    DedupIndexes.appendNearDup(batch, root, "b1")
    assert(new File(s"$root/gen-0/shingles/ingest=b1").exists(),
      "an append addressed at the root must land in the pointed generation")
    val shinglesBefore = DedupIndexes.readNearDupIndex(spark, root)._1
      .as[(Long, Seq[String], Int)].collect().toSet
    // compact the pointered root into gen-1: until the FLIP, the root
    // keeps serving the appended gen-0 (old index serves until a
    // complete new one exists)
    DedupIndexes.compactNearDupTo(spark, root, s"$root/gen-1")
    assert(DedupIndexes.resolveIndex(spark, root) === s"$root/gen-0",
      "compaction alone must not move the pointer")
    DedupIndexes.flipPointer(spark, root, "gen-1")
    assert(DedupIndexes.resolveIndex(spark, root) === s"$root/gen-1")
    val shinglesAfter = DedupIndexes.readNearDupIndex(spark, root)._1
      .as[(Long, Seq[String], Int)].collect().toSet
    assert(shinglesAfter === shinglesBefore,
      "the flipped-to compacted generation serves the same index")
    assert(spark.read.parquet(s"$root/gen-1/shingles")
      .select($"ingest").distinct().as[String].collect().toSeq ===
      Seq(DedupIndexes.BaseLabel),
      "the root now serves the single-ingest compacted generation")
    // an interrupted compaction leaves no manifest — the flip refuses
    // and the pointer stays where it was
    DedupIndexes.compactNearDupTo(spark, root, s"$root/gen-2")
    rmTree(new File(s"$root/gen-2/manifest"))
    intercept[IllegalArgumentException](
      DedupIndexes.flipPointer(spark, root, "gen-2"))
    assert(DedupIndexes.resolveIndex(spark, root) === s"$root/gen-1",
      "a refused flip must leave the pointer untouched")
  }

  test("SQL front door: registered probe views equal the Scala stored-probe spellings") {
    val path = "target/dedup_index_spec/sqlfront"
    DedupIndexes.writeNearDupIndex(corpus, path)
    batch.createOrReplaceTempView("sqlfront_batch")
    graft.sources.IndexSql.registerNearDupProbe(spark, "sqlfront_neardup",
      path, "sqlfront_batch")
    val viaSql = spark.sql("SELECT * FROM sqlfront_neardup")
      .as[(Long, Option[Long], Long, Long)].collect().toSet
    val (sh, idx) = DedupIndexes.readNearDupIndex(spark, path)
    val viaScala = Dedup.incrementalNearDupFromIndex(sh, idx, batch)
      .as[(Long, Option[Long], Long, Long)].collect().toSet
    spark.catalog.clearCache()
    assert(viaSql.nonEmpty && viaSql === viaScala,
      "a spark.sql user must see exactly the Scala probe's verdicts")
    val vp = "target/dedup_index_spec/sqlfront_v"
    DedupIndexes.writeVerbatimIndex(corpus, vp)
    graft.sources.IndexSql.registerVerbatimProbe(spark, "sqlfront_verbatim",
      vp, "sqlfront_batch", minRunTokens = 3)
    val sqlV = spark.sql("SELECT * FROM sqlfront_verbatim")
      .as[(Long, Long, Long)].collect().toSet
    val (pos, occ) = DedupIndexes.readVerbatimIndex(spark, vp)
    val scalaV = Dedup.incrementalVerbatimRunsFromIndex(pos, occ, batch,
        minRunTokens = 3).as[(Long, Long, Long)].collect().toSet
    spark.catalog.clearCache()
    assert(sqlV.nonEmpty && sqlV === scalaV,
      "the verbatim view must equal the Scala probe at the same params")
  }

  test("writeOnce refuses to memoize a write that produced no data file") {
    // the empty-fixture red path (r12 verdict, measurement-integrity
    // class #3): a "write" that silently lands nothing must throw, NOT
    // record the path as done — otherwise every later probe of this JVM
    // reads an empty fixture and the bench times empty scans
    val dir = s"target/dedup_index_spec/write_once_empty_${System.nanoTime()}"
    val e = intercept[IllegalStateException] {
      DedupIndexes.writeOnce(dir) { () } // produces nothing
    }
    assert(e.getMessage.contains("without producing any data file"))
    // NOT memoized: a later real write through the same memo goes ahead
    // and verifies green
    DedupIndexes.writeOnce(dir)(
      spark.range(3).toDF("id").write.mode("overwrite").parquet(dir))
    assert(DedupIndexes.hasData(spark, dir),
      "a real write after the refused empty one must land and memoize")
  }

  test("stored occurrence table equals a fresh aggregation of the stored positions") {
    val path = "target/dedup_index_spec/verbatim"
    DedupIndexes.writeVerbatimIndex(corpus, path)
    val (pos, occ) = DedupIndexes.readVerbatimIndex(spark, path)
    val fresh = pos.groupBy($"ng").agg(count(lit(1)).as("occ"))
    assert(occ.as[(String, Long)].collect().toMap ===
      fresh.as[(String, Long)].collect().toMap,
      "materialized occ table must stay consistent with its index")
  }
}
