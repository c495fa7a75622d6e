package graft

import java.io.File

import graft.engine.GrepEngine
import graft.sources.{DedupIndexes, IndexSql, TextIndexes}
import org.apache.spark.sql.functions._

/** The stored trigram grep index ([[graft.sources.TextIndexes]]) and
  * its probe cores: stored == inline on every mode (the hard contract —
  * trigram candidate pruning must be recall-free with the verify
  * restoring scan semantics exactly), the novel-only append economics,
  * compaction, the generation pointer, and bucket partition pruning.
  */
class TextIndexSpec extends SparkSpec {
  import spark.implicits._
  val sf = TestSpark.sf0001

  private def docs = Tables.documents(spark, sf).select($"doc_id", $"text")

  private def freqSet(df: org.apache.spark.sql.DataFrame): Set[(String, Long)] =
    df.select($"line", $"freq").as[(String, Long)].collect().toSet

  private def buildAt(path: String): (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    TextIndexes.writeGrepIndex(docs, "text", path)
    TextIndexes.readGrepIndex(spark, path)
  }

  test("stored probe equals the inline scan on every mode and edge") {
    val path = "target/text_index_spec/modes"
    val (lines, postings, gramdf) = buildAt(path)
    def stored(p: String, m: GrepEngine.Mode) =
      freqSet(GrepEngine.grepFreqFromIndex(lines, postings, gramdf, p, m))
    def inline(p: String, m: GrepEngine.Mode) =
      freqSet(GrepEngine.grepFreq(docs, "text", p, m))
    // trigram-pruned paths
    val sub = stored("spark", GrepEngine.Substring)
    assert(sub.nonEmpty, "fixture must contain 'spark' lines")
    assert(sub === inline("spark", GrepEngine.Substring),
      "substring probe must equal the scan")
    assert(stored("SPARK", GrepEngine.SubstringIgnoreCase) ===
      inline("SPARK", GrepEngine.SubstringIgnoreCase),
      "one lowercased-trigram index serves the CI mode")
    // regex: distinct-lines scan path (no trigram algebra)
    assert(stored("ve[ck]tor", GrepEngine.Regex) ===
      inline("ve[ck]tor", GrepEngine.Regex),
      "regex probe (distinct-lines scan) must equal the corpus scan")
    // under-3-char pattern: nothing to prune, distinct-lines fallback
    assert(stored("ql", GrepEngine.Substring) ===
      inline("ql", GrepEngine.Substring),
      "short-pattern fallback must equal the scan")
    // a pattern whose trigrams exist nowhere short-circuits to empty
    // without reading postings
    assert(stored("zzqzzqzz", GrepEngine.Substring).isEmpty,
      "absent trigrams must prove emptiness")
    // multi-pattern OR
    assert(freqSet(GrepEngine.multiGrepFromIndex(lines, postings, gramdf,
        Seq("vector", "stream"))) ===
      freqSet(GrepEngine.multiGrep(docs, "text", Seq("vector", "stream"))),
      "multi-pattern OR probe must equal the scan")
    // PARTIAL degradation: a short pattern must not cost the prunable
    // ones their trigram pruning — and the disjoint union must not
    // double-count lines matching both sides
    val mixed = Seq("vector", "ql", "stream")
    assert(freqSet(GrepEngine.multiGrepFromIndex(lines, postings, gramdf, mixed)) ===
      freqSet(GrepEngine.multiGrep(docs, "text", mixed)),
      "mixed short+prunable pattern set: stored must equal the scan")
    // an impossible pattern (absent trigrams) drops out without
    // disturbing the others
    val withImpossible = Seq("vector", "zzqzzqzz", "ql")
    assert(freqSet(GrepEngine.multiGrepFromIndex(lines, postings, gramdf,
        withImpossible)) ===
      freqSet(GrepEngine.multiGrep(docs, "text", withImpossible)),
      "an impossible pattern must not perturb the rest of the probe")
    assert(freqSet(GrepEngine.multiGrepFromIndex(lines, postings, gramdf,
        Seq("zzqzzqzz", "qqzyx"))).isEmpty,
      "all-impossible multi probe must be provably empty")
    // multi CI mode rides the same lowercased index
    assert(freqSet(GrepEngine.multiGrepFromIndex(lines, postings, gramdf,
        Seq("VECTOR", "ql"), GrepEngine.SubstringIgnoreCase)) ===
      freqSet(GrepEngine.multiGrep(docs, "text", Seq("VECTOR", "ql"),
        GrepEngine.SubstringIgnoreCase)),
      "multi CI probe must equal the CI scan")
    // whole-word mode: trigram pruning stays recall-free (word match
    // implies substring containment), the verify restores -w semantics;
    // a trigram-less word pattern rides the distinct-lines fallback
    assert(stored("spark", GrepEngine.WholeWord) ===
      inline("spark", GrepEngine.WholeWord),
      "word-mode probe (trigram-pruned) must equal the -w scan")
    assert(stored("a", GrepEngine.WholeWord) ===
      inline("a", GrepEngine.WholeWord),
      "short word pattern (distinct-lines fallback) must equal the -w scan")
    // top-k rides the probe with the same deterministic tie-break
    assert(GrepEngine.grepTopKFromIndex(lines, postings, gramdf, "spark", 10)
        .as[(String, Long)].collect().toSeq ===
      GrepEngine.grepTopK(docs, "text", "spark", 10)
        .as[(String, Long)].collect().toSeq,
      "stored top-k must equal the scan top-k, order included")
    spark.catalog.clearCache()
  }

  test("substring-inside-a-token matches: trigram candidates are not word-bound") {
    // 'spark' hiding inside a longer token and beside punctuation — the
    // case a TOKEN (word) index would miss and the trigram index must not
    val tricky = Seq(
      (1L, "asparkle of dust"), (2L, "asparkle of dust"),
      (3L, "end with spark."), (4L, "no match here"))
      .toDF("doc_id", "text")
    val path = "target/text_index_spec/tricky"
    TextIndexes.writeGrepIndex(tricky, "text", path)
    val (lines, postings, gramdf) = TextIndexes.readGrepIndex(spark, path)
    val got = freqSet(GrepEngine.grepFreqFromIndex(lines, postings, gramdf, "spark"))
    assert(got === Set(("asparkle of dust", 2L), ("end with spark.", 1L)),
      "substring semantics must survive the index (incl. the freq of a duplicated line)")
  }

  test("append: freq deltas for known lines, postings only for novel ones; replay-idempotent") {
    val base = docs.filter($"doc_id" % 10 < 8)
    val batch = docs.filter($"doc_id" % 10 >= 8)
      // re-deliver some KNOWN content alongside the novel docs: the
      // known lines must increment freq without growing the postings
      .union(base.filter($"doc_id" % 10 === 0))
    val path = "target/text_index_spec/append"
    TextIndexes.writeGrepIndex(base, "text", path)
    val postingsBefore = spark.read.parquet(s"$path/postings").count()
    TextIndexes.appendGrep(batch, "text", path, "b1")
    val postingsAfter = spark.read.parquet(s"$path/postings").count()
    // novel-only discipline: postings grew by exactly the batch's novel
    // distinct lines' trigram rows — compare against a fresh full build
    val full = "target/text_index_spec/append_full"
    TextIndexes.writeGrepIndex(base.union(batch), "text", full)
    assert(postingsAfter === spark.read.parquet(s"$full/postings").count(),
      "appended postings must match a fresh full build's (novel-only, no dupes)")
    // the probe agrees with the fresh full build (freq deltas reconcile)
    val (l1, p1, g1) = TextIndexes.readGrepIndex(spark, path)
    val (l2, p2, g2) = TextIndexes.readGrepIndex(spark, full)
    val probeAppended = freqSet(GrepEngine.grepFreqFromIndex(l1, p1, g1, "spark"))
    assert(probeAppended ===
      freqSet(GrepEngine.grepFreqFromIndex(l2, p2, g2, "spark")),
      "post-append probe must equal a fresh full build's")
    // replay: same label, same batch — nothing changes
    TextIndexes.appendGrep(batch, "text", path, "b1")
    val (l3, p3, g3) = TextIndexes.readGrepIndex(spark, path)
    assert(spark.read.parquet(s"$path/postings").count() === postingsAfter,
      "a replayed append must not duplicate postings")
    assert(freqSet(GrepEngine.grepFreqFromIndex(l3, p3, g3, "spark")) ===
      probeAppended, "a replayed append must not change the probe")
    spark.catalog.clearCache()
  }

  test("compaction: one base ingest, probe-identical, gramdf one row per gram") {
    val base = docs.filter($"doc_id" % 10 < 8)
    val batch = docs.filter($"doc_id" % 10 >= 8)
    val src = "target/text_index_spec/compact_src"
    val dst = "target/text_index_spec/compact_dst"
    TextIndexes.writeGrepIndex(base, "text", src)
    TextIndexes.appendGrep(batch, "text", src, "b1")
    val (l1, p1, g1) = TextIndexes.readGrepIndex(spark, src)
    val before = freqSet(GrepEngine.grepFreqFromIndex(l1, p1, g1, "spark"))
    TextIndexes.compactGrepTo(spark, src, dst)
    val ingests = spark.read.parquet(s"$dst/lines")
      .select($"ingest").distinct().as[String].collect().toSeq
    assert(ingests === Seq(DedupIndexes.BaseLabel),
      "compaction must collapse to the single base ingest")
    val gdRaw = spark.read.parquet(s"$dst/gramdf")
    assert(gdRaw.count() === gdRaw.select($"gram").distinct().count(),
      "compacted gramdf must hold one row per gram")
    val (l2, p2, g2) = TextIndexes.readGrepIndex(spark, dst)
    assert(freqSet(GrepEngine.grepFreqFromIndex(l2, p2, g2, "spark")) === before,
      "compacted probe must equal the appended probe")
    // overlap guard fires before any delete
    intercept[IllegalArgumentException](
      TextIndexes.compactGrepTo(spark, src, src))
    spark.catalog.clearCache()
  }

  test("generation pointer: root-addressed probes and appends follow the flip") {
    val root = "target/text_index_spec/pointered"
    def rm(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new File(root))
    TextIndexes.writeGrepIndex(docs.filter($"doc_id" % 10 < 8), "text", s"$root/gen-0")
    DedupIndexes.flipPointer(spark, root, "gen-0")
    TextIndexes.appendGrep(docs.filter($"doc_id" % 10 >= 8), "text", root, "b1")
    assert(new File(s"$root/gen-0/lines/ingest=b1").exists(),
      "root-addressed append must land in the pointed generation")
    val (l1, p1, g1) = TextIndexes.readGrepIndex(spark, root)
    val before = freqSet(GrepEngine.grepFreqFromIndex(l1, p1, g1, "spark"))
    TextIndexes.compactGrepTo(spark, root, s"$root/gen-1")
    assert(DedupIndexes.resolveIndex(spark, root) === s"$root/gen-0",
      "the root serves gen-0 until the flip")
    DedupIndexes.flipPointer(spark, root, "gen-1")
    val (l2, p2, g2) = TextIndexes.readGrepIndex(spark, root)
    assert(freqSet(GrepEngine.grepFreqFromIndex(l2, p2, g2, "spark")) === before,
      "the flipped-to generation serves the same grep results")
    spark.catalog.clearCache()
  }

  test("a probe's postings scan prunes to the chosen trigrams' bucket partitions") {
    val path = "target/text_index_spec/modes"
    TextIndexes.writeGrepIndex(docs, "text", path)
    val (_, postings, gramdf) = TextIndexes.readGrepIndex(spark, path)
    // the probe's pruning values, read the way the probe core reads
    // them: from the gramdf table's stored bucket column
    val buckets = gramdf.filter($"gram".isin("spa", "par", "ark"))
      .select($"bucket").collect().map(_.getInt(0)).distinct
    val probe = postings.filter($"bucket".isin(buckets.toSeq: _*))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), s"plan:\n$plan")
    val scan = probe.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    val files = scan.selectedPartitions.toPartitionArray.map(_.filePath.toString)
    assert(files.nonEmpty, "the probed buckets must hold data")
    assert(files.forall(f => buckets.exists(b => f.contains(s"/bucket=$b/"))),
      s"scan must touch only the probed buckets, got ${files.take(3).mkString(",")}")
  }

  test("SQL front door: the grep view equals the Scala probe") {
    val path = "target/text_index_spec/modes"
    TextIndexes.writeGrepIndex(docs, "text", path)
    IndexSql.registerGrepProbe(spark, "textidx_grep", path, "spark")
    val (lines, postings, gramdf) = TextIndexes.readGrepIndex(spark, path)
    assert(freqSet(spark.sql("SELECT * FROM textidx_grep")) ===
      freqSet(GrepEngine.grepFreqFromIndex(lines, postings, gramdf, "spark")),
      "spark.sql over the registered view must equal the Scala spelling")
    intercept[IllegalArgumentException](
      IndexSql.registerGrepProbe(spark, "textidx_bad", path, "x", "bogus"))
  }
}
