package graft

import graft.operators.TextAnalysis
import graft.sources.SearchIndexes
import org.apache.spark.sql.DataFrame

/** Stored BM25 postings (q_search_bm25_idx): the driver hash-checks
  * the probe against the inline oracle; this suite pins the postings
  * mechanics — scan == probe score identity, novel-only first-write-
  * wins, replay idempotence, bucket pruning reaching the scan, and
  * SQL parity.
  */
class SearchIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    s"target/test_search_idx/$tag-${java.util.UUID.randomUUID().toString.take(8)}"

  private def fixture: DataFrame = Seq(
    (1L, "a b c a"),
    (2L, "a b x y z x y z"),
    (3L, "a a a a a a a b"),
    (4L, "c d e"),
    (5L, "b b a c")).toDF("doc_id", "text")

  private def ranked(df: DataFrame): Seq[(Long, Long)] =
    df.as[(Long, Long)].collect().toSeq

  test("build + append probe equals the inline scan ranking") {
    val path = tmp("parity")
    SearchIndexes.writeSearchIndex(fixture.filter($"doc_id" <= 3), path)
    SearchIndexes.appendSearch(fixture.filter($"doc_id" > 3), path, "d1")
    val probe = ranked(SearchIndexes.searchBm25FromIndex(
      spark, path, Seq("a", "b"), 10))
    val inline = ranked(TextAnalysis.searchBm25On(fixture, Seq("a", "b"), 10))
    assert(probe === inline,
      "stored postings must rank exactly like the corpus scan")
  }

  test("novel-only postings: a re-delivered doc keeps its first write") {
    val path = tmp("novel")
    SearchIndexes.writeSearchIndex(fixture, path)
    val before = ranked(SearchIndexes.searchBm25FromIndex(
      spark, path, Seq("a", "b"), 10))
    // doc 1 re-arrives TAMPERED (a×50): the manifest anti-join must
    // drop it — re-ranking under a fitted corpus is a rebuild decision
    SearchIndexes.appendSearch(
      Seq((1L, ("a " * 50).trim)).toDF("doc_id", "text"), path, "d1")
    assert(ranked(SearchIndexes.searchBm25FromIndex(
      spark, path, Seq("a", "b"), 10)) === before)
  }

  test("append replay is idempotent by label ownership") {
    val path = tmp("replay")
    SearchIndexes.writeSearchIndex(fixture.filter($"doc_id" <= 3), path)
    val delta = fixture.filter($"doc_id" > 3)
    SearchIndexes.appendSearch(delta, path, "d1")
    val once = ranked(SearchIndexes.searchBm25FromIndex(
      spark, path, Seq("a", "c"), 10))
    SearchIndexes.appendSearch(delta, path, "d1") // failure replay
    assert(ranked(SearchIndexes.searchBm25FromIndex(
      spark, path, Seq("a", "c"), 10)) === once)
    assert(spark.read.parquet(s"$path/doclen").count() === 5L,
      "replay must rewrite its label, not duplicate doc lengths")
  }

  test("the probe prunes postings partitions to the query terms' buckets") {
    val path = tmp("prune")
    SearchIndexes.writeSearchIndex(fixture, path)
    val (tf, _) = SearchIndexes.readForTerms(spark, path, Seq("a"))
    val scan = tf.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("FileScan parquet")).mkString("\n")
    assert(scan.contains("PartitionFilters") && scan.contains("bucket"),
      s"bucket partition filter must reach the postings scan:\n$scan")
    // and pruning loses nothing: the pruned tf equals a term filter
    // over the unpruned postings
    val full = spark.read.parquet(s"$path/postings")
      .filter($"term" === "a").select("doc_id", "term", "tf")
      .as[(Long, String, Long)].collect().toSet
    assert(tf.as[(Long, String, Long)].collect().toSet === full)
  }

  test("positional phrase probe equals the scan spelling across append + compaction") {
    val path = tmp("phrase")
    SearchIndexes.writeSearchIndex(fixture.filter($"doc_id" <= 3), path)
    SearchIndexes.appendSearch(fixture.filter($"doc_id" > 3), path, "d1")
    def scanP(phrase: Seq[String]) = ranked(
      TextAnalysis.searchPhraseOn(fixture, phrase, 10))
    def probeP(at: String, phrase: Seq[String]) = ranked(
      SearchIndexes.searchPhraseFromIndex(spark, at, phrase, 10))
    // "a b": doc 1 "a b c a" -> 1; doc 2 "a b ..." -> 1; doc 5 "b b a c" -> 0;
    // doc 3 "a a a a a a a b" -> 1 — the probe must agree with the fold
    assert(probeP(path, Seq("a", "b")) === scanP(Seq("a", "b")),
      "stored positional probe must count phrase starts like the scan fold")
    // duplicate-term phrase: the same position list joins itself at two shifts
    assert(probeP(path, Seq("a", "a")) === scanP(Seq("a", "a")))
    // 3-token phrase
    assert(probeP(path, Seq("x", "y", "z")) === scanP(Seq("x", "y", "z")))
    // a phrase whose TERMS all exist but never adjacently yields no rows
    assert(probeP(path, Seq("c", "b")) === scanP(Seq("c", "b")))
    // positions survive compaction (dropping them would silently
    // demote the index to ranked-only)
    val dst = tmp("phrase-compact")
    SearchIndexes.compactSearchTo(spark, path, dst)
    assert(probeP(dst, Seq("a", "b")) === scanP(Seq("a", "b")))
    assert(intercept[IllegalArgumentException] {
      SearchIndexes.searchPhraseFromIndex(spark, path, Seq("a"), 5)
    }.getMessage.contains(">= 2 tokens"))
  }

  test("an entirely already-indexed delivery writes no vacant label") {
    val path = tmp("novacant")
    SearchIndexes.writeSearchIndex(fixture, path)
    val before = ranked(SearchIndexes.searchBm25FromIndex(
      spark, path, Seq("a", "b"), 10))
    // every doc is already claimed by the base build: the append must
    // SKIP, not accumulate empty postings/doclen/manifest directories
    // per overlapping delivery (the appendGraphNewOrders guard at the
    // search family's API level)
    SearchIndexes.appendSearch(fixture, path, "dup")
    Seq("postings", "doclen", "manifest").foreach { part =>
      assert(spark.read.parquet(s"$path/$part").select("ingest")
        .distinct().as[String].collect().toSeq === Seq("base"),
        s"no vacant ingest generation may appear under $part")
    }
    assert(ranked(SearchIndexes.searchBm25FromIndex(
      spark, path, Seq("a", "b"), 10)) === before)
  }

  test("compaction preserves the served ranking without the corpus text") {
    import graft.sources.DedupIndexes
    val src = tmp("compact-src")
    SearchIndexes.writeSearchIndex(fixture.filter($"doc_id" <= 2), src)
    SearchIndexes.appendSearch(fixture.filter($"doc_id" === 3L), src, "d1")
    SearchIndexes.appendSearch(fixture.filter($"doc_id" > 3), src, "d2")
    val dst = tmp("compact-dst")
    SearchIndexes.compactSearchTo(spark, src, dst)
    assert(ranked(SearchIndexes.searchBm25FromIndex(spark, dst, Seq("a", "b"), 10)) ===
      ranked(SearchIndexes.searchBm25FromIndex(spark, src, Seq("a", "b"), 10)),
      "compacted index must rank exactly like the appended ledger")
    // one generation, same layout contract (kind + buckets preserved)
    assert(spark.read.parquet(s"$dst/postings").select("ingest")
      .distinct().as[String].collect().toSeq === Seq("base"))
    assert(SearchIndexes.readSearchMeta(spark, dst) ===
      SearchIndexes.readSearchMeta(spark, src))
    assert(intercept[IllegalArgumentException] {
      SearchIndexes.compactSearchTo(spark, src, s"$src/nested")
    }.getMessage.contains("non-overlapping"))
    // generation swap through a pointer root — the graph precedent
    val root = tmp("pointered")
    val gen1 = s"$root/gen1"
    SearchIndexes.writeSearchIndex(fixture, gen1)
    DedupIndexes.flipPointer(spark, root, "gen1")
    val served = ranked(SearchIndexes.searchBm25FromIndex(spark, root, Seq("a"), 10))
    val gen2 = s"$root/gen2"
    SearchIndexes.compactSearchTo(spark, gen1, gen2)
    DedupIndexes.flipPointer(spark, root, "gen2")
    assert(ranked(SearchIndexes.searchBm25FromIndex(spark, root, Seq("a"), 10)) === served)
  }

  test("a half-claimed append (postings without doclen) cannot skew df") {
    val path = tmp("crashwin")
    SearchIndexes.writeSearchIndex(fixture, path)
    val before = ranked(SearchIndexes.searchBm25FromIndex(
      spark, path, Seq("a", "b"), 10))
    // simulate appendSearch crashing BETWEEN its postings and doclen
    // writes: a new ingest's tf rows land, its doclen/manifest never do
    // (r17 ADVICE — df derives from stored tf, so these rows would
    // inflate df for every query sharing the terms). The write mirrors
    // the real layout: bucket-partitioned under postings/ingest=<label>.
    val nb = graft.sources.TextIndexes.DefaultBuckets
    Seq((90L, "a", 3L), (91L, "b", 2L)).toDF("doc_id", "term", "tf")
      .withColumn("bucket",
        graft.sources.TextIndexes.bucketOf(org.apache.spark.sql.functions.col("term"), nb))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/postings/ingest=crashed")
    assert(ranked(SearchIndexes.searchBm25FromIndex(
      spark, path, Seq("a", "b"), 10)) === before,
      "postings rows with no doclen partner must be invisible to df and scores")
    // the structural guard lives in readForTerms: the pruned tf frame
    // itself excludes the half-claimed docs
    val (tf, _) = SearchIndexes.readForTerms(spark, path, Seq("a", "b"))
    assert(!tf.select("doc_id").as[Long].collect().toSet.exists(_ >= 90L))
  }

  test("compaction heals the crash window so a post-compaction replay cannot double-count") {
    import org.apache.spark.sql.functions._
    val src = tmp("crash-compact")
    SearchIndexes.writeSearchIndex(fixture.filter($"doc_id" <= 3), src)
    // simulate appendSearch(docs 4-5, "d1") crashing AFTER its postings
    // write, BEFORE doclen/manifest — the real posting derivation under
    // the real layout, so compaction sees exactly what a crash leaves
    val delta = fixture.filter($"doc_id" > 3)
    val nb = SearchIndexes.readSearchMeta(spark, src)
    delta.select(col("doc_id"),
        posexplode(graft.operators.TextOps.tokens(col("text"))).as(Seq("pos", "term")))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos") + 1)).as("positions"))
      .withColumn("bucket", graft.sources.TextIndexes.bucketOf(col("term"), nb))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$src/postings/ingest=d1")
    // r18 ADVICE scenario: unhealed, compaction would fold these rows
    // into ingest=base as claimed-by-nobody, and the label replay below
    // would append the same docs again — duplicate (doc, term) rows
    val dst = tmp("crash-compact-dst")
    SearchIndexes.compactSearchTo(spark, src, dst)
    assert(spark.read.parquet(s"$dst/postings").filter($"doc_id" > 3).count() === 0L,
      "compaction must not persist postings for docs absent from doclen")
    assert(spark.read.parquet(s"$dst/manifest").filter($"doc_id" > 3).count() === 0L,
      "half-claimed docs must stay unclaimed so a replay can land them whole")
    SearchIndexes.appendSearch(delta, dst, "d1") // the delivery's replay
    val postings = spark.read.parquet(s"$dst/postings")
    assert(postings.groupBy($"doc_id", $"term").count().filter($"count" > 1).count() === 0L,
      "replay after compaction must not duplicate (doc, term) postings")
    assert(spark.read.parquet(s"$dst/doclen").count() === 5L)
    assert(ranked(SearchIndexes.searchBm25FromIndex(spark, dst, Seq("a", "b"), 10)) ===
      ranked(TextAnalysis.searchBm25On(fixture, Seq("a", "b"), 10)),
      "healed + replayed index must rank exactly like the full-corpus scan")
  }

  test("meta refusal and SQL parity") {
    assert(intercept[IllegalArgumentException] {
      SearchIndexes.searchBm25FromIndex(spark, tmp("absent"), Seq("a"), 5)
    }.getMessage.contains("no search-index meta"))
    // kind fork-prevention (r17 ADVICE, the GraphIndexes contract):
    // a different nbuckets-keyed family at the same path must hit the
    // explicit refusal, not a later incidental schema error
    val foreign = tmp("foreign")
    Seq(("trigram", 16)).toDF("kind", "nbuckets")
      .write.mode("overwrite").parquet(s"$foreign/meta")
    assert(intercept[IllegalArgumentException] {
      SearchIndexes.searchBm25FromIndex(spark, foreign, Seq("a"), 5)
    }.getMessage.contains("refusing to mix"))
    // a pre-kind layout (meta without the tag) is likewise refused
    val untagged = tmp("untagged")
    Seq(16).toDF("nbuckets").write.mode("overwrite").parquet(s"$untagged/meta")
    assert(intercept[IllegalArgumentException] {
      SearchIndexes.searchBm25FromIndex(spark, untagged, Seq("a"), 5)
    }.getMessage.contains("no posting-kind tag"))
    val path = tmp("sql")
    SearchIndexes.writeSearchIndex(fixture, path)
    graft.sources.IndexSql.registerBm25Search(
      spark, "bm25_view", path, Seq("a", "b"), 10)
    assert(ranked(spark.sql("SELECT * FROM bm25_view")) ===
      ranked(SearchIndexes.searchBm25FromIndex(spark, path, Seq("a", "b"), 10)))
    graft.sources.IndexSql.registerPhraseSearch(
      spark, "phrase_view", path, Seq("a", "b"), 10)
    assert(ranked(spark.sql("SELECT * FROM phrase_view")) ===
      ranked(SearchIndexes.searchPhraseFromIndex(spark, path, Seq("a", "b"), 10)))
  }
}
