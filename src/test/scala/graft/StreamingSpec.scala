package graft

import graft.streaming.{StreamingOps, TypedEvent, UserEvent, UserProfile}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming grep accumulates line frequencies across micro-batches") {
    val ms = MemoryStream[String]
    val q = StreamingOps.grepFreq(ms.toDF(), "value", "spark")
      .writeStream.format("memory").queryName("sg").outputMode("complete").start()
    try {
      ms.addData("spark rules", "no match here", "spark rules")
      q.processAllAvailable()
      val r1 = spark.table("sg").as[(String, Long)].collect().toMap
      assert(r1 === Map("spark rules" -> 2L))
      // second micro-batch updates existing state incrementally
      ms.addData("spark rules", "spark anew")
      q.processAllAvailable()
      val r2 = spark.table("sg").as[(String, Long)].collect().toMap
      assert(r2 === Map("spark rules" -> 3L, "spark anew" -> 1L))
    } finally q.stop()
  }

  test("windowed counts: watermark finalizes windows and drops late rows") {
    val ms = MemoryStream[(Timestamp, String)]
    val events = ms.toDF().toDF("ts", "event_type")
    val q = StreamingOps.windowedEventCounts(events)
      .writeStream.format("memory").queryName("wc").outputMode("append").start()
    try {
      ms.addData(
        (ts("2024-01-01 10:00:10"), "a"),
        (ts("2024-01-01 10:05:00"), "a"),
        (ts("2024-01-01 10:07:00"), "b"))
      q.processAllAvailable()
      // nothing emitted yet: watermark (max 10:07 - 10m) hasn't passed
      // the 10:00-10:15 window end
      assert(spark.table("wc").count() === 0)
      // an event far ahead advances the watermark past the window
      ms.addData((ts("2024-01-01 11:00:00"), "c"))
      q.processAllAvailable()
      val emitted = spark.table("wc")
        .select(col("window_start").cast("string"), col("event_type"), col("n"))
        .as[(String, String, Long)].collect().toSet
      assert(emitted === Set(
        ("2024-01-01 10:00:00", "a", 2L),
        ("2024-01-01 10:00:00", "b", 1L)))
      // a row behind the watermark is dropped, not resurrected
      ms.addData((ts("2024-01-01 10:01:00"), "a"))
      q.processAllAvailable()
      assert(spark.table("wc").count() === emitted.size)
    } finally q.stop()
  }

  test("file source → file sink with checkpoint: restart is exactly-once") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("graft-stream")
    val in = Files.createDirectories(root.resolve("in"))
    val out = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString
    def addFile(name: String, lines: Seq[String]): Unit =
      Files.write(in.resolve(name), lines.asJava)
    // stateless grep filter: file sink supports append, and the sink's
    // metadata log + source checkpoint give exactly-once across restarts
    def start() = StreamingOps.textDirStream(spark, in.toString)
      .filter(col("value").contains("spark"))
      .writeStream.format("text")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()

    addFile("a.txt", Seq("spark one", "noise", "spark two"))
    val q1 = start()
    q1.processAllAvailable(); q1.stop() // "kill" after the first batch
    // data lands while the query is DOWN; restart must pick it up from
    // the checkpoint without reprocessing file a
    addFile("b.txt", Seq("spark three", "more noise"))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    // a third restart with nothing new must emit nothing (no dupes)
    val q3 = start()
    q3.processAllAvailable(); q3.stop()
    val got = spark.read.text(out).as[String].collect().sorted.toSeq
    assert(got === Seq("spark one", "spark three", "spark two"),
      "exactly the matching lines, each exactly once, across restarts")
  }

  test("session_window merges events across micro-batches and finalizes on watermark") {
    val ms = MemoryStream[(Timestamp, Long)]
    val events = ms.toDF().toDF("ts", "user_id")
    val q = StreamingOps.sessionWindowCounts(events)
      .writeStream.format("memory").queryName("sw").outputMode("append").start()
    try {
      // two events 5 min apart (one session), another user far away
      ms.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:05:00"), 1L))
      q.processAllAvailable()
      // a later batch EXTENDS the open session (9 min gap < 10) — state
      // merge across micro-batches
      ms.addData((ts("2024-01-01 10:14:00"), 1L))
      q.processAllAvailable()
      assert(spark.table("sw").count() === 0, "session still open: nothing final")
      // watermark jump finalizes it
      ms.addData((ts("2024-01-01 12:00:00"), 2L))
      q.processAllAvailable()
      val got = spark.table("sw")
        .select(col("user_id"), col("session_start").cast("string"), col("n_events"))
        .as[(Long, String, Long)].collect().toSet
      assert(got === Set((1L, "2024-01-01 10:00:00", 3L)))
    } finally q.stop()
  }

  test("streaming dedup suppresses duplicates across micro-batches") {
    val ms = MemoryStream[String]
    val q = StreamingOps.dedupStream(ms.toDF())
      .select("value")
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    try {
      ms.addData("alpha beta", "  Alpha   BETA ", "gamma")
      q.processAllAvailable()
      // canonicalization: case/whitespace variants share a fingerprint
      assert(spark.table("dd").count() === 2)
      ms.addData("alpha beta", "delta")
      q.processAllAvailable()
      val got = spark.table("dd").as[String].collect().toSet
      assert(got.size === 3 && got.contains("gamma") && got.contains("delta"))
    } finally q.stop()
  }

  test("watermarked dedup evicts state: a key re-occurring past the horizon re-emits") {
    val ms = MemoryStream[(Timestamp, String)]
    val q = StreamingOps.dedupStreamWithinWatermark(
        ms.toDF().toDF("ts", "value"), watermark = "10 minutes")
      .select("value")
      .writeStream.format("memory").queryName("ddw").outputMode("append").start()
    try {
      // duplicate inside the horizon is suppressed
      ms.addData((ts("2024-01-01 10:00:00"), "alpha"),
                 (ts("2024-01-01 10:01:00"), "  ALPHA "))
      q.processAllAvailable()
      assert(spark.table("ddw").count() === 1)
      // advance the watermark far past alpha's arrival + horizon,
      // evicting its state entry
      ms.addData((ts("2024-01-01 12:00:00"), "beta"))
      q.processAllAvailable()
      // the SAME content re-occurring after eviction is emitted again —
      // the documented bounded-state contract (cross-horizon dups belong
      // to the batch dedup)
      ms.addData((ts("2024-01-01 12:01:00"), "alpha"))
      q.processAllAvailable()
      val got = spark.table("ddw").as[String].collect().toSeq
      assert(got.count(_.trim.equalsIgnoreCase("alpha")) === 2)
      assert(got.size === 3)
    } finally q.stop()
  }

  test("mapGroupsWithState keeps a running per-user profile across batches") {
    val ms = MemoryStream[UserEvent]
    val q = StreamingOps.runningUserProfiles(ms.toDS())
      .writeStream.format("memory").queryName("up").outputMode("update").start()
    try {
      ms.addData(UserEvent(1L, 10L, 100L), UserEvent(1L, 11L, 200L), UserEvent(2L, 20L, 50L))
      q.processAllAvailable()
      val r1 = spark.table("up").as[UserProfile]
        .collect().groupBy(_.user_id).map { case (u, rs) => u -> rs.maxBy(_.n_events) }
      assert(r1(1L) === UserProfile(1L, 2L, 200L))
      assert(r1(2L) === UserProfile(2L, 1L, 50L))
      // state survives: the next batch ACCUMULATES, not restarts
      ms.addData(UserEvent(1L, 12L, 150L))
      q.processAllAvailable()
      val r2 = spark.table("up").as[UserProfile]
        .collect().groupBy(_.user_id).map { case (u, rs) => u -> rs.maxBy(_.n_events) }
      assert(r2(1L) === UserProfile(1L, 3L, 200L), "count up, last_us keeps max")
    } finally q.stop()
  }

  test("stream-static join enriches each micro-batch from a broadcast dim") {
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val ms = MemoryStream[(Long, Long)]
    val q = StreamingOps.enrichWithDim(
        ms.toDF().toDF("user_id", "event_id"), dim, "user_id")
      .writeStream.format("memory").queryName("enr").outputMode("append").start()
    try {
      ms.addData((1L, 100L), (2L, 101L), (3L, 102L))
      q.processAllAvailable()
      val got = spark.table("enr").select("event_id", "tier")
        .as[(Long, String)].collect().toSet
      // inner join: the dim-less user drops; tiers attach per batch
      assert(got === Set((100L, "gold"), (101L, "basic")))
      ms.addData((1L, 103L))
      q.processAllAvailable()
      assert(spark.table("enr").count() === 3)
    } finally q.stop()
  }

  test("stream-stream interval join: clicks attribute to in-window impressions only") {
    val imps = MemoryStream[(Long, Long, Timestamp)]
    val clks = MemoryStream[(Long, Long, Timestamp)]
    val q = StreamingOps.attributeClicks(
        imps.toDF().toDF("imp_user", "imp_id", "imp_ts"),
        clks.toDF().toDF("click_user", "click_id", "click_ts"))
      .select("imp_id", "click_id")
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    try {
      imps.addData((1L, 10L, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      clks.addData(
        (1L, 20L, ts("2024-01-01 10:05:00")), // in window → attributed
        (1L, 21L, ts("2024-01-01 10:20:00")), // 20 min later → outside
        (2L, 22L, ts("2024-01-01 10:05:00"))) // no impression → dropped
      q.processAllAvailable()
      val got = spark.table("attr").as[(Long, Long)].collect().toSet
      assert(got === Set((10L, 20L)), "exactly the in-window same-user pair")
      // a second impression arriving later still matches a FUTURE click
      imps.addData((2L, 11L, ts("2024-01-01 10:30:00")))
      clks.addData((2L, 23L, ts("2024-01-01 10:31:00")))
      q.processAllAvailable()
      assert(spark.table("attr").as[(Long, Long)].collect().toSet
        === Set((10L, 20L), (11L, 23L)))
    } finally q.stop()
  }

  test("foreachBatch incremental ingest appends only corpus-new fingerprints") {
    import java.nio.file.Files
    val corpus = Files.createTempDirectory("graft-ingest").resolve("corpus").toString
    val ms = MemoryStream[String]
    val q = StreamingOps.ingestNewDocs(ms.toDF(), corpus)
    try {
      // bootstrap: NO corpus directory exists — the first batch creates it
      ms.addData("alpha doc")
      q.processAllAvailable()
      assert(spark.read.parquet(corpus).count() === 1)
      // a corpus dup, a new doc, and a canonical variant of the new doc
      ms.addData("alpha doc", "beta doc", "  BETA   DOC ")
      q.processAllAvailable()
      // a within-stream dup across batches, and another new doc
      ms.addData("beta doc", "gamma doc")
      q.processAllAvailable()
      val rows = spark.read.parquet(corpus)
      assert(rows.count() === 3, "alpha (bootstrap) + beta + gamma, each exactly once")
      assert(rows.select("fingerprint").distinct().count() === 3)
      val texts = rows.select("text").as[String].collect().toSet
      assert(texts.contains("alpha doc") && texts.contains("gamma doc"))
    } finally q.stop()
  }

  test("foreachBatch near-dup ingest appends only docs new to the corpus at >= 0.8 Jaccard") {
    import java.nio.file.Files
    val corpus = Files.createTempDirectory("graft-ingest-near").resolve("corpus").toString
    val ms = MemoryStream[String]
    val q = StreamingOps.ingestNewDocsNearDup(ms.toDF(), corpus)
    try {
      val a = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12"
      ms.addData(a, "xy zz") // bootstrap: both appended (incl. the sub-3-token doc)
      q.processAllAvailable()
      assert(spark.read.parquet(corpus).count() === 2)
      // a near-dup of `a` (last token changed: J = 9/11 >= 0.8), an exact
      // re-delivery, a short-doc re-delivery (shingle-free — only the
      // fingerprint backstop can catch it), and a genuinely new doc
      ms.addData("t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 zz", a, "xy zz",
        "completely different tokens over here")
      q.processAllAvailable()
      val texts = spark.read.parquet(corpus).select("text").as[String].collect().toSet
      assert(texts === Set(a, "xy zz", "completely different tokens over here"),
        "only the new doc may be appended")
      // failure-replay idempotency: the same delivery again adds nothing
      ms.addData("t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 zz", a, "xy zz",
        "completely different tokens over here")
      q.processAllAvailable()
      assert(spark.read.parquet(corpus).count() === 3)
    } finally q.stop()
  }

  test("near-dup ingest collapses near-dups WITHIN a micro-batch, including at bootstrap") {
    import java.nio.file.Files
    val corpus = Files.createTempDirectory("graft-ingest-inbatch").resolve("corpus").toString
    val ms = MemoryStream[String]
    val q = StreamingOps.ingestNewDocsNearDup(ms.toDF(), corpus)
    try {
      // BOOTSTRAP batch already contains a near-dup pair (J = 9/11 >= 0.8):
      // without the in-batch pass both would seed the corpus
      val b1 = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 s11 s12"
      val b1near = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 s11 yy"
      ms.addData(b1, b1near)
      q.processAllAvailable()
      assert(spark.read.parquet(corpus).count() === 1,
        "bootstrap batch keeps one representative of the near-dup pair")
      // a later batch with a fresh near-dup pair (both corpus-new) plus a
      // doc near-duplicating the corpus: exactly one row may land
      val b2 = "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12"
      val b2near = "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 vv"
      val corpusNear = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 s11 ww"
      ms.addData(b2, b2near, corpusNear)
      q.processAllAvailable()
      val texts = spark.read.parquet(corpus).select("text").as[String].collect().toSet
      assert(texts.size === 2, s"one per cluster, got $texts")
      assert(texts.exists(t => t == b2 || t == b2near),
        "the second cluster is represented exactly once")
    } finally q.stop()
  }

  test("near-dup ingest: a loser to a corpus-rejected representative still lands") {
    import java.nio.file.Files
    val corpus = Files.createTempDirectory("graft-ingest-loser").resolve("corpus").toString
    val ms = MemoryStream[String]
    val q = StreamingOps.ingestNewDocsNearDup(ms.toDF(), corpus)
    try {
      // near-dup similarity is not transitive: A near-dups BOTH the
      // corpus doc X and B, while B does not near-dup X.
      //   J(A,X) = 9/11 (last token differs)      >= 0.8
      //   J(A,B) = 9/11 (first token differs)     >= 0.8
      //   J(B,X) = 8/12 (both tokens differ)      <  0.8
      val x = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12"
      val a = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 aa"
      val b = "b1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 aa"
      ms.addData(x)
      q.processAllAvailable()
      // A and B share a micro-batch. doc_id(A) < doc_id(B) — asserted
      // below — so a collapse-before-probe ordering would pick A as the
      // in-batch representative, drop B, then reject A against the
      // corpus: B (corpus-new!) would be silently lost, and its fate
      // would have depended on what shared its delivery. The shipped
      // probe-then-collapse ordering must append exactly B.
      ms.addData(a, b)
      q.processAllAvailable()
      val rows = spark.read.parquet(corpus)
        .select("text", "doc_id").as[(String, Long)].collect().toMap
      assert(rows.contains(x), "bootstrap doc present")
      assert(!rows.contains(a), "A is a corpus near-dup and must be rejected")
      assert(rows.contains(b),
        "B is corpus-new and must survive its batchmate's rejection")
      assert(rows.size === 2, s"exactly X and B, got ${rows.keySet}")
      // regression-pin precondition: the old ordering only failed when
      // the corpus-rejected doc was the cluster min — keep the fixture in
      // that regime so this test guards the ordering, not luck
      val ids = Seq(a, b).toDF("text")
        .select(xxhash64(md5(regexp_replace(trim(lower(col("text"))), "\\s+", " "))))
        .as[Long].collect()
      assert(ids(0) < ids(1),
        "fixture drift: A must synthesize the smaller doc_id for this test to bite")
    } finally q.stop()
  }

  test("verbatim ingest flags a cross-batch quote with its corpus source; replay-idempotent") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft-ingest-verbatim")
    val corpusDir = base.resolve("corpus").toString
    val flagsDir = base.resolve("flags").toString
    val ms = MemoryStream[String]
    val q = StreamingOps.ingestFlagVerbatim(ms.toDF(), corpusDir, flagsDir)
    try {
      def span(k: Int, tag: String) = (1 to k).map(i => s"$tag$i").mkString(" ")
      // seed: the future quote source (25-token quotable core) + an
      // unrelated doc; nothing to flag at bootstrap
      val source = s"${span(4, "h")} ${span(25, "q")} ${span(3, "t")}"
      val clean1 = span(15, "w")
      ms.addData(source, clean1)
      q.processAllAvailable()
      assert(spark.read.parquet(corpusDir).count() === 2)
      assert(!new java.io.File(flagsDir).exists(),
        "bootstrap batch probes nothing and writes no flags")
      // batch 2: a doc quoting the 25-token core verbatim (different
      // flanks) + a clean doc — exactly ONE flag row, naming the source
      val quoter = s"${span(5, "x")} ${span(25, "q")} ${span(2, "y")}"
      val clean2 = span(12, "z")
      ms.addData(quoter, clean2)
      q.processAllAvailable()
      val ids = spark.read.parquet(corpusDir)
        .select("text", "doc_id").as[(String, Long)].collect().toMap
      assert(ids.keySet === Set(source, clean1, quoter, clean2),
        "flagging must not block the append — all four docs land")
      val flags = spark.read.parquet(flagsDir)
        .as[(Long, Long, Long)].collect().toSet
      assert(flags === Set((ids(quoter), ids(source), 25L)),
        "one flag: the quoter, its corpus source, the exact run length")
      // failure replay: the same delivery again — fingerprint-caught, so
      // no new corpus rows AND no duplicate flag rows
      ms.addData(quoter, clean2)
      q.processAllAvailable()
      assert(spark.read.parquet(corpusDir).count() === 4)
      assert(spark.read.parquet(flagsDir).count() === 1)
    } finally q.stop()
  }

  test("stored-index near-dup ingest: later batches probe an index holding earlier batches' docs") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft-ingest-near-idx")
    val corpusIdx = base.resolve("corpus_idx").toString
    val corpusInline = base.resolve("corpus_inline").toString
    val indexDir = base.resolve("index").toString
    val msIdx = MemoryStream[String]
    val msInline = MemoryStream[String]
    val qIdx = StreamingOps.ingestNewDocsNearDup(msIdx.toDF(), corpusIdx,
      indexDir = Some(indexDir))
    val qInline = StreamingOps.ingestNewDocsNearDup(msInline.toDF(), corpusInline)
    try {
      def deliver(docs: String*): Unit = {
        msIdx.addData(docs); qIdx.processAllAvailable()
        msInline.addData(docs); qInline.processAllAvailable()
      }
      def corpora = (
        spark.read.parquet(corpusIdx).as[(String, String, Long)].collect().toSet,
        spark.read.parquet(corpusInline).as[(String, String, Long)].collect().toSet)
      val seed = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11 a12"
      deliver(seed, "unrelated words entirely")
      // batch 2 introduces doc X — accepted, and APPENDED to the index
      val x = "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10 m11 m12"
      deliver(x)
      val xId = spark.read.parquet(corpusIdx).filter($"text" === x)
        .select("doc_id").as[Long].head()
      assert(graft.sources.DedupIndexes.indexedDocIds(spark, indexDir)
        .as[Long].collect().toSet.contains(xId),
        "batch 2's accepted doc must be in the stored index before batch 3 runs")
      // batch 3: a near-dup of X (J = 9/11 >= 0.8) — rejecting it
      // REQUIRES the stored index to contain X, which arrived after the
      // index bootstrap; plus a genuinely new doc that must land
      val xNear = "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10 m11 zz"
      deliver(xNear, "fresh tokens nothing shares")
      val (viaIdx, viaInline) = corpora
      assert(!viaIdx.exists(_._2 == xNear),
        "the stored-index probe must reject a near-dup of a post-bootstrap doc")
      assert(viaIdx === viaInline,
        "stored-index and inline spellings must produce identical corpora")
      // failure replay: redeliver batch 3's content — nothing changes
      deliver(xNear, "fresh tokens nothing shares")
      val (replayIdx, replayInline) = corpora
      assert(replayIdx === viaIdx && replayInline === viaInline,
        "replay must be idempotent for both corpus and index spellings")
      // the maintained index stays equal to a fresh full build over the
      // final corpus — the DedupIndexSpec invariant, here driven by the
      // streaming maintenance path end to end
      val rebuilt = base.resolve("rebuilt").toString
      graft.sources.DedupIndexes.writeNearDupIndex(
        spark.read.parquet(corpusIdx).select($"doc_id", $"text"), rebuilt)
      val (shM, idxM) = graft.sources.DedupIndexes.readNearDupIndex(spark, indexDir)
      val (shR, idxR) = graft.sources.DedupIndexes.readNearDupIndex(spark, rebuilt)
      assert(shM.as[(Long, Seq[String], Int)].collect().toSet ===
        shR.as[(Long, Seq[String], Int)].collect().toSet,
        "streaming-maintained shingle frame == fresh rebuild over the corpus")
      assert(idxM.as[(Long, Long, Int)].collect().toSet ===
        idxR.as[(Long, Long, Int)].collect().toSet,
        "streaming-maintained band index == fresh rebuild over the corpus")
    } finally { qIdx.stop(); qInline.stop() }
  }

  test("stored-index verbatim ingest: flags derive from the maintained index across batches") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft-ingest-verbatim-idx")
    val corpusDir = base.resolve("corpus").toString
    val flagsDir = base.resolve("flags").toString
    val indexDir = base.resolve("index").toString
    val ms = MemoryStream[String]
    val q = StreamingOps.ingestFlagVerbatim(ms.toDF(), corpusDir, flagsDir,
      indexDir = Some(indexDir))
    try {
      def span(k: Int, tag: String) = (1 to k).map(i => s"$tag$i").mkString(" ")
      // batch 1 (bootstrap): the first quote source
      val source1 = s"${span(3, "h")} ${span(22, "q")} ${span(2, "t")}"
      ms.addData(source1, span(10, "w"))
      q.processAllAvailable()
      assert(!new java.io.File(flagsDir).exists(), "nothing to flag at bootstrap")
      // batch 2: quotes source1 (probes the index batch 1 built) AND is
      // itself the source a batch-3 doc will quote — so batch 3's flag
      // existing proves the index GREW with batch 2's append
      val source2 = s"${span(4, "x")} ${span(22, "q")} ${span(21, "r")}"
      ms.addData(source2)
      q.processAllAvailable()
      val ids = spark.read.parquet(corpusDir)
        .select("text", "doc_id").as[(String, Long)].collect().toMap
      val flags1 = spark.read.parquet(flagsDir).as[(Long, Long, Long)].collect().toSet
      assert(flags1 === Set((ids(source2), ids(source1), 22L)),
        "batch 2 must be flagged against the batch-1 source via the stored index")
      // batch 3: quotes source2's unique 21-token tail — only the
      // maintained index can know it
      val quoter3 = s"${span(2, "y")} ${span(21, "r")} ${span(3, "z")}"
      ms.addData(quoter3)
      q.processAllAvailable()
      val ids3 = spark.read.parquet(corpusDir)
        .select("text", "doc_id").as[(String, Long)].collect().toMap
      val flags2 = spark.read.parquet(flagsDir).as[(Long, Long, Long)].collect().toSet
      assert(flags2.contains((ids3(quoter3), ids(source2), 21L)),
        "batch 3's flag must name the batch-2 doc — the index grew per batch")
      // replay: same delivery adds no corpus rows and no duplicate flags
      ms.addData(quoter3)
      q.processAllAvailable()
      assert(spark.read.parquet(corpusDir).count() === ids3.size)
      assert(spark.read.parquet(flagsDir).count() === flags2.size)
      // maintained index == fresh rebuild over the final corpus
      val rebuilt = base.resolve("rebuilt").toString
      graft.sources.DedupIndexes.writeVerbatimIndex(
        spark.read.parquet(corpusDir).select($"doc_id", $"text"), rebuilt)
      val (posM, occM) = graft.sources.DedupIndexes.readVerbatimIndex(spark, indexDir)
      val (posR, occR) = graft.sources.DedupIndexes.readVerbatimIndex(spark, rebuilt)
      assert(posM.as[(Long, Int, String)].collect().toSet ===
        posR.as[(Long, Int, String)].collect().toSet,
        "streaming-maintained positional index == fresh rebuild")
      assert(occM.as[(String, Long)].collect().toMap ===
        occR.as[(String, Long)].collect().toMap,
        "merge-on-read occ == rebuilt occ after streaming maintenance")
    } finally q.stop()
  }

  test("near-dup sink attached to a PRE-EXISTING corpus bootstraps the stored index") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft-ingest-preexisting")
    val corpusDir = base.resolve("corpus").toString
    val indexDir = base.resolve("index").toString
    // a corpus this sink did NOT write (the attach scenario) — same
    // fingerprint/doc_id spelling the sink uses
    val seedText = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11 p12"
    Seq(seedText).toDF("text")
      .select(md5(regexp_replace(trim(lower($"text")), "\\s+", " ")).as("fingerprint"),
        $"text")
      .withColumn("doc_id", xxhash64($"fingerprint"))
      .write.parquet(corpusDir)
    val ms = MemoryStream[String]
    val q = StreamingOps.ingestNewDocsNearDup(ms.toDF(), corpusDir,
      indexDir = Some(indexDir))
    try {
      // batch 1 delivers a NEAR-dup (J = 9/11 >= 0.8) of the
      // pre-existing doc plus a genuinely new one. Rejecting the
      // near-dup REQUIRES the sink to have built the index from the
      // corpus — before the self-bootstrap, the index-absent branch
      // probed nothing and silently admitted it
      val near = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11 zz"
      ms.addData(near, "fresh tokens entirely new here")
      q.processAllAvailable()
      val texts = spark.read.parquet(corpusDir)
        .select("text").as[String].collect().toSet
      assert(!texts.contains(near),
        "a near-dup of a pre-existing corpus doc must be rejected via the bootstrapped index")
      assert(texts.exists(_.startsWith("fresh tokens")), "the new doc must land")
      // the bootstrapped+maintained index claims the WHOLE corpus
      assert(graft.sources.DedupIndexes.indexedDocIds(spark, indexDir)
        .as[Long].collect().toSet ===
        spark.read.parquet(corpusDir).select($"doc_id").as[Long].collect().toSet,
        "index must cover the pre-existing docs and the accepted delivery")
    } finally q.stop()
  }

  test("embedding ingest: bootstrap fit, stored-centroid appends, replay-idempotent") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft-ingest-emb")
    val corpusDir = base.resolve("corpus").toString
    val indexDir = base.resolve("index").toString
    val all = Tables.embeddings(spark, TestSpark.sf0001)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    val seed = all.filter(_._1 % 10 < 8)
    val rest = all.filter(_._1 % 10 >= 8)
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = StreamingOps.ingestEmbeddings(
      ms.toDF().toDF("vec_id", "embedding"), corpusDir, indexDir)
    try {
      // an EMPTY first delivery must not wedge the stream: zero rows
      // reaching the k-means fit would throw and replay the same empty
      // batch forever — the bootstrap waits for data instead
      ms.addData(Seq.empty[(Long, Seq[Float])])
      q.processAllAvailable()
      assert(!graft.sources.DedupIndexes.hasData(spark, s"$indexDir/manifest"),
        "an empty delivery must not bootstrap (and must not crash)")
      // batch with data (virgin index): the sink bootstraps the FULL
      // build — fit + assign + manifest — over the corpus
      ms.addData(seed.toSeq)
      q.processAllAvailable()
      val cent0 = graft.sources.SimilarityIndexes.readIvfIndex(spark, indexDir)._1
      assert(cent0.nonEmpty, "bootstrap must fit and store centroids")
      assert(graft.sources.SimilarityIndexes.indexedVecIds(spark, indexDir)
        .as[Long].collect().toSet === seed.map(_._1).toSet,
        "bootstrap manifest must claim the first delivery")
      // batch 2: new vectors plus a RE-EMBEDDED existing id — the
      // tampered row must be ignored (first write wins; replacing
      // vectors under a fitted quantizer is a rebuild decision)
      val tampered = (seed.head._1, seed.head._2.map(x => -x))
      ms.addData(rest.toSeq :+ tampered)
      q.processAllAvailable()
      val corpus = spark.read.parquet(corpusDir)
        .as[(Long, Seq[Float])].collect()
      assert(corpus.length === all.length, "each vec_id lands exactly once")
      assert(corpus.toMap.apply(seed.head._1) === seed.head._2,
        "a re-embedded id must not overwrite the stored vector")
      val (cent1, cells1) = graft.sources.SimilarityIndexes.readIvfIndex(spark, indexDir)
      assert(cent1 === cent0, "appends must never move the centroids")
      // the maintained cells equal a one-shot assignment of the final
      // corpus under the BOOTSTRAP centroids — fit once, assign
      // forever, certified through the streaming path end to end
      val expect = graft.operators.Similarity.assignCells(
          spark.read.parquet(corpusDir), cent0, nassign = 1)
        .select($"vec_id", $"cell").as[(Long, Int)].collect().toSet
      assert(cells1.select($"vec_id", $"cell").as[(Long, Int)].collect().toSet
        === expect,
        "streaming-maintained cells == one-shot stored-centroid assignment")
      // re-delivery: no corpus rows, no cell rows, no manifest claims
      ms.addData(rest.toSeq :+ tampered)
      q.processAllAvailable()
      assert(spark.read.parquet(corpusDir).count() === all.length)
      assert(graft.sources.SimilarityIndexes.readIvfIndex(spark, indexDir)
        ._2.count() === all.length)
      assert(graft.sources.SimilarityIndexes.indexedVecIds(spark, indexDir)
        .as[Long].collect().toSet === all.map(_._1).toSet)
    } finally q.stop()
  }

  test("embedding ingest maintains the PCA serving index: bootstrap, " +
      "stored-basis appends == batch appendPcaIndex, replay-idempotent, " +
      "drift sees each batch") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft-ingest-emb-pca")
    val corpusDir = base.resolve("corpus").toString
    val indexDir = base.resolve("ivf").toString
    val pcaDir = base.resolve("pca").toString
    val all = Tables.embeddings(spark, TestSpark.sf0001)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    val seed = all.filter(_._1 % 10 < 8)
    val rest = all.filter(_._1 % 10 >= 8)
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = StreamingOps.ingestEmbeddings(
      ms.toDF().toDF("vec_id", "embedding"), corpusDir, indexDir,
      pcaIndexDir = Some(pcaDir))
    try {
      // bootstrap: the first data-carrying batch builds the full PCA
      // index from the corpus (fit + project + manifest-last)
      ms.addData(seed.toSeq)
      q.processAllAvailable()
      val (basis0, reduced0, _) =
        graft.sources.SimilarityIndexes.readPcaIndex(spark, pcaDir)
      assert(basis0.nonEmpty, "bootstrap must fit and store the basis")
      assert(reduced0.count() === seed.length.toLong,
        "bootstrap reduced table must cover the first delivery")
      // append: new vectors are PROJECTED under the stored basis —
      // the basis never moves, and the streamed reduced coordinates
      // equal a one-shot batch appendPcaIndex of the same delta
      ms.addData(rest.toSeq)
      q.processAllAvailable()
      val (basis1, reduced1, vectors1) =
        graft.sources.SimilarityIndexes.readPcaIndex(spark, pcaDir)
      assert(basis1 === basis0, "appends must never move the basis")
      assert(vectors1.count() === all.length.toLong)
      val expected = graft.operators.Similarity.projectWithBasis(
          spark.read.parquet(corpusDir), basis0)
        .select($"vec_id", $"pc").as[(Long, Seq[Double])].collect().toMap
      val got = reduced1.select($"vec_id", $"pc")
        .as[(Long, Seq[Double])].collect().toMap
      assert(got === expected,
        "streaming-maintained reduced table == one-shot stored-basis projection")
      // drift audit sees the appended batch's moments as its own ingest
      val drift = graft.sources.SimilarityIndexes.pcaDriftStats(spark, pcaDir)
        .select($"ingest").as[String].collect().toSet
      assert(drift.contains(graft.sources.DedupIndexes.BaseLabel) &&
        drift.exists(_.startsWith("b")),
        s"drift stats must cover base + appended ingests, got $drift")
      // replay: a re-delivered batch claims nothing new
      ms.addData(rest.toSeq)
      q.processAllAvailable()
      val (_, reduced2, vectors2) =
        graft.sources.SimilarityIndexes.readPcaIndex(spark, pcaDir)
      assert(reduced2.count() === all.length.toLong &&
        vectors2.count() === all.length.toLong,
        "a pure re-delivery must not duplicate index rows")
      // the maintained index SERVES identically to an index built in
      // ONE SHOT from the final corpus under the same basis — the
      // streamed==batch family contract, certified through the probe
      val queries = spark.read.parquet(corpusDir)
        .filter($"vec_id" < 10).select($"vec_id".as("query_id"),
          $"embedding".as("eq"))
      val corpus = spark.read.parquet(corpusDir)
      val stored = graft.operators.Similarity.annTopKPcaFromIndex(
        basis1, reduced2, vectors2, broadcast(queries))
      val oneShot = graft.operators.Similarity.annTopKPcaFromIndex(
        basis1, graft.operators.Similarity.projectWithBasis(corpus, basis1)
          .select($"vec_id", $"pc"),
        corpus.select($"vec_id", $"embedding"), broadcast(queries))
      assert(stored.collect().toSet === oneShot.collect().toSet,
        "probe over the streaming-maintained PCA index must equal the one-shot build")
    } finally q.stop()
  }

  test("generalized embedding ingest maintains EVERY stored ANN family: " +
      "SQ8/LSH/PQ/IVF-SQ/IVF-PQ streamed artifacts == one-shot stored-fit " +
      "derivations, replay-idempotent, full manifest coverage") {
    import java.nio.file.Files
    import graft.streaming.IndexMaintenance
    import graft.sources.SimilarityIndexes
    import graft.operators.Similarity
    val base = Files.createTempDirectory("graft-ingest-emb-all")
    val corpusDir = base.resolve("corpus").toString
    def d(n: String) = base.resolve(n).toString
    val maintain = Seq(
      IndexMaintenance.Sq(d("sq")),
      IndexMaintenance.Lsh(d("lsh")),
      IndexMaintenance.Pq(d("pq"), m = 16, ksub = 8),
      IndexMaintenance.IvfSq(d("ivfsq"), nlist = 8),
      IndexMaintenance.IvfPq(d("ivfpq"), nlist = 8, m = 16, ksub = 8))
    val all = Tables.embeddings(spark, TestSpark.sf0001)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    val seed = all.filter(_._1 % 10 < 8)
    val rest = all.filter(_._1 % 10 >= 8)
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = StreamingOps.ingestEmbeddingsIndexed(
      ms.toDF().toDF("vec_id", "embedding"), corpusDir, maintain)
    try {
      ms.addData(seed.toSeq)        // bootstrap every family
      q.processAllAvailable()
      ms.addData(rest.toSeq)        // stored-fit append to every family
      q.processAllAvailable()
      ms.addData(rest.toSeq)        // pure re-delivery: nothing claimed
      q.processAllAvailable()
      val corpus = spark.read.parquet(corpusDir)
      assert(corpus.count() === all.length.toLong)
      // every family claims the whole corpus, exactly once
      maintain.foreach { m =>
        val claimed = SimilarityIndexes.indexedVecIds(spark, m.dir)
          .as[Long].collect()
        assert(claimed.length === all.length &&
          claimed.toSet === all.map(_._1).toSet,
          s"${m.family}: manifest must cover the corpus exactly once")
      }
      def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
        df.collect().map(_.toString).toSet
      // SQ8: streamed codes == one-shot quantization of the corpus
      val (sqCodes, _) = SimilarityIndexes.readSqIndex(spark, d("sq"))
      assert(rows(sqCodes) === rows(Similarity.quantizeSq8On(corpus)),
        "SQ8 streamed codes fork from the one-shot quantization")
      // LSH: streamed sketches == keys derived at the stored config
      val (sketches, lshVecs, (nt, bits, dim)) =
        SimilarityIndexes.readLshIndex(spark, d("lsh"))
      assert(rows(sketches) ===
        rows(Similarity.lshSketchFrames(corpus, nt, bits, dim)),
        "LSH streamed sketches fork from the stored-config derivation")
      assert(lshVecs.count() === all.length.toLong)
      // PQ: appended codes encoded under the BOOTSTRAP codebooks
      val (books, pqCodes, _) = SimilarityIndexes.readPqIndex(spark, d("pq"))
      assert(rows(pqCodes) === rows(Similarity.quantizePqOn(corpus, books)),
        "PQ streamed codes fork from stored-codebook encoding")
      // IVF-SQ: appended codes assigned under the BOOTSTRAP centroids
      val (cent, ivfSqCodes, _) = SimilarityIndexes.readIvfSqIndex(spark, d("ivfsq"))
      assert(rows(ivfSqCodes.select($"vec_id", $"cell", $"maxabs", $"codes")) ===
        rows(Similarity.quantizeSq8On(Similarity.assignCells(corpus, cent, nassign = 1))
          .select($"vec_id", $"cell", $"maxabs", $"codes")),
        "IVF-SQ streamed codes fork from stored-centroid assignment")
      // IVF-PQ: both fitted artifacts honored on append
      val (cent2, books2, ivfPqCodes, _) =
        SimilarityIndexes.readIvfPqIndex(spark, d("ivfpq"))
      assert(rows(ivfPqCodes.select($"vec_id", $"cell", $"codes")) ===
        rows(Similarity.quantizePqOn(
            Similarity.assignCells(corpus, cent2, nassign = 1), books2)
          .select($"vec_id", $"cell", $"codes")),
        "IVF-PQ streamed codes fork from stored-fit encoding")
    } finally q.stop()
  }

  test("generalized embedding sink refuses param forks and overlapping dirs") {
    import java.nio.file.Files
    import graft.streaming.IndexMaintenance
    val base = Files.createTempDirectory("graft-ingest-emb-forks")
    val corpusDir = base.resolve("corpus").toString
    val lshDir = base.resolve("lsh").toString
    // established-index param fork: build LSH at one config, restart
    // the sink at another — the batch must FAIL, not silently append
    // under the stored config
    val seed = Tables.embeddings(spark, TestSpark.sf0001)
      .select($"vec_id", $"embedding").limit(40)
    seed.write.mode("overwrite").parquet(corpusDir)
    graft.sources.SimilarityIndexes.writeLshIndex(
      spark.read.parquet(corpusDir), lshDir, nTables = 16, bitsPerTable = 2)
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = StreamingOps.ingestEmbeddingsIndexed(
      ms.toDF().toDF("vec_id", "embedding"), corpusDir,
      Seq(IndexMaintenance.Lsh(lshDir, nTables = 8, bitsPerTable = 2)))
    try {
      ms.addData(seed.as[(Long, Seq[Float])].collect().toSeq)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        q.processAllAvailable())
      assert(e.getMessage.contains("rebuild"),
        s"expected the param-fork refusal, got: ${e.getMessage}")
    } finally q.stop()
    // pairwise dir overlap between two maintained families
    intercept[IllegalArgumentException](
      StreamingOps.ingestEmbeddingsIndexed(
        ms.toDF().toDF("vec_id", "embedding"), corpusDir,
        Seq(IndexMaintenance.Sq(base.resolve("x").toString),
          IndexMaintenance.Lsh(s"${base.resolve("x")}/nested"))))
    // empty maintenance set is a construction error
    intercept[IllegalArgumentException](
      StreamingOps.ingestEmbeddingsIndexed(
        ms.toDF().toDF("vec_id", "embedding"), corpusDir, Seq.empty))
  }

  test("sink construction refuses an indexDir that overlaps corpusDir") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft-ingest-overlap")
    val corpusDir = base.resolve("corpus").toString
    val ms = MemoryStream[String]
    // equal dirs: the index build's delete(indexDir) would destroy the
    // corpus before its lazy read ran
    intercept[IllegalArgumentException](
      StreamingOps.ingestNewDocsNearDup(ms.toDF(), corpusDir,
        indexDir = Some(corpusDir)))
    // index nested INSIDE the corpus (corrupts corpus reads too)
    intercept[IllegalArgumentException](
      StreamingOps.ingestNewDocsNearDup(ms.toDF(), corpusDir,
        indexDir = Some(s"$corpusDir/index")))
    // relative-vs-absolute / dot-dot spellings of the same dir
    intercept[IllegalArgumentException](
      StreamingOps.ingestFlagVerbatim(ms.toDF(), corpusDir,
        base.resolve("flags").toString,
        indexDir = Some(s"$corpusDir/../corpus")))
    val msE = MemoryStream[(Long, Seq[Float])]
    intercept[IllegalArgumentException](
      StreamingOps.ingestEmbeddings(msE.toDF().toDF("vec_id", "embedding"),
        corpusDir, corpusDir))
    // disjoint sibling passes construction
    StreamingOps.ingestNewDocsNearDup(ms.toDF(), corpusDir,
      indexDir = Some(base.resolve("index").toString)).stop()
  }

  test("a pure re-delivery batch appends no vacant ingest label to the stored index") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft-ingest-empty-delta")
    val corpusDir = base.resolve("corpus").toString
    val indexDir = base.resolve("index").toString
    def labels = {
      val f = new java.io.File(s"$indexDir/shingles")
      if (!f.exists()) Seq.empty[String]
      else f.listFiles().filter(_.isDirectory).map(_.getName)
        .filter(_.startsWith("ingest=")).toSeq.sorted
    }
    val ms = MemoryStream[String]
    val q = StreamingOps.ingestNewDocsNearDup(ms.toDF(), corpusDir,
      indexDir = Some(indexDir))
    try {
      val d1 = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11 a12"
      ms.addData(d1, "unrelated words entirely")
      q.processAllAvailable()
      val after1 = labels
      assert(after1 === Seq(s"ingest=${graft.sources.DedupIndexes.BaseLabel}"),
        "the bootstrap build owns the base ingest")
      // pure re-delivery: the maintenance delta is EMPTY — steady-state
      // streams must not accumulate one vacant label per batch
      ms.addData(d1)
      q.processAllAvailable()
      assert(labels === after1,
        "an empty delta must skip the append, not write a vacant ingest label")
      // a batch with genuinely new content still appends under its label
      ms.addData("fresh tokens nothing here shares at all now")
      q.processAllAvailable()
      assert(labels.size === 2,
        s"a non-empty delta must append under its own ingest label, got $labels")
    } finally q.stop()
  }

  test("grep-index ingest: every occurrence counts, freq deltas reconcile, replay-idempotent") {
    import java.nio.file.Files
    import graft.engine.GrepEngine
    import graft.sources.TextIndexes
    val dir = Files.createTempDirectory("graft-ingest-grep").resolve("idx").toString
    def probe(pattern: String): Set[(String, Long)] = {
      // re-read after every append: overwritten parquet invalidates
      // previously-derived frames (stale file listings)
      val (l, p, g) = TextIndexes.readGrepIndex(spark, dir)
      GrepEngine.grepFreqFromIndex(l, p, g, pattern)
        .as[(String, Long)].collect().toSet
    }
    val ms = MemoryStream[String]
    val q = StreamingOps.ingestLinesGrepIndex(ms.toDF(), dir)
    try {
      // batch 0: an in-batch duplicate — both occurrences must count
      ms.addData("the spark line", "the spark line", "other content")
      q.processAllAvailable()
      assert(probe("spark") === Set(("the spark line", 2L)),
        "in-batch duplicates count per occurrence")
      // batch 1: a GENUINE re-delivery of known content (must increment
      // freq, not dedup) + a novel matching line
      ms.addData("the spark line", "sparkling new")
      q.processAllAvailable()
      assert(probe("spark") ===
        Set(("the spark line", 3L), ("sparkling new", 1L)),
        "known content increments freq; novel content lands")
      // novel-only postings: the known line's trigram rows did not
      // duplicate across the two batches that carried it
      val hash = Seq("the spark line").toDF("line")
        .select(xxhash64($"line")).head.getLong(0)
      val perGram = spark.read.parquet(s"$dir/postings")
        .filter($"line_hash" === hash)
        .groupBy($"gram").count().select($"count").as[Long].collect()
      assert(perGram.nonEmpty && perGram.forall(_ === 1L),
        "a line's postings must exist exactly once no matter how often it arrives")
      // failure replay of batch 1: same label, same content — the
      // overwrite-on-own-label contract keeps every count unchanged
      TextIndexes.appendGrep(
        Seq("the spark line", "sparkling new").toDF("line"), "line", dir, "b1")
      assert(probe("spark") ===
        Set(("the spark line", 3L), ("sparkling new", 1L)),
        "a replayed append must change nothing")
    } finally q.stop()
  }

  test("a caller's persisted frame survives ingest batches (scoped cleanup)") {
    import java.nio.file.Files
    // the round-8 nit: the ingest sinks cleared the WHOLE session cache
    // per batch; a co-resident job's persisted frames died with it
    val callerFrame = Tables.documents(spark, TestSpark.sf0001)
      .select($"doc_id").persist()
    callerFrame.count()
    val base = Files.createTempDirectory("graft-ingest-scoped")
    val ms = MemoryStream[String]
    val q = StreamingOps.ingestFlagVerbatim(ms.toDF(),
      base.resolve("corpus").toString, base.resolve("flags").toString,
      indexDir = Some(base.resolve("index").toString))
    try {
      val span = (1 to 25).map(i => s"q$i").mkString(" ")
      ms.addData(s"h1 h2 $span t1", "unrelated doc")
      q.processAllAvailable()
      // a second batch that actually probes (and flags) — the full
      // detector pipeline with its internal persists runs here
      ms.addData(s"x1 x2 $span y1")
      q.processAllAvailable()
      assert(spark.read.parquet(base.resolve("flags").toString).count() === 1)
      assert(callerFrame.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
        "ingest batches must unpersist only detector-owned frames")
    } finally q.stop()
    callerFrame.unpersist()
  }

  test("expiring profiles: state evicted once the watermark passes last activity + TTL") {
    def us(s: String): Long = ts(s).getTime * 1000L
    val ms = MemoryStream[UserEvent]
    // 10-minute TTL so a 2-hour watermark jump is unambiguously past it
    val q = StreamingOps.runningUserProfilesExpiring(
        ms.toDS(), watermark = "10 minutes", ttlMs = 600000L)
      .writeStream.format("memory").queryName("upe").outputMode("update").start()
    try {
      ms.addData(UserEvent(1L, 10L, us("2024-01-01 10:00:00")),
                 UserEvent(1L, 11L, us("2024-01-01 10:01:00")))
      q.processAllAvailable()
      val r1 = spark.table("upe").as[UserProfile].collect()
      assert(r1.filter(_.user_id == 1L).map(_.n_events).max === 2L)
      // another user far ahead advances the watermark past user 1's
      // last activity + TTL → the timeout callback evicts user 1
      ms.addData(UserEvent(2L, 20L, us("2024-01-01 12:00:00")))
      q.processAllAvailable()
      // user 1 returns AFTER eviction: the profile restarts from zero
      // (documented contract — long-horizon profiles are batch-side)
      ms.addData(UserEvent(1L, 12L, us("2024-01-01 12:30:00")))
      q.processAllAvailable()
      val r2 = spark.table("upe").as[UserProfile].collect()
        .filter(r => r.user_id == 1L && r.last_us == us("2024-01-01 12:30:00"))
      assert(r2.nonEmpty && r2.map(_.n_events).max === 1L,
        "fresh profile after TTL eviction, not a continuation")
    } finally q.stop()
  }

  test("curation ingest dir guard: same-dir respellings rejected, prefix-sharing siblings allowed") {
    val base = java.nio.file.Files.createTempDirectory("curate-guard")
    val corpusDir = base.resolve("corpus").toString
    val ms = MemoryStream[String]
    // same dir, trailing-slash and dot-dot respellings: all rejected
    intercept[IllegalArgumentException](
      StreamingOps.ingestCuratedDocs(ms.toDF(), corpusDir, corpusDir))
    intercept[IllegalArgumentException](
      StreamingOps.ingestCuratedDocs(ms.toDF(), corpusDir, s"$corpusDir/"))
    intercept[IllegalArgumentException](
      StreamingOps.ingestCuratedDocs(ms.toDF(), corpusDir,
        base.resolve("x").resolve("..").resolve("corpus").toString))
    // ledger nested inside the corpus: rejected
    intercept[IllegalArgumentException](
      StreamingOps.ingestCuratedDocs(ms.toDF(), corpusDir, s"$corpusDir/ledger"))
    // a SIBLING sharing a raw name prefix must pass (the r11 ADVICE
    // false-rejection: /x/corpus vs /x/corpus-ledger)
    StreamingOps.ingestCuratedDocs(ms.toDF(), corpusDir,
      s"$corpusDir-ledger").stop()
  }

  test("curation ingest gates, dedupes, and ledgers every doc; " +
      "re-delivery and same-label replay are idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("curate-ingest").toString
    val corpusDir = s"$dir/corpus"
    val ledgerDir = s"$dir/ledger"
    // passes the gate: English, 25+ mostly-distinct tokens, stopwords
    val good1 = "the quick brown fox jumps over a lazy dog while many other " +
      "animals watch from distant green hills and the wind carries soft " +
      "autumn leaves across quiet village roads"
    val good2 = "a calm morning light spreads over the old harbor and small " +
      "boats drift past the stone pier while children wave from the wooden " +
      "bridge near open market stalls"
    // passes lang (all 'the' → en) but fails ttr → dropped_quality
    val badQuality = Seq.fill(25)("the").mkString(" ")
    // French stopword profile wins → dropped_lang
    val french = "le chat et la porte de la maison et le jardin entre les arbres"
    def ledgerByBatch: Map[(String, String), Long] =
      spark.read.parquet(ledgerDir)
        .groupBy(col("ingest"), col("outcome")).count()
        .as[(String, String, Long)].collect()
        .map { case (i, o, n) => (i, o) -> n }.toMap
    def corpusTexts: Set[String] =
      spark.read.parquet(corpusDir).select("text").as[String].collect().toSet

    val ms = MemoryStream[String]
    val q = StreamingOps.ingestCuratedDocs(ms.toDF(), corpusDir, ledgerDir)
    try {
      // good1 sent TWICE: in-batch exact collapse → one ledger row
      ms.addData(good1, good1, badQuality, french)
      q.processAllAvailable()
      assert(ledgerByBatch === Map(
        ("0", "ingested") -> 1L, ("0", "dropped_quality") -> 1L,
        ("0", "dropped_lang") -> 1L))
      assert(corpusTexts === Set(good1))
      // re-DELIVERY in a new batch: good1 is now a corpus duplicate
      ms.addData(good1, good2)
      q.processAllAvailable()
      assert(ledgerByBatch === Map(
        ("0", "ingested") -> 1L, ("0", "dropped_quality") -> 1L,
        ("0", "dropped_lang") -> 1L,
        ("1", "ingested") -> 1L, ("1", "dropped_duplicate") -> 1L))
      assert(corpusTexts === Set(good1, good2))
    } finally q.stop()
    // same-LABEL crash replay: re-run batch 1's body verbatim — the dup
    // check excludes the current label, so good2 must re-judge as
    // ingested (not flip to a duplicate of its own prior attempt) and
    // the own-label overwrite must leave corpus and ledger unchanged
    StreamingOps.curateBatch(Seq(good1, good2).toDF("value"),
      corpusDir, ledgerDir, "1")
    assert(ledgerByBatch === Map(
      ("0", "ingested") -> 1L, ("0", "dropped_quality") -> 1L,
      ("0", "dropped_lang") -> 1L,
      ("1", "ingested") -> 1L, ("1", "dropped_duplicate") -> 1L))
    assert(corpusTexts === Set(good1, good2))
    assert(spark.read.parquet(corpusDir).count() === 2L,
      "replay must not duplicate corpus rows")
    // the streaming gate IS the batch pipeline's gate: outcomes for the
    // same four docs under Pipeline.stageBits agree
    val bits = graft.operators.Pipeline.stageBits(
      Seq((1L, good1), (2L, good2), (3L, badQuality), (4L, french))
        .toDF("doc_id", "text"))
      .select(col("doc_id"), col("lang_ok"), col("quality_ok"))
      .as[(Long, Long, Long)].collect()
      .map { case (id, l, qk) => id -> ((l, qk)) }.toMap
    assert(bits(1L) === ((1L, 1L)) && bits(2L) === ((1L, 1L)))
    assert(bits(3L) === ((1L, 0L)), "badQuality passes lang, fails quality")
    assert(bits(4L)._1 === 0L, "french fails lang")
  }

  test("curation ingest near-dup gate: corpus and in-batch near-dups ledger " +
      "as dropped_near_duplicate; replay-idempotent; index maintained") {
    val dir = java.nio.file.Files.createTempDirectory("curate-neardup").toString
    val corpusDir = s"$dir/corpus"
    val ledgerDir = s"$dir/ledger"
    val idxDir = s"$dir/ndidx"
    // three quality-passing English docs, mutually NOT near-dups
    val good1 = "the quick brown fox jumps over a lazy dog while many other " +
      "animals watch from distant green hills and the wind carries soft " +
      "autumn leaves across quiet village roads"
    val good2 = "a calm morning light spreads over the old harbor and small " +
      "boats drift past the stone pier while children wave from the wooden " +
      "bridge near open market stalls"
    val good3 = "heavy winter clouds gather above the tall mountain pass and " +
      "a lone traveler follows the frozen river down toward the warm lights " +
      "of the valley town below"
    // one APPENDED token keeps word-3-gram Jaccard at (n-2)/(n-1) >= 0.8
    // (the Pipeline plantNearDups arithmetic)
    val near1 = good1 + " plantedneardup"
    val near2 = good2 + " anotherplanted"
    def outcomesOf(label: String): Map[String, String] =
      spark.read.parquet(ledgerDir).filter(col("ingest") === label)
        .join(spark.read.parquet(corpusDir).select(col("doc_id"), col("text"))
          .unionByName(Seq(near1, near2, good1, good2, good3).toDF("text")
            .select(xxhash64(md5(regexp_replace(trim(lower(col("text"))),
              "\\s+", " "))).as("doc_id"), col("text"))).distinct(),
          Seq("doc_id"), "left")
        .select(col("text"), col("outcome"))
        .as[(String, String)].collect().toMap
    // ground the gate's similarity facts first: the appended-token pairs
    // ARE >= 0.8 near-dups and the distinct docs are NOT
    val probe = Seq((1L, good1), (2L, near1), (3L, good2), (4L, good3))
      .toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.minHashNearDupsOn(probe)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)),
      s"fixture similarity assumptions broken: $pairs")

    // batch 0: bootstrap — good1 enters, index built
    StreamingOps.curateBatch(Seq(good1).toDF("value"),
      corpusDir, ledgerDir, "0", nearDupIndexDir = Some(idxDir))
    assert(outcomesOf("0") === Map(good1 -> "ingested"))
    assert(graft.sources.DedupIndexes.hasCompleteIndex(spark, idxDir))

    // batch 1: exact dup + corpus near-dup + in-batch near-dup pair + fresh
    StreamingOps.curateBatch(Seq(good1, near1, good2, near2, good3).toDF("value"),
      corpusDir, ledgerDir, "1", nearDupIndexDir = Some(idxDir))
    val o1 = outcomesOf("1")
    assert(o1(good1) === "dropped_duplicate")
    assert(o1(near1) === "dropped_near_duplicate",
      "a >= 0.8 near-dup of a corpus doc must be gated by the stored-index probe")
    assert(o1(good3) === "ingested")
    // the in-batch pair: exactly one enters (min-doc_id keeper), the
    // other drops as a near-dup — neither is in the corpus yet, so this
    // is the in-batch cluster collapse, not the corpus probe
    assert(Set(o1(good2), o1(near2)) === Set("ingested", "dropped_near_duplicate"))
    val corpusTexts = spark.read.parquet(corpusDir)
      .select("text").as[String].collect().toSet
    assert(corpusTexts.contains(good1) && corpusTexts.contains(good3))
    assert(corpusTexts.intersect(Set(good2, near2)).size === 1)
    val indexedAfter1 = graft.sources.DedupIndexes.indexedDocIds(spark, idxDir)
      .as[Long].collect().toSet
    // every corpus doc is indexed — the sink maintains the identity it probes
    val corpusIds = spark.read.parquet(corpusDir)
      .select("doc_id").as[Long].collect().toSet
    assert(indexedAfter1 === corpusIds,
      "the stored index must cover exactly the corpus after maintenance")

    // same-label crash replay of batch 1: outcomes identical (own label
    // excluded from corpus, probe, and indexed-set), nothing grows
    StreamingOps.curateBatch(Seq(good1, near1, good2, near2, good3).toDF("value"),
      corpusDir, ledgerDir, "1", nearDupIndexDir = Some(idxDir))
    assert(outcomesOf("1") === o1,
      "replaying the same label must re-judge identical outcomes")
    assert(spark.read.parquet(corpusDir).count() === corpusIds.size.toLong,
      "replay must not grow the corpus")
    assert(graft.sources.DedupIndexes.indexedDocIds(spark, idxDir)
      .as[Long].collect().toSet === indexedAfter1,
      "replay must not grow the index")
  }

  // -- graded-reference-similarity corpus shared by the stored-model
  // gate tests (classifier / perplexity): a VALUE-separable score
  // distribution — the sf fixture's 31-token shared vocabulary ties
  // nearly every doc at bits_per_100 = 10000, which only a rank rule
  // can split. Doc i carries i reference-vocabulary tokens and 60-i
  // crawl-vocabulary tokens (plus a fixed stopword scaffold for
  // lang/stop_pct and i unique fillers so lengths differ too); all 60
  // docs pass every quality rule (all-distinct tokens: ttr 100, rep 0)
  // and their reference similarity rises with i --
  private val gradedStop = Seq("the", "and", "of", "to", "in", "a", "is", "was")
  private val gradedRefVocab = (0 until 60).map(j => f"river$j%02d")
  private val gradedCrawlVocab = (0 until 60).map(j => f"gadget$j%02d")
  private lazy val gradedTexts: Seq[String] = (0 until 60).map { i =>
    (gradedStop ++ gradedRefVocab.take(i) ++ gradedCrawlVocab.drop(i) ++
      (0 until i).map(k => f"fill$i%02dx$k%02d")).mkString(" ")
  }
  private def gradedRef =
    Seq.fill(5)((gradedStop ++ gradedRefVocab).mkString(" ")).toDF("text")
  private def gradedFp =
    md5(regexp_replace(trim(lower(col("text"))), "\\s+", " "))

  test("stage-scope contract: one streaming delivery == batch curateOn " +
      "restricted to its stages (lang/blocklist/quality/exact/near-dup)") {
    // THE scope pin (r13 verdict #4, blocklist added r15):
    // ingestCuratedDocs implements the batch pipeline's lang ->
    // blocklist -> quality -> exact-dedup -> near-dedup prefix;
    // batch-only stages (split/decontam/verbatim/ppl — and classifier
    // unless a stored model is wired, its own test below) are out of
    // scope, and batch train/eval both map to streaming `ingested`.
    // Asserted outcome-for-outcome over the REAL fixture corpus: ids on
    // the batch side are the streaming sink's own fingerprint-derived
    // ids, so every min-id keeper race is decided identically by
    // construction. The blocklist rides BOTH sides at the driver terms
    // ("dup" hits a real fixture slice) — batch as the codegen'd
    // literal rule, streaming as the broadcast-join spelling
    // (ProfileSpec pins the two spellings equal).
    val dir = java.nio.file.Files.createTempDirectory("curate-scope").toString
    val corpusDir = s"$dir/corpus"
    val ledgerDir = s"$dir/ledger"
    val idxDir = s"$dir/ndidx"
    val terms = graft.operators.Profile.driverBlocklist
    val docsRaw = Tables.documents(spark, TestSpark.sf0001).select(col("text"))
    // plant one near-dup of a doc that passes lang, blocklist AND
    // quality so the near-dup class is non-vacuous at this SF (the
    // Pipeline plantNearDups arithmetic: one appended token keeps
    // word-3-gram Jaccard >= 0.8) — an earlier-gate drop of the source
    // would shadow the class (the blocklist terms hit "dup" docs, so
    // the pre-r15 longest-doc pick is no longer guaranteed clean)
    val fpOf0 = md5(regexp_replace(trim(lower(col("text"))), "\\s+", " "))
    val planted = graft.operators.Pipeline.stageBits(
        docsRaw.select(xxhash64(fpOf0).as("doc_id"), col("text")), "en")
      .filter(col("lang_ok") === 1L && col("quality_ok") === 1L &&
        !arrays_overlap(graft.operators.TextOps.tokens(lower(col("text"))),
          array(terms.map(t => lit(t.toLowerCase)): _*)))
      .orderBy(length(col("text")).desc).limit(1)
      .select(concat(col("text"), lit(" plantedneardup")).as("text"))
    val texts = docsRaw.unionByName(planted)
    val fpOf = md5(regexp_replace(trim(lower(col("text"))), "\\s+", " "))
    val arrival = texts
      .select(xxhash64(fpOf).as("doc_id"), col("text")).distinct()
    val batchOutcome = graft.operators.Pipeline
      .curateOn(arrival, nearDedup = true, contamMinPct = 101L,
        blocklist = terms)
      .select(col("doc_id"),
        when(col("outcome").isin("train", "eval"), lit("ingested"))
          .otherwise(col("outcome")).as("outcome"))
      .as[(Long, String)].collect().toMap
    def deliver(): Unit = StreamingOps.curateBatch(
      texts.select(col("text").as("value")),
      corpusDir, ledgerDir, "0", nearDupIndexDir = Some(idxDir),
      blocklistTerms = Some(terms.toDF("term")))
    deliver()
    val streamOutcome = spark.read.parquet(ledgerDir)
      .select(col("doc_id"), col("outcome"))
      .as[(Long, String)].collect().toMap
    assert(streamOutcome === batchOutcome,
      "one streaming delivery must judge exactly as the batch pipeline " +
        "restricted to the streaming stages")
    // the contract is non-vacuous on every in-scope outcome class this
    // single-delivery shape can produce (cross-batch dropped_duplicate
    // is the earlier ingest test's job)
    val classes = streamOutcome.values.toSet
    assert(classes.contains("ingested") && classes.contains("dropped_lang") &&
      classes.contains("dropped_blocklist") &&
      classes.contains("dropped_quality") &&
      classes.contains("dropped_near_duplicate"),
      s"fixture must exercise every in-scope outcome class, got $classes")
    // replay the same label with the blocklist wired: outcomes
    // identical, corpus unchanged — the stage is stateless per-row, so
    // the label-based replay contract carries over untouched
    val corpusBefore = spark.read.parquet(corpusDir)
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    deliver()
    assert(spark.read.parquet(ledgerDir)
        .select(col("doc_id"), col("outcome"))
        .as[(Long, String)].collect().toMap === streamOutcome,
      "a replayed delivery must recompute identical outcomes")
    assert(spark.read.parquet(corpusDir)
        .select(col("doc_id")).as[Long].collect().sorted.toSeq === corpusBefore,
      "a replayed delivery must not grow the corpus")
  }

  test("streaming classifier gate from the stored model+cutoff: batch-train " +
      "equality, pinned eval-split divergence, replay-idempotent") {
    // The batch classifier stage (Pipeline.curateOn clfRef) is
    // DISTRIBUTIONAL — bottom reference-similarity tertile of the
    // corpus's train survivors — which a micro-batch cannot recompute.
    // The streaming spelling is score-vs-stored-cutoff: the boundary is
    // calibrated ONCE (here: from the batch pipeline's own train
    // survivors — the production flow, where a batch run calibrates and
    // the stream applies) and pinned in the model artifact. Contract
    // asserted here, in three parts:
    //   1. on batch-TRAIN docs: outcome-for-outcome equality
    //      (dropped_classifier <-> dropped_classifier, train <-> ingested);
    //   2. on batch-EVAL docs: the PINNED divergence — batch exempts
    //      eval docs BY SPLIT (the benchmark must survive), streaming
    //      has no split, so a below-cutoff eval doc streams to
    //      dropped_classifier while batch keeps it;
    //   3. same-label replay re-judges identical outcomes.
    val dir = java.nio.file.Files.createTempDirectory("curate-clf").toString
    val corpusDir = s"$dir/corpus"
    val ledgerDir = s"$dir/ledger"
    val modelDir = s"$dir/nbmodel"
    // the cap must admit the WHOLE graded vocabulary (128 = stopwords +
    // both 60-token vocabularies): a tighter cap zeroes the mid-range
    // tokens' weights and flattens half the corpus onto one score value
    val vocab = 128
    val docsRaw = gradedTexts.toDF("text")
    val arrival = docsRaw
      .select(xxhash64(gradedFp).as("doc_id"), col("text")).distinct()
    val ref = gradedRef
    // calibration: model counts = (ref positive vs this corpus negative),
    // exactly the batch stage's nbWeightsOn inputs; cutoff from the
    // train survivors of a classifier-less run with the same stages
    graft.sources.ClassifierModels.writeNbModel(
      ref, arrival.select(col("text")), modelDir)
    val pre = graft.operators.Pipeline.curateOn(arrival, contamMinPct = 101L)
    val trainDocs = arrival.join(
      pre.filter(col("outcome") === "train").select(col("doc_id")), "doc_id")
    graft.sources.ClassifierModels.writeNbCutoff(trainDocs, modelDir, vocab)
    val Some((cutoff, vRead)) =
      graft.sources.ClassifierModels.readNbCutoff(spark, modelDir): @unchecked
    assert(vRead === vocab, "the cutoff must pin the vocab cap it was fit under")
    // the rank-vs-value residual precondition, asserted so a fixture
    // drift fails HERE, attributably: no batch-kept train doc may tie
    // the boundary value
    val scoredAll = graft.operators.Classifier.nbScoreOn(
        arrival.select(col("doc_id"), col("text")),
        graft.sources.ClassifierModels.readNbWeights(spark, modelDir, vocab))
      .select(col("doc_id"),
        expr("(score * 100 + 10000 * n_tokens) DIV n_tokens").as("bits_per_100"))
    val bp = scoredAll.as[(Long, Long)].collect().toMap
    val batchOutcome = graft.operators.Pipeline
      .curateOn(arrival, contamMinPct = 101L,
        clfRef = Some(ref), clfVocab = vocab)
      .select(col("doc_id"), col("outcome"))
      .as[(Long, String)].collect().toMap
    val batchDrops = batchOutcome.collect {
      case (id, "dropped_classifier") => id }.toSet
    assert(batchDrops.nonEmpty, "the batch classifier stage must fire on this fixture")
    val keptTrainAtBoundary = batchOutcome.collect {
      case (id, "train") if bp(id) == cutoff => id }
    assert(keptTrainAtBoundary.isEmpty,
      s"fixture precondition broken: batch-kept train docs tie the boundary value $cutoff")

    StreamingOps.curateBatch(docsRaw.select(col("text").as("value")),
      corpusDir, ledgerDir, "0", clfModelDir = Some(modelDir))
    def streamOutcomes: Map[Long, String] = spark.read.parquet(ledgerDir)
      .select(col("doc_id"), col("outcome"))
      .as[(Long, String)].collect().toMap
    val so = streamOutcomes
    // part 1: batch-train equality
    batchOutcome.foreach {
      case (id, "dropped_classifier") =>
        assert(so(id) === "dropped_classifier",
          s"doc $id: batch classifier-dropped, streaming says ${so(id)}")
      case (id, "train") =>
        assert(so(id) === "ingested",
          s"doc $id: batch-kept train doc, streaming says ${so(id)}")
      case (id, "eval") => // part 2 below
      case (id, other) =>
        assert(so(id) === other,
          s"doc $id: pre-classifier outcome $other must ride through unchanged")
    }
    // part 2: the pinned eval-split divergence, exercised in BOTH
    // directions (a vacuous direction would pin nothing)
    val evalIds = batchOutcome.collect { case (id, "eval") => id }.toSet
    val evalBelow = evalIds.filter(id => bp(id) <= cutoff)
    val evalAbove = evalIds -- evalBelow
    assert(evalBelow.nonEmpty && evalAbove.nonEmpty,
      s"fixture must exercise both eval-score sides of the cutoff " +
        s"(below=${evalBelow.size}, above=${evalAbove.size})")
    evalBelow.foreach(id => assert(so(id) === "dropped_classifier",
      s"doc $id: below-cutoff eval doc must stream to dropped_classifier " +
        "(streaming has no split — the documented scope difference)"))
    evalAbove.foreach(id => assert(so(id) === "ingested",
      s"doc $id: above-cutoff eval doc must stream to ingested"))
    // classifier drops never enter the corpus
    val corpusIds = spark.read.parquet(corpusDir)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(corpusIds.intersect(batchDrops ++ evalBelow).isEmpty,
      "classifier-dropped docs must not land in the corpus")
    // part 3: same-label crash replay — identical outcomes, no growth
    StreamingOps.curateBatch(docsRaw.select(col("text").as("value")),
      corpusDir, ledgerDir, "0", clfModelDir = Some(modelDir))
    assert(streamOutcomes === so,
      "replaying the same label must re-judge identical outcomes")
    assert(spark.read.parquet(corpusDir).count() === corpusIds.size.toLong,
      "replay must not grow the corpus")
  }

  test("streaming perplexity annotation from the stored LM+cutoffs: " +
      "bucket-for-bucket with batch pplRef, NULL for dropped, replay-idempotent") {
    // The batch ppl stage (Pipeline.curateOn pplRef) buckets survivors
    // head/middle/tail over the SURVIVOR score distribution — again not
    // per-batch-computable, so the streaming spelling is
    // score-vs-stored-boundaries: the unigram LM lives in the stored
    // model (LmModels — counts merge exactly) and BOTH tertile
    // boundaries are calibrated once (here from the batch run's own
    // survivors) and pinned. Unlike the classifier gate this stage
    // never drops: ingested docs gain ppl_bucket, dropped docs carry
    // NULL — exactly the batch annotate-not-drop contract.
    val dir = java.nio.file.Files.createTempDirectory("curate-ppl").toString
    val corpusDir = s"$dir/corpus"
    val ledgerDir = s"$dir/ledger"
    val modelDir = s"$dir/lmmodel"
    val vocab = 128
    val docsRaw = gradedTexts.toDF("text")
    val arrival = docsRaw
      .select(xxhash64(gradedFp).as("doc_id"), col("text")).distinct()
    val ref = gradedRef
    val batchLedger = graft.operators.Pipeline
      .curateOn(arrival, contamMinPct = 101L,
        pplRef = Some(ref), pplVocab = vocab)
      .select(col("doc_id"), col("outcome"), col("ppl_bucket"))
      .as[(Long, String, Option[String])].collect()
    val batchBuckets = batchLedger.collect {
      case (id, o, Some(b)) if o == "train" || o == "eval" => id -> b }.toMap
    assert(batchBuckets.nonEmpty, "the batch ppl stage must fire on this fixture")
    assert(batchBuckets.values.toSet === Set("head", "middle", "tail"),
      "fixture must exercise all three buckets")
    // calibration: stored LM = the ref counts; boundaries from the
    // batch run's own survivors (the production flow)
    graft.sources.LmModels.writeLmModel(ref, modelDir)
    val survivors = arrival.join(
      batchBuckets.keys.toSeq.toDF("doc_id"), "doc_id")
    graft.sources.LmModels.writeLmCutoffs(survivors, modelDir, vocab)
    val Some((q1, q2, vRead)) =
      graft.sources.LmModels.readLmCutoffs(spark, modelDir): @unchecked
    assert(vRead === vocab)
    assert(q1 < q2, s"fixture must separate the boundaries, got q1=$q1 q2=$q2")
    // rank-vs-value residual precondition: no off-tertile survivor may
    // tie a boundary value (fails HERE, attributably, on fixture drift)
    val bp = graft.sources.LmModels.lmScoreStoredOn(
        arrival.select(col("doc_id"), col("text")), modelDir, vocab)
      .select(col("doc_id"), col("bits_per_100"))
      .as[(Long, Long)].collect().toMap
    batchBuckets.foreach { case (id, b) =>
      if (bp(id) == q1) assert(b === "head",
        s"doc $id ties q1=$q1 but batch-buckets $b — value rule cannot reproduce rank")
      if (bp(id) == q2) assert(b === "middle" || b === "head",
        s"doc $id ties q2=$q2 but batch-buckets $b")
    }

    StreamingOps.curateBatch(docsRaw.select(col("text").as("value")),
      corpusDir, ledgerDir, "0", pplModelDir = Some(modelDir))
    def ledgerNow: Map[Long, (String, Option[String])] =
      spark.read.parquet(ledgerDir)
        .select(col("doc_id"), col("outcome"), col("ppl_bucket"))
        .as[(Long, String, Option[String])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    val so = ledgerNow
    // bucket-for-bucket equality on every batch survivor (train/eval ->
    // ingested carries the same bucket)
    batchBuckets.foreach { case (id, b) =>
      assert(so(id) === (("ingested", Some(b))),
        s"doc $id: batch buckets $b, streaming says ${so(id)}")
    }
    // dropped docs carry NULL, annotated ingested set == batch survivors
    so.foreach { case (id, (o, pb)) =>
      if (o != "ingested") assert(pb.isEmpty,
        s"doc $id: dropped docs must carry NULL ppl_bucket, got $pb")
    }
    assert(so.collect { case (id, ("ingested", _)) => id }.toSet ===
      batchBuckets.keySet,
      "streaming ingested set must equal the batch survivor set")
    // same-label replay: identical annotations
    StreamingOps.curateBatch(docsRaw.select(col("text").as("value")),
      corpusDir, ledgerDir, "0", pplModelDir = Some(modelDir))
    assert(ledgerNow === so, "replay must re-judge identical annotations")
  }

  test("streaming verbatim gate from the stored positional index: cross-corpus " +
      "and in-batch cuts, arriving-doc asymmetry pinned, replay-idempotent") {
    // The batch pipeline's last missing streaming stage (3c, the
    // ExactSubstr pass): arriving docs lose >= 20-token runs shared
    // with COMMITTED corpus text (stored positional-index probe) and
    // with their OWN delivery (the batch higher-id rule); docs are
    // cleaned, never dropped; the corpus lands CLEANED text and the
    // index is maintained with it. The ONE deliberate asymmetry vs
    // batch, pinned here: committed text is immutable, so a cross run
    // always cuts from the ARRIVING doc even when it holds the SMALLER
    // id (batch would cut the higher id).
    val dir = java.nio.file.Files.createTempDirectory("curate-verbatim").toString
    val corpusDir = s"$dir/corpus"
    val ledgerDir = s"$dir/ledger"
    val vbDir = s"$dir/vbidx"
    val stop = Seq("the", "and", "of", "to", "in", "a", "is", "was")
    val w = (0 until 32).map(j => f"wood$j%02d")   // committed doc body
    // pick docB's filler vocabulary so the ARRIVING doc holds the
    // SMALLER id — the asymmetry case the test must exercise (batch
    // would cut committed docA then; streaming must cut docB): ids are
    // deterministic content hashes, so scan a few spellings and take
    // the first that lands below docA's id
    val docAText = (stop ++ w).mkString(" ")
    def idOfText(t: String): Long = Seq(t).toDF("text")
      .select(xxhash64(gradedFp)).as[Long].head
    val idA = idOfText(docAText)
    def qOf(v: Int): IndexedSeq[String] =
      (0 until 12).map(j => f"quay$v%03d$j%02d")
    val q = {
      val hit = (0 until 512)
        .map(v => (v, (stop ++ qOf(v) ++ w.take(25)).mkString(" ")))
        .toDF("v", "text")
        .select(col("v"), xxhash64(gradedFp).as("id"))
        .filter(col("id") < idA).orderBy(col("v")).limit(1)
        .as[(Int, Long)].collect()
      assert(hit.nonEmpty, "no filler spelling yields an arriving id " +
        "below the committed id — widen the candidate scan")
      qOf(hit.head._1)
    }
    val s25 = (0 until 25).map(j => f"sail$j%02d") // the in-batch shared run
    val c12 = (0 until 12).map(j => f"cliff$j%02d")
    val d12 = (0 until 12).map(j => f"dune$j%02d")
    val e20 = (0 until 20).map(j => f"elm$j%02d")
    val docA = docAText                                        // committed
    val docB = (stop ++ q ++ w.take(25)).mkString(" ")         // copies 25 of A
    val docC = (stop ++ c12 ++ s25).mkString(" ")              // in-batch pair
    val docD = (stop ++ d12 ++ s25).mkString(" ")
    val docE = (stop ++ e20).mkString(" ")                     // untouched
    def idOf(t: String): Long = Seq(t).toDF("text")
      .select(xxhash64(gradedFp)).as[Long].head

    StreamingOps.curateBatch(Seq(docA).toDF("value"),
      corpusDir, ledgerDir, "0", verbatimIndexDir = Some(vbDir))
    StreamingOps.curateBatch(Seq(docB, docC, docD, docE).toDF("value"),
      corpusDir, ledgerDir, "1", verbatimIndexDir = Some(vbDir))

    def corpusText: Map[Long, String] = spark.read.parquet(corpusDir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    def ledgerCuts: Map[Long, (String, Long)] = spark.read.parquet(ledgerDir)
      .filter(col("ingest") === "1")
      .select(col("doc_id"), col("outcome"), col("n_tokens_removed"))
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val ct = corpusText
    val lc = ledgerCuts
    assert(lc.values.forall(_._1 === "ingested"),
      "the verbatim stage cleans, never drops")
    // cross-corpus cut: docB lost exactly the 25 copied tokens — and the
    // asymmetry is NON-VACUOUS: this arriving doc holds the SMALLER id,
    // where the batch bidirectional rule would have cut committed docA
    assert(ct(idOf(docB)) === (stop ++ q).mkString(" "),
      "the arriving copy must lose exactly the committed run")
    assert(lc(idOf(docB))._2 === 25L)
    assert(idOf(docB) < idOf(docA),
      "fixture construction broke: the arriving doc must hold the " +
        "smaller id so the asymmetry vs the batch higher-id rule is " +
        "actually exercised")
    // in-batch pair: the batch higher-id rule — one of C/D loses s25
    val (hi, lo) = if (idOf(docC) > idOf(docD)) (docC, docD) else (docD, docC)
    val hiKept = if (hi == docC) stop ++ c12 else stop ++ d12
    assert(ct(idOf(hi)) === hiKept.mkString(" "),
      "the higher-id in-batch doc must lose the shared run")
    assert(ct(idOf(lo)) === lo, "the lower-id in-batch doc keeps its text")
    assert(lc(idOf(hi))._2 === 25L && lc(idOf(lo))._2 === 0L)
    // untouched doc: text verbatim, zero removed
    assert(ct(idOf(docE)) === docE && lc(idOf(docE))._2 === 0L)
    // committed text is immutable
    assert(ct(idOf(docA)) === docA)
    // the index covers the corpus's CLEANED text: a re-arrival of docB's
    // CLEANED content must now be judged against it (exact-dup via fp of
    // the ORIGINAL is a different fp, so this lands as a verbatim cut)
    val posCount = spark.read.parquet(s"$vbDir/positions").count()

    // same-label crash replay: own-label exclusion everywhere — a doc
    // must never self-match its own prior rows (which would cut its
    // WHOLE text); corpus, ledger, and index byte-stable
    StreamingOps.curateBatch(Seq(docB, docC, docD, docE).toDF("value"),
      corpusDir, ledgerDir, "1", verbatimIndexDir = Some(vbDir))
    assert(corpusText === ct, "replay must not change corpus text")
    assert(ledgerCuts === lc, "replay must re-judge identical cut measures")
    assert(spark.read.parquet(s"$vbDir/positions").count() === posCount,
      "replay must not grow the index")
  }

  test("session_window spelling equals the oracle-checked batch sessionizer " +
      "on the real events table") {
    // The streaming path sessionizes with Spark's native session_window;
    // the batch path (q_event_sessions, DuckDB-oracle-green) uses the
    // hand-salted two-phase sessionizer. Same gap rule, so on the same
    // input they must produce the SAME sessions — this ties the streaming
    // spelling to the oracle without putting streaming in the oracle set.
    // Boundary nuance: session_window extends a session while the next
    // event is STRICTLY closer than the gap; the batch rule uses <=. The
    // guard below proves no adjacent pair in the data sits exactly at the
    // gap, so the two rules cannot diverge on this input.
    val gapSec = 600L
    val ev = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("user_id"), col("ts"),
        unix_micros(col("ts")).as("us"))
    val exactGapPairs = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("us").asc)
      ev.withColumn("delta", col("us") - lag(col("us"), 1).over(w))
        .filter(col("delta") === gapSec * 1000000L).count()
    }
    assert(exactGapPairs === 0L,
      "data has an adjacent pair exactly at the gap — the <= vs < boundary " +
        "semantics difference would make this equivalence ill-posed; pick another gap")
    // the streaming transform, applied in batch mode (session_window works
    // in both; batch mode needs no watermark)
    val viaWindow = ev
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapSec seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        // session_window end = last event + gap; normalize to last-event us
        (unix_micros(col("session_window.end")) - gapSec * 1000000L).as("end_us"),
        col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val viaSalted = graft.operators.AsOf
      .sessionizeSaltedEvents(ev.select(col("event_id"), col("user_id"), col("us")), gapSec)
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(viaWindow === viaSalted,
      "native session_window and the salted sessionizer disagree on identical input")
    assert(viaWindow.nonEmpty, "vacuous equivalence — no sessions formed")
  }

  test("streaming corpus stats: stored-partials card == batch card, replay-idempotent") {
    import java.nio.file.Files
    import graft.operators.Profile
    val statsDir = Files.createTempDirectory("graft-stats").resolve("stats").toString
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    val rows = docs.as[(Long, String, String, String, Long)].collect()
    val ms = MemoryStream[(Long, String, String, String, Long)]
    val q = StreamingOps.ingestCorpusStats(
      ms.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"), statsDir)
    try {
      // three uneven micro-batches covering the whole fixture
      rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { g =>
        ms.addData(g.toSeq); q.processAllAvailable()
      }
    } finally q.stop()
    val stored = Profile.corpusCardFromStats(spark, statsDir)
      .orderBy("source").collect().map(_.toString)
    val batch = Profile.corpusCardOn(docs)
      .orderBy("source").collect().map(_.toString)
    assert(stored === batch,
      "merged per-ingest partials diverge from the one-pass batch card")
    // same-label crash replay: re-delivering batch 0's slice under its
    // own label overwrites, never double-counts
    StreamingOps.corpusStatsBatch(
      rows.take(math.max(1, rows.length / 3 + 1)).toSeq
        .toDF("doc_id", "text", "lang", "source", "n_chars"), statsDir, "b0")
    val replayed = Profile.corpusCardFromStats(spark, statsDir)
      .orderBy("source").collect().map(_.toString)
    assert(replayed === batch, "replayed own-label delivery changed the card")
    // empty recovery replay appends no vacant label
    StreamingOps.corpusStatsBatch(
      docs.filter(lit(false)), statsDir, "b99")
    assert(!spark.read.parquet(statsDir).select("ingest")
      .as[String].collect().contains("b99"))
  }

  test("streaming cluster stats: writeStream path == batch profile over all deliveries") {
    import java.nio.file.Files
    import graft.operators.{Clustering, Similarity}
    val statsDir = Files.createTempDirectory("graft-clstats").resolve("stats").toString
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding"))
    val centroids = Similarity.fitQuantizer(emb, TestSpark.sf0001, 8)
    val rows = emb.as[(Long, Seq[Float])].collect()
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = StreamingOps.ingestClusterStats(
      ms.toDF().toDF("vec_id", "embedding"), statsDir, centroids)
    try {
      rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { g =>
        ms.addData(g.toSeq); q.processAllAvailable()
      }
    } finally q.stop()
    val stored = Clustering.clusterProfileFromStats(spark, statsDir)
      .orderBy("cell").collect().map(_.toString)
    val batch = Clustering.clusterProfileOn(emb, TestSpark.sf0001, 8)
      .orderBy("cell").collect().map(_.toString)
    assert(stored === batch,
      "merged per-ingest cluster partials diverge from the batch profile")
  }

  test("streaming funnel == batch funnel under event-time-ordered delivery") {
    val ms = MemoryStream[TypedEvent]
    val q = StreamingOps.streamingFunnel(ms.toDS(),
        Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("sfun")
      .outputMode("update").start()
    val events = Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .as[TypedEvent].collect().sortBy(_.us)
    try {
      // three event-time-ordered micro-batches (shuffled WITHIN each
      // batch — intra-batch arrival order must not matter)
      val rnd = new scala.util.Random(42)
      events.grouped(events.length / 3 + 1).foreach { g =>
        ms.addData(rnd.shuffle(g.toSeq)); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("sfun")
      .groupBy("user_id").agg(max("funnel_stage").as("funnel_stage"))
      .as[(Long, Long)].collect().toMap
    val batch = graft.operators.EventAnalytics
      .funnelOn(Tables.events(spark, TestSpark.sf0001), Seq("view", "click", "purchase"))
      .as[(Long, Long)].collect().toMap
    assert(streamed === batch,
      "incremental funnel state diverges from the batch min-reach-time chain")
    // at sf0.001 every user has enough events to finish — the content
    // of this test is the equality; full completion is the non-trivial
    // progression (0 would mean the stage machine never advanced)
    assert(batch.values.max === 3L, "no user completed the funnel")
  }

  test("streaming funnel: strictly-after gate holds across micro-batches") {
    val ms = MemoryStream[TypedEvent]
    val q = StreamingOps.streamingFunnel(ms.toDS(), Seq("view", "click"))
      .writeStream.format("memory").queryName("sfun2")
      .outputMode("update").start()
    try {
      ms.addData(TypedEvent(1L, "view", 100L)); q.processAllAvailable()
      // click at the SAME event time in a later batch must not advance
      ms.addData(TypedEvent(1L, "click", 100L)); q.processAllAvailable()
      ms.addData(TypedEvent(1L, "click", 101L)); q.processAllAvailable()
    } finally q.stop()
    val stages = spark.table("sfun2").select("funnel_stage")
      .as[Long].collect()
    assert(stages.max === 2L && stages.toSeq.sorted === Seq(1L, 1L, 2L))
  }

  test("same transform runs in batch mode over the events table") {
    val batch = StreamingOps.windowedEventCounts(
      Tables.events(spark, TestSpark.sf0001), windowLen = "1 day")
    val viaDaily = graft.operators.Relational.eventsDaily(spark, TestSpark.sf0001)
    // per-day totals agree between the windowed transform and the batch
    // daily aggregate (windows are UTC-aligned days)
    val w = batch.groupBy(to_date(col("window_start")).as("day"))
      .agg(sum("n").as("n")).as[(String, Long)].collect().toMap
    val d = viaDaily.groupBy(col("day")).agg(sum("n_events").as("n"))
      .as[(String, Long)].collect().toMap
    assert(w === d)
  }

  test("cdc ingest: cross-batch latest-wins, tombstones, merge-on-read state") {
    import java.nio.file.Files
    val state = Files.createTempDirectory("graft-cdc").resolve("state").toString
    val ms = MemoryStream[(Long, Long, String, Long)]
    val q = StreamingOps.ingestChangelog(
      ms.toDF().toDF("key", "seq", "op", "v"), state)
    try {
      // batch 0: inserts for 1..3, plus an in-batch overwrite of key 1
      ms.addData((1L, 1L, "U", 10L), (1L, 4L, "U", 11L),
        (2L, 2L, "U", 20L), (3L, 3L, "U", 30L))
      q.processAllAvailable()
      val s0 = StreamingOps.changelogState(spark, state)
        .as[(Long, Long, String, Long)].collect()
        .map(r => r._1 -> r._4).toMap
      assert(s0 === Map(1L -> 11L, 2L -> 20L, 3L -> 30L))
      // batch 1: delete key 2, update key 3, insert key 9
      ms.addData((2L, 5L, "D", 0L), (3L, 6L, "U", 31L), (9L, 7L, "U", 90L))
      q.processAllAvailable()
      val s1 = StreamingOps.changelogState(spark, state)
        .as[(Long, Long, String, Long)].collect()
        .map(r => r._1 -> r._4).toMap
      assert(s1 === Map(1L -> 11L, 3L -> 31L, 9L -> 90L))
      // a STALE late row for key 3 (seq below the winner) must not win
      ms.addData((3L, 2L, "U", 999L))
      q.processAllAvailable()
      val s2 = StreamingOps.changelogState(spark, state)
        .as[(Long, Long, String, Long)].collect()
        .map(r => r._1 -> r._4).toMap
      assert(s2 === s1, "stale seq must lose the merge-on-read arg-max")
    } finally q.stop()
  }

  test("cdc ingest: same-label replay idempotent; compaction drops tombstones") {
    import java.nio.file.Files
    val state = Files.createTempDirectory("graft-cdc-r").resolve("state").toString
    val b0 = Seq((1L, 1L, "U", 10L), (2L, 2L, "U", 20L))
      .toDF("key", "seq", "op", "v")
    val b1 = Seq((2L, 3L, "D", 0L), (5L, 4L, "U", 50L))
      .toDF("key", "seq", "op", "v")
    StreamingOps.changelogBatch(b0, state, "0", "key", "seq", "op")
    StreamingOps.changelogBatch(b1, state, "1", "key", "seq", "op")
    // crash-replay of label 1: own-label overwrite, state unchanged
    StreamingOps.changelogBatch(b1, state, "1", "key", "seq", "op")
    val live = StreamingOps.changelogState(spark, state)
      .as[(Long, Long, String, Long)].collect().map(r => r._1 -> r._4).toMap
    assert(live === Map(1L -> 10L, 5L -> 50L))
    // stored rows: 2 (label 0) + 2 (label 1, replay overwrote) = 4
    assert(spark.read.parquet(state).count() === 4L)
    // compaction: one live row per key, tombstone gone, state identical
    val dst = Files.createTempDirectory("graft-cdc-r").resolve("compact").toString
    StreamingOps.compactChangelogTo(spark, state, dst)
    assert(spark.read.parquet(dst).count() === 2L)
    val compacted = StreamingOps.changelogState(spark, dst)
      .as[(Long, Long, String, Long)].collect().map(r => r._1 -> r._4).toMap
    assert(compacted === live)
    // overlap refusal fires before any write
    val e = intercept[IllegalArgumentException] {
      StreamingOps.compactChangelogTo(spark, state, state + "/sub")
    }
    assert(e.getMessage.contains("overlaps"))
    // sibling dirs sharing a PREFIX are not overlap (qualified-path idiom)
    StreamingOps.compactChangelogTo(spark, state, state + "-sibling")
    assert(StreamingOps.changelogState(spark, state + "-sibling")
      .count() === 2L)
    // SQL front door: the registered view IS the merge-on-read state
    graft.sources.IndexSql.registerChangelogState(spark, "cdc_state", state)
    val viaSql = spark.sql("SELECT key, v FROM cdc_state")
      .as[(Long, Long)].collect().toMap
    assert(viaSql === live)
  }

  test("cdc ingest e2e: file source + checkpoint, exactly-once across restarts") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-cdc-e2e")
    val in = root.resolve("in"); Files.createDirectories(in)
    val state = root.resolve("state").toString
    val ckpt = root.resolve("ckpt").toString
    val schema = "key LONG, seq LONG, op STRING, v LONG"
    def addFile(name: String, rows: Seq[String]): Unit = {
      val tmp = root.resolve(name + ".tmp")
      Files.write(tmp, rows.mkString("\n").getBytes("UTF-8"))
      Files.move(tmp, in.resolve(name)) // atomic appearance
    }
    def start() = StreamingOps.ingestChangelog(
      spark.readStream.schema(schema).json(in.toString),
      state, checkpointDir = Some(ckpt))

    addFile("a.json", Seq(
      """{"key":1,"seq":1,"op":"U","v":10}""",
      """{"key":2,"seq":2,"op":"U","v":20}"""))
    val q1 = start()
    q1.processAllAvailable(); q1.stop() // "kill" after the first epoch
    // changes land while the query is DOWN; restart resumes from the
    // checkpoint without reprocessing file a
    addFile("b.json", Seq(
      """{"key":2,"seq":3,"op":"D","v":0}""",
      """{"key":5,"seq":4,"op":"U","v":50}"""))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    // a third restart with nothing new must change nothing
    val q3 = start()
    q3.processAllAvailable(); q3.stop()
    val live = StreamingOps.changelogState(spark, state)
      .as[(Long, Long, String, Long)].collect().map(r => r._1 -> r._4).toMap
    assert(live === Map(1L -> 10L, 5L -> 50L),
      "tombstone applied once, nothing double-ingested across restarts")
    // labels continued monotonically: two ingest partitions, 2 rows each
    val labels = spark.read.parquet(state)
      .select($"ingest".cast("string")).distinct().count()
    assert(labels === 2L, "exactly one label per processed epoch")
  }

  test("cdc state == batch applyChangelog over the same deliveries") {
    import java.nio.file.Files
    val state = Files.createTempDirectory("graft-cdc-eq").resolve("state").toString
    val changes = Seq(
      (1L, 1L, "U", 10L), (1L, 5L, "D", 0L),
      (2L, 2L, "U", 20L), (2L, 9L, "U", 22L),
      (9L, 4L, "U", 99L)).toDF("key", "seq", "op", "v")
    // delivered as two interleaved batches
    StreamingOps.changelogBatch(
      changes.filter($"seq" % 2 === 1), state, "a", "key", "seq", "op")
    StreamingOps.changelogBatch(
      changes.filter($"seq" % 2 === 0), state, "b", "key", "seq", "op")
    val streamed = StreamingOps.changelogState(spark, state)
      .select($"key", $"v").as[(Long, Long)].collect().toSet
    // the batch twin: empty base + the full changelog in one apply
    val batch2 = graft.operators.Snapshot.applyChangelogOn(
      Seq.empty[(Long, Long)].toDF("key", "v"), changes, "key", "seq", "op")
      .select($"key", $"v").as[(Long, Long)].collect().toSet
    assert(streamed === batch2,
      "streamed merge-on-read must equal the batch apply")
  }

  test("order-line ingest maintains the co-purchase ledger: streamed == one-shot") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Files.createTempDirectory("graft-graph-stream")
    val corpusDir = root.resolve("corpus").toString
    val indexDir = root.resolve("ledger").toString
    val b1 = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 20L))
    val b2 = Seq((3L, 20L), (3L, 30L), (4L, 10L), (4L, 40L))
    val ms = MemoryStream[(Long, Long)]
    val q = StreamingOps.ingestOrderLinesGraph(
      ms.toDF().toDF("l_orderkey", "l_partkey"), corpusDir, indexDir)
    try {
      // empty first delivery: no wedge, no bootstrap, no manifest claim
      ms.addData(Seq.empty[(Long, Long)])
      q.processAllAvailable()
      assert(!graft.sources.DedupIndexes.hasData(spark, s"$indexDir/manifest"),
        "an empty delivery must not bootstrap")
      // batch 1 bootstraps the full build from the corpus
      ms.addData(b1)
      q.processAllAvailable()
      assert(graft.sources.GraphIndexes.indexedOrderIds(spark, indexDir)
        .as[Long].collect().toSet === Set(1L, 2L))
      // batch 2: new orders PLUS a re-delivered order 1 with a TAMPERED
      // extra line — order id is the content identity, so the replayed
      // order must change nothing (first write wins) at the corpus AND
      // the ledger
      ms.addData(b2 ++ Seq((1L, 40L)))
      q.processAllAvailable()
      val streamed = graft.sources.GraphIndexes.readGraphEdges(spark, indexDir)
        .as[(Long, Long, Long)].collect().toSet
      val oneShot = graft.operators.Graph.copurchaseEdgesOn(
        (b1 ++ b2).toDF("l_orderkey", "l_partkey"))
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed === oneShot,
        "streamed ledger must equal the one-shot build over the same orders")
      assert(spark.read.parquet(corpusDir).count() === (b1 ++ b2).size.toLong,
        "each order's lines land exactly once in the corpus")
      // a pure re-delivery is an empty delta: no new ingest label appears
      val labelsBefore = spark.read.parquet(s"$indexDir/edges")
        .select($"ingest").distinct().as[String].collect().toSet
      ms.addData(b2)
      q.processAllAvailable()
      val labelsAfter = spark.read.parquet(s"$indexDir/edges")
        .select($"ingest").distinct().as[String].collect().toSet
      assert(labelsAfter === labelsBefore,
        "a pure re-delivery must not accumulate a vacant ingest label")
      assert(graft.sources.GraphIndexes.readGraphEdges(spark, indexDir)
        .as[(Long, Long, Long)].collect().toSet === oneShot)
    } finally q.stop()
  }

  test("document ingest maintains the BM25 postings: streamed == one-shot") {
    val root = java.nio.file.Files.createTempDirectory("graft-search-stream")
    val corpusDir = root.resolve("corpus").toString
    val indexDir = root.resolve("postings").toString
    val b1 = Seq((1L, "a b c a"), (2L, "a b x y z x y z"))
    val b2 = Seq((3L, "a a a a a a a b"), (4L, "c d e"), (5L, "b b a c"))
    val ms = MemoryStream[(Long, String)]
    val q = StreamingOps.ingestDocsSearchIndex(
      ms.toDF().toDF("doc_id", "text"), corpusDir, indexDir)
    def probe(): Seq[(Long, Long)] =
      graft.sources.SearchIndexes.searchBm25FromIndex(
        spark, indexDir, Seq("a", "b"), 10).as[(Long, Long)].collect().toSeq
    try {
      ms.addData(b1)
      q.processAllAvailable()
      // batch 2 includes a TAMPERED re-delivery of doc 1: first write
      // wins at the corpus and the postings alike
      ms.addData(b2 ++ Seq((1L, ("a " * 50).trim)))
      q.processAllAvailable()
      val oneShot = graft.operators.TextAnalysis.searchBm25On(
        (b1 ++ b2).toDF("doc_id", "text"), Seq("a", "b"), 10)
        .as[(Long, Long)].collect().toSeq
      assert(probe() === oneShot,
        "streamed postings must rank exactly like the one-shot scan")
      // pure re-delivery: no vacant ingest label, ranking unchanged
      val labels = spark.read.parquet(s"$indexDir/doclen")
        .select($"ingest").distinct().as[String].collect().toSet
      ms.addData(b2)
      q.processAllAvailable()
      assert(spark.read.parquet(s"$indexDir/doclen")
        .select($"ingest").distinct().as[String].collect().toSet === labels)
      assert(probe() === oneShot)
      // the SAME streamed index serves POSITIONAL retrieval: the phrase
      // probe over the maintained postings equals the one-shot scan
      // fold (positions ride every append label)
      assert(graft.sources.SearchIndexes.searchPhraseFromIndex(
          spark, indexDir, Seq("a", "b"), 10)
          .as[(Long, Long)].collect().toSeq ===
        graft.operators.TextAnalysis.searchPhraseOn(
          (b1 ++ b2).toDF("doc_id", "text"), Seq("a", "b"), 10)
          .as[(Long, Long)].collect().toSeq,
        "streamed positional postings must count phrase starts like the scan")
    } finally q.stop()
  }

  test("streaming multimodal decode equals the batch spelling per asset") {
    // decode is a stateless per-row projection, so it must stream
    // as-is (append mode, no state) and agree with the batch path on
    // every asset — the r19 decode family's streaming twin
    import graft.functions.{AudioDecode, ImageDecode}
    val ms = MemoryStream[(Long, String)]
    val assets = ms.toDF().toDF("asset_id", "text")
      .select($"asset_id",
        AudioDecode.wrapPcm8Wav(encode($"text", "UTF-8")).as("wav"),
        concat(encode(lit("P5\n4 4\n255\n"), "UTF-8"),
          encode(rpad($"text", 16, "x"), "UTF-8")).as("pgm"))
      .select($"asset_id",
        AudioDecode.audioStats($"wav").as("a"),
        ImageDecode.imageStats($"pgm").as("i"))
      .select($"asset_id", $"a.n_frames", $"a.ch_rms", $"i.ch_mean")
    val q = assets.writeStream.format("memory").queryName("mmdec")
      .outputMode("append").start()
    try {
      val docs = Seq((1L, "first streamed asset"), (2L, "second one"))
      ms.addData(docs: _*)
      q.processAllAvailable()
      ms.addData((3L, "a late third delivery"))
      q.processAllAvailable()
      val streamed = spark.table("mmdec")
        .as[(Long, Int, Seq[Int], Seq[Int])].collect().toSet
      val batch = (docs :+ (3L, "a late third delivery")).toDF("asset_id", "text")
        .select($"asset_id",
          AudioDecode.audioStats(
            AudioDecode.wrapPcm8Wav(encode($"text", "UTF-8"))).as("a"),
          ImageDecode.imageStats(concat(encode(lit("P5\n4 4\n255\n"), "UTF-8"),
            encode(rpad($"text", 16, "x"), "UTF-8"))).as("i"))
        .select($"asset_id", $"a.n_frames", $"a.ch_rms", $"i.ch_mean")
        .as[(Long, Int, Seq[Int], Seq[Int])].collect().toSet
      assert(streamed === batch && streamed.size === 3,
        "stateless decode must be batch==stream identical per asset")
    } finally q.stop()
  }

  test("streaming multimodal transforms (resize/frames/windows) equal the batch spelling") {
    // the r20 transform family is stateless per-row like decode — the
    // resize round-trip, per-frame explode, and windowed RMS must all
    // stream in append mode and agree with the batch path per asset
    import graft.functions.{AudioDecode, ImageDecode, VideoDecode}
    val ms = MemoryStream[(Long, String)]
    def xform(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.select($"asset_id",
          ImageDecode.imageStats(ImageDecode.resizePnm(
            concat(encode(lit("P5\n4 4\n255\n"), "UTF-8"),
              encode(rpad($"text", 16, "x"), "UTF-8")), 2)).as("r"),
          VideoDecode.videoFrameStats(VideoDecode.wrapDibAvi(
            encode($"text", "UTF-8"), 2, 2, 2, 40000)).as("f"),
          AudioDecode.audioWindowStats(
            AudioDecode.wrapPcm8Wav(encode($"text", "UTF-8")), 4).as("w"))
        .select($"asset_id", $"r.ch_mean".as("rmean"),
          $"f"(0)("ch_mean").as("f0mean"), size($"w").as("nwin"),
          $"w"(0)("ch_rms").as("w0rms"))
    val q = xform(ms.toDF().toDF("asset_id", "text"))
      .writeStream.format("memory").queryName("mmxf")
      .outputMode("append").start()
    try {
      val docs = Seq((1L, "first streamed asset"), (2L, "second one"))
      ms.addData(docs: _*)
      q.processAllAvailable()
      ms.addData((3L, "a late third delivery"))
      q.processAllAvailable()
      val streamed = spark.table("mmxf")
        .as[(Long, Seq[Int], Seq[Int], Int, Seq[Int])].collect().toSet
      val batch = xform((docs :+ (3L, "a late third delivery"))
          .toDF("asset_id", "text"))
        .as[(Long, Seq[Int], Seq[Int], Int, Seq[Int])].collect().toSet
      assert(streamed === batch && streamed.size === 3,
        "stateless transforms must be batch==stream identical per asset")
    } finally q.stop()
  }
}
