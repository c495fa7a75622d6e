package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._
  val sf = TestSpark.sf0001

  test("weighted sample == first-principles A-ES reference, partition-invariant") {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, sf).select($"doc_id", $"n_chars")
    val rows = docs.as[(Long, Long)].collect()
    // the same draw, recomputed from first principles on the driver:
    // u from the salted md5's first 13 hex digits, score ln(u)/w
    def ref(salt: String, k: Int): Seq[Long] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.filter(_._2 > 0).map { case (id, w) =>
        val hex = md.digest(s"$id:$salt".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(13)
        val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4503599627370496.0
        (id, math.log(u) / w)
      }.sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSeq
    }
    val got = TextAnalysis.weightedSampleOn(docs, "doc_id", "n_chars", 10, "w0")
      .select($"doc_id").as[Long].collect().toSeq
    assert(got === ref("w0", 10), "engine sample must equal the reference, order included")
    // partitioning must not leak into the draw
    val re = TextAnalysis.weightedSampleOn(docs.repartition(7), "doc_id",
      "n_chars", 10, "w0").select($"doc_id").as[Long].collect().toSeq
    assert(re === got, "sample must be invariant under repartitioning")
    // a different salt IS a different sample
    assert(TextAnalysis.weightedSampleOn(docs, "doc_id", "n_chars", 10, "w1")
      .select($"doc_id").as[Long].collect().toSeq !== got)
    // k >= population returns every positive-weight row
    assert(TextAnalysis.weightedSampleOn(docs, "doc_id", "n_chars",
      100000, "w0").count() === rows.count(_._2 > 0).toLong)
  }

  test("weighted sample: selection frequency tracks weight across salts") {
    import graft.operators.TextAnalysis
    // planted 10x-weight minority: across 20 fixed salts it must be
    // drawn far more often than its population share (deterministic —
    // the salts are fixed, so this is a regression test, not a flake)
    val docs = (0L until 200L).map(id =>
      (id, if (id < 20) 1000L else 100L)).toDF("doc_id", "n_chars")
    val heavyHits = (0 until 20).map { s =>
      TextAnalysis.weightedSampleOn(docs, "doc_id", "n_chars", 20, s"s$s")
        .select($"doc_id").as[Long].collect().count(_ < 20L)
    }.sum
    // heavy docs are 10% of the population but 10x the weight: expected
    // share of draws ~53% (20/200 docs at weight ratio 10); require
    // well above the 10% population share
    assert(heavyHits > 100,
      s"10x-weight decile drew only $heavyHits of 400 slots across salts")
  }

  test("langGuess identifies real multilingual snippets") {
    val samples = Seq(
      ("the cat sat on the mat and looked at a bird", "en"),
      ("le chat est sur la table et les oiseaux chantent", "fr"),
      ("der hund und die katze sind im garten das ist gut", "de"),
      ("el perro y los gatos corren en las calles", "es"),
      ("今天天气很好我们去公园散步", "zh"),
      ("こんにちは世界これはテストです", "ja"),
      ("안녕하세요 세계 이것은 테스트입니다", "ko"),
      ("xyzzy quux blorp", "und"),
    ).toDF("text", "want")
    val got = samples
      .select(col("want"), TextAnalysis.langGuess(col("text")).as("got"))
      .as[(String, String)].collect()
    got.foreach { case (want, g) => assert(g === want, s"want $want got $g") }
  }

  test("token frequency equals driver-side brute force") {
    val docs = Tables.documents(spark, sf).select("text").as[String].collect()
    val want = docs.flatMap(_.split(" ")).groupBy(identity)
      .map { case (t, xs) => (t, xs.length.toLong) }.toSeq
      .sortBy { case (t, n) => (-n, t) }.take(20)
    val got = TextAnalysis.tokenFreq(spark, sf).as[(String, Long)].collect().toSeq
    assert(got === want)
  }

  test("ngram doc frequency counts each doc once per gram") {
    val got = TextAnalysis.ngramDocFreq(spark, sf).as[(String, Long)].collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(got.nonEmpty)
    assert(got.forall(_._2 <= nDocs), "df cannot exceed doc count")
  }

  test("quality metrics: exact integer values on a hand-made doc") {
    // 5 tokens, 4 types, 2 'the/a' stopword hits, 15 chars sans spaces
    val df = Seq((1L, "the quick the a fox")).toDF("doc_id", "text")
      .createOrReplaceTempView("qm_doc")
    val toks = split(col("text"), " ")
    val row = Seq((1L, "the quick the a fox")).toDF("doc_id", "text")
      .select(
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_types"),
        length(concat_ws("", toks)).cast("long").as("char_len"))
      .as[(Long, Long, Long)].head
    assert(row === ((5L, 4L, 15L)))
    val metrics = TextAnalysis.qualityMetrics(spark, sf).collect()
    assert(metrics.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= 100), "ttr in (0,100]")
    assert(metrics.forall(r => r.getLong(3) >= 0 && r.getLong(3) <= 100), "stop_pct in [0,100]")
  }

  test("fingerprint is case/whitespace-insensitive, content-sensitive") {
    val df = Seq(
      (1L, "Hello   World"),
      (2L, " hello world "),
      (3L, "hello worlds"),
    ).toDF("doc_id", "text")
    val fp = df.select(
      md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ")).as("f"))
      .as[String].collect()
    assert(fp(0) === fp(1))
    assert(fp(0) !== fp(2))
  }

  test("BPE-ish token counting: exact counts on hand-made docs, CJK chars split") {
    val df = Seq(
      "hello world42, ok!", // hello|world|4|2|,|ok|! = 7
      "今天天气 abc12",     // 4 CJK chars + abc + 1 + 2 = 7
    ).toDF("text")
    val got = df.select(size(regexp_extract_all(col("text"),
      lit(TextAnalysis.BpeishPattern), lit(0)))).as[Int].collect().toSeq
    assert(got === Seq(7, 7))
    // suite-level: bpe counts >= ws counts (splitting only adds tokens)
    val stats = TextAnalysis.subwordStats(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(stats.nonEmpty)
    stats.foreach { case (src, _, ws, bpe) =>
      assert(bpe >= ws, s"$src: bpe $bpe < ws $ws")
    }
  }

  test("token quantiles: rank-selected p50/p90 equal driver-side discrete quantiles") {
    val got = TextAnalysis.tokenQuantilesBySource(spark, sf)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        size(graft.operators.TextOps.tokens(col("text"))).cast("long").as("nt"))
      .as[(String, Long, Long)].collect()
    val want = docs.groupBy(_._1).map { case (src, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val n = sorted.length
      def at(p: Int, q: Int) = sorted((p * n + q - 1) / q - 1) // ceil(p*n/q)-th, 1-based
      src -> ((at(1, 2), at(9, 10), n.toLong))
    }
    assert(got === want)
    got.values.foreach { case (p50, p90, _) => assert(p50 <= p90) }
  }

  test("stratified sample keeps exactly the docs under each source's hash threshold") {
    val rates = Map("src0" -> 64, "src1" -> 128, "src2" -> 192)
    val got = TextAnalysis.stratifiedSample(spark, sf, rates)
      .as[(Long, String)].collect().toSet
    val want = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ")).as("h"))
      .as[(Long, String, String)].collect()
      .filter { case (_, src, h) =>
        rates.get(src) match {
          case Some(r) => h < f"$r%02x"
          case None => true
        }
      }
      .map { case (id, src, _) => (id, src) }.toSet
    assert(got === want)
    // sampled sources actually shrank; unlisted sources are untouched
    val bySrc = want.groupBy(_._2).view.mapValues(_.size).toMap
    val totals = Tables.documents(spark, sf).groupBy(col("source"))
      .agg(count(lit(1))).as[(String, Long)].collect().toMap
    assert(bySrc("src0") < totals("src0"))
    assert(bySrc("src3") === totals("src3").toInt)
    // determinism across runs
    val again = TextAnalysis.stratifiedSample(spark, sf, rates)
      .as[(Long, String)].collect().toSet
    assert(again === got)
  }

  test("token shards: blockwise prefix equals the direct spelling; budgets respected") {
    val got = TextAnalysis.tokenShards(spark, sf, budgetTokens = 500, blockSize = 7)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // direct driver-side prefix sum in doc_id order
    var pre = 0L
    val want = got.map(_._1).zip(
      Tables.documents(spark, sf).select("doc_id", "text")
        .as[(Long, String)].collect().sortBy(_._1)
        .map { case (_, t) => t.split(" ").length.toLong })
    want.foreach { case (id, nt) =>
      val shard = pre / 500
      val row = got.find(_._1 == id).get
      assert(row._2 === nt && row._3 === shard, s"doc $id")
      pre += nt
    }
    // every shard except possibly the last crosses its budget boundary:
    // consecutive shard ids with no gaps
    val shards = got.map(_._3).distinct.sorted
    assert(shards === (0L to shards.max).toArray.toSeq)
    assert(shards.length > 1, "fixture must span multiple shards")
  }

  test("quality filter: rule bits equal driver-side recomputation, both outcomes occur") {
    val stop = Set("the", "a", "of", "and", "is")
    val got = TextAnalysis.qualityFilter(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got.length === docs.size)
    got.foreach { case (id, nt, ttr, st, mlen, rep, keep) =>
      val ws = docs(id).split(" ")
      val nG = math.max(ws.length - 2, 0)
      val nDg = ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet.size
      assert(nt === ws.length.toLong)
      assert(ttr === ws.distinct.length * 100L / ws.length)
      assert(st === ws.count(stop) * 100L / ws.length)
      assert(mlen === ws.map(_.length).sum * 100L / ws.length)
      assert(rep === (if (nG > 0) (nG - nDg) * 100L / nG else 0L))
      val wantKeep = nt >= 20 && mlen >= 300 && mlen <= 1000 &&
        st >= 3 && ttr >= 40 && rep <= 2
      assert(keep === (if (wantKeep) 1L else 0L))
    }
    // the rules must actually discriminate on this fixture
    assert(got.exists(_._7 == 1L) && got.exists(_._7 == 0L))
  }

  test("approx quantile sketch lands within one doc-length rank of exact") {
    val exact = TextAnalysis.tokenQuantilesBySource(spark, sf)
      .select("source", "p50_tokens", "p90_tokens")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val approx = TextAnalysis.tokenQuantilesApprox(spark, sf)
      .select("source", "p50_approx", "p90_approx")
      .as[(String, Long, Long)].collect()
    assert(approx.nonEmpty)
    // at accuracy=10000 and fixture sizes, the GK sketch's rank error is
    // < 1 rank — the returned member value sits within the tight
    // token-length spread around the exact discrete quantile
    for ((src, p50a, p90a) <- approx) {
      val (p50e, p90e) = exact(src)
      assert(math.abs(p50a - p50e) <= 2, s"$src p50: sketch $p50a vs exact $p50e")
      assert(math.abs(p90a - p90e) <= 2, s"$src p90: sketch $p90a vs exact $p90e")
    }
  }

  test("tf-idf top terms equal a driver-side reimplementation") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val n = docs.length.toLong
    val tf = docs.flatMap { case (id, t) =>
      t.split(" ").groupBy(identity).map { case (term, occ) => (id, term, occ.length.toLong) }
    }
    val dfm = tf.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val want = tf.map { case (id, term, f) =>
      (id, term, f, dfm(term), f * (n * 1000L / dfm(term)))
    }.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._5, r._2)).take(3).zipWithIndex.toSeq
        .map { case ((id, term, f, df, score), i) => (id, term, f, df, score, (i + 1).toLong) }
    }.toSet
    val got = TextAnalysis.tfidfTopTerms(spark, sf)
      .as[(Long, String, Long, Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("contamination equals a driver-side shingle-overlap reimplementation") {
    def canon(t: String) = t.trim.toLowerCase.replaceAll("\\s+", " ")
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def sh(t: String) =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => (id, md5hex(canon(t)) < "cc", sh(t)) }
    val evalNgrams = docs.filter(!_._2).flatMap(_._3).toSet
    val want = docs.filter(_._2)
      .map { case (id, _, s) => id -> (s & evalNgrams).size.toLong }
      .filter(_._2 > 0).toMap
    val got = TextAnalysis.contamination(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(got === want)
    assert(want.nonEmpty, "fixture must actually exercise the overlap path")
  }

  test("contamination coverage: ratio and threshold bit match a planted fixture") {
    // md5 split verified driver-side: docs 1-3 land train (< 'cc'), doc 90
    // lands eval. Eval n-grams = {alpha beta gamma, beta gamma delta,
    // gamma delta zeta}. Doc 1: both its n-grams shared -> 100%,
    // contaminated. Doc 2: 1 of 4 -> 25%, kept in output but below the
    // 50% bit. Doc 3: nothing shared -> absent entirely.
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma zz yy xx"),
      (3L, "quick brown fox jumps over"),
      (90L, "alpha beta gamma delta zeta"))
    val got = TextAnalysis.contaminationCoverageOn(docs.toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val want = Set(
      (1L, 2L, 2L, 100L, 1L),
      (2L, 1L, 4L, 25L, 0L))
    assert(got === want)
    // threshold is a real parameter: at minPct=20 doc 2 flips to contaminated
    val loose = TextAnalysis.contaminationCoverageOn(docs.toDF("doc_id", "text"), minPct = 20L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(loose === Set((1L, 2L, 2L, 100L, 1L), (2L, 1L, 4L, 25L, 1L)))
    // eval-side mirror on the same fixture: doc 90 (the one eval doc with
    // train overlap) has 3 n-grams, 2 of them in the train set -> 66%
    val eval = TextAnalysis.evalContaminationCoverageOn(docs.toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(eval === Set((90L, 2L, 3L, 66L, 1L)))
  }

  test("set ops: union distinct and except produce disjoint+complete split") {
    import graft.operators.Relational
    val all = Tables.orders(spark, sf).select(col("o_custkey").as("custkey"))
      .distinct().as[Long].collect().toSet
    val small = Relational.onlySmallOrderCustomers(spark, sf).as[Long].collect().toSet
    val big = Tables.orders(spark, sf).filter(col("o_totalprice") > 400000.0)
      .select(col("o_custkey")).as[Long].collect().toSet
    assert(small === all -- big, "EXCEPT semantics")
    assert((small & big).isEmpty)
  }

  test("day-partitioned layout prunes partitions for per-day queries") {
    val df = graft.sources.Roundtrip.eventsPartitionedByDay(spark, sf)
    val days = df.select("day").distinct().as[String].collect().sorted
    assert(days.nonEmpty && days.forall(_.matches("\\d{4}-\\d{2}-\\d{2}")))
    val oneDay = df.filter(col("day") === days.head)
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), s"plan:\n$plan")
    assert(plan.contains(days.head), "day predicate must reach partition pruning")
    // pruned count equals the unpruned group count for that day
    val viaGroup = df.groupBy("day").count()
      .filter(col("day") === days.head).select("count").as[Long].head
    assert(oneDay.count() === viaGroup)
  }

  test("compacted events: exact file count, sorted layout, values preserved") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val out = sources.Roundtrip.eventsCompacted(spark, sf, files = 4)
    // content identical to the source table
    assert(out.count() === Tables.events(spark, sf).count())
    assert(out.agg(sum(col("event_id"))).head.getLong(0) ===
      Tables.events(spark, sf).agg(sum(col("event_id"))).head.getLong(0))
    // exactly the requested number of data files (small-files control)
    val dir = Paths.get("target/roundtrip/parquet_compact/root_testdata_sf0.001_events")
    val parts = Files.list(dir).iterator().asScala
      .count(_.getFileName.toString.endsWith(".parquet"))
    assert(parts === 4)
    // within-file ordering: rows of one file are (user_id, ts)-sorted,
    // so parquet row-group min/max stats are tight for the access key
    val fileSorted = out
      .select(input_file_name().as("f"), col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("f"))
          .orderBy(monotonically_increasing_id())))
    val viol = fileSorted.as("a").join(fileSorted.as("b"),
        col("a.f") === col("b.f") && col("a.rn") + 1 === col("b.rn"))
      .filter(col("a.user_id") > col("b.user_id") ||
        (col("a.user_id") === col("b.user_id") && col("a.us") > col("b.us")))
    assert(viol.isEmpty, "physical row order must follow (user_id, ts) per file")
  }

  test("dynamic partition overwrite rewrites only the delta's day partitions") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val path = Files.createTempDirectory("graft-upsert").resolve("events").toString
    val events = Tables.events(spark, sf)
    // base layout: all days
    sources.Roundtrip.upsertEventsByDay(events, path)
    val days = spark.read.parquet(path).select("day").distinct()
      .as[String].collect().sorted
    assert(days.length >= 2, "fixture must span multiple days")
    val (touched, untouched) = (days.head, days.last)
    def files(day: String) =
      Files.list(Paths.get(path, s"day=$day")).iterator().asScala
        .map(p => p.getFileName.toString -> Files.getLastModifiedTime(p))
        .toMap
    val untouchedBefore = files(untouched)
    // late delta: only the touched day, with corrected values
    val delta = events
      .filter(date_format(col("ts"), "yyyy-MM-dd") === touched)
      .withColumn("value", col("value") * 2)
    sources.Roundtrip.upsertEventsByDay(delta, path)
    // the untouched partition's files are PHYSICALLY identical
    assert(files(untouched) === untouchedBefore,
      "dynamic overwrite must not rewrite unaffected partitions")
    // the touched day carries the corrected rows; row counts preserved
    val after = spark.read.parquet(path)
    assert(after.count() === events.count())
    val wantSum = events.filter(date_format(col("ts"), "yyyy-MM-dd") === touched)
      .agg(sum(col("value") * 2)).head.getDouble(0)
    val gotSum = after.filter(col("day") === touched)
      .agg(sum(col("value"))).head.getDouble(0)
    assert(math.abs(gotSum - wantSum) < 1e-6)
  }

  test("malformed JSON records: permissive captures, drop skips, failfast raises") {
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    // a 100 TB crawl ingest WILL contain broken rows; the engine must
    // offer all three contracts, not die or silently corrupt
    val dir = Files.createTempDirectory("graft-corrupt")
    Files.write(dir.resolve("part.json"), Seq(
      """{"doc_id": 1, "text": "good row"}""",
      """{"doc_id": 2, "text": "also fine"}""",
      """{"doc_id": 3, "text": "truncated""").asJava)
    val path = dir.toString
    val schema = "doc_id LONG, text STRING, _corrupt_record STRING"
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path).cache() // corrupt-column queries require a cached/full scan
    assert(permissive.count() === 3)
    assert(permissive.filter(col("_corrupt_record").isNotNull).count() === 1,
      "the broken row is captured, not dropped or parsed as garbage")
    assert(permissive.filter(col("_corrupt_record").isNull)
      .select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    val dropped = spark.read.schema("doc_id LONG, text STRING")
      .option("mode", "DROPMALFORMED").json(path)
    assert(dropped.count() === 2)
    assertThrows[org.apache.spark.SparkException] {
      spark.read.schema("doc_id LONG, text STRING")
        .option("mode", "FAILFAST").json(path).collect()
    }
  }

  test("top-gram share: every doc covered, pcts in range, keep bit consistent") {
    val rows = TextAnalysis.topGramShare(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length === Tables.documents(spark, sf).count(),
      "one verdict per document")
    rows.foreach { case (id, top1, top2, keep) =>
      assert(top1 >= 0 && top1 <= 100 && top2 >= 0 && top2 <= 100,
        s"doc $id shares out of range: $top1/$top2")
      // unigram mass is at least 1/n_types of the total: share > 0 for
      // nonempty docs (fixture docs all have text)
      assert(top1 > 0, s"doc $id has a zero top-unigram share")
      assert(keep === (if (top1 <= 30 && top2 <= 20) 1L else 0L),
        s"doc $id keep bit inconsistent with shares")
    }
    // the uniform fixture never trips the thresholds (max top1 share is
    // ~30%); planted boilerplate MUST — drive the *On entry directly
    val planted = Seq(
      (1L, "spam spam spam spam spam spam"),             // one gram is everything
      (2L, "buy now buy now buy now buy now"),           // dominant bigram
      (3L, "alpha beta gamma delta epsilon zeta eta"),   // all-distinct: keep
      (4L, ""),                                          // blank: tot_chars = 0
      (5L, "   ")                                        // whitespace-only ditto
    ).toDF("doc_id", "text")
    val byId = TextAnalysis.topGramShareOn(planted)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(byId(1L)._2 === 100L && byId(1L)._4 === 0L, "pure repetition must drop")
    assert(byId(2L)._3 > 20L && byId(2L)._4 === 0L, "dominant bigram must drop")
    assert(byId(3L)._2 <= 30L && byId(3L)._3 <= 20L && byId(3L)._4 === 1L)
    // zero-denominator guard: a blank doc's unigrams are all zero-length,
    // so tot_chars = 0 — must yield share 0 (not ANSI DIVIDE_BY_ZERO).
    // The whitespace doc's bigrams are lone spaces (length 1), so its
    // top2 is legitimately 100 — only the unigram side divides by zero.
    assert(byId(4L) === ((4L, 0L, 0L, 1L)), "empty doc: shares 0, kept")
    assert(byId(5L) === ((5L, 0L, 100L, 0L)), "whitespace-only doc: unigram share 0")
  }

  test("PII redaction: planted categories redact exactly; clean text untouched") {
    val docs = Seq(
      (1L, "contact bob.smith+spam@mail.example.org or alice@ex.co today"),
      (2L, "server 10.0.0.1 and 192.168.255.3 responded"),
      (3L, "call 555-123-4567 or 555.987.6543 now"),
      (4L, "account 123456789012 flagged"),
      (5L, "mixed bob@x.io at 10.0.0.1 ref 987654321"),
      (6L, "no sensitive content here at all")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.redactPiiOn(docs)
      .as[(Long, String, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 === "contact <EMAIL> or <EMAIL> today")
    assert(got(1L)._3 === 2L && got(1L)._7 === 2L)
    assert(got(2L)._2 === "server <IP> and <IP> responded")
    assert(got(2L)._4 === 2L)
    assert(got(3L)._2 === "call <PHONE> or <PHONE> now")
    assert(got(3L)._5 === 2L)
    assert(got(4L)._2 === "account <ID> flagged")
    assert(got(4L)._6 === 1L)
    assert(got(5L)._2 === "mixed <EMAIL> at <IP> ref <ID>")
    assert(got(5L)._7 === 3L)
    assert(got(6L)._2 === "no sensitive content here at all")
    assert(got(6L)._7 === 0L, "clean doc: zero counts, identity text")
    // order guarantee: an IP must never be consumed as digit-run fragments
    assert(got(2L)._6 === 0L && got(5L)._6 === 1L)
  }

  test("cluster-safe split: near-dups never straddle the boundary; singletons match plain") {
    val split = TextAnalysis.trainEvalAssignClusterSafe(spark, sf)
      .as[(Long, String)].collect().toMap
    spark.catalog.clearCache()
    assert(split.size === Tables.documents(spark, sf).count(), "every doc assigned")
    assert(split.values.toSet === Set("train", "eval"), "both splits occur")
    // every verified near-dup pair lands on one side — the leak-safety
    // contract the plain assignment cannot give
    val pairs = graft.operators.Dedup.minHashNearDups(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    spark.catalog.clearCache()
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs for this test to bite")
    pairs.foreach { case (a, b) =>
      assert(split(a) === split(b), s"near-dups $a/$b straddle the split")
    }
    // docs in no pair are their own representative: identical to the
    // per-doc assignment
    val plain = TextAnalysis.trainEvalAssign(spark, sf)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    split.filterNot { case (id, _) => paired(id) }.foreach { case (id, s) =>
      assert(plain(id) === s, s"singleton $id diverges from the plain assignment")
    }
  }

  test("novelty: unique-gram share per doc, short docs NULL, dup docs zero") {
    val docs = Seq(
      (1L, "a b c d"), // grams "a b c" (shared with doc 2), "b c d" (unique)
      (2L, "a b c"),   // one gram, shared -> novelty 0
      (3L, "x y"),     // too short: 0 grams, NULL ppm
      (4L, "p q r s")) // fully unique
      .toDF("doc_id", "text")
    val got = TextAnalysis.noveltyOn(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]))))
      .toMap
    assert(got === Map(
      1L -> ((2L, 1L, Some(500000L))),
      2L -> ((1L, 0L, Some(0L))),
      3L -> ((0L, 0L, None)),
      4L -> ((2L, 2L, Some(1000000L)))))
  }

  test("novelty: within-doc gram repetition counts once (distinct shingles)") {
    val docs = Seq((1L, "a b c a b c"), (2L, "z z z")).toDF("doc_id", "text")
    // doc 1 distinct grams: "a b c","b c a","c a b" — all df=1 despite repeats
    val r = TextAnalysis.noveltyOn(docs).filter(col("doc_id") === 1).head()
    assert((r.getLong(1), r.getLong(2)) === ((3L, 3L)))
  }

  test("csv and json round-trips preserve row counts and values") {
    val orig = Tables.nation(spark, sf)
    val viaCsv = graft.sources.Roundtrip.csv(spark, sf, "nation")
    val viaJson = graft.sources.Roundtrip.json(spark, sf, "nation")
    assert(viaCsv.schema === orig.schema)
    assert(viaJson.schema === orig.schema)
    val o = orig.orderBy("n_nationkey").collect().map(_.toString)
    assert(viaCsv.orderBy("n_nationkey").collect().map(_.toString) === o)
    assert(viaJson.orderBy("n_nationkey").collect().map(_.toString) === o)
  }

  test("schema evolution: mergeSchema unions generations, old rows null-filled") {
    val merged = graft.sources.Roundtrip.eventsEvolved(spark, sf)
    assert(merged.columns.toSet ===
      Set("event_id", "user_id", "event_type", "source_tag", "gen"))
    val total = Tables.events(spark, sf).count()
    assert(merged.count() === total, "no row lost across generations")
    // generation 1 predates the column: NULL back-fill, never a default
    assert(merged.filter($"gen" === 1 && $"source_tag".isNotNull).count() === 0L)
    assert(merged.filter($"gen" === 2 && $"source_tag" =!= "crawl-2").count() === 0L)
    assert(merged.filter($"source_tag".isNull).count() ===
      merged.filter($"gen" === 1).count())
  }

  test("per-group weighted sample == first-principles per-group A-ES") {
    val docs = Tables.documents(spark, sf)
      .select($"source", $"doc_id", $"n_chars")
    val rows = docs.as[(String, Long, Long)].collect()
    def ref(salt: String, k: Int): Map[String, Seq[Long]] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.filter(_._3 > 0).map { case (src, id, w) =>
        val hex = md.digest(s"$id:$salt".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(13)
        val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4503599627370496.0
        (src, id, math.log(u) / w)
      }.groupBy(_._1).view.mapValues(
        _.sortBy { case (_, id, s) => (-s, id) }.take(k).map(_._2).toSeq).toMap
    }
    val got = TextAnalysis.weightedSamplePerGroupOn(
      docs, "source", "doc_id", "n_chars", 5, "w0")
      .orderBy($"source", $"rn")
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(_._2).toSeq).toMap
    assert(got === ref("w0", 5), "per-group draw must equal the reference, ranked")
    // partition invariance + two-phase == the draw at a different salt set
    val re = TextAnalysis.weightedSamplePerGroupOn(
      docs.repartition(11), "source", "doc_id", "n_chars", 5, "w0", salts = 3)
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(_._2).toSeq).toMap
    assert(re === got, "salts/partitioning must not change the exact top-k")
    // a different salt IS a different sample somewhere
    assert(TextAnalysis.weightedSamplePerGroupOn(
      docs, "source", "doc_id", "n_chars", 5, "w1")
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(_._2).toSeq).toMap !== got)
  }

  test("per-source cap: banded exact rank == plain per-source window") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf).select($"doc_id", $"source")
    val cap = 20L
    val banded = TextAnalysis.capPerSourceOn(docs, cap)
      .as[(Long, String)].collect().toSet
    val w = Window.partitionBy($"source")
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
    val plain = docs.withColumn("rk", row_number().over(w))
      .filter($"rk" <= cap).select($"doc_id", $"source")
      .as[(Long, String)].collect().toSet
    assert(banded === plain,
      "banded rank must equal the single-window spelling")
    // cap honored exactly; under-cap sources keep everything
    val sizes = docs.groupBy($"source").count().as[(String, Long)]
      .collect().toMap
    val kept = TextAnalysis.capPerSourceOn(docs, cap)
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    sizes.foreach { case (src, n) =>
      assert(kept.getOrElse(src, 0L) === math.min(n, cap), src)
    }
    assert(sizes.values.exists(_ > cap), "cap must bite on the fixture")
    // partition-invariant: the draw is content-keyed, not layout-keyed
    val re = TextAnalysis.capPerSourceOn(docs.repartition(13), cap)
      .as[(Long, String)].collect().toSet
    assert(re === banded)
  }

  test("native profile_hits equals the HOF filter-count spelling") {
    import graft.functions.ProfileHits.profileHits
    val profile = Seq("the", "and", "of", "la", "de")
    def hof(toks: org.apache.spark.sql.Column) =
      size(filter(toks, t => profile.map(w => t === lit(w)).reduce(_ || _)))
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val diff = docs.filter(
      profileHits(col("toks"), profile) =!= hof(col("toks"))).count()
    assert(diff === 0L)
    // duplicates count per occurrence; null array stays null
    import spark.implicits._
    val hand = Seq((1L, Seq("the", "the", "x")), (2L, Seq[String]()))
      .toDF("id", "toks")
    assert(hand.select(profileHits(col("toks"), profile)).as[Int].collect()
      .toSeq === Seq(2, 0))
    val nul = Seq((1L, null.asInstanceOf[Seq[String]])).toDF("id", "toks")
    assert(nul.select(profileHits(col("toks"), profile)).collect().head.isNullAt(0))
  }
}
