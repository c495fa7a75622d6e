package graft

import graft.operators.{Dedup, TextOps}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._
  val sf = TestSpark.sf0001

  /** Brute-force word-n-gram Jaccard pairs computed driver-side.
    * sliding(n) emits one short window for docs with < n tokens; filter
    * it so semantics match TextOps.shingles (empty set below n tokens).
    */
  private def brutePairs(threshold: Double, n: Int = 3): Set[(Long, Long)] = {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val sh = docs.map { case (id, t) =>
      id -> t.split(" ").sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
    }
    (for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      inter = (sa & sb).size
      if inter.toDouble / (sa.size + sb.size - inter) >= threshold
    } yield (a, b)).toSet
  }

  test("exact dedup preserves every doc and multiplicity sums to row count") {
    val docs = Tables.documents(spark, sf)
    val out = Dedup.exact(spark, sf)
    assert(out.agg(sum("n")).as[Long].head === docs.count())
  }

  test("wordset dedup finds groups exact dedup misses") {
    val out = Dedup.wordset(spark, sf).collect()
    assert(out.forall(_.getLong(2) > 1))
  }

  test("wordset dedup: 8-byte hash grouping key equals the string-keyed spelling") {
    val str = Dedup.wordset(spark, sf)
      .as[(String, Long, Long)].collect().toSet
    val hashed = Dedup.wordset(spark, sf, hashKey = true)
      .as[(String, Long, Long)].collect().toSet
    assert(hashed === str)
  }

  test("minhash LSH + exact verify equals brute-force Jaccard >= 0.8") {
    val got = Dedup.minHashNearDups(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got === brutePairs(0.8), "LSH must have full recall on this data")
  }

  test("minhash hot-bucket cap drops capped buckets from candidate generation") {
    // cap = 1: every bucket that could produce a candidate (>= 2 members)
    // is dropped, so the output must be empty — the structural proof the
    // cap gates the self-join
    assert(Dedup.minHashNearDups(spark, sf, maxBucket = 1).count() === 0)
    // and a cap far above any real bucket changes nothing
    val capped = Dedup.minHashNearDups(spark, sf, maxBucket = 1000000)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped === brutePairs(0.8))
  }

  test("exact ngram Jaccard pairs equal brute force at >= 0.5") {
    val got = Dedup.ngramJaccardPairs(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got === brutePairs(0.5))
  }

  test("ngram Jaccard with an aggressive stop-shingle cap stays sound") {
    // a tiny cap drops common shingles from the prefix index; recall may
    // drop (documented approximation) but soundness holds — candidates
    // are verified on FULL shingle arrays, so every emitted pair must
    // still be a TRUE >= 0.5 pair
    val got = Dedup.ngramJaccardPairs(spark, sf, maxDocFreq = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got.subsetOf(brutePairs(0.5)), "no false positives under capping")
  }

  test("ngram intersection/union sizes are exact") {
    val row = Dedup.ngramJaccardPairs(spark, sf)
      .orderBy("doc_a", "doc_b").limit(1).collect().headOption
    row.foreach { r =>
      val docs = Tables.documents(spark, sf).select("doc_id", "text")
        .as[(Long, String)].collect().toMap
      // filter(_.length == 3): sliding emits one short window below 3
      // tokens, which TextOps.shingles treats as an empty shingle set
      val sa = docs(r.getLong(0)).split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      val sb = docs(r.getLong(1)).split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      assert(r.getLong(2) === (sa & sb).size.toLong)
      assert(r.getLong(3) === (sa | sb).size.toLong)
    }
  }

  /** Driver-side union-find over a pair list; merging by min root makes
    * every final root the component minimum — the same labeling
    * clusterPairs converges to.
    */
  private def bruteComponents(pairs: Set[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    pairs.flatMap(p => Seq(p._1, p._2)).map(x => x -> find(x)).toMap
  }

  private def lcsTokens(a: Array[String], b: Array[String]): Int =
    TestOracles.lcsTokens(a, b)

  test("verbatim runs equal a driver-side longest-common-substring DP") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ", -1) }
    val want = (for {
      (a, ta) <- docs; (b, tb) <- docs if a < b
      l = lcsTokens(ta, tb) if l >= 3
    } yield (a, b) -> l.toLong).toMap
    // minRunTokens = n and an ineffective cap: the operator must report
    // EVERY pair with any shared 3-token span, at its exact max length
    val got = Dedup.verbatimRunPairs(spark, sf, minRunTokens = 3,
        maxOccFreq = 1000000)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === want, "k-gram run lengths must equal token-LCS exactly")
  }

  test("verbatim runs: planted spans split at the threshold; cap gates matching") {
    def span(k: Int, tag: String) = (1 to k).map(i => s"$tag$i").mkString(" ")
    val common25 = span(25, "c")
    val common10 = span(10, "d")
    val docs = Seq(
      (1L, s"${span(5, "a")} $common25 ${span(5, "b")}"),
      (2L, s"${span(7, "e")} $common25"),
      (3L, s"$common10 ${span(12, "f")}"),
      (4L, s"${span(3, "g")} $common10")
    ).toDF("doc_id", "text")
    val got = Dedup.verbatimRunPairsOn(docs, minRunTokens = 20)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got === Map((1L, 2L) -> 25L),
      "only the 25-token span passes the 20-token threshold")
    // occurrence cap = 1: any shingle occurring in BOTH docs of a pair has
    // occ >= 2, so matching is structurally gated off — empty output
    assert(Dedup.verbatimRunPairsOn(docs, minRunTokens = 3, maxOccFreq = 1)
      .count() === 0)
  }

  test("verbatim spans carry exact coordinates; per-pair max equals run pairs") {
    def span(k: Int, tag: String) = (1 to k).map(i => s"$tag$i").mkString(" ")
    // doc1 token offsets: a=0..2, s1=3..24, b=25..28, s2=29..48
    // doc2 token offsets: s1=0..21, c=22..27, s2=28..47, d=48..49
    val s1 = span(22, "p")
    val s2 = span(20, "q")
    val docs = Seq(
      (1L, s"${span(3, "a")} $s1 ${span(4, "b")} $s2"),
      (2L, s"$s1 ${span(6, "c")} $s2 ${span(2, "d")}")
    ).toDF("doc_id", "text")
    val got = Dedup.verbatimRunSpansOn(docs, minRunTokens = 20)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 3L, 0L, 22L), (1L, 2L, 29L, 28L, 20L)),
      "two disjoint shared spans, exact 0-based offsets both sides")
    // fixture-wide consistency: the per-pair max over spans must equal
    // verbatimRunPairs (same islands, different aggregation)
    val base = Tables.documents(spark, sf).select($"doc_id", $"text")
    val spans = Dedup.verbatimRunSpansOn(base, minRunTokens = 3,
        maxOccFreq = 1000000)
      .as[(Long, Long, Long, Long, Long)].collect()
    val maxPerPair = spans.groupBy(s => (s._1, s._2))
      .view.mapValues(_.map(_._5).max).toMap
    val pairs = Dedup.verbatimRunPairsOn(base, minRunTokens = 3,
        maxOccFreq = 1000000)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(maxPerPair === pairs)
  }

  test("applyVerbatimCuts: overlapping spans merge before cutting; lower-id docs untouched") {
    def span(k: Int, tag: String) = (1 to k).map(i => s"$tag$i").mkString(" ")
    val a = span(20, "a"); val b = span(10, "b"); val c = span(20, "c")
    val flank1 = span(4, "u"); val flank2 = span(5, "v")
    // doc3 = A+B+C; doc1 shares A+B (doc3 tokens [0,30)), doc2 shares
    // B+C ([20,50)) — the two cut intervals on doc3 OVERLAP in B, so the
    // merged union is the whole 50-token doc, not 60 double-counted
    // tokens. doc4/doc5 are the disjoint control: one exact 20-token
    // span cut from the higher id, flanks preserved verbatim.
    val shared = span(20, "s")
    val docs = Seq(
      (1L, s"$a $b"), (2L, s"$b $c"), (3L, s"$a $b $c"),
      (4L, s"$shared ${span(6, "w")}"),
      (5L, s"$flank1 $shared $flank2")
    ).toDF("doc_id", "text")
    val cleaned = Dedup.applyVerbatimCuts(docs,
        Dedup.verbatimRunSpansOn(docs, minRunTokens = 20))
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(cleaned(1L) === ((s"$a $b", 0L)), "lower-id source keeps its copy")
    assert(cleaned(2L) === ((s"$b $c", 0L)), "lower-id source keeps its copy")
    assert(cleaned(3L) === (("", 50L)),
      "overlapping [0,30)+[20,50) merge to [0,50): 50 removed, not 60")
    assert(cleaned(4L)._2 === 0L)
    assert(cleaned(5L) === ((s"$flank1 $flank2", 20L)),
      "disjoint cut removes exactly the span, flanks rejoin")
  }

  test("applyVerbatimCuts on the fixture: no runs remain; removed == merged span measure") {
    val base = Tables.documents(spark, sf).select($"doc_id", $"text")
    val spansDf = Dedup.verbatimRunSpansOn(base)
    val spans = spansDf.as[(Long, Long, Long, Long, Long)].collect()
    val cleaned = Dedup.applyVerbatimCuts(base, spansDf)
    val got = cleaned.as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // invariant 1: the removal pass actually removes — re-running the
    // detector on the cleaned corpus finds no cross-doc run >= threshold
    val cleanedDocs = cleaned.select($"doc_id", $"text")
    assert(Dedup.verbatimRunPairsOn(cleanedDocs).count() === 0L,
      "no cross-doc verbatim run >= 20 tokens may survive the cut")
    // invariant 2: token conservation — each doc's n_tokens_removed is
    // the measure of the UNION of its [b_start, b_start+run_tokens)
    // intervals (driver-side interval merge), and untouched docs pass
    // through byte-identical
    val mergedLen: Map[Long, Long] = spans.groupBy(_._2).map { case (doc, ss) =>
      val ivs = ss.map(s => (s._4, s._4 + s._5)).sorted
      var tot = 0L; var curS = ivs.head._1; var curE = ivs.head._2
      ivs.tail.foreach { case (s, e) =>
        if (s > curE) { tot += curE - curS; curS = s; curE = e }
        else curE = math.max(curE, e)
      }
      doc -> (tot + (curE - curS))
    }
    val orig = base.as[(Long, String)].collect().toMap
    orig.keys.foreach { id =>
      val (text, removed) = got(id)
      assert(removed === mergedLen.getOrElse(id, 0L),
        s"doc $id: removed tokens must equal merged interval measure")
      if (removed == 0L) assert(text === orig(id), s"doc $id must pass through")
      // "" split(" ", -1) is [""] not [] — count kept tokens as 0 there
      else assert((if (text.isEmpty) 0 else text.split(" ", -1).length) ===
        orig(id).split(" ", -1).length - removed.toInt,
        s"doc $id: kept token count must reconcile")
    }
  }

  test("stripCommonLines strikes boilerplate lines at the doc-frequency threshold") {
    val docs = Seq(
      (1L, "H\na b\nF1"), (2L, "H\nc d\nF1"), (3L, "H\ne f\nF2"),
      (4L, "X\nX\ng h")
    ).toDF("doc_id", "text")
    def run(k: Int) = Dedup.stripCommonLines(docs, minDocFreq = k)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // k=3: only H (df=3) is struck; F1 (df=2), F2 (df=1) survive
    assert(run(3) === Map(
      1L -> (("a b\nF1", 1L)), 2L -> (("c d\nF1", 1L)),
      3L -> (("e f\nF2", 1L)), 4L -> (("X\nX\ng h", 0L))),
      "df counts DISTINCT docs: doc4's repeated X (df=1) must survive")
    // k=2: F1 struck too; a line repeated within ONE doc still has df=1
    assert(run(2) === Map(
      1L -> (("a b", 2L)), 2L -> (("c d", 2L)),
      3L -> (("e f\nF2", 1L)), 4L -> (("X\nX\ng h", 0L))))
    // a doc that is ALL boilerplate empties out but stays in the corpus
    val allBoiler = (docs.as[(Long, String)].collect().toSeq :+
      ((5L, "H\nF1"))).toDF("doc_id", "text")
    val got = Dedup.stripCommonLines(allBoiler, minDocFreq = 2)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(5L) === (("", 2L)), "fully-boilerplate doc empties, row kept")
    // blank lines are paragraph STRUCTURE, not boilerplate: a blank
    // separator present in every doc (df over threshold) must survive
    val para = Seq((1L, "H\n\na"), (2L, "H\n\nb"), (3L, "H\n\nc"))
      .toDF("doc_id", "text")
    val kept = Dedup.stripCommonLines(para, minDocFreq = 2)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(kept === Map(1L -> (("\na", 1L)), 2L -> (("\nb", 1L)),
      3L -> (("\nc", 1L))),
      "header struck, blank separator exempt from striking")
  }

  test("stripCommonLines hashKey spelling equals the string-keyed default") {
    // the documents fixture under the SAME planted header/footer
    // construction as q_line_dedup — real corpus, over-threshold
    // boilerplate, plus a blank-line doc so the exemption path is
    // exercised under both keys
    val docs = Tables.documents(spark, sf).select($"doc_id",
      concat(lit("shared header boilerplate\n"), $"text",
        lit("\nfooter group "), ($"doc_id" % 5).cast("string")).as("text"))
      .union(Seq((900001L, "shared header boilerplate\n\nunique tail"),
        (900002L, "shared header boilerplate\n\nother tail")).toDF("doc_id", "text"))
    def run(hashKey: Boolean) =
      Dedup.stripCommonLines(docs, minDocFreq = 50, hashKey = hashKey)
        .as[(Long, String, Long)].collect().toSet
    val stringKeyed = run(false)
    assert(stringKeyed.exists(_._3 > 0), "fixture must actually strike lines")
    assert(run(true) === stringKeyed,
      "xxhash64 line keys must not change the result (modulo 2^-64 collisions)")
  }

  test("stripCommonParagraphs strikes shared paragraphs; blank-run split normalizes to one separator") {
    val docs = Seq(
      (1L, "PRE\n\na b\n\nF1"), (2L, "PRE\n\nc d\n\nF1"),
      (3L, "PRE\n\ne f\n\nF2"),
      // multi-line paragraph: its two lines strike or survive as a UNIT
      // (the granularity the line spelling cannot see), and a 3-newline
      // separator still reads as one paragraph break
      (4L, "PRE\n\nmulti line\npara here\n\n\nF2")
    ).toDF("doc_id", "text")
    def run(k: Int) = Dedup.stripCommonParagraphs(docs, minDocFreq = k)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // k=4: only PRE (df=4) struck; F1 (df=2), F2 (df=2) survive
    assert(run(4) === Map(
      1L -> (("a b\n\nF1", 1L)), 2L -> (("c d\n\nF1", 1L)),
      3L -> (("e f\n\nF2", 1L)),
      4L -> (("multi line\npara here\n\nF2", 1L))),
      "PRE struck as a unit; the \\n{3} separator normalizes to \\n\\n")
    // k=2: the footers strike too; the multi-line paragraph (df=1) stays
    assert(run(2) === Map(
      1L -> (("a b", 2L)), 2L -> (("c d", 2L)), 3L -> (("e f", 2L)),
      4L -> (("multi line\npara here", 2L))))
  }

  test("stripCommonParagraphs hashKey spelling equals the string-keyed default") {
    val docs = Tables.documents(spark, sf).select($"doc_id",
      concat(lit("shared preamble paragraph\n\n"), $"text",
        lit("\n\nfooter para "), ($"doc_id" % 5).cast("string")).as("text"))
    def run(hashKey: Boolean) =
      Dedup.stripCommonParagraphs(docs, minDocFreq = 50, hashKey = hashKey)
        .as[(Long, String, Long)].collect().toSet
    val stringKeyed = run(false)
    assert(stringKeyed.exists(_._3 > 0), "fixture must actually strike paragraphs")
    assert(run(true) === stringKeyed,
      "xxhash64 paragraph keys must not change the result")
  }

  test("verbatimCleanFixpoint clears a planted seam rematch one pass leaves behind") {
    // cutting "X Y Z" out of doc2 butt-joins its flanks into "p q r s" —
    // which coincidentally equals doc0, a run one pass cannot see
    // because it only exists AFTER the cut
    val docs = Seq(
      (0L, "p q r s"), (1L, "X Y Z"), (2L, "p q X Y Z r s")
    ).toDF("doc_id", "text")
    val onePass = Dedup.applyVerbatimCuts(docs,
      Dedup.verbatimRunSpansOn(docs, minRunTokens = 3))
    assert(Dedup.verbatimRunPairsOn(onePass.select($"doc_id", $"text"),
        minRunTokens = 3).count() === 1L,
      "one pass must leave the seam-created (0,2) run — the fixpoint's raison d'etre")
    val fixed = Dedup.verbatimCleanFixpoint(docs, minRunTokens = 3)
    val got = fixed.as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(0L) === (("p q r s", 0L)) && got(1L) === (("X Y Z", 0L)),
      "lower-id sources stay untouched through every round")
    assert(got(2L) === (("", 7L)),
      "doc2 loses the quote (3) then the seam rematch (4): 7 total")
    assert(Dedup.verbatimRunPairsOn(fixed.select($"doc_id", $"text"),
        minRunTokens = 3).count() === 0L,
      "fixpoint output must re-detect clean")
  }

  test("a caller's persisted frame survives a fixpoint run (scoped cleanup)") {
    // the round-8 nit: fixpoint dropped its per-round detector caches
    // with clearCache(), evicting the CALLER's frames too. Now each
    // round unpersists only its own tracked handles.
    val callerFrame = Tables.documents(spark, sf).select($"doc_id").persist()
    callerFrame.count() // materialize the cache before the fixpoint runs
    val docs = Seq(
      (0L, "p q r s"), (1L, "X Y Z"), (2L, "p q X Y Z r s")
    ).toDF("doc_id", "text")
    Dedup.verbatimCleanFixpoint(docs, minRunTokens = 3).collect()
    assert(callerFrame.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "fixpoint must unpersist only detector-owned frames, not the caller's")
    callerFrame.unpersist()
  }

  test("self-repeats equal a driver-side longest-repeated-substring scan") {
    // brute force: for every alignment offset d >= 1, the longest run of
    // positions i with tokens(i) == tokens(i-d) is the longest repeated
    // span at that offset (overlap allowed — periodic text reports its
    // full extent); answer = max over d, counted only at >= n tokens
    def longestSelfRepeat(t: Array[String]): Int = {
      var best = 0
      for (d <- 1 until t.length) {
        var run = 0
        for (i <- d until t.length) {
          run = if (t(i) == t(i - d)) run + 1 else 0
          if (run > best) best = run
        }
      }
      best
    }
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ", -1) }
    val want = docs.map { case (id, t) => id -> longestSelfRepeat(t).toLong }
      .filter(_._2 >= 3).toMap
    val got = Dedup.selfRepeatsOn(
        Tables.documents(spark, sf).select($"doc_id", $"text"),
        minRepTokens = 3, maxOccFreq = 1000000)
      .as[(Long, Long)].collect().toMap
    assert(got === want)
    // planted: a doc repeating a 25-token block, a periodic doc, and a
    // clean doc — the real (>= 20) threshold keeps only the repeater
    def span(k: Int, tag: String) = (1 to k).map(i => s"$tag$i").mkString(" ")
    val block = span(25, "r")
    val planted = Seq(
      (1L, s"$block ${span(4, "mid")} $block"),
      (2L, Seq.fill(30)("x").mkString(" ")),  // period-1: repeat extent 29
      (3L, span(40, "clean"))
    ).toDF("doc_id", "text")
    val p20 = Dedup.selfRepeatsOn(planted).as[(Long, Long)].collect().toMap
    assert(p20 === Map(1L -> 25L, 2L -> 29L),
      "block repeat exact at 25; periodic doc reports full extent; clean absent")
  }

  test("incremental verbatim runs equal the cross-split slice of the LCS DP") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ", -1) }
    val corpus = docs.filter(_._1 % 10 < 8)
    val batch = docs.filter(_._1 % 10 >= 8)
    val want = (for {
      (b, tb) <- batch; (c, tc) <- corpus
      l = lcsTokens(tb, tc) if l >= 3
    } yield (b, c) -> l.toLong).toMap
    val base = Tables.documents(spark, sf).select($"doc_id", $"text")
    val got = Dedup.incrementalVerbatimRuns(
        base.filter($"doc_id" % 10 < 8), base.filter($"doc_id" % 10 >= 8),
        minRunTokens = 3, maxOccFreq = 1000000)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === want, "cross-split k-gram runs must equal token-LCS exactly")
    // corpus-side cap = 1: every probed shingle exists at least once in
    // the corpus; any shared one with a cross match has occ >= 1, so a
    // cap of 0 gates ALL matching (structural proof the cap is corpus-side)
    assert(Dedup.incrementalVerbatimRuns(
      base.filter($"doc_id" % 10 < 8), base.filter($"doc_id" % 10 >= 8),
      minRunTokens = 3, maxOccFreq = 0).count() === 0)
  }

  test("near-dup clusters equal driver-side union-find over the exact pair set") {
    val got = Dedup.nearDupClusters(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(got === bruteComponents(brutePairs(0.8)))
  }

  test("clusterPairs: chains, merged triangles, and separate components") {
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("doc_a", "doc_b")
    val got = Dedup.clusterPairs(pairs).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("clusterPairs converges on a pure chain (worst-case diameter)") {
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.clusterPairs(chain).as[(Long, Long)].collect()
    assert(got.length === 12 && got.forall(_._2 == 1L))
    // the guard is a FALLBACK, not a wall: a bound below the diameter
    // hands the graph to large-star/small-star and still returns the
    // exact labeling, never a half-propagated one
    val fellBack = Dedup.clusterPairs(chain, maxIter = 3)
      .as[(Long, Long)].collect()
    assert(fellBack.length === 12 && fellBack.forall(_._2 == 1L))
  }

  test("clusterPairsStar equals min-label propagation on random graphs") {
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 40 + trial * 30
      val m = n * 3 / 2
      val pairs = Seq.fill(m) {
        val a = rng.nextInt(n).toLong
        val b = rng.nextInt(n).toLong
        (a, if (a == b) a + 1 else b)
      }.toDF("doc_a", "doc_b")
      val star = Dedup.clusterPairsStar(pairs).as[(Long, Long)].collect().toMap
      val minLabel = Dedup.clusterPairs(pairs).as[(Long, Long)].collect().toMap
      assert(star === minLabel, s"trial $trial (n=$n, m=$m)")
    }
  }

  test("clusterPairsStar collapses a 10k-node path graph in O(log n) rounds") {
    // diameter 10k: min-label propagation would need ~10k rounds (its
    // maxIter guard exists exactly for this shape); large-star/small-star
    // must label every node with the path minimum within its 60-round
    // O(log n) budget or throw
    val path = (0L until 10000L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.clusterPairsStar(path).as[(Long, Long)].collect()
    assert(got.length === 10001 && got.forall(_._2 == 0L))
  }

  test("incremental dedup equals a driver-side fingerprint anti-join") {
    def canon(t: String) = t.trim.toLowerCase.replaceAll("\\s+", " ")
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => (id, md5hex(canon(t))) }
    val corpusFps = docs.filter(_._1 % 10 < 8).map(_._2).toSet
    val want = docs.filter(_._1 % 10 >= 8)
      .groupBy(_._2).view
      .mapValues(rows => (rows.map(_._1).min, rows.size.toLong)).toMap
      .filter { case (fp, _) => !corpusFps.contains(fp) }
    val got = Dedup.incrementalNewDocs(spark, sf)
      .as[(String, Long, Long)].collect()
      .map { case (fp, id, n) => fp -> ((id, n)) }.toMap
    assert(got === want)
    assert(want.nonEmpty, "fixture must have genuinely-new batch docs")
  }

  test("incremental near-dup classifies planted batch docs across the boundary") {
    val corpus = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12"),
      (2L, "u1 u2 u3 u4 u5 u6")).toDF("doc_id", "text")
    val batch = Seq(
      // last token changed: 9 of 10 shingles shared with doc 1 →
      // J = 9/11, and 9·9 ≥ 4·20 holds with a margin of 1 — right at
      // the 0.8 integer-threshold boundary
      (18L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 zz"),
      (19L, "completely different tokens over here"),
      (28L, "u1 u2 u3 u4 u5 u6"), // exact copy of corpus doc 2
      (30L, "xy zz")              // < 3 tokens: no shingles, trivially new
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalNearDup(corpus, batch)
      .as[(Long, Option[Long], Long, Long)].collect().toSet
    assert(got === Set(
      (18L, Some(1L), 1L, 0L),
      (19L, None, 0L, 1L),
      (28L, Some(2L), 1L, 0L),
      (30L, None, 0L, 1L)))
    spark.catalog.clearCache() // operator persist()s its shingle frames
  }

  test("incremental near-dup equals driver-side cross-split brute force") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val sh = docs.map { case (id, t) =>
      id -> t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.toMap
    val batchIds = docs.map(_._1).filter(_ % 10 >= 8)
    val corpusIds = docs.map(_._1).filter(_ % 10 < 8)
    val want = batchIds.map { b =>
      val matches = corpusIds.filter { c =>
        val (sa, sb) = (sh(b), sh(c))
        sa.nonEmpty && sb.nonEmpty &&
          (sa & sb).size * 9 >= 4 * (sa.size + sb.size)
      }
      if (matches.isEmpty) (b, None, 0L, 1L)
      else (b, Some(matches.min), matches.size.toLong, 0L)
    }.toSet
    val got = Dedup.incrementalNearDupDocs(spark, sf)
      .as[(Long, Option[Long], Long, Long)].collect().toSet
    assert(got === want)
    assert(want.exists(_._4 == 0L), "fixture must plant cross-boundary near-dups")
    spark.catalog.clearCache()
  }

  /** Independent driver-side SimHash: plain Scala loops over token
    * counts, same 64-bit xxhash64(tok, seed 42) as the SQL expression —
    * an independent REIMPLEMENTATION of the signature + threshold (the
    * engine path is Spark SQL sum/when/bit ops; this is scalar Scala).
    */
  private def driverSimHash(text: String): Long = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val counts = text.split(" ").groupBy(identity).view.mapValues(_.length)
    val sums = new Array[Long](64)
    for ((tok, c) <- counts) {
      val h = XxHash64Function.hash(UTF8String.fromString(tok), StringType, 42L)
      var b = 0
      while (b < 64) {
        sums(b) += (if (((h >>> b) & 1L) == 1L) c else -c)
        b += 1
      }
    }
    (0 until 64).foldLeft(0L)((acc, b) => if (sums(b) > 0) acc | (1L << b) else acc)
  }

  test("native simhash_agg equals the composed two-aggregation spelling per doc") {
    val ref = Dedup.simHashSignaturesRef(spark, sf)
      .as[(Long, Long)].collect().toMap
    val got = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"))
      .agg(graft.functions.SimHashAgg.simhashAgg(xxhash64(col("tok"))).as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(got === ref)
  }

  test("simhash pairs equal an independent driver-side implementation exactly") {
    val sigs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> driverSimHash(t) }
    val want = (for {
      (a, sa) <- sigs; (b, sb) <- sigs
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b, java.lang.Long.bitCount(sa ^ sb))).toSet
    val got = Dedup.simHashNearDups(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === want, "banding must have full recall (pigeonhole) and exact hamming")
  }

  test("shingles: docs shorter than n tokens yield empty array, not garbage") {
    val df = Seq("a b", "a b c", "a b c d").toDF("text")
    val out = df.select(TextOps.shingles(col("text"), 3).as("sh"))
      .select(size(col("sh"))).as[Int].collect()
    assert(out.toSeq === Seq(0, 1, 2))
  }

  test("minhash signature is deterministic and k-long") {
    val df = Seq("x y z w", "x y z w").toDF("text")
    val sigs = df.select(TextOps.minHashSignature(
      TextOps.shingles(col("text"), 3), 16).as("sig"))
      .as[Seq[Long]].collect()
    assert(sigs(0) === sigs(1))
    assert(sigs(0).length === 16)
  }

  test("keep-best: highest quality wins per cluster, singletons keep themselves") {
    // 12-token base so J >= 0.8 holds with one token changed; docs
    // 1/2/3 are a near-dup cluster with qualities 5/9/9 (tie -> doc 2);
    // doc 7 is a singleton
    val base = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12"
    val docs = Seq(
      (1L, base, 5L),
      (2L, base.replace("t12", "t12b"), 9L),
      (3L, base.replace("t12", "t12c"), 9L),
      (7L, "completely different words here entirely", 4L))
      .toDF("doc_id", "text", "q")
    val got = Dedup.keepBestOn(docs, "q")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got === Map(
      1L -> (1L, 2L, 0L), 2L -> (1L, 2L, 1L), 3L -> (1L, 2L, 0L),
      7L -> (7L, 7L, 1L)))
    // exactly one keeper per cluster; every doc appears exactly once
    assert(got.values.count(_._3 == 1L) === 2)
    // fixture: keepers == one per cluster, kept count == cluster count
    val fix = Dedup.keepBestNearDups(spark, TestSpark.sf0001)
    val clusters = fix.select($"cluster_id").distinct().count()
    assert(fix.filter($"kept" === 1L).count() === clusters)
    assert(fix.count() ===
      Tables.documents(spark, TestSpark.sf0001).count())
    // the keeper really is argmax quality in its cluster
    val viol = fix.as[(Long, Long, Long, Long)].collect()
      .groupBy(_._2).values.count { rows =>
        val byId = rows.map(_._1).toSet
        !byId.contains(rows.head._3)
      }
    assert(viol === 0, "keeper must be a member of its own cluster")
  }
}
