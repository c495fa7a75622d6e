package graft

import graft.engine.GrepEngine
import graft.functions.MinHash
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based tests (SURVEY.md §5): engine results must equal brute
  * force and be invariant under row permutation and partition count —
  * the two degrees of freedom a distributed engine must not leak into
  * results.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop, n: Int = 12): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val word = Gen.oneOf("ab", "cd", "ee", "x", "spark", "sp")
  private val lineGen = Gen.listOfN(4, word).map(_.mkString(" "))
  private val bagGen = Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, lineGen))

  test("grep == brute force, invariant under permutation and partitioning") {
    val prop = Prop.forAll(bagGen, Gen.oneOf("a", "spark", "e", "zzz"),
      Gen.chooseNum(1, 7), Gen.chooseNum(0L, 99L)) { (bag, pat, parts, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(bag)
      val df = shuffled.toDF("line").repartition(parts)
      val got = GrepEngine.grepFreq(df, "line", pat)
        .as[(String, Long)].collect().toMap
      val want = bag.filter(_.contains(pat)).groupBy(identity)
        .map { case (l, xs) => l -> xs.length.toLong }
      got == want
    }
    check("grepFreq", prop)
  }

  test("context grep == brute force on random multi-file corpora") {
    // naive reference: per file, a line is emitted iff any line within
    // distance n of it (by SORTED position, grep's physical adjacency)
    // matches — recomputed from first principles, no window functions
    val corpusGen = Gen.chooseNum(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.oneOf("f1", "f2", "f3"), lineGen)))
    val prop = Prop.forAll(corpusGen, Gen.oneOf("spark", "ee", "zzz"),
      Gen.chooseNum(0, 3), Gen.chooseNum(1, 5)) { (corpus, pat, n, parts) =>
      // distinct line numbers per file, assigned before shuffling
      val numbered = corpus.groupBy(_._1).toSeq.flatMap { case (f, ls) =>
        ls.zipWithIndex.map { case ((_, l), i) => (f, i.toLong, l) }
      }
      val df = scala.util.Random.shuffle(numbered)
        .toDF("file", "line_no", "line").repartition(parts)
      val got = GrepEngine.contextGrep(df, "file", "line_no", "line", pat, n)
        .as[(String, Long, String, Long)].collect()
        .map(r => (r._1, r._2, r._4)).toSet
      val want = numbered.groupBy(_._1).toSeq.flatMap { case (_, ls) =>
        val sorted = ls.sortBy(_._2)
        val isM = sorted.map(_._3.contains(pat))
        sorted.indices.collect {
          case i if ((math.max(0, i - n) to math.min(sorted.size - 1, i + n))
              .exists(isM)) =>
            (sorted(i)._1, sorted(i)._2, if (isM(i)) 1L else 0L)
        }
      }.toSet
      got == want
    }
    check("contextGrep", prop)
  }

  test("minhash band keys: permutation- and multiplicity-invariant (pure)") {
    val setGen = Gen.chooseNum(1, 30)
      .flatMap(n => Gen.listOfN(n, Gen.identifier.map(_.take(8))))
    def keys(xs: Seq[String]): Seq[Long] =
      MinHash.bandKeys(
        new GenericArrayData(xs.map(s => UTF8String.fromString(s)).toArray),
        64, 16).toSeq
    val prop = Prop.forAll(setGen, Gen.chooseNum(0L, 99L)) { (xs, seed) =>
      val perm = new scala.util.Random(seed).shuffle(xs)
      keys(xs) == keys(perm) && keys(xs) == keys(xs ++ xs)
    }
    check("bandKeys", prop, n = 100)
  }

  test("integer Jaccard threshold algebra == float comparison (pure)") {
    // (den+num)*inter >= num*(sa+sb) must decide exactly like
    // inter/(sa+sb-inter) >= num/den for every integer configuration
    val prop = Prop.forAll(
      Gen.chooseNum(1, 500), Gen.chooseNum(1, 500), Gen.chooseNum(0, 500),
      Gen.oneOf((4, 5), (1, 2), (9, 10))) { (sa, sb, interRaw, t) =>
      val inter = math.min(interRaw, math.min(sa, sb))
      val (num, den) = t
      val intDecision = inter.toLong * (den + num) >= num.toLong * (sa + sb)
      val ratDecision = // exact rational compare, no floats
        BigInt(inter) * den >= BigInt(num) * (sa + sb - inter)
      intDecision == ratDecision
    }
    check("jaccardAlgebra", prop, n = 500)
  }

  test("as-of join equals brute force on random key/time data") {
    import org.apache.spark.sql.functions.col
    val rowGen = for {
      k <- Gen.chooseNum(1, 4); t <- Gen.chooseNum(0L, 50L)
    } yield (k.toLong, new java.sql.Timestamp(t * 1000))
    val sideGen = Gen.chooseNum(1, 15).flatMap(n => Gen.listOfN(n, rowGen))
    val prop = Prop.forAll(sideGen, sideGen) { (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val right = rs.zipWithIndex.map { case ((k, t), i) => (k, t, 1000L + i) }
      val got = graft.operators.AsOf.asOfJoin(
          left.toDF("k", "t", "id"), col("k"), col("t"), col("id"),
          right.toDF("k", "t", "v"), col("k"), col("t"), col("v"), "v")
        .as[(Long, Option[Long])].collect().toMap
      val want = left.map { case (k, t, id) =>
        val prior = right.filter(r => r._1 == k && !r._2.after(t))
        id -> (if (prior.isEmpty) None
               else Some(prior.maxBy(r => (r._2.getTime, r._3))._3))
      }.toMap
      got == want
    }
    check("asOfJoin", prop, n = 10)
  }

  test("banded range pairing equals brute force on random timestamps") {
    import org.apache.spark.sql.functions._
    val winUs = 600L
    val evGen = Gen.chooseNum(2, 20).flatMap(n => Gen.listOfN(n,
      for { u <- Gen.chooseNum(1, 3); t <- Gen.chooseNum(0L, 5000L) } yield (u.toLong, t)))
    val prop = Prop.forAll(evGen) { evs =>
      val rows = evs.zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) }
      val df = rows.toDF("event_id", "user_id", "us")
        .withColumn("band", floor(col("us") / winUs))
      val probe = df.select(col("event_id").as("id_x"), col("user_id"),
        col("us").as("us_x"), explode(array(col("band"), col("band") + 1)).as("band"))
      val build = df.select(col("event_id").as("id_y"), col("user_id"),
        col("us").as("us_y"), col("band"))
      val got = probe.join(build, Seq("user_id", "band"))
        .filter(col("id_x") =!= col("id_y") &&
          abs(col("us_x") - col("us_y")) <= winUs)
        .select(least(col("id_x"), col("id_y")), greatest(col("id_x"), col("id_y")))
        .distinct().as[(Long, Long)].collect().toSet
      val want = (for {
        a <- rows; b <- rows
        if a._1 < b._1 && a._2 == b._2 && math.abs(a._3 - b._3) <= winUs
      } yield (a._1, b._1)).toSet
      got == want
    }
    check("bandedRange", prop, n = 10)
  }

  test("salted sessionization equals single-window on random event sets") {
    import org.apache.spark.sql.functions.col
    // timestamps quantized near the gap (600s) and band (3600s)
    // boundaries so splits/merges and exact-boundary ties all occur
    val evGen = Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n,
      for {
        u <- Gen.chooseNum(1, 3)
        t <- Gen.chooseNum(0L, 40L)
        jit <- Gen.oneOf(0L, 1L, 300L)
      } yield (u.toLong, t * 600000000L + jit * 1000000L)))
    val prop = Prop.forAll(evGen) { evs =>
      val rows = evs.zipWithIndex.map { case ((u, us), i) => (i.toLong, u, us) }
      val df = rows.toDF("event_id", "user_id", "us")
      val plain = graft.operators.AsOf.sessionizeEvents(df)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val salted = graft.operators.AsOf.sessionizeSaltedEvents(df, bandSec = 3600L)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      salted == plain
    }
    check("saltedSessionize", prop, n = 10)
  }

  test("banded as-of equals plain as-of on random key/time data") {
    import org.apache.spark.sql.functions.col
    val rowGen = for {
      k <- Gen.chooseNum(1, 4); t <- Gen.chooseNum(0L, 50L)
    } yield (k.toLong, new java.sql.Timestamp(t * 600000L)) // spans bands at 20min
    val sideGen = Gen.chooseNum(1, 15).flatMap(n => Gen.listOfN(n, rowGen))
    val prop = Prop.forAll(sideGen, sideGen) { (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val right = rs.zipWithIndex.map { case ((k, t), i) => (k, t, 1000L + i) }
      val banded = graft.operators.AsOf.asOfJoinBanded(
          left.toDF("k", "t", "id"), col("k"), col("t"), col("id"),
          right.toDF("k", "t", "v"), col("k"), col("t"), col("v"), "v",
          bandUs = 1200L * 1000000L)
        .as[(Long, Option[Long])].collect().toMap
      val plain = graft.operators.AsOf.asOfJoin(
          left.toDF("k", "t", "id"), col("k"), col("t"), col("id"),
          right.toDF("k", "t", "v"), col("k"), col("t"), col("v"), "v")
        .as[(Long, Option[Long])].collect().toMap
      banded == plain
    }
    check("asOfJoinBanded", prop, n = 8)
  }

  test("prefix-filtered ngram Jaccard equals brute force on random corpora") {
    import org.apache.spark.sql.functions.col
    // small vocabulary so shared shingles (and near-dup pairs) are common
    val tok = Gen.oneOf("a", "b", "c", "d", "e")
    val docGen = Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, tok).map(_.mkString(" ")))
    val corpusGen = Gen.chooseNum(2, 14).flatMap(n => Gen.listOfN(n, docGen))
    val prop = Prop.forAll(corpusGen) { corpus =>
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = graft.operators.Dedup
        .ngramJaccardPairsOn(docs.toDF("doc_id", "text"))
        .select(col("doc_a"), col("doc_b"))
        .as[(Long, Long)].collect().toSet
      spark.catalog.clearCache()
      val sh = docs.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet
      }
      val want = (for {
        (a, sa) <- sh; (b, sb) <- sh
        if a < b && sa.nonEmpty && sb.nonEmpty
        inter = (sa & sb).size
        if inter * 3 >= sa.size + sb.size // j >= 1/2 in integer algebra
      } yield (a, b)).toSet
      got == want
    }
    check("ngramPrefixFilter", prop, n = 10)
  }

  test("verbatim k-gram runs equal token-LCS on random corpora") {
    import org.apache.spark.sql.functions.col
    def lcs(a: Array[String], b: Array[String]): Int = TestOracles.lcsTokens(a, b)
    // tiny vocabulary makes shared spans (and repeated shingles WITHIN a
    // doc — the multi-occurrence alignment case) common
    val tok = Gen.oneOf("a", "b", "c")
    val docGen = Gen.chooseNum(0, 10).flatMap(n => Gen.listOfN(n, tok).map(_.mkString(" ")))
    val corpusGen = Gen.chooseNum(2, 10).flatMap(n => Gen.listOfN(n, docGen))
    val prop = Prop.forAll(corpusGen) { corpus =>
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = graft.operators.Dedup
        .verbatimRunPairsOn(docs.toDF("doc_id", "text"),
          minRunTokens = 3, maxOccFreq = 1000000)
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      spark.catalog.clearCache()
      val toks = docs.map { case (id, t) => id -> t.split(" ", -1) }
      val want = (for {
        (a, ta) <- toks; (b, tb) <- toks if a < b
        l = lcs(ta, tb) if l >= 3
      } yield (a, b) -> l.toLong).toMap
      got == want
    }
    check("verbatimRuns", prop, n = 10)
  }

  test("applyVerbatimCuts equals a driver-side splice on random corpora") {
    import org.apache.spark.sql.functions.col
    // tiny vocabulary: overlapping spans on one doc and multi-span pairs
    // are common, exercising the interval merge where it matters. The
    // reference implementation recomputes spans from first principles
    // (token-window scan), merges [s, e) intervals, and splices.
    val tok = Gen.oneOf("a", "b", "c")
    val docGen = Gen.chooseNum(0, 10).flatMap(n => Gen.listOfN(n, tok).map(_.mkString(" ")))
    val corpusGen = Gen.chooseNum(2, 8).flatMap(n => Gen.listOfN(n, docGen))
    val prop = Prop.forAll(corpusGen) { corpus =>
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("doc_id", "text")
      val got = graft.operators.Dedup
        .applyVerbatimCuts(df, graft.operators.Dedup
          .verbatimRunSpansOn(df, minRunTokens = 3, maxOccFreq = 1000000))
        .as[(Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      spark.catalog.clearCache()
      val toks = docs.map { case (id, t) => id -> t.split(" ", -1) }.toMap
      // spans from first principles: for every (a < b) and alignment, the
      // maximal equal token runs >= 3, as [s, e) on the HIGHER-id doc
      val ivs = (for {
        (a, ta) <- toks.toSeq; (b, tb) <- toks.toSeq if a < b
        off <- -(tb.length - 1) to (ta.length - 1)
        run <- {
          val pairs = (math.max(0, off) until math.min(ta.length, tb.length + off))
            .map(i => (i, ta(i) == tb(i - off)))
          // maximal true-runs along this alignment
          val runs = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
          var st = -1
          pairs.foreach { case (i, eq) =>
            if (eq && st < 0) st = i
            if (!eq && st >= 0) { runs += ((st, i)); st = -1 }
          }
          if (st >= 0) runs += ((st, pairs.last._1 + 1))
          runs.toSeq
        }
        if run._2 - run._1 >= 3
      } yield b -> ((run._1 - off, run._2 - off))) // b-side coordinates
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      docs.forall { case (id, _) =>
        val t = toks(id)
        val merged = ivs.get(id).map { spans =>
          val sorted = spans.sortBy(x => (x._1, x._2))
          sorted.tail.foldLeft(List(sorted.head)) { case (acc, (s, e)) =>
            if (s <= acc.head._2) (acc.head._1, math.max(acc.head._2, e)) :: acc.tail
            else (s, e) :: acc
          }.reverse
        }.getOrElse(Nil)
        val kept = t.zipWithIndex.collect {
          case (w, i) if !merged.exists(iv => i >= iv._1 && i < iv._2) => w
        }
        val removed = t.length - kept.length
        got(id) == ((kept.mkString(" "), removed.toLong))
      }
    }
    check("applyVerbatimCuts", prop, n = 10)
  }

  test("connected components equal union-find on random graphs") {
    def unionFind(pairs: Set[(Long, Long)]): Map[Long, Long] = {
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
    // random graphs cover chains, cycles, stars, and forests — the
    // topologies min-label propagation must converge on
    val edgeGen = for {
      n <- Gen.chooseNum(2, 12)
      m <- Gen.chooseNum(1, 18)
      edges <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0L, n.toLong)
        b <- Gen.chooseNum(0L, n.toLong) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges.distinct
    val prop = Prop.forAll(edgeGen) { edges =>
      edges.isEmpty || {
        val got = graft.operators.Dedup.clusterPairs(edges.toDF("doc_a", "doc_b"))
          .as[(Long, Long)].collect().toMap
        got == unionFind(edges.toSet)
      }
    }
    check("clusterPairs", prop, n = 6)
  }

  test("token sharding: blockwise prefix equals direct for random budgets/blocks") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
      .map { case (id, t) => (id, t.split(" ").length.toLong) }
    val prop = Prop.forAll(Gen.chooseNum(50L, 5000L), Gen.chooseNum(1L, 600L)) {
      (budget, blockSize) =>
        var pre = 0L
        val want = docs.map { case (id, nt) =>
          val s = pre / budget; pre += nt; (id, s)
        }.toMap
        val got = graft.operators.TextAnalysis
          .tokenShards(spark, TestSpark.sf0001, budget, blockSize)
          .select("doc_id", "shard").as[(Long, Long)].collect().toMap
        // each call persist()s its base projection (caller-owned
        // cleanup contract) — drop it so iterations don't accumulate
        spark.catalog.clearCache()
        got == want
    }
    check("tokenShards", prop, n = 6)
  }

  test("curation ledger == first-principles reimplementation on random corpora") {
    // The entire pipeline — lang-ID argmax w/ tie order, integer quality
    // rules, canonical-md5 dedup keeper race, split threshold, 3-gram
    // decontamination, stage precedence — reimplemented in plain Scala
    // and compared doc for doc. Row order and partitioning are the
    // randomized degrees of freedom; duplicate texts are forced by
    // sampling docs from a small text pool.
    import graft.operators.TextAnalysis.langProfiles
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def fpOf(text: String): String =
      md5hex(text.trim.toLowerCase.replaceAll("\\s+", " "))
    def langOf(toks: Seq[String]): String = {
      val hs = langProfiles.map { case (l, p) => l -> toks.count(p.contains).toLong }
      val best = hs.map(_._2).max
      hs.find { case (_, h) => h == best && best > 0 }.map(_._1).getOrElse("und")
    }
    def qualityOf(toks: Seq[String]): Boolean = {
      val nt = toks.size.toLong
      val ttr = toks.distinct.size.toLong * 100 / nt
      val stopPct = toks.count(langProfiles.head._2.contains).toLong * 100 / nt
      val mtl = toks.map(_.length).sum.toLong * 100 / nt
      val nGrams = math.max(nt - 2, 0L)
      val ndg = if (toks.size >= 3)
        toks.sliding(3).map(_.mkString(" ")).toSet.size.toLong else 0L
      val rep = if (nGrams > 0) (nGrams - ndg) * 100 / nGrams else 0L
      nt >= 20 && mtl >= 300 && mtl <= 1000 && stopPct >= 3 && ttr >= 40 && rep <= 2
    }
    def gramsOf(toks: Seq[String]): Set[String] =
      if (toks.size >= 3) toks.sliding(3).map(_.mkString(" ")).toSet else Set.empty
    def ledgerOf(docs: Seq[(Long, String)]): Map[Long, (Long, String)] = {
      val bits = docs.map { case (id, text) =>
        val toks = text.split(" ", -1).toSeq
        (id, toks, langOf(toks), qualityOf(toks), fpOf(text))
      }
      val keeper = bits.filter(b => b._3 == "en" && b._4)
        .groupBy(_._5).map { case (fp, xs) => fp -> xs.map(_._1).min }
      val survivors = bits.filter(b =>
        b._3 == "en" && b._4 && keeper(b._5) == b._1)
      val evalGrams = survivors.filter(_._5 >= "cc").flatMap(b => gramsOf(b._2)).toSet
      val contaminated = survivors
        .filter(b => b._5 < "cc" && gramsOf(b._2).exists(evalGrams)).map(_._1).toSet
      bits.map { case (id, toks, lang, qual, fp) =>
        val outcome =
          if (lang != "en") "dropped_lang"
          else if (!qual) "dropped_quality"
          else if (keeper(fp) != id) "dropped_duplicate"
          else if (contaminated(id)) "dropped_contaminated"
          else if (fp < "cc") "train" else "eval"
        id -> ((toks.size.toLong, outcome))
      }.toMap
    }
    val stopW = Gen.oneOf("the", "a", "of", "and", "is", "le", "la", "et", "und", "y")
    val contentW = Gen.oneOf("alpha", "beta", "gamma", "delta", "omega", "sigma",
      "kappa", "lambda", "zeta", "theta", "mira", "vela")
    val docText = Gen.chooseNum(1, 30)
      .flatMap(n => Gen.listOfN(n, Gen.frequency(3 -> stopW, 7 -> contentW)))
      .map(_.mkString(" "))
    val corpusGen = Gen.chooseNum(1, 8)
      .flatMap(k => Gen.listOfN(k, docText))
      .flatMap(pool => Gen.chooseNum(1, 16)
        .flatMap(n => Gen.listOfN(n, Gen.oneOf(pool))))
      .map(_.zipWithIndex.map { case (t, i) => (i + 1L, t) })
    val prop = Prop.forAll(corpusGen, Gen.chooseNum(1, 7), Gen.chooseNum(0L, 99L)) {
      (docs, parts, seed) =>
        val shuffled = new scala.util.Random(seed).shuffle(docs)
        val got = graft.operators.Pipeline.curateOn(
            shuffled.toDF("doc_id", "text").repartition(parts))
          .as[(Long, Long, String)].collect()
          .map { case (id, nt, o) => id -> ((nt, o)) }.toMap
        spark.catalog.clearCache()
        got == ledgerOf(docs)
    }
    check("curationLedger", prop, n = 10)
  }

  test("wordset dedup key is permutation-invariant over token order") {
    val prop = Prop.forAll(bagGen.suchThat(_.nonEmpty), Gen.chooseNum(0L, 99L)) {
      (bag, seed) =>
        val rnd = new scala.util.Random(seed)
        // permute the TOKENS of each line: the wordset key must not move
        val permuted = bag.map(l => rnd.shuffle(l.split(" ").toList).mkString(" "))
        def keysOf(xs: Seq[String]) = xs.toDF("text")
          .select(org.apache.spark.sql.functions.array_join(
            org.apache.spark.sql.functions.array_sort(
              org.apache.spark.sql.functions.array_distinct(
                graft.operators.TextOps.tokens(
                  org.apache.spark.sql.functions.col("text")))), " "))
          .as[String].collect().sorted.toSeq
        keysOf(bag) == keysOf(permuted)
    }
    check("wordsetKey", prop, n = 8)
  }

  // deterministic pseudo-random undirected edge sets (a < b, no dupes):
  // the graph-family oracles below re-derive everything by brute force
  private val graphGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(4, 12)
    density <- Gen.chooseNum(25, 70)
    seed <- Gen.chooseNum(0L, 999L)
  } yield {
    val rnd = new scala.util.Random(seed)
    (for { a <- 1L to n; b <- (a + 1) to n if rnd.nextInt(100) < density }
      yield (a, b)).toList
  }

  test("label propagation equals driver-side r-round min folding on random graphs") {
    val prop = Prop.forAll(graphGen.suchThat(_.nonEmpty), Gen.chooseNum(1, 6)) {
      (es, rounds) =>
        val df = es.map { case (a, b) => (a, b, 1L) }.toDF("part_a", "part_b", "w")
        val got = graft.operators.Graph.labelPropagationOn(df, rounds)
          .as[(Long, Long)].collect().toMap
        // first principles: labels as a map, folded r times over
        // min(self, neighbors) — no Spark, no window machinery
        val nbrs = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2) }
        var want = nbrs.keys.map(n => n -> n).toMap
        (1 to rounds).foreach { _ =>
          want = want.map { case (n, l) =>
            n -> (nbrs(n).map(want) :+ l).min
          }
        }
        got == want
    }
    check("labelPropBrute", prop, n = 8)
  }

  test("weighted-Jaccard item similarity equals the brute formula on random graphs") {
    val wGraphGen = graphGen.suchThat(_.nonEmpty).flatMap { es =>
      Gen.listOfN(es.size, Gen.chooseNum(1L, 5L)).map(ws => es.zip(ws))
    }
    val prop = Prop.forAll(wGraphGen) { ews =>
      val df = ews.map { case ((a, b), w) => (a, b, w) }
        .toDF("part_a", "part_b", "w")
      val k = ews.size // full cut: every pair surfaces, order checked
      val got = graft.operators.Graph.itemSimilarityOn(df, k)
        .as[(Long, Long, Long, Long)].collect().toSeq
      val wdeg = ews.flatMap { case ((a, b), w) => Seq(a -> w, b -> w) }
        .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).sum }
      val want = ews.map { case ((a, b), w) =>
        (a, b, w, w * 1000000L / (wdeg(a) + wdeg(b) - w))
      }.sortBy { case (a, b, _, s) => (-s, a, b) }
      got == want
    }
    check("itemSimBrute", prop, n = 8)
  }

  test("phrase search equals brute start-position counting on random corpora") {
    val tok = Gen.oneOf("a", "b", "c", "x")
    val docGen = Gen.chooseNum(0, 9).flatMap(n =>
      Gen.listOfN(n, tok).map(_.mkString(" ")))
    val corpusGen = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, docGen))
    val phraseGen = Gen.chooseNum(2, 3).flatMap(n => Gen.listOfN(n, tok))
    val prop = Prop.forAll(corpusGen, phraseGen) { (docs, phrase) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.operators.TextAnalysis
        .searchPhraseOn(df, phrase, k = docs.size + 1)
        .as[(Long, Long)].collect().toSeq
      val want = docs.zipWithIndex.flatMap { case (t, i) =>
        val ts = t.split(" ").filter(_.nonEmpty).toSeq
        val n = ts.sliding(phrase.size).count(_ == phrase)
        if (n > 0) Some((i.toLong, n.toLong)) else None
      }.sortBy { case (id, n) => (-n, id) }
      got == want
    }
    check("phraseBrute", prop, n = 10)
  }

  test("triangle stats equal brute force on random graphs") {
    import org.apache.spark.sql.functions.col
    val prop = Prop.forAll(graphGen.suchThat(_.nonEmpty)) { es =>
      val df = es.map { case (a, b) => (a, b, 1L) }.toDF("part_a", "part_b", "w")
      val got = graft.operators.Graph.triangleStatsOn(df)
        .as[(Long, Long, Long, Long)].collect().toSet
      val eSet = es.toSet
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
      val deg = nodes.map(n => n -> es.count(e => e._1 == n || e._2 == n).toLong).toMap
      def hasEdge(a: Long, b: Long) = eSet((a min b, a max b))
      val tri = nodes.map { n =>
        n -> (for {
          (a, b) <- es if a != n && b != n
          if hasEdge(n, a) && hasEdge(n, b)
        } yield 1L).size.toLong
      }.toMap
      val want = nodes.filter(deg(_) >= 2).map { n =>
        (n, deg(n), tri(n), 2L * tri(n) * 1000000L / (deg(n) * (deg(n) - 1L)))
      }.toSet
      got == want
    }
    check("triangleBrute", prop, n = 6)
  }

  test("pagerank conserves damped mass and ignores row layout on random graphs") {
    val prop = Prop.forAll(graphGen.suchThat(_.nonEmpty), Gen.chooseNum(1, 6)) {
      (es, parts) =>
        val df = es.map { case (a, b) => (a, b, 1L) }.toDF("part_a", "part_b", "w")
        val ranks = graft.operators.Graph.pageRankOn(df, iters = 3)
          .as[(Long, Long)].collect().toMap
        val n = es.flatMap(e => Seq(e._1, e._2)).distinct.size.toLong
        val total = ranks.values.sum
        // per directed edge per step the truncation loses < 1 ppm unit
        val massOk = total <= n * 1000000L &&
          total >= n * 1000000L - 3L * 2L * es.size
        val floorOk = ranks.values.forall(_ >= 150000L)
        // row layout (order + partitioning) must not leak into values
        val shuffled = new scala.util.Random(es.size.toLong).shuffle(es)
          .map { case (a, b) => (a, b, 1L) }
          .toDF("part_a", "part_b", "w").repartition(parts)
        val again = graft.operators.Graph.pageRankOn(shuffled, iters = 3)
          .as[(Long, Long)].collect().toMap
        massOk && floorOk && again == ranks
    }
    check("pagerankMass", prop, n = 5)
  }

  test("RA link prediction equals brute force on random graphs") {
    val prop = Prop.forAll(graphGen.suchThat(_.nonEmpty), Gen.chooseNum(1, 3)) {
      (es, k) =>
        val df = es.map { case (a, b) => (a, b, 1L) }.toDF("part_a", "part_b", "w")
        val got = graft.operators.Graph.linkPredictOn(df, seedMod = 2, k = k)
          .as[(Long, Long, Long, Long)].collect().toSet
        val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .groupBy(_._1).map { case (n, vs) => n -> vs.map(_._2).toSet }
        val want = (for {
          u <- adj.keySet if u % 2 == 0
          scored = (for {
            v <- adj.keySet if v != u && !adj(u)(v)
            ra = adj(u).intersect(adj(v)).toSeq
              .map(z => 1000000L / adj(z).size).sum
            if ra > 0L
          } yield (v, ra)).toSeq.sortBy { case (v, ra) => (-ra, v) }
          ((v, ra), i) <- scored.zipWithIndex if i < k
        } yield (u, v, ra, (i + 1).toLong)).toSet
        got == want
    }
    check("linkpredBrute", prop, n = 5)
  }

  test("customer CF recs equal brute force on random ownership") {
    val prop = Prop.forAll(graphGen.suchThat(_.nonEmpty), Gen.chooseNum(0L, 99L)) {
      (es, seed) =>
        val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        val rnd = new scala.util.Random(seed)
        val owned = (for { c <- 2L to 8L; p <- nodes if rnd.nextInt(100) < 40 }
          yield (c, p)).toList
        if (owned.isEmpty) true else {
          val df = es.map { case (a, b) => (a, b, 1L) }.toDF("part_a", "part_b", "w")
          val got = graft.operators.Graph.customerRecsOn(
            df, owned.toDF("cust", "part"), seedMod = 2, k = 2)
            .as[(Long, Long, Long, Long)].collect().toSet
          val w = es.map { case (a, b) => ((a, b), 1L) }.toMap
          def wOf(a: Long, b: Long) = w.getOrElse((a min b, a max b), 0L)
          val byCust = owned.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).toSet }
          val want = (for {
            (c, ps) <- byCust if c % 2 == 0
            scored = (for {
              v <- nodes.toSet -- ps
              s = ps.toSeq.map(p => wOf(p, v)).sum if s > 0L
            } yield (v, s)).toSeq.sortBy { case (v, s) => (-s, v) }
            ((v, s), i) <- scored.zipWithIndex if i < 2
          } yield (c, v, s, (i + 1).toLong)).toSet
          got == want
        }
    }
    check("custrecsBrute", prop, n = 5)
  }

  test("reachability equals brute-force BFS closure on random graphs") {
    val prop = Prop.forAll(graphGen.suchThat(_.nonEmpty)) { es =>
      val df = es.map { case (a, b) => (a, b, 1L) }.toDF("part_a", "part_b", "w")
      val got = graft.operators.Graph.reachabilityOn(df, seedMod = 2, maxHops = 3)
        .as[(Long, Long, Long)].collect().toSet
      val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
      val seeds = adj.keySet.filter(_ % 2 == 0)
      val want = (for {
        s <- seeds
        closures = Iterator.iterate(Set(s))(r => r ++ r.flatMap(adj(_))).drop(1).take(3).toSeq
        (r, h) <- closures.zipWithIndex
      } yield (s, (h + 1).toLong, (r - s).size.toLong)).toSet
      got == want
    }
    check("reachBfs", prop, n = 5)
  }
}
