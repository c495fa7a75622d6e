package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** [[graft.functions.MisraGriesAgg]] + [[TextAnalysis.heavyHittersOn]]:
  * the sketch guarantee (candidates ⊇ true frequent items) under
  * decrement and merge pressure, and the operator's exact-output
  * contract against the unbounded groupBy spelling.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Exact frequent items of a token stream: n·(k+1) > N. */
  private def exact(toks: Seq[String], k: Int): Map[String, Long] = {
    val n = toks.size.toLong
    toks.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * (k + 1) > n }.toMap
  }

  private def run(texts: Seq[String], k: Int, parts: Int): Map[String, Long] =
    TextAnalysis.heavyHittersOn(
      texts.toDF("text").repartition(parts), k)
      .as[(String, Long)].collect().toMap

  test("fixture corpus: sketch+recount == unbounded groupBy, k=100") {
    val docs = Tables.documents(spark, TestSpark.sf0001).select($"text")
    val got = TextAnalysis.heavyHittersOn(docs, 100)
      .as[(String, Long)].collect().toMap
    val toks = docs.select(explode(split($"text", " ")).as("tok"))
    val n = toks.count()
    val want = toks.groupBy($"tok").agg(count(lit(1)).as("n"))
      .filter($"n" * 101 > n).as[(String, Long)].collect().toMap
    assert(got === want)
    assert(got.nonEmpty, "threshold chosen non-vacuously")
    assert(!got.contains("dup"), "the rare token must fall below threshold")
  }

  test("planted skew, tiny k: decrement and merge paths still exact") {
    // 3 heavy keys + a long uniform tail; k=4 counters cannot hold the
    // tail, so per-partition decrement-all and the cross-partition MG
    // merge (subtract (k+1)-th largest) both fire
    val heavy = Seq.fill(400)("alpha") ++ Seq.fill(350)("beta") ++ Seq.fill(300)("gamma")
    val tail = (0 until 500).map(i => s"t${i % 83}")
    val stream = new scala.util.Random(7).shuffle(heavy ++ tail)
    for (parts <- Seq(1, 3, 13)) {
      val got = run(stream.map(t => t), 4, parts)
      assert(got === exact(stream, 4), s"parts=$parts")
    }
  }

  test("randomized streams: output == exact for every k and partitioning") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      // Zipf-ish: key i drawn with weight 1/(i+1)
      val keys = (0 until 40).map(i => s"k$i")
      val weights = keys.indices.map(i => 1.0 / (i + 1))
      val cum = weights.scanLeft(0.0)(_ + _).tail
      val total = cum.last
      val stream = (0 until 2000).map { _ =>
        val x = rnd.nextDouble() * total
        keys(cum.indexWhere(x <= _))
      }
      for (k <- Seq(2, 5, 9)) {
        val got = run(stream, k, 7)
        assert(got === exact(stream, k), s"trial=$trial k=$k")
      }
    }
  }

  test("multi-token docs, empty docs, and the empty corpus") {
    val got = run(Seq("a a a b", "", "a b c", "c"), 2, 3)
    // stream: a×4 b×2 c×2 plus two "" tokens from the empty doc and
    // the split of "" → [""]; exact() must see the same tokenization
    val toks = Seq("a a a b", "", "a b c", "c").flatMap(_.split(" ", -1) match {
      case arr if arr.isEmpty => Seq("")
      case arr => arr.toSeq
    })
    assert(got === exact(toks, 2))
    assert(run(Seq.empty[String], 3, 2) === Map.empty[String, Long])
  }

  test("grouped heavy hitters: per-group thresholds, no cross-group leak") {
    // source A: 'hot' is heavy (12/20 > 1/3); source B: 'hot' absent,
    // 'cold' heavy there only. k=2 -> threshold N_g/3 per group.
    val docs = Seq(
      ("A", ("hot " * 12 + "a b c d e f g h").trim),
      ("B", ("cold " * 10 + "p q r s t u v w x y z p q r s").trim)
    ).toDF("source", "text")
    val got = operators.TextAnalysis.heavyHittersBySourceOn(docs, 2)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // A: 20 toks, hot=12 > 20/3; B: 25 toks, cold=10 > 25/3; 'p'..'s'
    // appear twice each (< 25/3): only the two planted heavies survive
    assert(got === Map(("A", "hot") -> 12L, ("B", "cold") -> 10L))
    // a group whose stream is uniform below threshold contributes nothing
    val quiet = operators.TextAnalysis.heavyHittersBySourceOn(
      docs.unionByName(Seq(("C", "m n o m n o")).toDF("source", "text")), 2)
      .filter($"source" === "C").count()
    assert(quiet === 0L, "6 tokens, max freq 2 = 6/3 NOT strictly above")
  }

  test("search: conjunctive gate, integer scoring, tiebreak, k cut") {
    // corpus of 4 docs; terms (a, b): doc 1 has both (a×2, b×1),
    // doc 2 has both once, doc 3 has only a, doc 4 has neither.
    // df(a)=3, df(b)=2, n_docs=4 -> idf_a = 4000 DIV 3 = 1333,
    // idf_b = 2000. score(1) = 2*1333 + 2000 = 4666; score(2) = 3333.
    val docs = Seq((1L, "a a b x"), (2L, "a b"), (3L, "a x"),
      (4L, "x y")).toDF("doc_id", "text")
    val got = TextAnalysis.searchRankedOn(docs, Seq("a", "b"), 10)
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 4666L), (2L, 3333L)),
      "only conjunctive docs, ordered by score")
    // k cut respects the (score desc, doc_id asc) total order
    val top1 = TextAnalysis.searchRankedOn(docs, Seq("a", "b"), 1)
      .as[(Long, Long)].collect().toSeq
    assert(top1 === Seq((1L, 4666L)))
    // duplicate query terms don't break the arity gate
    val dup = TextAnalysis.searchRankedOn(docs, Seq("a", "a", "b"), 10)
      .as[(Long, Long)].collect().toSeq
    assert(dup === got)
    // single-term query degenerates to tf ranking with doc_id tiebreak
    val one = TextAnalysis.searchRankedOn(docs, Seq("a"), 10)
      .as[(Long, Long)].collect().map(_._1).toSeq
    assert(one === Seq(1L, 2L, 3L), "tf 2 first, then doc_id order on ties")
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.searchRankedOn(docs, Seq.empty, 5)
    }.getMessage.contains("at least one term"))
  }

  test("phrase: adjacency semantics, overlap counting, short-doc guard, k cut") {
    val docs = Seq(
      (1L, "a b a b a"),   // "a b" at starts 1 and 3
      (2L, "b a"),         // reversed order never matches
      (3L, "a"),           // shorter than the phrase — the guard path
      (4L, "x a b"),       // one occurrence mid-doc
      (5L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.searchPhraseOn(docs, Seq("a", "b"), 10)
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L), (4L, 1L)),
      "adjacent matches only, ranked by count then doc_id")
    // overlapping occurrences count once per START position
    val overlap = TextAnalysis.searchPhraseOn(
      Seq((1L, "a a a")).toDF("doc_id", "text"), Seq("a", "a"), 10)
      .as[(Long, Long)].collect().toSeq
    assert(overlap === Seq((1L, 2L)), "\"a a a\" holds two \"a a\" starts")
    // a 3-token phrase needs all three positions in order
    val tri = TextAnalysis.searchPhraseOn(docs, Seq("a", "b", "a"), 10)
      .as[(Long, Long)].collect().toSeq
    assert(tri === Seq((1L, 2L)), "doc 1 holds \"a b a\" at starts 1 and 3")
    // k cut on the (n_occ desc, doc_id asc) total order
    assert(TextAnalysis.searchPhraseOn(docs, Seq("a", "b"), 1)
      .as[(Long, Long)].collect().toSeq === got.take(1))
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.searchPhraseOn(docs, Seq("a"), 5)
    }.getMessage.contains(">= 2 tokens"))
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.searchPhraseOn(docs, Seq("a", "b"), 0)
    }.getMessage.contains("k >= 1"))
  }

  test("bm25: length normalization, tf saturation, exact integer contract") {
    // doc 1 and doc 2 carry IDENTICAL term counts (a×1, b×1); doc 2 is
    // padded 4x longer. doc 3 stacks a×7 at the same length as doc 2.
    // doc 4 fails the conjunctive gate.
    val docs = Seq(
      (1L, "a b"),
      (2L, "a b x y z x y z"),
      (3L, "a a a a a a a b"),
      (4L, "a x")).toDF("doc_id", "text")
    val got = TextAnalysis.searchBm25On(docs, Seq("a", "b"), 10)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet === Set(1L, 2L, 3L), "conjunctive gate")
    // law 1 — length normalization: same tf, longer doc scores lower
    assert(got(1L) > got(2L),
      s"short doc ${got(1L)} must beat the padded twin ${got(2L)}")
    // law 2 — saturation: 7 extra 'a's buy less than 2x doc 2's score
    assert(got(3L) > got(2L) && got(3L) < 2L * got(2L),
      s"tf gain must be sublinear: ${got(3L)} vs ${got(2L)}")
    // exact integer contract — replicate the fixed-point formula
    val dls = Map(1L -> 2L, 2L -> 8L, 3L -> 8L, 4L -> 2L)
    val nDocs = 4L
    val avgdlMilli = dls.values.sum * 1000L / nDocs
    val dfOf = Map("a" -> 4L, "b" -> 3L)
    def score(tfs: Map[String, Long], dl: Long): Long =
      tfs.map { case (t, tf) =>
        val norm = 250L + 750L * (dl * 1000000L / avgdlMilli) / 1000L
        val sat = tf * 2200L * 1000L / (tf * 1000L + 1200L * norm / 1000L)
        (nDocs * 1000L / dfOf(t)) * sat
      }.sum
    assert(got === Map(
      1L -> score(Map("a" -> 1L, "b" -> 1L), 2L),
      2L -> score(Map("a" -> 1L, "b" -> 1L), 8L),
      3L -> score(Map("a" -> 7L, "b" -> 1L), 8L)))
    // k cut + empty refusal share searchRanked's contract
    assert(TextAnalysis.searchBm25On(docs, Seq("a", "b"), 1)
      .as[(Long, Long)].collect().map(_._1).toSeq === Seq(got.maxBy(r => (r._2, -r._1))._1))
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.searchBm25On(docs, Seq.empty, 5)
    }.getMessage.contains("at least one term"))
    // the disjunctive spelling admits doc 4 (term a only) and scores
    // conjunctive docs IDENTICALLY — the gate is the only difference
    val any = TextAnalysis.bm25Rank(
      docs.select($"doc_id", explode(split($"text", " ")).as("term"))
        .filter($"term".isin("a", "b"))
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf")),
      docs.select($"doc_id", size(split($"text", " ")).cast("long").as("dl")),
      Seq("a", "b"), 10, matchAll = false)
      .as[(Long, Long)].collect().toMap
    assert(any.keySet === Set(1L, 2L, 3L, 4L))
    got.foreach { case (id, s) => assert(any(id) === s,
      s"doc $id: disjunctive score ${any(id)} must equal conjunctive $s") }
  }

  test("misra_gries is SQL-registered via GraftExtensions") {
    val cands = spark.sql(
      """SELECT misra_gries(tok, 3) AS c FROM (
        |  SELECT explode(array('x','x','x','y','z','w','x')) AS tok)""".stripMargin)
      .as[Seq[String]].head()
    assert(cands.contains("x"), "the heavy key must survive any MG run")
    assert(cands.size <= 3, "state bounded by k")
    val err = intercept[Exception] {
      spark.sql("SELECT misra_gries(tok, 0) FROM (SELECT 'a' AS tok)").collect()
    }
    assert(err.getMessage.contains("k >= 1"))
  }
}
