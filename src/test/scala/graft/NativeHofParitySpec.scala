package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The r21 native HOF replacements against the composed-builtins
  * spellings they replaced (each kept VERBATIM here as the reference) —
  * outputs must be identical value-for-value and order-for-order, the
  * [[PqEncodeSpec]] contract: these expressions exist only because
  * Spark's higher-order functions are CodegenFallback, never to change
  * a result.
  */
class NativeHofParitySpec extends SparkSpec {
  import graft.functions.AdjacentStructs.adjacentStructs
  import graft.functions.PositionalBigrams.positionalBigrams
  import graft.functions.BpeMergeApply.bpeMerge
  import graft.functions.MaskArgmax.maskArgmax
  import graft.functions.CreditStructs.creditStructs

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  // ---- AdjacentStructs (Lm.bigramVocabOn / Bpe.pairCountsOn) ----

  /** Pre-r21 composed spelling, verbatim. */
  private def composedAdjacent(ws: Column, a: String, b: String): Column =
    transform(sequence(lit(1), size(ws) - 1),
      i => struct(element_at(ws, i).as(a), element_at(ws, i + 1).as(b)))

  test("adjacent_structs == composed transform(sequence) on fixture tokens") {
    val toks = Tables.documents(spark, TestSpark.sf0001)
      .select(operators.TextOps.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
    val native = rows(toks.select(explode(
      adjacentStructs(col("ws"), "prev", "tok")).as("p"))
      .select(col("p.prev"), col("p.tok")))
    val composed = rows(toks.select(explode(
      composedAdjacent(col("ws"), "prev", "tok")).as("p"))
      .select(col("p.prev"), col("p.tok")))
    assert(native.nonEmpty && native === composed)
  }

  test("adjacent_structs edges: null array, null elements, short arrays") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq("x", null, "y")),
      (3L, Seq("solo")),
      (4L, Seq.empty[String]),
      (5L, null.asInstanceOf[Seq[String]])
    ).toDF("id", "ws")
    // size >= 2 rows: values match the composed spelling exactly
    val two = df.filter(size(col("ws")) >= 2)
    assert(rows(two.select(col("id"), adjacentStructs(col("ws"), "l", "r")))
      === rows(two.select(col("id"), composedAdjacent(col("ws"), "l", "r"))))
    // below-2 and null rows: native is total — [] and null respectively
    // (the composed sequence(1, n-1) spelling is only defined past the
    // callers' size >= 2 filter)
    val out = df.select(col("id"), adjacentStructs(col("ws"), "l", "r").as("p"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Any](1).size)).toMap
    assert(out(3L) === 0 && out(4L) === 0 && out(5L) === null)
  }

  // ---- PositionalBigrams (Lm.bigramScoreOn) ----

  /** Pre-r21 composed spelling, verbatim. */
  private def composedPositional(ws: Column): Column =
    transform(sequence(lit(1), size(ws)),
      i => struct(element_at(ws, i).as("tok"),
        when(i > 1, element_at(ws, i - 1)).as("prev")))

  test("positional_bigrams == composed transform(sequence) on fixture tokens") {
    val toks = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), operators.TextOps.tokens(col("text")).as("ws"))
    val native = rows(toks.select(col("doc_id"),
      explode(positionalBigrams(col("ws"))).as("p"))
      .select(col("doc_id"), col("p.tok"), col("p.prev")))
    val composed = rows(toks.select(col("doc_id"),
      explode(composedPositional(col("ws"))).as("p"))
      .select(col("doc_id"), col("p.tok"), col("p.prev")))
    assert(native.nonEmpty && native === composed)
  }

  test("positional_bigrams edges: single token, null elements, null array") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("only")),
      (2L, Seq("a", null, "b")),
      (3L, null.asInstanceOf[Seq[String]])
    ).toDF("id", "ws")
    val nn = df.filter(col("ws").isNotNull)
    assert(rows(nn.select(col("id"), positionalBigrams(col("ws"))))
      === rows(nn.select(col("id"), composedPositional(col("ws")))))
    assert(df.filter(col("id") === 3L)
      .select(positionalBigrams(col("ws"))).collect().head.isNullAt(0))
  }

  // ---- BpeMergeApply (Bpe.applyMerge) ----

  /** Pre-r21 composed fold, verbatim. */
  private def composedMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => {
        val lastSym = when(size(acc) > 0, element_at(acc, -1)).otherwise(lit(""))
        when(lastSym === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x)))
      })

  test("bpe_merge == composed aggregate fold on fixture symbols") {
    val seg = operators.Bpe.wordFreqOn(
      Tables.documents(spark, TestSpark.sf0001).select(col("text")))
      .select(split(col("word"), "").as("syms"))
    // a pair that actually occurs (from the fixture's first merge) plus
    // one that never does
    for ((l, r) <- Seq(("e", "r"), ("q", "q"))) {
      assert(rows(seg.select(bpeMerge(col("syms"), l, r)))
        === rows(seg.select(composedMerge(col("syms"), l, r))))
    }
  }

  test("bpe_merge edges: re-merge runs, null elements, null array") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "a", "a")),          // [aa, a] — merged symbol never re-merges
      (2L, Seq("a", "a", "a", "a")),     // [aa, aa]
      (3L, Seq("b", "a", "a", "b")),     // [b, aa, b]
      (4L, Seq("a", null, "a", "a")),    // null never matches, breaks adjacency
      (5L, Seq.empty[String]),
      (6L, null.asInstanceOf[Seq[String]])
    ).toDF("id", "syms")
    assert(rows(df.select(col("id"), bpeMerge(col("syms"), "a", "a")))
      === rows(df.select(col("id"), composedMerge(col("syms"), "a", "a"))))
    val native = df.select(col("id"), bpeMerge(col("syms"), "a", "a").as("m"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1).toList)).toMap
    assert(native(1L) === List("aa", "a"))
    assert(native(2L) === List("aa", "aa"))
    assert(native(3L) === List("b", "aa", "b"))
    assert(native(4L) === List("a", null, "aa"))
    assert(native(5L) === Nil && native(6L) === null)
  }

  // ---- MaskArgmax (Similarity.assignCells exclusion stages) ----

  /** Pre-r21 composed spelling, verbatim (nlist = the array length the
    * call site guarantees).
    */
  private def composedMask(sims: Column, nlist: Int): Column =
    zip_with(sims, sequence(lit(1), lit(nlist)),
      (x, i) => when(i === array_position(sims, array_max(sims)),
        lit(-2.0)).otherwise(x))

  test("mask_argmax == composed zip_with on synthetic sims incl. ties/NaN") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.1, 0.9, 0.3, 0.9)),      // tie: first max masked
      (2L, Seq(-1.0, -2.0, -0.5, -0.9)),
      (3L, Seq(0.0, 0.0, 0.0, 0.0)),
      (4L, Seq(Double.NaN, 1.0, 0.5, 0.2)), // NaN ranks above everything
      (5L, Seq(0.2, Double.NaN, Double.NaN, 1.0)) // first NaN masked
    ).toDF("id", "sims")
    assert(rows(df.select(col("id"), maskArgmax(col("sims"))))
      === rows(df.select(col("id"), composedMask(col("sims"), 4))))
  }

  test("mask_argmax stacks like the assignCells loop (4 stages, fixture sims)") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val centroids = operators.Similarity.fitQuantizer(emb, "maskargmaxspec", 8)
    val sims0 = emb.select(col("vec_id"),
      array(centroids.map(c => graft.functions.CosineSimilarity.cosineSim(
        col("embedding"), typedlit(c))): _*).as("s0"))
    val native = sims0.withColumn("s1", maskArgmax(col("s0")))
      .withColumn("s2", maskArgmax(col("s1")))
    val composed = sims0.withColumn("s1", composedMask(col("s0"), 8))
      .withColumn("s2", composedMask(col("s1"), 8))
    assert(rows(native.select(col("vec_id"), col("s2")))
      === rows(composed.select(col("vec_id"), col("s2"))))
  }

  // ---- Sq8MaxAbs / Sq8Codes (Similarity.quantizeSq8On) ----

  /** Pre-r21 composed spelling, verbatim. */
  private def composedSq8(emb: DataFrame): DataFrame =
    emb
      .withColumn("maxabs",
        aggregate(col("embedding"), lit(0.0),
          (acc, x) => greatest(acc, abs(x.cast("double")))))
      .withColumn("codes",
        when(col("maxabs") === 0.0,
          transform(col("embedding"), _ => lit(0).cast("tinyint")))
          .otherwise(transform(col("embedding"),
            x => round(x.cast("double") / col("maxabs") * 127.0)
              .cast("int").cast("tinyint"))))
      .select(col("vec_id"), col("maxabs"), col("codes"))

  private def nativeSq8(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      graft.functions.Sq8.sq8MaxAbs(col("embedding")).as("maxabs"),
      graft.functions.Sq8.sq8Codes(col("embedding")).as("codes"))

  test("sq8 maxabs + codes == composed aggregate/transform on the fixture") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val native = rows(nativeSq8(emb))
    val composed = rows(composedSq8(emb))
    assert(native.nonEmpty && native === composed)
  }

  test("sq8 edges: zero vector, NaN component, null component, null vector") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.0f, 0.0f, 0.0f)),                  // all-zero → zero codes
      (2L, Seq(1.0f, -2.0f, 0.5f)),
      (4L, Seq(0.5f, 63.5f, -63.5f)),               // exact .5 HALF_UP boundary
      (5L, null.asInstanceOf[Seq[Float]])
    ).toDF("vec_id", "embedding")
    assert(rows(nativeSq8(df)) === rows(composedSq8(df)))
    // a NaN component THROWS in both spellings: NaN maxabs sticks, the
    // scaled value is NaN, and the composed `cast("int")` is an ANSI
    // overflow error — the native ansiToInt guard mirrors it
    val nan = Seq((3L, Seq(Float.NaN, 1.0f, -1.0f))).toDF("vec_id", "embedding")
    intercept[Exception](rows(composedSq8(nan)))
    intercept[Exception](rows(nativeSq8(nan)))
    // null COMPONENT (Seq.toDF can't spell it): codes keep the null,
    // maxabs skips it — the composed greatest/transform behavior
    val withNull = spark.sql(
      "select 6L as vec_id, array(cast(1.0 as float), cast(null as float), cast(-3.0 as float)) as embedding")
    assert(rows(nativeSq8(withNull)) === rows(composedSq8(withNull)))
  }

  // ---- CellSims (assignCells / assignWithSim / IVF probe ranking) ----

  /** Pre-r21 composed spelling, verbatim. */
  private def composedCellSims(e: Column, cs: Seq[Seq[Double]]): Column =
    array(cs.map(c => graft.functions.CosineSimilarity.cosineSim(
      e, typedlit(c))): _*)

  test("cell_sims == composed per-centroid cosine array on the fixture") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val centroids = operators.Similarity.fitQuantizer(emb, "cellsimsspec", 16)
    val native = rows(emb.select(col("vec_id"),
      graft.functions.CellSims.cellSims(col("embedding"), centroids)))
    val composed = rows(emb.select(col("vec_id"),
      composedCellSims(col("embedding"), centroids)))
    assert(native.nonEmpty && native === composed)
  }

  test("cell_sims edges: zero vector, null component, null vector") {
    val cs = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, -1.0, 0.5), Seq(0.0, 0.0, 0.0))
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.0f, 0.0f, 0.0f)),   // zero norm → 0.0 everywhere
      (2L, Seq(2.0f, 1.0f, -0.5f)),
      (3L, null.asInstanceOf[Seq[Float]]) // → array of nulls, NOT null
    ).toDF("vec_id", "embedding")
    assert(rows(df.select(col("vec_id"),
      graft.functions.CellSims.cellSims(col("embedding"), cs)))
      === rows(df.select(col("vec_id"),
        composedCellSims(col("embedding"), cs))))
    val withNull = spark.sql("select array(cast(1.0 as float), " +
      "cast(null as float), cast(2.0 as float)) as embedding")
    assert(rows(withNull.select(
      graft.functions.CellSims.cellSims(col("embedding"), cs)))
      === rows(withNull.select(composedCellSims(col("embedding"), cs))))
  }

  // ---- PcaProject (Pca.projectOn) ----

  /** Pre-r21 composed spelling, verbatim. */
  private def composedPcaProject(df: DataFrame, mean: Seq[Double],
                                 comps: Seq[Seq[Double]]): DataFrame = {
    val meanLit = typedlit(mean)
    val compsLit = typedlit(comps)
    df.withColumn("__graft_centered",
        zip_with(col("embedding"), meanLit, (x, m) => x.cast("double") - m))
      .withColumn("pc",
        transform(compsLit, c =>
          aggregate(zip_with(c, col("__graft_centered"), (a, b) => a * b),
            lit(0.0), (acc, x) => acc + x)))
      .drop("__graft_centered")
  }

  test("pca_project == composed zip_with/transform/aggregate on the fixture") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding"))
    val model = operators.Pca.fitPcaOn(emb, dim = 64, k = 4)
    val mean = model.mean.toSeq
    val comps = model.components.map(_.toSeq).toSeq
    val native = rows(emb.withColumn("pc",
      graft.functions.PcaProject.pcaProject(col("embedding"), mean, comps)))
    val composed = rows(composedPcaProject(emb, mean, comps))
    assert(native.nonEmpty && native === composed)
  }

  test("pca_project edges: null vector / null component / length mismatch → k nulls") {
    val mean = Seq(0.5, -0.5, 1.0)
    val comps = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, -1.0))
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f)),
      (2L, null.asInstanceOf[Seq[Float]]),
      (3L, Seq(1.0f, 2.0f)) // zip_with null-pads → k nulls
    ).toDF("vec_id", "embedding")
    assert(rows(df.withColumn("pc", graft.functions.PcaProject
        .pcaProject(col("embedding"), mean, comps))
        .select(col("vec_id"), col("pc")))
      === rows(composedPcaProject(df, mean, comps)
        .select(col("vec_id"), col("pc"))))
    val withNull = spark.sql("select array(cast(1.0 as float), " +
      "cast(null as float), cast(2.0 as float)) as embedding")
    assert(rows(withNull.withColumn("pc", graft.functions.PcaProject
        .pcaProject(col("embedding"), mean, comps)).select(col("pc")))
      === rows(composedPcaProject(withNull, mean, comps).select(col("pc"))))
  }

  // ---- TokenWeightSum (Pipeline clf gate) ----

  /** Pre-r21 composed spelling, verbatim. */
  private def composedWeightSum(ws: Column, w: Map[String, Long]): Column = {
    val wlit = typedlit(w)
    aggregate(ws, lit(0L),
      (acc, t) => acc + coalesce(element_at(wlit, t), lit(0L)))
  }

  test("token_weight_sum == composed aggregate/element_at on fixture tokens") {
    val w = Map("the" -> 3L, "a" -> -2L, "of" -> 7L, "zq" -> 100L)
    val toks = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), operators.TextOps.tokens(col("text")).as("ws"))
    assert(rows(toks.select(col("doc_id"),
        graft.functions.TokenWeightSum.tokenWeightSum(col("ws"), w)))
      === rows(toks.select(col("doc_id"), composedWeightSum(col("ws"), w))))
  }

  test("token_weight_sum edges: OOV-only, empty, null element, null array") {
    val w = Map("hit" -> 5L)
    import spark.implicits._
    val df = Seq(
      (1L, Seq("miss", "hit", "hit")),
      (2L, Seq("miss")),
      (3L, Seq.empty[String]),
      (4L, Seq("hit", null, "hit")),
      (5L, null.asInstanceOf[Seq[String]])
    ).toDF("id", "ws")
    assert(rows(df.select(col("id"),
        graft.functions.TokenWeightSum.tokenWeightSum(col("ws"), w)))
      === rows(df.select(col("id"), composedWeightSum(col("ws"), w))))
  }

  // ---- CutTokens (Dedup.applyVerbatimCuts) ----

  /** Pre-r21 composed spelling, verbatim. */
  private def composedCut(toks: Column, cuts: Column): Column =
    filter(toks, (_, i) =>
      !exists(cuts, c => i >= c("s") && i < c("e")))

  test("cut_tokens == composed filter/exists on synthetic cuts") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b", "c", "d", "e"), Seq((1L, 3L))),
      (2L, Seq("a", "b", "c", "d", "e"), Seq((0L, 2L), (3L, 5L))),
      (3L, Seq("a", "b"), Seq.empty[(Long, Long)]),
      (4L, Seq("a", "b", "c"), Seq((0L, 3L)))
    ).toDF("id", "toks", "rawcuts")
      .withColumn("cuts", expr(
        "transform(rawcuts, c -> named_struct('s', c._1, 'e', c._2))"))
    assert(rows(df.select(col("id"),
        graft.functions.CutTokens.cutTokens(col("toks"), col("cuts"))))
      === rows(df.select(col("id"), composedCut(col("toks"), col("cuts")))))
  }

  // ---- PhraseCount (TextAnalysis.searchPhraseOn) ----

  /** Pre-r21 composed spelling, verbatim (including the size guard). */
  private def composedPhraseCount(toks: Column, phrase: Seq[String]): Column = {
    val hit = (i: Column) => phrase.zipWithIndex.map { case (p, j) =>
      element_at(toks, i + lit(j)) === lit(p)
    }.reduce(_ && _)
    when(size(toks) >= phrase.size,
      aggregate(sequence(lit(1), size(toks) - lit(phrase.size - 1)), lit(0L),
        (acc, i) => acc + when(hit(i), lit(1L)).otherwise(lit(0L))))
      .otherwise(lit(0L))
  }

  test("phrase_count == composed fold on fixture tokens") {
    val toks = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), operators.TextOps.tokens(col("text")).as("ws"))
    for (phrase <- Seq(Seq("the", "of"), Seq("a", "a"), Seq("x", "y", "z"))) {
      assert(rows(toks.select(col("doc_id"), coalesce(
          graft.functions.PhraseCount.phraseCount(col("ws"), phrase), lit(0L))))
        === rows(toks.select(col("doc_id"),
          composedPhraseCount(col("ws"), phrase))))
    }
  }

  test("phrase_count edges: overlaps, short docs, null tokens") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "a", "a")),       // overlapping "a a" counts twice
      (2L, Seq("a")),                 // below window → 0
      (3L, Seq("a", null, "a")),      // null never matches
      (4L, Seq.empty[String])
    ).toDF("id", "ws")
    val phrase = Seq("a", "a")
    assert(rows(df.select(col("id"), coalesce(
        graft.functions.PhraseCount.phraseCount(col("ws"), phrase), lit(0L))))
      === rows(df.select(col("id"), composedPhraseCount(col("ws"), phrase))))
    val out = df.select(col("id"), graft.functions.PhraseCount
      .phraseCount(col("ws"), phrase).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 2L && out(2L) === 0L && out(3L) === 0L)
  }

  // ---- LogRegMargin (Classifier margin fold) ----

  /** Pre-r21 composed spelling, verbatim. */
  private def composedMargin(w: Seq[Double]): Column =
    aggregate(col("feats"), lit(0.0),
      (acc, e) => acc + element_at(typedlit(w), e.getField("i") + 1) * e.getField("v"))

  test("logreg_margin == composed aggregate/element_at fold") {
    import spark.implicits._
    val w = Seq(0.5, -1.25, 2.0, 0.0, 3.5)
    val df = Seq(
      (1L, Seq((0, 0.5), (2, -1.0), (4, 0.25))),
      (2L, Seq((1, 1.0))),
      (3L, Seq.empty[(Int, Double)])
    ).toDF("id", "rawfeats")
      .withColumn("feats", expr(
        "transform(rawfeats, e -> named_struct('i', e._1, 'v', e._2))"))
    assert(rows(df.select(col("id"),
        graft.functions.LogRegMargin.logRegMargin(col("feats"), w)))
      === rows(df.select(col("id"), composedMargin(w))))
  }

  // ---- CreditStructs (Graph.triangleStatsOn credits) ----

  /** Pre-r21 composed spelling, verbatim. */
  private def composedCredits(u: Column, v: Column, ws: Column): Column =
    concat(
      array(struct(u.as("n"), size(ws).cast("long").as("c")),
        struct(v.as("n"), size(ws).cast("long").as("c"))),
      transform(ws, w => struct(w.as("n"), lit(1L).as("c"))))

  test("credit_structs == composed concat/transform on synthetic edges") {
    import spark.implicits._
    val df = Seq(
      (10L, 20L, Seq(30L)),
      (10L, 30L, Seq(40L, 50L, 60L)),
      (7L, 8L, Seq(9L, 11L, 12L, 13L, 14L))
    ).toDF("u", "v", "ws")
    val native = rows(df.select(explode(
      creditStructs(col("u"), col("v"), col("ws"))).as("x"))
      .select(col("x.n"), col("x.c")))
    val composed = rows(df.select(explode(
      composedCredits(col("u"), col("v"), col("ws"))).as("x"))
      .select(col("x.n"), col("x.c")))
    assert(native.nonEmpty && native === composed)
  }
}
