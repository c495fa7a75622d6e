package graft

import graft.operators.Classifier
import org.apache.spark.sql.functions._

/** NB token log-odds classifier (q_nb_classifier / _planted /
  * q_nb_confusion): full output values are hash-checked against DuckDB
  * by the driver; this suite asserts the invariants the oracle can't
  * see — hand-computed staircase weights on a tiny labeled set,
  * guaranteed separation on a disjoint-vocabulary plant, the OOV
  * neutral path, the vocab cap, and the driver plant's actual
  * separation quality.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val sf = TestSpark.sf0001

  test("staircase weights on a hand-built labeled set") {
    // pos stream = "a a a b"  (np=4), neg stream = "a c c c"  (nn=4)
    // w(tok) = [bitlen(4) - bitlen(cn+1)] - [bitlen(4) - bitlen(cp+1)]
    //   a: cp=3, cn=1 -> (3-2) - (3-3) = 1
    //   b: cp=1, cn=0 -> (3-1) - (3-2) = 1
    //   c: cp=0, cn=3 -> (3-3) - (3-1) = -2
    val w = Classifier.nbWeightsOn(
        Seq("a a a b").toDF("text"), Seq("a c c c").toDF("text"))
      .as[(String, Long)].collect().sortBy(_._1)
    assert(w.toSeq === Seq(("a", 1L), ("b", 1L), ("c", -2L)))

    // scoring sums the token STREAM (per occurrence), OOV neutral:
    // "a a c z" -> 1 + 1 - 2 + 0 = 0 over 4 tokens -> label_pos (0 >= 0)
    val s = Classifier.nbScoreOn(
        Seq((7L, "a a c z")).toDF("doc_id", "text"),
        Seq(("a", 1L), ("b", 1L), ("c", -2L)).toDF("tok", "w"))
      .as[(Long, Long, Long, Long)].collect()
    assert(s.toSeq === Seq((7L, 4L, 0L, 1L)))
  }

  test("a document of only out-of-vocabulary tokens scores neutral zero") {
    val got = Classifier.nbScoreOn(
        Seq((1L, "x y z")).toDF("doc_id", "text"),
        Seq(("a", 5L)).toDF("tok", "w"))
      .as[(Long, Long, Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 3L, 0L, 1L)))
  }

  test("the vocab cap is respected with a deterministic tie-break") {
    // combined counts: a=3, b=2, c=2, d=1 — cap 2 keeps a and then the
    // tie (b,c) breaks by token asc: b
    val w = Classifier.nbWeightsOn(
      Seq("a a b c").toDF("text"), Seq("a b c d").toDF("text"), vocabSize = 2)
    assert(w.select("tok").as[String].collect().sorted.toSeq === Seq("a", "b"))
  }

  test("disjoint vocabularies separate perfectly at any length") {
    // every pos token is unseen in neg and vice versa -> every pos
    // token weight is strictly positive, every neg strictly negative,
    // so scores separate with certainty (no staircase-noise caveat)
    val pos = (0L until 40L).map(i => (i, s"p${i % 5}x p${(i + 1) % 5}x p${(i + 2) % 7}x"))
    val neg = (100L until 140L).map(i => (i, s"n${i % 5}x n${(i + 1) % 5}x n${(i + 3) % 7}x"))
    val docs = (pos ++ neg).toDF("doc_id", "text")
    val scored = Classifier.nbClassifyOn(
        docs.withColumn("is_pos", col("doc_id") < 100L), col("is_pos"))
      .join(docs.select(col("doc_id"),
        (col("doc_id") < 100L).cast("long").as("truth")), Seq("doc_id"))
    val confusion = scored.groupBy(col("truth"), col("label_pos"))
      .agg(count(lit(1)).as("n")).as[(Long, Long, Long)].collect().toSet
    assert(confusion === Set((1L, 1L, 40L), (0L, 0L, 40L)),
      s"disjoint-vocab classes must separate perfectly, got $confusion")
  }

  test("NB bits_per_100 is hard-bounded: the cutoff-calibration histogram " +
    "can never grow past 12601 rows") {
    // the r14 ADVICE guard, NB spelling: w is a difference of bitlen
    // staircases, each ∈ [0, 63], so per-token score ∈ [−63, 63] and
    // bits_per_100 = 10000 + score·100 DIV n ∈ [3700, 16300] at ANY
    // corpus size — writeNbCutoff's global window sorts a ≤ 12601-row
    // histogram, control plane by construction.
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val r = Classifier.nbClassifyOn(docs, col("doc_id") % 3 =!= 0)
      .select(expr("(score * 100 + 10000 * n_tokens) DIV n_tokens")
        .as("bits_per_100"))
      .agg(min($"bits_per_100"), max($"bits_per_100"))
      .as[(Long, Long)].head()
    assert(r._1 >= 3700L && r._2 <= 16300L,
      s"NB bits_per_100 range $r escapes the documented [3700, 16300] hard bound")
  }

  test("nbClassifyOn equals the weights+score composition") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text", $"lang")
    val composed = Classifier.nbScoreOn(
      docs.select($"doc_id", $"text"),
      Classifier.nbWeightsOn(
        docs.filter($"lang" === "en").select($"text"),
        docs.filter($"lang" =!= "en").select($"text"), 16))
    val direct = Classifier.nbClassifyOn(docs, $"lang" === "en", 16)
    assert(direct.as[(Long, Long, Long, Long)].collect().toSet ===
      composed.as[(Long, Long, Long, Long)].collect().toSet)
  }

  test("logistic regression: loss strictly falls and the planted classes separate") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    // fit on the same zj-drift labels the NB planted query uses
    val (w, losses) = {
      val planted = docs.withColumn("y",
        ($"doc_id" % 3 =!= 0).cast("long"))
      Classifier.fitLogRegOn(
        planted.select($"doc_id",
          when($"doc_id" % 3 === 0,
            array_join(transform(split($"text", " "),
              (t, j) => when(j % 3 === 0, concat(lit("zj"), t)).otherwise(t)), " "))
            .otherwise($"text").as("text"),
          $"y"),
        dim = 256, iters = 80)
    }
    info(s"log-loss trace (nats x 1e6): ${losses.mkString(", ")}")
    assert(losses.zip(losses.tail).forall { case (a, b) => b < a },
      s"full-batch GD loss must strictly fall on separable data: $losses")
    assert(w.length === 257, "weights must be dim + bias")

    val scored = Classifier.logRegPlantedClassify(spark, sf, dim = 256, iters = 80)
      .as[(Long, Long, Long, Long)].collect()
    assert(scored.length === docs.count(),
      "every doc must be scored exactly once")
    val confusion = scored.groupBy(r => (r._4, r._3)).view.mapValues(_.length).toMap
    info(s"logreg planted confusion: $confusion")
    assert(!confusion.contains((1L, 1L)) && !confusion.contains((0L, 0L)),
      s"planted drift must separate perfectly after training, got $confusion")
    // probabilities are calibrated to the right side of 1/2
    assert(scored.forall(r => (r._3 == 1L) == (r._2 >= 500000L)),
      "decision bit must agree with the ppm probability at the 1/2 threshold")
  }

  test("stored logreg model: resume-from-storage == one continuous fit; " +
      "meta pins hyperparams; crash-orphan generations are invisible") {
    import graft.sources.ClassifierModels
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val planted = graft.operators.Classifier.mangled(docs)
    val labeled = planted.select($"doc_id", $"text",
      (lit(1L) - $"is_mangled").as("y"))
    val root = java.nio.file.Files.createTempDirectory("logreg-model").toString
    val dim = 64

    // the resume contract: init(4 steps) + append(4 steps) over the SAME
    // frame must land where ONE 8-step fit lands — warm start IS the
    // same descent, continued (float partial-sum order is the only
    // slack, hence the tolerance, not exact equality like NB counts)
    val (wCont, _) = graft.operators.Classifier.fitLogRegOn(
      labeled, dim, iters = 8, trace = false)
    ClassifierModels.writeLogRegModel(labeled, s"$root/m", dim, iters = 4)
    val (wInit, gen1) = ClassifierModels.readLogRegWeights(spark, s"$root/m")
    assert(gen1 === 1L)
    ClassifierModels.appendLogReg(labeled, s"$root/m", "b2", iters = 4)
    val (wRes, gen2) = ClassifierModels.readLogRegWeights(spark, s"$root/m")
    assert(gen2 === 2L, "the append must commit a new generation")
    assert(wRes.size === dim + 1)
    val maxDiff = wCont.zip(wRes).map { case (a, b) => math.abs(a - b) }.max
    info(s"stored-resume vs continuous max |dw| = $maxDiff")
    assert(maxDiff < 1e-9,
      s"resumed descent must equal the continuous fit (max diff $maxDiff)")
    assert(wInit.zip(wRes).exists { case (a, b) => a != b },
      "the append must actually move the weights")

    // meta pins the feature dim: an append under a different dim is a
    // different model, refused loudly
    intercept[IllegalArgumentException] {
      graft.operators.Classifier.fitLogRegOn(labeled, dim = 32, iters = 1,
        init = Some(wRes))
    }

    // gens-last crash visibility: weights written but no gens row =
    // orphan — readers still see generation 2
    wRes.zipWithIndex.map { case (v, i) => (i, v + 99.0) }
      .toDF("i", "w").write.mode("overwrite")
      .parquet(s"$root/m/weights/ingest=crashed")
    val (wAfter, genAfter) = ClassifierModels.readLogRegWeights(spark, s"$root/m")
    assert(genAfter === 2L && wAfter === wRes,
      "an uncommitted generation must be invisible to readers")
  }

  test("q_logreg_planted: the stored-lifecycle driver query separates the drift") {
    import graft.sources.ClassifierModels
    val scored = ClassifierModels.logRegPlantedStoredDocs(spark, sf)
      .select($"doc_id", $"label_pos", $"is_mangled")
      .as[(Long, Long, Long)].collect()
    assert(scored.length === Tables.documents(spark, sf).count(),
      "every doc scored exactly once")
    // 40 total steps (20 init + 20 warm-start) — the warm-start phase
    // trains on the odd-id half ONLY, so a lone straggler from the
    // other half is the honest residual of split training (measured: 1
    // of 501); the bound is >= 99% separation, the driver-side contract
    // that backs the rows-only correctness row
    val errs = scored.count(r => r._2 != 1L - r._3)
    info(s"q_logreg_planted errors: $errs of ${scored.length}")
    assert(errs * 100 <= scored.length,
      s"planted classes must separate >= 99% from the stored split fit ($errs errors)")
  }

  test("stored NB model: counts merge exactly — append == fresh full fit, replay adds nothing") {
    import graft.sources.ClassifierModels
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text", $"lang")
    val pos = docs.filter($"lang" === "en").select($"text")
    val neg = docs.filter($"lang" =!= "en").select($"text")
    val root = java.nio.file.Files.createTempDirectory("nb-model").toString

    // fresh full fit = the reference
    ClassifierModels.writeNbModel(pos, neg, s"$root/full")
    val full = ClassifierModels.readNbWeights(spark, s"$root/full", 16)
      .as[(String, Long)].collect().toSet
    val inline = Classifier.nbWeightsOn(pos, neg, 16)
      .as[(String, Long)].collect().toSet
    assert(full === inline && full.nonEmpty,
      "stored-model weights diverged from the inline fit")

    // incremental: init on half the docs, append the rest — counts
    // merge, so the derived weights are EXACTLY the full fit's
    val lo = docs.filter($"doc_id" % 2 === 0)
    val hi = docs.filter($"doc_id" % 2 === 1)
    ClassifierModels.writeNbModel(
      lo.filter($"lang" === "en").select($"text"),
      lo.filter($"lang" =!= "en").select($"text"), s"$root/grown")
    ClassifierModels.appendNb(
      hi.filter($"lang" === "en").select($"text"),
      hi.filter($"lang" =!= "en").select($"text"), s"$root/grown", "b2")
    // replay the append: own-label overwrite adds nothing
    ClassifierModels.appendNb(
      hi.filter($"lang" === "en").select($"text"),
      hi.filter($"lang" =!= "en").select($"text"), s"$root/grown", "b2")
    val grown = ClassifierModels.readNbWeights(spark, s"$root/grown", 16)
      .as[(String, Long)].collect().toSet
    assert(grown === full,
      "init-then-append weights must equal the fresh full fit exactly")

    // crash visibility: an ingest with counts but no totals row (the
    // totals-last contract's half-written state) is invisible
    val spark2 = spark
    spark2.read.parquet(s"$root/grown/counts").filter($"ingest" === "b2")
      .drop("ingest")
      .write.mode("overwrite").parquet(s"$root/grown/counts/ingest=crashed")
    val healed = ClassifierModels.readNbWeights(spark, s"$root/grown", 16)
      .as[(String, Long)].collect().toSet
    assert(healed === full,
      "a half-written ingest (counts without totals) must be invisible")
  }

  test("the driver plant separates the fixture corpus") {
    // the zj-prefix drift (every third token of doc_id%3 docs) must
    // yield a clean diagonal at sf0.001 too: mangled-doc scores are
    // dominated by ~n/3 strongly-negative drifted tokens against at
    // most ±1 staircase noise on the rest
    val confusion = Classifier.nbPlantedConfusion(spark, sf, 64)
      .as[(Long, Long, Long)].collect()
    val offDiagonal = confusion.filter { case (truth, pred, _) =>
      (truth == 1L && pred == 1L) || (truth == 0L && pred == 0L) }
    assert(offDiagonal.isEmpty,
      s"planted drift must separate perfectly, got ${confusion.toSeq}")
    assert(confusion.map(_._3).sum ===
      Tables.documents(spark, sf).count(),
      "confusion matrix must cover every doc exactly once")
    assert(confusion.length === 2 && confusion.exists(_._1 == 1L) &&
      confusion.exists(_._1 == 0L),
      "both planted classes must be non-vacuous")
  }
}
