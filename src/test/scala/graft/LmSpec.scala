package graft

import graft.operators.Lm
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CCNet-style LM scoring (q_lm_score / q_lm_buckets): full output
  * values are hash-checked against DuckDB by the driver; this suite
  * asserts the invariants the oracle can't see — hand-computed bitlen
  * arithmetic on a known tiny LM, a non-vacuous vocabulary cap and OOV
  * path at the driver settings, tertile balance, score-monotone bucket
  * boundaries, and histogram-spelling == direct-global-rank equality.
  */
class LmSpec extends SparkSpec {
  import spark.implicits._

  private val sf = TestSpark.sf0001

  test("bitlen staircase arithmetic on a hand-built reference LM") {
    // ref = "a a a b": N=4 (bitlen 3); cnt(a)=3 -> bitlen(4)=3;
    // cnt(b)=1 -> bitlen(2)=2; OOV c -> bitlen(1)=1
    val ref = Seq("a a a b").toDF("text")
    val docs = Seq((1L, "a b c"), (2L, "a a"), (3L, "c c c c"))
      .toDF("doc_id", "text")
    val got = Lm.lmScoreOn(docs, ref, vocabSize = 4096)
      .select("doc_id", "n_tokens", "bits", "bits_per_100")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // doc 1: (3-3) + (3-2) + (3-1) = 3 bits over 3 tokens
    // doc 2: 0 bits over 2 tokens
    // doc 3: 4 * 2 = 8 bits over 4 tokens
    assert(got.toSeq === Seq((1L, 3L, 3L, 100L), (2L, 2L, 0L, 0L),
      (3L, 4L, 8L, 200L)))
  }

  test("vocab cap keeps exactly vocabSize tokens with a deterministic tie-break") {
    val ref = Seq("a a b b c d").toDF("text")
    // cap 2: counts a=2, b=2, c=1, d=1 -> keep (a,2),(b,2); ties on cnt
    // break by token asc, so cap 3 keeps c (not d)
    val v2 = Lm.vocabOn(ref, 2).as[(String, Long)].collect().sortBy(_._1)
    assert(v2.toSeq === Seq(("a", 2L), ("b", 2L)))
    val v3 = Lm.vocabOn(ref, 3).as[(String, Long)].collect().sortBy(_._1)
    assert(v3.toSeq === Seq(("a", 2L), ("b", 2L), ("c", 1L)))
  }

  test("driver settings are non-vacuous: the fixture vocab exceeds the cap") {
    val docs = Tables.documents(spark, sf)
    val refTexts = docs.filter(col("lang") === "en").select(col("text"))
    val full = refTexts
      .select(explode(split(col("text"), " ")).as("tok"))
      .distinct().count()
    assert(full > 16, s"fixture en vocab ($full) no longer exceeds the cap " +
      "of 16 - q_lm_score's OOV path went vacuous; lower the driver cap")
    // and the cap changes real scores (OOV surprise is being paid)
    val capped = Lm.lmScore(spark, sf, "en", 16)
    val uncapped = Lm.lmScoreOn(
      docs.select(col("doc_id"), col("text")), refTexts, 1 << 20)
    val diff = capped.alias("c")
      .join(uncapped.alias("u"), "doc_id")
      .filter(col("c.bits") =!= col("u.bits")).count()
    assert(diff > 0, "vocab cap changed no score - the OOV path is vacuous")
  }

  test("bits_per_100 is hard-bounded: the cutoff-calibration histogram can " +
    "never grow past 6301 rows") {
    // the r14 ADVICE guard: writeLmCutoffs' global window runs over the
    // VALUE histogram, and the value range is corpus-size-INDEPENDENT —
    // per-token surprise = bitlen(N) − bitlen(c+1) ∈ [0, 63] whole bits
    // (bitlen of a Long), so bits_per_100 = bits·100 DIV n ∈ [0, 6300].
    // Pinned here on the fixture scorer so a re-spelling of the score
    // unit that breaks the bound breaks a named test.
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val r = Lm.lmScoreOn(docs, docs.select($"text"))
      .agg(min($"bits_per_100"), max($"bits_per_100"))
      .as[(Long, Long)].head()
    assert(r._1 >= 0L && r._2 <= 6300L,
      s"bits_per_100 range $r escapes the documented [0, 6300] hard bound")
  }

  test("tertiles are balanced and cover every doc exactly once") {
    val b = Lm.lmBuckets(spark, sf, "en", 16).cache()
    val n = Tables.documents(spark, sf).count()
    assert(b.count() === n)
    assert(b.select("doc_id").distinct().count() === n)
    val sizes = b.groupBy("bucket").count()
      .as[(String, Long)].collect().toMap
    assert(sizes.keySet === Set("head", "middle", "tail"))
    assert(sizes("head") === n / 3)
    assert(sizes("middle") === 2 * n / 3 - n / 3)
    assert(sizes("tail") === n - 2 * n / 3)
  }

  test("bucket boundaries are score-monotone: head <= middle <= tail") {
    val b = Lm.lmBuckets(spark, sf, "en", 16)
    val mm = b.groupBy("bucket")
      .agg(min(col("bits_per_100")).as("lo"), max(col("bits_per_100")).as("hi"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(mm("head")._2 <= mm("middle")._1)
    assert(mm("middle")._2 <= mm("tail")._1)
  }

  test("histogram bucketing equals the direct global-rank spelling") {
    val docs = Tables.documents(spark, sf)
    val refTexts = docs.filter(col("lang") === "en").select(col("text"))
    val docTexts = docs.select(col("doc_id"), col("text"))
    val sc = Lm.lmScoreOn(docTexts, refTexts, 16)
      .select(col("doc_id"), col("bits_per_100"))
    val n = sc.count()
    val direct = sc
      .withColumn("rk",
        row_number().over(Window.orderBy(col("bits_per_100"), col("doc_id")))
          .cast("long"))
      .withColumn("bucket",
        when(col("rk") <= n / 3, "head")
          .when(col("rk") <= 2 * n / 3, "middle").otherwise("tail"))
      .drop("rk")
    val got = Lm.lmBucketsOn(docTexts, refTexts, 16)
    assert(got.exceptAll(direct).isEmpty && direct.exceptAll(got).isEmpty,
      "histogram tertiles diverge from the direct global-rank spelling")
  }

  test("a tertile boundary actually lands inside a score value (straddle non-vacuous)") {
    // if every boundary falls between distinct values the per-doc
    // tie-break path is dead code for the fixture; this guards the
    // driver query exercising BOTH branches of lmBucketsOn
    val b = Lm.lmBuckets(spark, sf, "en", 16)
    val split = b.groupBy("bits_per_100")
      .agg(countDistinct(col("bucket")).as("nb"))
      .filter(col("nb") > 1).count()
    assert(split > 0, "no score value straddles a tertile boundary - " +
      "the boundary tie-break went vacuous on this fixture")
  }

  test("stored LM model: counts merge exactly — append == fresh fit, " +
      "replay adds nothing, crashed ingest invisible, score == inline") {
    import graft.sources.LmModels
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text", $"lang")
    val ref = docs.filter($"lang" === "en").select($"text")
    val root = java.nio.file.Files.createTempDirectory("lm-model").toString

    // fresh full fit = the reference
    LmModels.writeLmModel(ref, s"$root/full")
    val fullVocab = LmModels.readLmVocab(spark, s"$root/full", 16)
      .as[(String, Long)].collect().toSet
    val inlineVocab = Lm.vocabOn(ref, 16)
      .as[(String, Long)].collect().toSet
    assert(fullVocab === inlineVocab,
      "stored-model vocab must equal the inline vocabOn exactly")

    // incremental: init + append == the fresh fit EXACTLY (counts merge)
    val half = docs.filter($"lang" === "en" && $"doc_id" % 2 === 0).select($"text")
    val rest = docs.filter($"lang" === "en" && $"doc_id" % 2 =!= 0).select($"text")
    LmModels.writeLmModel(half, s"$root/incr")
    LmModels.appendLm(rest, s"$root/incr", "b2")
    assert(LmModels.readLmVocab(spark, s"$root/incr", 16)
      .as[(String, Long)].collect().toSet === inlineVocab,
      "init + append must merge to the fresh-fit vocabulary exactly")
    assert(LmModels.readLmNtot(spark, s"$root/incr").as[Long].head ===
      LmModels.readLmNtot(spark, s"$root/full").as[Long].head,
      "merged token total must equal the full fit's")

    // same-label replay: overwrite-on-own-label, nothing doubles
    LmModels.appendLm(rest, s"$root/incr", "b2")
    assert(LmModels.readLmNtot(spark, s"$root/incr").as[Long].head ===
      LmModels.readLmNtot(spark, s"$root/full").as[Long].head,
      "replaying an append must not double its counts")

    // totals-last crash visibility: counts without a totals row are
    // invisible to every read
    spark.read.parquet(s"$root/incr/counts").filter($"ingest" === "b2")
      .select($"tok", $"cnt")
      .write.mode("overwrite").parquet(s"$root/incr/counts/ingest=crashed")
    assert(LmModels.readLmVocab(spark, s"$root/incr", 16)
      .as[(String, Long)].collect().toSet === inlineVocab,
      "an uncommitted ingest's counts must be invisible")

    // the scored surface: stored == inline, row for row
    val stored = LmModels.lmScoreStoredOn(
        docs.select($"doc_id", $"text"), s"$root/incr", 16)
      .as[(Long, Long, Long, Long)].collect().toSet
    val inline = Lm.lmScoreOn(docs.select($"doc_id", $"text"), ref, 16)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(stored === inline,
      "scoring from the stored model must equal the inline scorer exactly")
  }
}
