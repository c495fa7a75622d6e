package graft

import graft.operators.{Mixture, Pipeline, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mix construction (q_pack_sequences / q_mixture_* /
  * q_dsir_*): the full output values are hash-checked against DuckDB by
  * the driver; this suite asserts the invariants the oracle can't see —
  * token conservation, exact sequence fill, blockwise == direct-window
  * equality, quota monotonicity, score-direction sanity, and exact
  * top-k cardinality.
  */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private val sf = TestSpark.sf0001
  private lazy val docs = Tables.documents(spark, sf)
    .select(col("doc_id"), col("text"))
  private lazy val packed = Mixture.packSequences(spark, sf).cache()

  test("packing conserves every token: per-doc tok_in_seq sums to n_tokens") {
    val bad = packed.groupBy("doc_id")
      .agg(max(col("n_tokens")).as("n_tokens"),
        sum(col("tok_in_seq")).as("packed"))
      .filter(col("n_tokens") =!= col("packed"))
    assert(bad.isEmpty, "a doc lost or gained tokens in packing")
    // and every input doc appears (no doc dropped by the chunker)
    assert(packed.select("doc_id").distinct().count() === docs.count())
  }

  test("every sequence except the last is filled to exactly seqLen tokens") {
    val fills = packed.groupBy("seq_id").agg(sum(col("tok_in_seq")).as("fill"))
    val lastSeq = fills.agg(max(col("seq_id"))).as[Long].head()
    val bad = fills.filter(col("seq_id") =!= lastSeq && col("fill") =!= 512L)
    assert(bad.isEmpty, "an interior training sequence is not exactly full")
    // seq ids are dense from 0 — chunking leaves no holes
    assert(fills.count() === lastSeq + 1)
  }

  test("a doc's sequences are consecutive (it straddles, never scatters)") {
    val bad = packed.groupBy("doc_id")
      .agg(min(col("seq_id")).as("lo"), max(col("seq_id")).as("hi"),
        count(lit(1)).as("n"))
      .filter(col("hi") - col("lo") + 1 =!= col("n"))
    assert(bad.isEmpty, "non-consecutive seq ids for one doc")
  }

  test("blockwise packing equals the direct single-window spelling") {
    // the oracle checks the direct spelling; this closes the loop on the
    // blockwise plan being the SAME function (tokenShards precedent)
    val key = md5(regexp_replace(trim(lower(col("text"))), "\\s+", " "))
    val direct = docs
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"),
        key.as("key"))
      .withColumn("strt", coalesce(
        sum(col("n_tokens")).over(Window.orderBy(col("key"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("seq_id",
        explode(sequence(expr("strt DIV 512"),
          expr("(strt + n_tokens - 1) DIV 512"))))
      .select(col("doc_id"), col("seq_id"), col("n_tokens"),
        (least((col("seq_id") + 1) * 512L, col("strt") + col("n_tokens"))
          - greatest(col("seq_id") * 512L, col("strt"))).as("tok_in_seq"))
    assert(packed.except(direct).isEmpty && direct.except(packed).isEmpty,
      "blockwise packing diverged from the direct prefix-sum spelling")
  }

  test("nTokensCol fed with whitespace counts reproduces the default packing exactly") {
    val withCounts = docs.withColumn("n_ws",
      size(TextOps.tokens(col("text"))).cast("long"))
    val viaCol = Mixture.packSequencesOn(withCounts, 512L, Some("n_ws"))
    assert(viaCol.except(packed).isEmpty && packed.except(viaCol).isEmpty,
      "the precomputed-count path diverged from the default whitespace path")
    spark.catalog.clearCache()
  }

  test("tokenizer-faithful packing: BPE token counts drive real context budgets") {
    // segment the fixture under a small learned merge table and pack by
    // the TOKENIZER count — the r12-verdict gap: context budgets are
    // tokenizer tokens, not words
    val merges = graft.operators.Bpe.learnMergesOn(docs, 4)
      .orderBy(col("step")).as[(Int, String, String, Long)].collect()
      .map(m => (m._2, m._3)).toSeq
    val seg = docs.withColumn("n_bpe",
      size(flatten(transform(TextOps.tokens(col("text")),
        w => graft.operators.Bpe.segmentWith(w, merges)))).cast("long"))
      .cache()
    val bpePacked = Mixture.packSequencesOn(seg, 512L, Some("n_bpe")).cache()
    // conservation under the fed count
    val bad = bpePacked.groupBy("doc_id")
      .agg(max(col("n_tokens")).as("n_tokens"), sum(col("tok_in_seq")).as("p"))
      .filter(col("n_tokens") =!= col("p"))
    assert(bad.isEmpty, "a doc lost or gained BPE tokens in packing")
    // interior sequences are exactly 512 BPE tokens
    val fills = bpePacked.groupBy("seq_id").agg(sum(col("tok_in_seq")).as("fill"))
    val lastSeq = fills.agg(max(col("seq_id"))).as[Long].head()
    assert(fills.filter(col("seq_id") =!= lastSeq && col("fill") =!= 512L).isEmpty,
      "an interior sequence is not exactly 512 tokenizer tokens")
    // and the budget genuinely differs from word budgets (characters
    // under 4 merges outnumber words by construction) — non-vacuous
    val bpeTotal = seg.agg(sum(col("n_bpe"))).as[Long].head()
    val wsTotal = docs.select(size(TextOps.tokens(col("text"))).cast("long").as("n"))
      .agg(sum(col("n"))).as[Long].head()
    assert(bpeTotal > wsTotal,
      "BPE segmentation did not change the token budget — the case is vacuous")
    seg.unpersist(); bpePacked.unpersist()
    spark.catalog.clearCache()
  }

  test("a non-positive precomputed count fails loudly, never mis-chunks") {
    val poisoned = docs.withColumn("n_bad",
      when(col("doc_id") === 7L, lit(0L))
        .otherwise(size(TextOps.tokens(col("text"))).cast("long")))
    val e = intercept[Exception] {
      Mixture.packSequencesOn(poisoned, 512L, Some("n_bad")).collect()
    }
    // the assertion surfaces wrapped in task-failure layers — check the
    // whole cause chain for the guard's message
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("nTokensCol must be >= 1"),
      s"expected the per-row count guard to fire, got: $msgs")
    spark.catalog.clearCache()
  }

  test("epoch schedule: budget conserved, maxEpochs capped, partial round dealt in name order") {
    val srcDocs = Seq(
      ("a b c d", "s1"),       // 4 tokens
      ("e f g", "s2"),         // 3
      ("h i j k l m", "s3"))   // 6 -> total 13
      .toDF("text", "source")
    // budget 30, cap 4: r0 = 2 full rounds (26 tokens), remainder 4 ->
    // s1 (first in name order) absorbs all 4, s2/s3 get none
    val got = Mixture.epochScheduleOn(srcDocs, 30L, 4L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === Map(
      "s1" -> ((4L, 12L, 300L)),
      "s2" -> ((3L, 6L, 200L)),
      "s3" -> ((6L, 12L, 200L))))
    assert(got.values.map(_._2).sum === 30L, "the full budget must be allocated")
    // mid-source boundary: budget 15 -> r0 = 1 (13), remainder 2 lands
    // partially on s1 (2 of its 4 tokens)
    val partial = Mixture.epochScheduleOn(srcDocs, 15L, 4L)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(partial === Map("s1" -> 6L, "s2" -> 3L, "s3" -> 6L))
    // budget past the cap: every source stops at exactly maxEpochs —
    // repeated tokens beyond the cap are worthless, so they are never
    // allocated even with budget to burn
    val capped = Mixture.epochScheduleOn(srcDocs, 1000L, 4L)
      .as[(String, Long, Long, Long)].collect()
    assert(capped.forall(r => r._3 === r._2 * 4 && r._4 === 400L),
      s"cap violated: ${capped.mkString(", ")}")
    // degenerate budgets refuse loudly / allocate nothing
    intercept[IllegalArgumentException](Mixture.epochScheduleOn(srcDocs, -1L))
    assert(Mixture.epochScheduleOn(srcDocs, 0L)
      .as[(String, Long, Long, Long)].collect().forall(_._3 === 0L))
  }

  test("temperature sample honors its quota exactly, with dense ranks") {
    val sampled = Mixture.temperatureSample(spark, sf).cache()
    val plan = Mixture.mixturePlan(spark, sf)
      .select(col("source"), col("n_docs"), col("quota"))
    val got = sampled.groupBy("source")
      .agg(count(lit(1)).as("kept"), max(col("rk")).as("max_rk"))
    val bad = got.join(plan, "source")
      .filter(col("kept") =!= col("quota") || col("max_rk") =!= col("quota") ||
        col("quota") =!= least(col("n_docs"),
          floor(sqrt(col("n_docs").cast("double"))).cast("long") * 4))
    assert(bad.isEmpty, "per-source kept count / max rank != sqrt-temperature quota")
    // ranks are dense 1..quota per source: count == max == quota and
    // distinct — no rank skipped or duplicated by the blockwise offsets
    val dup = sampled.groupBy("source", "rk").count().filter(col("count") > 1)
    assert(dup.isEmpty, "duplicate rank within a source")
    sampled.unpersist()
  }

  test("temperature sample is monotone in scale (smaller scale ⊂ larger)") {
    val base = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("source"))
    val s2 = Mixture.temperatureSampleOn(base, scale = 2L)
      .select("doc_id").as[Long].collect().toSet
    val s4 = Mixture.temperatureSampleOn(base, scale = 4L)
      .select("doc_id").as[Long].collect().toSet
    assert(s2.subsetOf(s4), "scale-2 sample is not a prefix of scale-4")
    assert(s2.size < s4.size, "larger scale kept nothing extra (vacuous)")
  }

  test("importance weights point toward the target domain") {
    // synthetic corpus: docs made ONLY of a target-exclusive token score
    // strictly above docs made only of a non-target token, with the real
    // fixture vocabulary absent from both
    val synth = Seq(
      (1L, "aurorax aurorax aurorax", "src0"),
      (2L, "aurorax aurorax aurorax", "src1"),
      (3L, "borealz borealz borealz", "src1"),
      (4L, "borealz borealz borealz", "src2"))
      .toDF("doc_id", "text", "source")
    val w = Mixture.importanceWeightsOn(synth, targetSource = "src0")
      .select(col("doc_id"), col("avg_ppm")).as[(Long, Long)].collect().toMap
    // 'aurorax' occurs 3× in target of 6 total ⇒ w = 4*1e6/7; 'borealz'
    // never in target ⇒ w = 1e6/7; identical length cancels
    assert(w(1L) === w(2L), "same text must score identically regardless of source")
    assert(w(1L) > w(4L), "target-exclusive vocabulary must outscore absent vocabulary")
  }

  test("importance resample keeps exactly floor(n/denom) docs — the top slice") {
    val scores = Mixture.importanceWeights(spark, sf).cache()
    val n = scores.count()
    val kept = Mixture.importanceResampleOn(scores, denom = 4L).cache()
    assert(kept.count() === n / 4, "kept cardinality != floor(n/4)")
    // equals the brute-force global rank spelling (the thing the
    // histogram + boundary tie-break exists to avoid at scale)
    val brute = scores
      .withColumn("rk", row_number().over(
        Window.orderBy(col("avg_ppm").desc, col("doc_id"))))
      .filter(col("rk") <= n / 4)
      .select(col("doc_id"), col("avg_ppm"))
    assert(kept.except(brute).isEmpty && brute.except(kept).isEmpty,
      "histogram top-k diverged from the global-rank spelling")
    scores.unpersist(); kept.unpersist()
  }

  test("curated mixture samples only ledger-train docs, with train-set quotas") {
    // the mixture composes the COVERAGE-THRESHOLD ledger (see
    // mixtureCurated's scaladoc: the blunt rule empties train at sf0.1)
    val ledger = Pipeline.curateCov(spark, sf).cache()
    val train = ledger.filter(col("outcome") === "train")
      .select("doc_id").as[Long].collect().toSet
    val sampled = Mixture.mixtureCurated(spark, sf).cache()
    val ids = sampled.select("doc_id").as[Long].collect()
    assert(ids.nonEmpty && ids.forall(train), "sampled a non-train doc")
    // quotas are computed over the TRAIN subset, not the full corpus
    val trainDocs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("source"))
      .filter(col("doc_id").isInCollection(train))
    val direct = Mixture.temperatureSampleOn(trainDocs)
    assert(sampled.except(direct).isEmpty && direct.except(sampled).isEmpty,
      "composed mixture diverged from temperatureSample over the train set")
    ledger.unpersist(); sampled.unpersist()
  }

  test("curriculum position is a permutation, grade-monotone, and equals the direct window") {
    val cur = Mixture.curriculumOrder(spark, sf).cache()
    val n = Tables.documents(spark, sf).count()
    // 1..n with no holes or repeats
    assert(cur.count() === n)
    assert(cur.agg(min(col("pos")), max(col("pos")), countDistinct(col("pos")))
      .as[(Long, Long, Long)].head() === ((1L, n, n)))
    // easy-to-hard: grade never decreases along the schedule
    val byPos = cur.orderBy("pos").select("grade").as[Long].collect()
    assert(byPos.zip(byPos.tail).forall { case (a, b) => a <= b },
      "grade decreased along the curriculum")
    // blockwise rank == the direct single-window spelling (the oracle)
    val key = md5(regexp_replace(trim(lower(col("text"))), "\\s+", " "))
    val grades = operators.Lm.lmScore(spark, sf, "en", 16)
      .select(col("doc_id"), col("bits_per_100").as("grade"))
    val direct = Tables.documents(spark, sf)
      .select(col("doc_id"), key.as("key")).join(grades, "doc_id")
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("grade"), col("key"), col("doc_id"))).cast("long"))
      .select("doc_id", "grade", "pos")
    assert(cur.exceptAll(direct).isEmpty && direct.exceptAll(cur).isEmpty,
      "blockwise curriculum rank diverged from the direct window")
    cur.unpersist()
  }

  test("corpus build == packSequences over exactly the mixture-picked docs") {
    val picked = Mixture.mixtureCurated(spark, sf).select("doc_id")
    val direct = Mixture.packSequencesOn(
      Tables.documents(spark, sf).select(col("doc_id"), col("text"))
        .join(picked, "doc_id"))
    val composed = Mixture.corpusBuild(spark, sf)
    assert(composed.exceptAll(direct).isEmpty && direct.exceptAll(composed).isEmpty,
      "corpusBuild diverges from its definitional composition")
    // token conservation: packed spans sum to the picked docs' tokens
    val pickedToks = Tables.documents(spark, sf)
      .join(picked, "doc_id")
      .agg(sum(size(split(col("text"), " ")))).as[Long].head()
    val packedToks = composed.agg(sum(col("tok_in_seq"))).as[Long].head()
    assert(packedToks === pickedToks, "packing lost or invented tokens")
    // every interior sequence is exactly full
    val maxSeq = composed.agg(max(col("seq_id"))).as[Long].head()
    val bad = composed.filter(col("seq_id") < maxSeq)
      .groupBy("seq_id").agg(sum(col("tok_in_seq")).as("t"))
      .filter(col("t") =!= 512L).count()
    assert(bad === 0L, "an interior sequence is not exactly 512 tokens")
  }

  test("dsir weight table never exceeds its 4096 hashed buckets") {
    // the whole scale story: the broadcast side is fixed-size no matter
    // the corpus — verify the bucket id really is a 3-hex-char key
    val toks = Tables.documents(spark, sf)
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .select(substring(md5(col("tok")), 1, 3).as("bkt")).distinct()
    val n = toks.count()
    assert(n <= 4096, s"bucket space exceeded 4096: $n")
    assert(toks.filter(length(col("bkt")) =!= 3).isEmpty)
  }
}
