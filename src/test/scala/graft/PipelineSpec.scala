package graft

import graft.operators.{Pipeline, TextAnalysis}
import org.apache.spark.sql.functions._

/** The end-to-end curation ledger (q_pipeline_curate): stage attribution,
  * consistency with the individually-oracle-verified component operators,
  * and the planted-duplicate guarantee. The full-ledger values are
  * hash-checked against DuckDB by the driver; this suite asserts the
  * CROSS-OPERATOR invariants the oracle can't see.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ledger =
    Pipeline.curate(spark, TestSpark.sf0001).cache()
  private lazy val byOutcome: Map[String, Long] =
    ledger.groupBy("outcome").count().as[(String, Long)].collect().toMap

  test("every stage of the pipeline fires non-vacuously on the fixture") {
    val classes = Set("dropped_lang", "dropped_quality", "dropped_duplicate",
      "dropped_contaminated", "train", "eval")
    assert(byOutcome.keySet === classes,
      s"expected all six outcome classes, got ${byOutcome.keySet}")
    assert(byOutcome.values.forall(_ > 0))
  }

  test("dropped_quality agrees with the oracle-verified quality filter") {
    // every non-planted doc the ledger drops for quality must be keep=0
    // in qualityFilter, and vice versa among lang-passing docs
    val droppedQ = ledger
      .filter(col("outcome") === "dropped_quality" && col("doc_id") < 1000000L)
      .select("doc_id").as[Long].collect().toSet
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val langPass = docs
      .filter(TextAnalysis.langGuess(col("text")) === "en")
      .select("doc_id").as[Long].collect().toSet
    val keepZero = TextAnalysis.qualityFilter(spark, TestSpark.sf0001)
      .filter(col("keep") === 0L).select("doc_id").as[Long].collect().toSet
    assert(droppedQ === (langPass intersect keepZero),
      "pipeline quality stage diverged from the standalone quality filter")
  }

  test("planted duplicates always lose the keeper race, originals never do") {
    val outcomes = ledger.select(col("doc_id"), col("outcome"))
      .as[(Long, String)].collect().toMap
    val planted = outcomes.keys.filter(_ >= 1000000L)
    assert(planted.nonEmpty)
    planted.foreach { pid =>
      val orig = outcomes(pid - 1000000L)
      val p = outcomes(pid)
      if (orig == "dropped_lang" || orig == "dropped_quality")
        // identical text ⇒ identical verdicts at stages 1–2
        assert(p === orig, s"planted $pid diverged from original at lang/quality: $p vs $orig")
      else
        assert(p === "dropped_duplicate",
          s"planted $pid should lose the min-doc_id keeper race, got $p")
    }
    // and no original is ever displaced by its (higher-id) plant: the
    // fixture has no NATURAL canonical dups (q_dedup_exact is 1:1), so
    // every dropped_duplicate must be a planted id
    val origDupDrops = outcomes.collect {
      case (id, "dropped_duplicate") if id < 1000000L => id }
    assert(origDupDrops.isEmpty,
      s"originals displaced by planted copies (keeper must be min doc_id): $origDupDrops")
  }

  test("curateStats is exactly the ledger rolled up, docs and tokens") {
    val stats = Pipeline.curateStats(spark, TestSpark.sf0001)
      .as[(String, Long, Long)].collect()
      .map { case (o, d, t) => o -> ((d, t)) }.toMap
    assert(stats.view.mapValues(_._1).toMap === byOutcome)
    val tokensByOutcome = ledger.groupBy("outcome")
      .agg(sum("n_tokens").as("t")).as[(String, Long)].collect().toMap
    assert(stats.view.mapValues(_._2).toMap === tokensByOutcome)
    assert(tokensByOutcome.values.sum > 0)
  }

  test("the ledger covers every input doc exactly once") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val nBase = docs.count()
    val nPlanted = docs.filter(col("doc_id") % 7 === 0).count()
    assert(ledger.count() === nBase + nPlanted)
    assert(ledger.select("doc_id").distinct().count() === nBase + nPlanted)
  }

  test("the SQL front-door view equals the Scala ledger") {
    Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
      .createOrReplaceTempView("sqlfront_docs")
    graft.sources.IndexSql.registerCurationLedger(
      spark, "sqlfront_curation", "sqlfront_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, outcome FROM sqlfront_curation")
      .as[(Long, String)].collect().toMap
    val viaScala = graft.operators.Pipeline.curateOn(
        Tables.documents(spark, TestSpark.sf0001).select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("outcome"))
      .as[(Long, String)].collect().toMap
    assert(viaSql === viaScala)
  }

  test("the plan is scan-fused and never corpus-quadratic") {
    val plan = Pipeline.curate(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "pipeline plan contains a cartesian product")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "pipeline plan contains a nested-loop join")
    // the fuzzy ledger assembly (near-loser + contamination joins on top
    // of the keeper frame) must stay key-joined too
    val fuzzyPlan = Pipeline.curateFuzzy(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(!fuzzyPlan.contains("CartesianProduct"),
      "fuzzy pipeline plan contains a cartesian product")
    assert(!fuzzyPlan.contains("BroadcastNestedLoopJoin"),
      "fuzzy pipeline plan contains a nested-loop join")
  }

  test("fuzzy stage equals standalone minHashNearDups + clusterPairs on the same survivor set") {
    val base = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    val fuzzy = Pipeline.curateOn(base, plantDups = true,
      nearDedup = true, plantNearDups = true).cache()
    val exact = Pipeline.curateOn(base, plantDups = true,
      plantNearDups = true)
    // the survivor set entering the fuzzy stage = exact-dedup survivors,
    // read off the NON-fuzzy ledger of the same planted input
    val survivorIds = exact
      .filter(col("outcome").isin("dropped_contaminated", "train", "eval"))
      .select("doc_id").as[Long].collect().toSet
    // rebuild the planted frame the same way curateOn does, restricted
    // to the survivors, and run the standalone stage
    val planted = base
      .unionByName(base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text")))
      .unionByName(base.filter(col("doc_id") % 11 === 3)
        .select((col("doc_id") + lit(2000000L)).as("doc_id"),
          concat(col("text"), lit(" plantedneardup")).as("text")))
    val survivorTexts = planted.filter(col("doc_id").isInCollection(survivorIds))
    val expectedLosers = graft.operators.Dedup.clusterPairs(
        graft.operators.Dedup.minHashNearDupsOn(survivorTexts)
          .select(col("doc_a"), col("doc_b")))
      .filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id").as[Long].collect().toSet
    val gotLosers = fuzzy.filter(col("outcome") === "dropped_near_duplicate")
      .select("doc_id").as[Long].collect().toSet
    assert(gotLosers === expectedLosers,
      "pipeline fuzzy stage diverged from the standalone near-dedup operators")
    // the planted near-dup class is non-vacuous and plants always lose
    // the min-representative race to their original
    val plantedLosers = gotLosers.filter(_ >= 2000000L)
    assert(plantedLosers.nonEmpty, "no planted near-dup was dropped")
    val outcomes = fuzzy.select(col("doc_id"), col("outcome"))
      .as[(Long, String)].collect().toMap
    // a planted copy can never displace its original: min-representative
    // keeps the smaller id, and the copy is edge-connected to its
    // original — so a copy surviving to train/eval while the original
    // dropped as a near-dup would mean the stage broke transitivity
    outcomes.foreach { case (pid, o) =>
      if (pid >= 2000000L && (o == "train" || o == "eval"))
        assert(outcomes(pid - 2000000L) !== "dropped_near_duplicate",
          s"planted copy $pid survived while its original dropped as near-dup")
    }
    // and every non-fuzzy outcome class is unchanged in spirit: the
    // fuzzy ledger still covers every input exactly once
    assert(fuzzy.count() === planted.count())
    assert(fuzzy.select("doc_id").distinct().count() === planted.count())
    fuzzy.unpersist()
  }

  test("verbatim stage equals the standalone span-cut composition on the same survivor set") {
    val base = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    val verb = Pipeline.curateOn(base, plantDups = true,
      verbatimCuts = true).cache()
    val plain = Pipeline.curateOn(base, plantDups = true).cache()
    // the set entering the cut = exact-dedup survivors; stage 3 is
    // identical in both ledgers, so read it off the plain one
    val survivorIds = plain
      .filter(col("outcome").isin("dropped_contaminated", "train", "eval"))
      .select("doc_id").as[Long].collect().toSet
    val planted = base.unionByName(base.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text")))
    val survivorTexts = planted.filter(col("doc_id").isInCollection(survivorIds))
    // the standalone oracle-verified composition over the same set
    val expected = graft.operators.Dedup.applyVerbatimCuts(survivorTexts,
        graft.operators.Dedup.verbatimRunSpansOn(survivorTexts))
      .select(col("doc_id"), col("n_tokens_removed"))
      .as[(Long, Long)].collect().toMap
    val got = verb.filter(col("doc_id").isInCollection(survivorIds))
      .select(col("doc_id"), col("n_tokens_removed"))
      .as[(Long, Long)].collect().toMap
    assert(got === expected,
      "pipeline verbatim stage diverged from the standalone span-cut operators")
    assert(expected.values.exists(_ > 0), "no span was cut — the stage is vacuous")
    // docs that never reached the cut carry exactly 0
    assert(verb.filter(!col("doc_id").isInCollection(survivorIds))
      .filter(col("n_tokens_removed") =!= 0L).count() === 0L)
    // outcome flips are confined to the post-cut stages: lang / quality /
    // dedup attribution is decided before the cut and must be identical
    val flips = plain.select(col("doc_id"), col("outcome").as("o1"))
      .join(verb.select(col("doc_id"), col("outcome").as("o2")), "doc_id")
      .filter(col("o1") =!= col("o2"))
      .select(col("o1"), col("o2")).distinct()
      .as[(String, String)].collect().toSet
    val postCut = Set("dropped_contaminated", "train", "eval")
    assert(flips.forall { case (a, b) => postCut(a) && postCut(b) },
      s"a pre-cut stage's attribution flipped under the verbatim stage: $flips")
    // the cut-instead-of-drop payoff is non-vacuous on the fixture:
    // at least one doc whose only leak was a cut span returns to train
    assert(flips.contains(("dropped_contaminated", "train")),
      "no contaminated doc was rescued by cutting its leaking span")
    verb.unpersist(); plain.unpersist()
  }

  test("ppl stage buckets exactly the final survivors by the standalone LM tertiles") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val base = docs.select(col("doc_id"), col("text"))
    val ref = docs.filter(col("lang") === "en").select(col("text"))
    val led = Pipeline.curateOn(base, plantDups = true,
      pplRef = Some(ref), pplVocab = 16).cache()
    val plain = Pipeline.curateOn(base, plantDups = true)
    // the ledger under the bucket column is byte-identical to the plain one
    assert(led.select(col("doc_id"), col("n_tokens"), col("outcome"))
      .as[(Long, Long, String)].collect().toSet ===
      plain.as[(Long, Long, String)].collect().toSet,
      "adding the ppl stage must not perturb the ledger itself")
    // standalone tertiles over the final survivor subset
    val survivorIds = led.filter(col("outcome").isin("train", "eval"))
      .select("doc_id").as[Long].collect().toSet
    val expected = graft.operators.Lm.bucketsFromScores(
        graft.operators.Lm.lmScoreOn(
          base.filter(col("doc_id").isInCollection(survivorIds)), ref, 16)
          .select(col("doc_id"), col("bits_per_100")))
      .select(col("doc_id"), col("bucket"))
      .as[(Long, String)].collect().toMap
    val got = led.filter(col("outcome").isin("train", "eval"))
      .select(col("doc_id"), col("ppl_bucket"))
      .as[(Long, String)].collect().toMap
    assert(got === expected,
      "pipeline ppl stage diverged from the standalone lmScore + tertile spelling")
    assert(got.values.toSet === Set("head", "middle", "tail"),
      "a ppl tertile is vacuous on the fixture")
    // dropped docs carry NULL — they were never scored
    assert(led.filter(!col("outcome").isin("train", "eval"))
      .filter(col("ppl_bucket").isNotNull).count() === 0L)
    led.unpersist()
  }

  test("classifier stage drops exactly the bottom train tertile by the standalone NB score") {
    import graft.operators.Classifier
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val base = docs.select(col("doc_id"), col("text"))
    val ref = docs.filter(col("lang") === "en").select(col("text"))
    val led = Pipeline.curateOn(base, plantDups = true, contamMinPct = 40L,
      clfRef = Some(ref), clfVocab = 16).cache()
    val plain = Pipeline.curateOn(base, plantDups = true, contamMinPct = 40L)
    // outside the re-attributed train rows the ledger is untouched, and
    // every dropped_classifier row was train in the plain ledger
    val plainMap = plain.as[(Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val ledRows = led.as[(Long, Long, String)].collect()
    assert(ledRows.length === plainMap.size,
      "classifier ledger must stay one row per doc")
    ledRows.foreach { case (id, n, out) =>
      val (pn, pout) = plainMap(id)
      assert(n === pn)
      if (out == "dropped_classifier")
        assert(pout === "train",
          s"doc $id dropped by the classifier was not a kept train doc")
      else assert(out === pout,
        s"doc $id changed outcome $pout -> $out outside the classifier stage")
    }
    // the dropped set is EXACTLY the bottom tertile of the plain
    // ledger's train docs under the standalone NB score (offset
    // per-token spelling, (value, doc_id) rank — bucketsFromScores'
    // contract)
    val trainIds = plainMap.filter(_._2._2 == "train").keySet
    val planted = base.unionByName(
      base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val scores = Classifier.nbScoreOn(
        planted.filter(col("doc_id").isInCollection(trainIds)),
        Classifier.nbWeightsOn(ref, planted.select(col("text")), 16))
      .select(col("doc_id"),
        expr("(score * 100 + 10000 * n_tokens) DIV n_tokens").as("spt"))
      .as[(Long, Long)].collect()
    val expectedDrop = scores.sortBy { case (id, spt) => (spt, id) }
      .take(scores.length / 3).map(_._1).toSet
    val gotDrop = ledRows.filter(_._3 == "dropped_classifier").map(_._1).toSet
    assert(gotDrop === expectedDrop,
      "classifier stage diverged from the standalone NB bottom tertile")
    assert(gotDrop.nonEmpty && trainIds.diff(gotDrop).nonEmpty,
      "the classifier gate must be non-vacuous in both directions")
    led.unpersist()
  }

  test("checkpointDir spelling yields the identical ledger to the in-memory persist") {
    val base = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("pipeline-ckpt").toString
    val viaCkpt = Pipeline.curateOn(base, plantDups = true,
        checkpointDir = Some(s"$dir/keeper"))
      .select(col("doc_id"), col("n_tokens"), col("outcome"))
      .as[(Long, Long, String)].collect().toSet
    val viaPersist = Pipeline.curateOn(base, plantDups = true)
      .select(col("doc_id"), col("n_tokens"), col("outcome"))
      .as[(Long, Long, String)].collect().toSet
    assert(viaCkpt === viaPersist,
      "parquet-checkpointed pipeline diverged from the persisted one")
  }

  test("contamMinPct: low-coverage contaminated docs survive at a threshold, none gain drops") {
    val base = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    def dropsAt(pct: Long): Set[Long] =
      Pipeline.curateOn(base, plantDups = true, contamMinPct = pct)
        .filter(col("outcome") === "dropped_contaminated")
        .select("doc_id").as[Long].collect().toSet
    val blunt = dropsAt(0L)
    val thresholded = dropsAt(40L)
    assert(thresholded.subsetOf(blunt),
      "coverage thresholding can only RELAX the blunt any-shared-n-gram rule")
    assert((blunt -- thresholded).nonEmpty,
      "no low-coverage doc survived at pct<threshold — the planted case is vacuous")
    // survivors-by-threshold land back in train (they were train docs
    // by construction of the contamination stage)
    val survived = blunt -- thresholded
    val covLedger = Pipeline.curateOn(base, plantDups = true, contamMinPct = 40L)
      .filter(col("doc_id").isInCollection(survived))
      .select("outcome").distinct().as[String].collect().toSet
    assert(covLedger === Set("train"))
  }

  test("blocklist stage: attribution between lang and quality, default off is identical") {
    import graft.operators.{Profile, TextAnalysis, TextOps}
    val base = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    val blocked = Pipeline.curateOn(base, plantDups = true,
      blocklist = Profile.driverBlocklist)
      .select("doc_id", "outcome").as[(Long, String)].collect().toMap
    // expected dropped_blocklist set: exactly the target-lang docs (incl.
    // planted copies) holding a blocklist token — quality never consulted
    val planted = base.unionByName(base.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text")))
    val expected = planted
      .filter(TextAnalysis.langGuess(col("text")) === "en")
      .filter(arrays_overlap(TextOps.tokens(lower(col("text"))),
        array(Profile.driverBlocklist.map(t => lit(t)): _*)))
      .select("doc_id").as[Long].collect().toSet
    assert(expected.nonEmpty, "vacuous: no en doc hits the driver blocklist")
    assert(blocked.filter(_._2 == "dropped_blocklist").keySet === expected)
    // empty blocklist is byte-identical to the base ledger
    val off = Pipeline.curateOn(base, plantDups = true)
      .select("doc_id", "outcome").as[(Long, String)].collect().toMap
    val offDefault = Pipeline.curateOn(base, plantDups = true,
      blocklist = Seq.empty)
      .select("doc_id", "outcome").as[(Long, String)].collect().toMap
    assert(off === offDefault)
    // switching the stage on never changes a non-blocked doc's LANG
    // attribution (stage 1 precedes 1b)
    assert(blocked.filter(_._2 == "dropped_lang") === off.filter(_._2 == "dropped_lang"))
  }

  test("incremental curation: init == curateOn, increment == rebuild restricted, replay adds nothing") {
    import graft.sources.CurateState
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select($"doc_id", $"text")
    val b1 = docs.filter($"doc_id" < 25)
    val b2 = docs.filter($"doc_id" >= 25)
      .unionByName(b1.filter($"doc_id" % 7 === 0)
        .select(($"doc_id" + 1000000L).as("doc_id"), $"text"))
      .unionByName(b1.filter($"doc_id" % 11 === 3)
        .select(($"doc_id" + 2000000L).as("doc_id"),
          concat($"text", lit(" plantedneardup")).as("text")))
    val dir = java.nio.file.Files.createTempDirectory("curate-state").toString + "/s"

    // init against the EMPTY state degrades to exactly the full pipeline
    val init = CurateState.init(b1, dir, contamMinPct = 40L)
      .as[(Long, Long, String)].collect().toSet
    val alone = Pipeline.curateOn(b1, nearDedup = true, contamMinPct = 40L)
      .as[(Long, Long, String)].collect().toSet
    assert(init === alone && init.nonEmpty,
      "init ledger diverged from the full pipeline over the same batch")

    // the equality contract: the increment's ledger == the full-rebuild
    // ledger over batch1 ∪ batch2 restricted to batch2's rows
    val incr = CurateState.increment(b2, dir, "b2")
      .as[(Long, Long, String)].collect().toSet
    val rebuild = Pipeline.curateOn(b1.unionByName(b2),
        nearDedup = true, contamMinPct = 40L)
      .filter($"doc_id" >= 25)
      .as[(Long, Long, String)].collect().toSet
    assert(incr === rebuild && incr.nonEmpty,
      "incremental ledger diverged from the restricted full rebuild")

    // the cross-state gates fire non-vacuously: a planted exact copy of
    // a committed doc must die on the STORED fps, a planted near-dup on
    // the STORED MinHash index (their originals are in batch1 only)
    assert(incr.exists(r => r._1 >= 1000000L && r._1 < 2000000L &&
        r._3 == "dropped_duplicate"),
      "no planted cross-state exact duplicate was dropped by the stored-fps gate")
    assert(incr.exists(r => r._1 >= 2000000L && r._3 == "dropped_near_duplicate"),
      "no planted cross-state near-dup was dropped through the stored index")

    // the dry-run judge under the batch's own label reproduces its
    // commit-time verdicts (the replay view — and the Plans-tracked
    // spelling, so the tracked plan cannot drift from the commit)
    val preview = CurateState.judge(b2, dir, "b2")
      .as[(Long, Long, String)].collect().toSet
    assert(preview === incr, "dry-run judge diverged from the committed ledger")

    // replay the SAME (batch, label): identical ledger, zero state growth
    def stateCounts() = (
      spark.read.parquet(s"$dir/fps").count(),
      spark.read.parquet(s"$dir/evalgrams").count(),
      spark.read.parquet(s"$dir/neardup/shingles").count(),
      CurateState.ledger(spark, dir).count())
    val before = stateCounts()
    val replay = CurateState.increment(b2, dir, "b2")
      .as[(Long, Long, String)].collect().toSet
    assert(replay === incr, "replayed increment changed the ledger")
    assert(stateCounts() === before, "replayed increment grew the state")
    assert(before._4 === b1.count() + b2.count(),
      "assembled ledger must cover every committed doc exactly once")
  }

  test("retro-decontamination report and state compaction hold their contracts") {
    import graft.sources.{CurateState, DedupIndexes}
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select($"doc_id", $"text")
    val b1 = docs.filter($"doc_id" < 25)
    val b2 = docs.filter($"doc_id" >= 25)
      .unionByName(b1.filter($"doc_id" % 7 === 0)
        .select(($"doc_id" + 1000000L).as("doc_id"), $"text"))
    val root = java.nio.file.Files.createTempDirectory("curate-state2").toString
    val dir = s"$root/s"
    CurateState.init(b1, dir, contamMinPct = 40L)

    // RETRO PLANT — the asymmetry made non-vacuous: an EVAL doc in
    // batch2 built from a committed batch1 TRAIN doc's text. The full
    // prefix keeps the original's gram coverage at 100% (>= the 40%
    // threshold); ~40% junk padding pushes Jaccard under 0.8 so the
    // plant survives the near-dup gate; a driver-picked trailing
    // variant lands its fingerprint in the eval split. The original
    // was committed train against a smaller eval universe — after this
    // batch, only a rebuild would drop it.
    val (origId, origText) = CurateState.ledger(spark, dir)
      .filter($"outcome" === "train")
      .join(b1, Seq("doc_id"))
      .orderBy($"doc_id").select($"doc_id", $"text")
      .as[(Long, String)].head()
    def fpHex(t: String): String = {
      val canon = t.toLowerCase.trim.replaceAll("\\s+", " ")
      java.security.MessageDigest.getInstance("MD5")
        .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val toks = origText.split(" ")
    val junk = (0 until math.ceil(toks.length * 0.4).toInt)
      .map(k => if (k % 4 == 0) "the" else s"pad${k}x")
    val padded = (toks ++ junk).mkString(" ")
    val retroText = (0 until 64).map(i => s"$padded v${i}x")
      .find(t => fpHex(t) >= "cc")
      .getOrElse(fail("no padding variant landed an eval fingerprint"))
    val b2p = b2.unionByName(Seq((9000000L, retroText)).toDF("doc_id", "text"))
    val all = b1.unionByName(b2p)
    CurateState.increment(b2p, dir, "b2")
    assert(CurateState.ledger(spark, dir)
        .filter($"doc_id" === 9000000L).select($"outcome")
        .as[String].head() === "eval",
      "the retro plant must commit as an eval doc (not die earlier)")

    // the report: flagged == exactly what a FULL REBUILD would newly
    // attribute dropped_contaminated among the committed train rows —
    // the retro asymmetry, measured. Later-batch train docs were judged
    // against the same universe the report reads, so they can never
    // flag (the invariant is implied by the equality).
    val committedTrain = CurateState.ledger(spark, dir)
      .filter($"outcome" === "train").select($"doc_id")
    val trainSet = committedTrain.as[Long].collect().toSet
    val report = CurateState.retroContamination(
        all.join(committedTrain, Seq("doc_id")), dir)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(report.map(_._1).toSet === trainSet,
      "report must cover every committed train doc exactly once")
    val flagged = report.filter(_._5 == 1L).map(_._1).toSet
    val rebuildDropped = Pipeline.curateOn(all,
        nearDedup = true, contamMinPct = 40L)
      .filter($"outcome" === "dropped_contaminated")
      .select($"doc_id").as[Long].collect().toSet
    info(s"retro report: ${flagged.size} flagged of ${trainSet.size} committed train docs")
    assert(flagged === (rebuildDropped & trainSet),
      "flagged set must equal rebuild-dropped ∩ committed-train")
    assert(flagged.contains(origId),
      "the planted retro case (train doc fully covered by a later eval doc) must flag")

    // compaction: single base ingest everywhere, assembled ledger
    // preserved, and a FRESH probe batch judges identically against the
    // compacted state (the fps/index/evalgram identity is intact) —
    // and the RESULT is the pre-compaction two-axis retro verdict
    // (measured while the labels still exist): the contamination axis
    // must report exactly the flagged set derived above, so the
    // rebuild-due signal rides in the operator's face
    val audit = CurateState.compactTo(spark, dir, s"$root/c",
      trainDocs = Some(all.join(committedTrain, Seq("doc_id"))))
    assert(audit.contamFlagged === Some(flagged.size.toLong),
      "compaction must return the retro-contamination flagged count it measured")
    assert(audit.rebuildDue,
      "the planted retro contamination must surface as rebuild-due at compaction")
    for (sub <- Seq("fps", "evalgrams", "ledger"))
      assert(spark.read.parquet(s"$root/c/$sub")
          .select($"ingest").distinct().as[String].collect().toSeq === Seq("base"),
        s"compacted $sub must hold a single base ingest")
    assert(CurateState.ledger(spark, s"$root/c")
        .as[(Long, Long, String)].collect().toSet ===
      CurateState.ledger(spark, dir).as[(Long, Long, String)].collect().toSet,
      "compaction must carry the assembled ledger verbatim")
    val b3 = b1.select(($"doc_id" + 5000000L).as("doc_id"), $"text")
      .unionByName(docs.filter($"doc_id" >= 25)
        .select(($"doc_id" + 6000000L).as("doc_id"),
          concat($"text", lit(" plantedneardup")).as("text")))
    val probeSrc = CurateState.judge(b3, dir, "b3")
      .as[(Long, Long, String)].collect().toSet
    val probeCmp = CurateState.judge(b3, s"$root/c", "b3")
      .as[(Long, Long, String)].collect().toSet
    assert(probeSrc === probeCmp && probeSrc.nonEmpty,
      "fresh batch judged differently against the compacted state")
    assert(probeSrc.exists(_._3 == "dropped_duplicate") &&
        probeSrc.exists(_._3 == "dropped_near_duplicate"),
      "the compaction probe must exercise both identity gates non-vacuously")
  }

  test("retro-near-dup report: flagged == rebuild near-dropped ∩ committed-kept on cross-batch bridges") {
    import graft.sources.CurateState
    import org.apache.spark.sql.functions.{array_join, concat, size, slice}
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select($"doc_id", $"text")
    // the harness's bridge-trio construction (CurateState.retroNdBatches)
    // over a denser source set (d % 10 == 7 -> ~5 trios at sf0.001):
    // B1a = X++M and B1b = M++Y commit together (J ≈ 0.73 < 0.8, both
    // kept); the bridge C = M arrives in batch 2 and is a near-dup of
    // BOTH (J ≈ 0.83 / 0.86) — a full rebuild merges {B1a, B1b, C} and
    // keeps only B1a, so committed B1b is the rep the rebuild drops
    val toks = graft.operators.TextOps.tokens($"text")
    val src = docs.filter($"doc_id" % 10 === 7 && size(toks) >= 54)
    val b1a = src.select(($"doc_id" * 2 + 5000000L).as("doc_id"),
      array_join(concat(slice(toks, 41, 8), slice(toks, 1, 40)), " ").as("text"))
    val b1b = src.select(($"doc_id" * 2 + 5000001L).as("doc_id"),
      array_join(concat(slice(toks, 1, 40), slice(toks, 49, 6)), " ").as("text"))
    val bridge = src.select(($"doc_id" + 6000000L).as("doc_id"),
      array_join(slice(toks, 1, 40), " ").as("text"))
    val b1 = docs.filter($"doc_id" < 25).unionByName(b1a).unionByName(b1b)
    val b2 = docs.filter($"doc_id" >= 25).unionByName(bridge)
    val dir = java.nio.file.Files.createTempDirectory("retro-nd").toString + "/s"
    // decontamination off (cov_pct can never reach 101) — the near-dup
    // axis isolated, exactly the harness's state config
    CurateState.init(b1, dir, contamMinPct = 101L)
    CurateState.increment(b2, dir, "b2")

    val kept = CurateState.ledger(spark, dir)
      .filter($"outcome".isin("train", "eval"))
      .select($"doc_id").as[Long].collect().toSet
    val report = CurateState.retroNearDup(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(report.map(_._1).toSet === kept,
      "report must cover every committed kept doc exactly once")
    assert(report.length === kept.size)

    // the contract: flagged == exactly the kept docs a FULL REBUILD's
    // near-dup stage would drop (component merge through the bridges)
    val flagged = report.filter(_._3 == 1L).map(_._1).toSet
    val rebuildNearDropped = Pipeline.curateOn(b1.unionByName(b2),
        nearDedup = true, contamMinPct = 101L)
      .filter($"outcome" === "dropped_near_duplicate")
      .select($"doc_id").as[Long].collect().toSet
    info(s"retro near-dup: ${flagged.size} flagged of ${kept.size} kept")
    assert(flagged === (rebuildNearDropped & kept),
      "flagged set must equal rebuild-near-dropped ∩ committed-kept")
    assert(flagged.nonEmpty,
      "the planted cross-batch bridge trios must produce at least one flag")
    // the bridge shape specifically: a flagged B1b whose rebuild rep is
    // its paired B1a (ids 2d+5000001 -> 2d+5000000)
    val repOf = report.map(r => r._1 -> r._2).toMap
    assert(flagged.exists(id => id >= 5000001L && id < 6000000L &&
        (id - 5000001L) % 2 == 0 && repOf(id) == id - 1),
      "no flagged committed B1b resolves to its paired B1a as the rebuild rep")
    // un-bridged kept docs keep themselves as rep
    assert(report.filter(_._3 == 0L).forall(r => r._2 == r._1),
      "unflagged kept docs must be their own rebuild rep")

    // compaction carries the near-dup axis of the same verdict: the
    // returned count equals the report's flagged set (no train text
    // passed -> the contamination axis is honestly absent, not zero)
    val audit = CurateState.compactTo(spark, dir,
      java.nio.file.Files.createTempDirectory("retro-nd-c").toString + "/c")
    assert(audit.nearDupFlagged === flagged.size.toLong,
      "compaction must return the retro-near-dup flagged count it measured")
    assert(audit.contamFlagged === None && audit.rebuildDue,
      "bridge flags alone must make the compaction verdict rebuild-due")
  }

  test("nTokensCol: BPE-faithful ledger — outcomes unchanged, stats roll up " +
      "exactly the per-doc tokenizer counts, oracles untouched on the default") {
    import graft.operators.{Bpe, Pipeline, TextOps}
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select($"doc_id", $"text")
    val merges = Bpe.learnMergesOn(docs.select($"text"), 4)
      .orderBy(col("step")).as[(Int, String, String, Long)].collect()
      .map(m => (m._2, m._3)).toSeq
    val bpeCount = size(flatten(transform(TextOps.tokens(col("text")),
      w => Bpe.segmentWith(w, merges)))).cast("long")
    val default0 = Pipeline.curateOn(docs)
      .select($"doc_id", $"n_tokens", $"outcome")
      .as[(Long, Long, String)].collect()
    val optioned = Pipeline.curateOn(docs, nTokensCol = Some(bpeCount))
      .select($"doc_id", $"n_tokens", $"outcome")
      .as[(Long, Long, String)].collect()
    // outcomes byte-identical — the option changes the REPORTING
    // measure, never a gate
    assert(optioned.map(r => r._1 -> r._3).toMap ===
      default0.map(r => r._1 -> r._3).toMap,
      "nTokensCol must not change any outcome")
    // the optioned ledger's n_tokens IS the per-doc tokenizer count
    val bpePerDoc = docs.select($"doc_id", bpeCount.as("n_bpe"))
      .as[(Long, Long)].collect().toMap
    optioned.foreach { case (id, n, _) =>
      assert(n === bpePerDoc(id), s"doc $id: ledger n_tokens $n != BPE count ${bpePerDoc(id)}")
    }
    // BPE and whitespace measures genuinely differ on this corpus — the
    // equality above is non-vacuous
    assert(optioned.map(_._2).sum !== default0.map(_._2).sum,
      "fixture must make the tokenizer measure differ from whitespace")
    // the composable contract: token-weighted stage-loss stats over the
    // optioned ledger == the default outcomes rolled up against the
    // SAME per-doc counts downstream packing would use — no recount
    val statsOpt = Pipeline.curateStatsOn(
        Pipeline.curateOn(docs, nTokensCol = Some(bpeCount)))
      .as[(String, Long, Long)].collect().toSet
    val statsExpected = default0.groupBy(_._3).map { case (o, rows) =>
      (o, rows.length.toLong, rows.map(r => bpePerDoc(r._1)).sum)
    }.toSet
    assert(statsOpt === statsExpected,
      "curateStatsOn over the BPE-faithful ledger must equal the rollup " +
        "of per-doc tokenizer counts")
    // the mixed-unit guard fails loudly
    val err = intercept[IllegalArgumentException] {
      Pipeline.curateOn(docs, verbatimCuts = true, nTokensCol = Some(bpeCount))
    }
    assert(err.getMessage.contains("must not mix units"))
  }

  test("the full-recipe flagship is non-vacuous on every stage it composes") {
    import graft.operators.Pipeline
    // sf0.01: the 40% coverage decontamination needs the denser corpus
    // to fire (50 docs share too few grams to reach the threshold —
    // at sf0.01 it drops 3 train docs, the q_pipeline_curate_cov number)
    val led = Pipeline.curateFull(spark, TestSpark.sf001)
      .select($"doc_id", $"n_tokens", $"outcome", $"n_tokens_removed",
        $"ppl_bucket")
      .as[(Long, Long, String, Long, Option[String])].collect()
    val classes = led.map(_._3).toSet
    // every composed stage must actually FIRE —
    // a vacuous stage in the flagship would hash-check green while
    // testing nothing (dropped_lang/quality come from the fixture's
    // natural non-en/degenerate docs; dups and near-dups are planted;
    // the classifier acts on the survivor tail)
    Seq("dropped_lang", "dropped_quality", "dropped_duplicate",
        "dropped_near_duplicate",
        "dropped_classifier", "train", "eval").foreach { c =>
      assert(classes.contains(c), s"flagship outcome class '$c' is vacuous")
    }
    assert(led.exists(_._4 > 0L), "the verbatim stage must cut something")
    // the contamination stage is exercised through its INTERACTION with
    // the verbatim stage: on this fixture every doc the 40%-coverage
    // rule would drop is RESCUED because the cut removes exactly the
    // leaked spans before decontamination judges the cleaned text —
    // assert the rescue, not the class: the verbatim-less twin DOES
    // drop contaminated docs, and every one of them survives (or dies
    // to a LATER stage) in the flagship
    val noVerbatim = Pipeline.curateOn(
        Tables.documents(spark, TestSpark.sf001).select($"doc_id", $"text"),
        plantDups = true, nearDedup = true, plantNearDups = true,
        contamMinPct = 40L, plantQuotes = true)
      .filter($"outcome" === "dropped_contaminated")
      .select($"doc_id").as[Long].collect().toSet
    assert(noVerbatim.nonEmpty,
      "the verbatim-less twin must drop contaminated docs — else the " +
        "rescue assertion below is vacuous")
    val flagOutcome = led.map(r => r._1 -> r._3).toMap
    noVerbatim.foreach { id =>
      assert(flagOutcome(id) != "dropped_contaminated",
        s"doc $id: the flagship's verbatim cut must rescue it from " +
          "coverage contamination (it judges the cleaned text)")
    }
    val buckets = led.flatMap(_._5).toSet
    assert(buckets === Set("head", "middle", "tail"),
      s"all three ppl buckets must appear, got $buckets")
    // dropped docs never carry a bucket; surviving train/eval always do
    led.foreach { case (id, _, o, _, pb) =>
      if (o == "train" || o == "eval")
        assert(pb.nonEmpty, s"doc $id: surviving $o doc must carry a ppl bucket")
      else assert(pb.isEmpty, s"doc $id: dropped doc must not carry a bucket")
    }
    // one ledger row per input doc (base + all three plant classes)
    val docs = Tables.documents(spark, TestSpark.sf001)
    val expected = docs.count() +
      docs.filter($"doc_id" % 7 === 0).count() +
      docs.filter($"doc_id" % 11 === 3).count() +
      docs.filter($"doc_id" % 13 === 5).count()
    assert(led.length.toLong === expected)
    assert(led.map(_._1).distinct.length === led.length)
  }

  test("plantDups fails loudly when base doc_ids collide with the planted range") {
    val bad = Seq((999999L, "safe doc"), (1000001L, "colliding doc"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      Pipeline.curateOn(bad, plantDups = true).collect()
    }
    assert(e.getMessage.toLowerCase.contains("collision")
        || e.getCause != null && e.getCause.getMessage.toLowerCase.contains("collision"),
      s"expected the plant-collision guard to fire, got: ${e.getMessage}")
  }
}
