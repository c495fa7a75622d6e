package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{AsOf, Dedup, Relational}
import graft.sources.DedupIndexes

/** Scale-sensitivity smoke over the SHIPPED operator entry points:
  * replicates the documents/events tables Nx in memory and times the
  * production pipelines at growing input sizes. Near-linear growth
  * validates the bucketed/capped designs; quadratic growth would expose
  * an all-pairs plan hiding behind small test data.
  *
  * Covered per factor:
  *   - [[Dedup.minHashNearDupsOn]] (banded LSH + exact verify);
  *   - [[Dedup.clusterPairs]] over the verified pairs (pairs
  *     pre-materialized: times only the propagation loop — linear
  *     components, constant topology ⇒ rounds must stay constant);
  *   - [[Dedup.incrementalNew]] with a factor-sized corpus and a
  *     base-sized delivery batch (time tracks the corpus scan);
  *   - [[Dedup.incrementalNearDup]] over the same corpus/batch split
  *     (batch probes the corpus band index — linear in the corpus,
  *     never corpus×corpus);
  *   - [[graft.operators.TextAnalysis.contaminationOn]] (eval side
  *     collapses to a distinct n-gram set ⇒ bounded by the train
  *     inverted index);
  *   - [[graft.operators.Pipeline.curateOn]] over the VERBATIM-replicated
  *     (duplication-shaped) corpus: dedup collapses each factor-sized
  *     clique to one keeper, so the survivor-side outcome counts are
  *     asserted IDENTICAL across factors and dropped_duplicate must
  *     equal (factor-1) x keepers — the pipeline's expensive tail
  *     (split + decontamination) is constant while only the scan-fused
  *     projections and fp exchange grow;
  *   - [[Dedup.ngramJaccardPairsOn]] — the CAPPED production path, not
  *     the raw inverted index;
  *   - the same path under an ADVERSARIAL boilerplate shingle stamped
  *     into every doc, with maxDocFreq below its document frequency:
  *     without the stop-shingle cap this one shingle alone contributes
  *     (500·factor)² candidate partials; bounded growth here is the
  *     cap doing its job;
  *   - [[Dedup.verbatimRunPairsOn]] plain and under the same stamped
  *     boilerplate with maxOccFreq below its occurrence count — the
  *     preamble shingle alone would otherwise contribute (500·factor)²
  *     position-pair rows to the run detector;
  *   - [[Dedup.applyVerbatimCuts]] end to end (detector + interval merge
  *     + per-row cut) — the removal pass must track the detector's
  *     linear growth, never add a super-linear term of its own
  *   - [[Dedup.stripCommonLines]] (hashKey spelling) under planted
  *     header/footer boilerplate whose doc frequency grows with the
  *     factor — one agg + one join, so hot lines cost one aggregate row
  *     each, never a blow-up;
  *   - [[Dedup.incrementalVerbatimRuns]] with a factor-sized corpus and
  *     a base-sized delivery batch (time tracks the corpus positional
  *     index build — linear, never corpus²);
  *   - the STORED-index spellings of both incremental probes
  *     ([[graft.sources.DedupIndexes]]): the factor-sized corpus's index
  *     is written once UNTIMED (the ingest-time cost the layout
  *     amortizes), then the base-sized batch probes it from parquet —
  *     probe time has the stored-index scan as its linear ceiling and
  *     must sit at or below the inline spelling that re-derives the same
  *     index from text, with identical row counts; the APPEND of the
  *     base-sized batch is timed too and must stay ~flat across factors
  *     (append is pure batch work — corpus size never enters it);
  *   - the stored trigram grep probe ([[graft.sources.TextIndexes]])
  *     vs the inline corpus-scan grep, row-count-identical by
  *     assertion and under the stored-probe budget at every factor;
  *   - [[graft.engine.GrepEngine.contextGrep]] (-C) over a constant
  *     file count with factor-growing files — the one-window-per-file
  *     spelling must grow near-linearly, never collapse to a
  *     single-partition sort;
  *   - [[graft.operators.Clustering.clusterPruneOn]] over the
  *     replicated embedding corpus (quantizer warmed untimed — the
  *     stored-artifact cost): scan-fused assignment + cell-keyed rank,
  *     constant nlist ⇒ near-linear;
  *   - the stored ANN probes ([[graft.sources.SimilarityIndexes]]):
  *     LSH sketch index and IVF index written once per factor over a
  *     replicated embedding corpus (circularly shifted copies — same
  *     isotropic geometry, no planted clusters), probed by a base-sized
  *     query set — probe time's linear ceiling is bucket/cell occupancy
  *     growth, never corpus²;
  *   - salted vs single-window sessionization with one hot user holding
  *     ~factor·1500× the median user's events — the power-law tail the
  *     salted two-phase spelling exists for;
  *   - banded vs plain as-of join over the same skewed events (orders
  *     unreplicated: the skew lives on the probe side);
  *   - banded vs plain exact ntile over orders replicated onto ONE
  *     priority — the whole hot partition lands in a single window task
  *     for the plain spelling, while the banded one keeps its per-band
  *     task bound as the partition grows.
  *
  * Usage: `sbt 'runMain graft.ScaleSmoke [sfDir] [factors]'` — prints
  * one JSON line per factor with rows and seconds.
  *
  * READING THE NUMBERS: all factors of one invocation share a JVM, so
  * the last factor's absolute seconds carry the earlier factors'
  * accumulated old-gen/JIT state — measured r10: factor 16 inside a
  * `1,4,16` run read 3-5x the SAME code's fresh-JVM `16`-alone numbers
  * (line_dedup 21.3 s vs 4.1 s, verbatim_clean 17.6 s vs 6.7 s), while
  * the ratio-based assertions (stored-vs-inline, which compare two
  * timings from the SAME JVM state) stayed stable across both shapes.
  * Judge growth (the linear-scaling claims) only across same-shape
  * invocations — factor N alone vs factor 4N alone; the multi-factor
  * spelling is for the ratio assertions and the drift canary in one
  * pass, not for cross-factor absolute comparisons.
  */
object ScaleSmoke {

  /** The stored-probe budget relative to its inline twin — the
    * stored-index layout's whole reason to exist is NOT paying the
    * per-delivery index re-derivation, so a probe past this multiple
    * of inline fails the sweep (1.3x absorbs single-sample GC noise;
    * a real regression, e.g. losing partition pruning on the stored
    * read, lands well past it).
    */
  val StoredProbeSlack = 1.3

  /** documents replicated `factor`x: fresh doc_ids per copy (strided by
    * max(doc_id)+1, collision-free for any id distribution), every token
    * suffixed per copy so replicas share no shingles with each other or
    * the original — the pair structure stays that of the base data
    * scaled Nx; replicating verbatim would build factor-sized near-dup
    * cliques and measure that pathology instead of pipeline scaling.
    */
  private def replicatedDocs(spark: SparkSession, sfDir: String, factor: Int): DataFrame = {
    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val stride = base.agg(max(col("doc_id"))).head().getLong(0) + 1
    (0 until factor).map { i =>
      base.select(
        (col("doc_id") + lit(i * stride)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"$$1x$i").as("text"))
    }.reduce(_ union _)
  }

  /** documents replicated `factor`x VERBATIM — fresh doc_ids, identical
    * text — the duplication-dominant shape of a real ingest stream,
    * used ONLY by entries that are pair-safe under exact duplication
    * (grep: no pairwise work). The dedup/verbatim entries use the
    * token-suffixed [[replicatedDocs]] precisely to avoid this shape's
    * factor-sized duplicate cliques.
    */
  private def verbatimReplicatedDocs(spark: SparkSession, sfDir: String,
                                     factor: Int): DataFrame = {
    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val stride = base.agg(max(col("doc_id"))).head().getLong(0) + 1
    (0 until factor).map { i =>
      base.select((col("doc_id") + lit(i * stride)).as("doc_id"), col("text"))
    }.reduce(_ union _)
  }

  /** embeddings replicated `factor`x: fresh vec_ids per copy (strided),
    * each copy's vectors circularly SHIFTED by its copy index — same
    * norm and distribution, different hyperplane signs and cell
    * assignments, so replicas neither collapse onto each other's LSH
    * buckets / IVF cells nor introduce planted near-identical clusters
    * (that pathology has its own capped unit tests); the corpus scales
    * Nx with the base's isotropic geometry. Valid for factor <= 64
    * (distinct shifts on 64-dim vectors).
    */
  private def replicatedEmbeddings(spark: SparkSession, sfDir: String, factor: Int): DataFrame = {
    require(factor <= 64, s"factor=$factor: shifts repeat past the 64-dim width")
    val base = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val stride = base.agg(max(col("vec_id"))).head().getLong(0) + 1
    (0 until factor).map { i =>
      val shift = i % 64
      val shifted =
        if (shift == 0) col("embedding")
        else concat(slice(col("embedding"), shift + 1, 64 - shift),
          slice(col("embedding"), 1, shift))
      base.select((col("vec_id") + lit(i * stride)).as("vec_id"),
        shifted.as("embedding"))
    }.reduce(_ union _)
  }

  /** events replicated `factor`x as (event_id, user_id, us): the first
    * max(1, factor/4) replicas ALL collapse onto one hot user (id -1),
    * so the hot key grows WITH the factor — at sf0.01, factor 16 puts
    * 40k events on one user vs a ~66-event median (600× skew) — while
    * other replicas keep distinct strided users. Timestamps get a
    * per-replica sub-second jitter so collapsed copies don't reduce to
    * mass timestamp ties.
    */
  private def replicatedEvents(spark: SparkSession, sfDir: String, factor: Int): DataFrame = {
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val eStride = base.agg(max(col("event_id"))).head().getLong(0) + 1
    val uStride = base.agg(max(col("user_id"))).head().getLong(0) + 1
    val hotReplicas = math.max(1, factor / 4)
    (0 until factor).map { i =>
      base.select(
        (col("event_id") + lit(i * eStride)).as("event_id"),
        (if (i < hotReplicas) lit(-1L)
         else (col("user_id") + lit(i * uStride))).as("user_id"),
        (col("us") + lit(i * 997L)).as("us"))
    }.reduce(_ union _)
  }

  /** Order lines replicated `factor`x as DISJOINT subgraphs: orderkeys
    * AND partkeys shift per replica, so the co-purchase graph is
    * `factor` isolated copies — linear edge/node/triangle growth with
    * constant per-order fan-out, the shape that catches an all-pairs
    * term without conflating it with densification.
    */
  private def replicatedLines(spark: SparkSession, sfDir: String,
                              factor: Int): DataFrame = {
    val base = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
    val oStride = base.agg(max(col("l_orderkey"))).head().getLong(0) + 1
    val pStride = base.agg(max(col("l_partkey"))).head().getLong(0) + 1
    (0 until factor).map { i =>
      base.select(
        (col("l_orderkey") + lit(i * oStride)).as("l_orderkey"),
        (col("l_partkey") + lit(i * pStride)).as("l_partkey"))
    }.reduce(_ union _)
  }

  private def timeIt(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val rows = f
    ((System.nanoTime() - t0) / 1e9, rows)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val factors = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(1, 4, 16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // curation-ledger collapse invariant: survivor-side outcome counts
    // must be IDENTICAL at every factor (filled at the first factor)
    var curSurvivorCounts: Option[Map[String, Long]] = None
    // r13 stage invariants, same shape: the verbatim cut-doc count and
    // the ppl tertile distribution run on the collapsed survivor set
    var curVerbatimCuts: Option[Long] = None
    var curPplDist: Option[Map[String, Long]] = None

    for (factor <- factors) {
      val docs = replicatedDocs(spark, sfDir, factor)

      val (tMh, nMh) = timeIt(Dedup.minHashNearDupsOn(docs).count())
      spark.catalog.clearCache()

      // connected components over the verified pair list: pairs are
      // materialized first so this times ONLY the propagation loop.
      // Replicas share no shingles, so components (and pairs) scale
      // linearly while topology — hence round count — stays constant;
      // super-linear growth here would mean the per-round join/agg
      // shape, not the data, is the bottleneck.
      val pairList = Dedup.minHashNearDupsOn(docs)
        .select(col("doc_a"), col("doc_b")).persist()
      pairList.count()
      val (tCl, nCl) = timeIt(Dedup.clusterPairs(pairList).count())
      pairList.unpersist()
      spark.catalog.clearCache()

      val (tNg, nNg) = timeIt(Dedup.ngramJaccardPairsOn(docs).count())
      spark.catalog.clearCache()

      // boilerplate attack: one 3-token preamble on EVERY doc creates a
      // shingle with df = 500·factor; maxDocFreq=100 drops it from the
      // prefix index at every factor, so runtime must stay near-linear.
      // Soundness is preserved regardless (every candidate is verified
      // on the full shingle arrays); the documented residual is recall
      // on docs whose ENTIRE prefix is capped boilerplate.
      val adv = docs.select(col("doc_id"),
        concat(lit("boiler plate preamble "), col("text")).as("text"))
      val (tAdv, nAdv) = timeIt(
        Dedup.ngramJaccardPairsOn(adv, maxDocFreq = 100).count())
      spark.catalog.clearCache()

      // verbatim k-gram runs: replicas share no shingles, so the matched
      // position-pair volume (and pair output) scales linearly with the
      // corpus — candidate work is Σ occ² over shingle values
      val (tVr, nVr) = timeIt(Dedup.verbatimRunPairsOn(docs).count())
      spark.catalog.clearCache()
      // same boilerplate attack: the stamped preamble shingle reaches
      // occ = 500·factor; maxOccFreq=100 drops it from matching, so
      // runtime must stay near-linear instead of quadratic in that one
      // bucket (the 3-token preamble is below minRunTokens anyway, so
      // the cap changes no output here — only the work)
      val (tVrAdv, nVrAdv) = timeIt(
        Dedup.verbatimRunPairsOn(adv, maxOccFreq = 100).count())
      spark.catalog.clearCache()

      // span-removal pass end to end: detector + interval merge + cut.
      // Replicas share no shingles, so spans (and cut work) scale
      // linearly; the cut itself is a per-row projection over a per-doc
      // window — nothing in the pass can exceed the detector's growth
      val (tVc, nVc) = timeIt(Dedup.applyVerbatimCuts(docs,
        Dedup.verbatimRunSpansOn(docs, minRunTokens = 3))
        .filter(col("n_tokens_removed") > 0).count())
      spark.catalog.clearCache()

      // boilerplate LINE removal (hashKey = the 100 TB spelling): a
      // constant header (df = 500·factor) and a 5-way footer
      // (df ≈ 100·factor) stamped onto every doc, both past the
      // threshold at every factor — the strike work is ONE line-frequency
      // agg + one equi-join back, so growth must stay near-linear no
      // matter how hot the boilerplate lines get (their frequency rows
      // are one aggregate row each, not a join blow-up)
      val lined = docs.select(col("doc_id"),
        concat(lit("shared header boilerplate\n"), col("text"),
          lit("\nfooter group "), (col("doc_id") % 5).cast("string")).as("text"))
      val (tLd, nLd) = timeIt(
        Dedup.stripCommonLines(lined, minDocFreq = 50, hashKey = true)
          .filter(col("n_lines_removed") > 0).count())
      spark.catalog.clearCache()

      // incremental ingest: corpus grows with the factor, the delivery
      // batch stays base-sized — time must track the corpus SCAN
      // (linear), with the anti-join shuffling only fingerprints. Half
      // the delivery (the x0 copy) already exists in the corpus and must
      // be filtered; half (the raw originals) is genuinely new.
      val batch = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
        .union(replicatedDocs(spark, sfDir, 1))
      val (tInc, nInc) = timeIt(
        Dedup.incrementalNew(docs, batch).count())
      spark.catalog.clearCache()

      // incremental NEAR-dup: same factor-sized corpus, base-sized batch.
      // Batch band keys PROBE the corpus index — candidates are bounded
      // by batch size × bucket occupancy, so time must track the corpus
      // shingle/index build (linear), never corpus×corpus. The x0-copy
      // half of the batch rediscovers its corpus twins (exact dups are
      // near-dups); the raw-original half is new.
      val (tIncN, nIncN) = timeIt(
        Dedup.incrementalNearDup(docs, batch).count())
      spark.catalog.clearCache()

      // incremental verbatim runs: same factor-sized corpus, base-sized
      // batch — the batch probes the corpus positional index, so time
      // must track the corpus index build (linear), never corpus²
      val (tIncV, nIncV) = timeIt(
        Dedup.incrementalVerbatimRuns(docs, batch, minRunTokens = 3).count())
      spark.catalog.clearCache()

      // stored-index probes: the factor-sized corpus's index is written
      // once per factor (untimed fixture — the ingest-time cost), then
      // the SAME base-sized batch probes it from parquet. Rows must
      // equal the inline spellings' exactly (shared arithmetic, spec-
      // certified); time must track the stored-index SCAN at worst —
      // at or below the inline probe, which re-derives the index from
      // text per delivery. The appends are timed and must stay ~flat
      // across factors: an append shingles only the batch and writes
      // under its own ingest label — corpus size never enters it.
      val idxRoot = s"target/scale_smoke_idx/f$factor"
      DedupIndexes.writeNearDupIndex(docs, s"$idxRoot/neardup")
      val (shS, bandS) = DedupIndexes.readNearDupIndex(spark, s"$idxRoot/neardup")
      val (tIdxN, nIdxN) = timeIt(
        Dedup.incrementalNearDupFromIndex(shS, bandS, batch).count())
      spark.catalog.clearCache()
      // TRACKED INVARIANT (r9 verdict item 5): the stored probe must
      // cost at most `StoredProbeSlack`x its inline twin at every
      // factor — the layout exists to be cheaper than re-deriving the
      // index from text, so a stored probe drifting past the inline
      // spelling is a regression, surfaced HERE as a failure instead of
      // bench-table archaeology. Single samples are GC-noisy, so a
      // violation is re-measured once (both sides, same order) before
      // it counts.
      def assertStoredLeqInline(what: String, stored: Double, inline: Double,
                                remeasure: () => (Double, Double)): (Double, Double) =
        if (stored <= inline * StoredProbeSlack) (stored, inline)
        else {
          spark.catalog.clearCache()
          val (s2, i2) = remeasure()
          spark.catalog.clearCache()
          assert(s2 <= i2 * StoredProbeSlack,
            s"factor $factor: $what stored probe ${s2}s vs inline ${i2}s " +
              s"(first sample ${stored}s vs ${inline}s) — stored exceeds " +
              s"${StoredProbeSlack}x inline on both measures")
          (s2, i2)
        }
      val (tIdxN2, tIncN2) = assertStoredLeqInline("near-dup", tIdxN, tIncN,
        () => (timeIt(Dedup.incrementalNearDupFromIndex(shS, bandS, batch).count())._1,
          { spark.catalog.clearCache()
            timeIt(Dedup.incrementalNearDup(docs, batch).count())._1 }))
      val (tAppN, _) = timeIt {
        DedupIndexes.appendNearDup(batch, s"$idxRoot/neardup", "smoke"); 0L
      }
      spark.catalog.clearCache()

      DedupIndexes.writeVerbatimIndex(docs, s"$idxRoot/verbatim")
      val (posS, occS) = DedupIndexes.readVerbatimIndex(spark, s"$idxRoot/verbatim")
      val (tIdxV, nIdxV) = timeIt(
        Dedup.incrementalVerbatimRunsFromIndex(posS, occS, batch,
          minRunTokens = 3).count())
      spark.catalog.clearCache()
      val (tIdxV2, tIncV2) = assertStoredLeqInline("verbatim", tIdxV, tIncV,
        () => (timeIt(Dedup.incrementalVerbatimRunsFromIndex(posS, occS, batch,
            minRunTokens = 3).count())._1,
          { spark.catalog.clearCache()
            timeIt(Dedup.incrementalVerbatimRuns(docs, batch,
              minRunTokens = 3).count())._1 }))
      val (tAppV, _) = timeIt {
        DedupIndexes.appendVerbatim(batch, s"$idxRoot/verbatim", "smoke"); 0L
      }
      spark.catalog.clearCache()

      // stored trigram grep probe vs the inline corpus scan, over a
      // DUPLICATION-shaped corpus: the base docs replicated VERBATIM
      // with fresh ids (safe for grep — no pair blowup; the suffixed
      // `docs` corpus used elsewhere deliberately DEFEATS dedup and
      // would grow the index's distinct-content tables linearly,
      // measuring a different index than the one a training-data
      // pipeline stores). Here the corpus grows factor-x while the
      // index's lines/postings tables stay base-sized — freq deltas
      // absorb the duplication — so the inline scan grows linearly
      // while the probe stays ~flat: the whole economics of paying the
      // scan once at ingest. Probed with the selective 'dup' (~5% of
      // fixture lines). Row counts (distinct matching lines) must be
      // IDENTICAL at every factor — trigram pruning is recall-free and
      // the stored freq deltas must reconcile to the corpus's counts.
      // The cost budget is asserted from factor 16 up: below that the
      // toy corpus scan is a single sub-second job and the probe's
      // fixed two-job floor (driver gramdf read + candidate join)
      // dominates — the crossover, not the asymptote.
      val dupDocs = verbatimReplicatedDocs(spark, sfDir, factor)
      graft.sources.TextIndexes.writeGrepIndex(dupDocs, "text", s"$idxRoot/grep")
      val (tGrepInl, nGrepInl) = timeIt(
        graft.engine.GrepEngine.grepFreq(dupDocs, "text", "dup").count())
      spark.catalog.clearCache()
      val (gLines, gPost, gGram) =
        graft.sources.TextIndexes.readGrepIndex(spark, s"$idxRoot/grep")
      val (tGrepIdx, nGrepIdx) = timeIt(graft.engine.GrepEngine
        .grepFreqFromIndex(gLines, gPost, gGram, "dup").count())
      spark.catalog.clearCache()
      assert(nGrepIdx == nGrepInl,
        s"factor $factor: stored grep returned $nGrepIdx rows vs inline $nGrepInl")
      val (tGrepIdx2, tGrepInl2) =
        if (factor < 16) (tGrepIdx, tGrepInl)
        else assertStoredLeqInline("grep", tGrepIdx, tGrepInl,
          () => (timeIt(graft.engine.GrepEngine
              .grepFreqFromIndex(gLines, gPost, gGram, "dup").count())._1,
            { spark.catalog.clearCache()
              timeIt(graft.engine.GrepEngine.grepFreq(dupDocs, "text", "dup").count())._1 }))

      // context grep (-C) over the duplication-shaped corpus mapped to
      // a CONSTANT file count (file = doc_id % 40): per-file line
      // populations grow factor-x, so the per-file sort behind the one
      // context window is the only superlinear term (n log n within a
      // file) — near-linear growth here certifies the window never
      // degenerates to a single-partition sort, and the match+context
      // row count grows exactly linearly (verbatim copies match alike)
      val ctxLines = dupDocs.select(
        pmod(col("doc_id"), lit(40L)).as("file"),
        col("doc_id").as("line_no"), col("text").as("line"))
      val (tCtx, nCtx) = timeIt(graft.engine.GrepEngine
        .contextGrep(ctxLines, "file", "line_no", "line", "dup", 2).count())
      spark.catalog.clearCache()

      // decontamination: both sides grow with the factor, but the eval
      // side collapses to a distinct n-gram set before the join, so the
      // output (and time) must stay bounded by the train inverted index
      val (tDec, nDec) = timeIt(
        operators.TextAnalysis.contaminationOn(docs).count())
      spark.catalog.clearCache()

      // end-to-end curation ledger over the DUPLICATION-shaped corpus
      // (dupDocs: base docs replicated VERBATIM with fresh ids — the
      // real ingest-stream shape): the dedup stage collapses each
      // factor-sized clique to its min-id keeper, so the SURVIVOR set —
      // and with it the split and decontamination work, the pipeline's
      // expensive tail — is CONSTANT across factors; only the scan-fused
      // stage-1/2 projections and the fp exchange grow (linearly). Both
      // halves asserted: survivor-side outcome counts (train/eval/
      // dropped_contaminated) must be IDENTICAL at every factor, and
      // dropped_duplicate must absorb exactly the (factor-1) extra
      // copies of every surviving-or-contaminated keeper.
      val (tCur, curCounts) = {
        val t0 = System.nanoTime()
        val counts = operators.Pipeline.curateOn(dupDocs)
          .groupBy(col("outcome")).count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        ((System.nanoTime() - t0) / 1e9, counts)
      }
      spark.catalog.clearCache()
      val survivorSide = curCounts.filter { case (k, _) =>
        k == "train" || k == "eval" || k == "dropped_contaminated" }
      curSurvivorCounts match {
        case None => curSurvivorCounts = Some(survivorSide)
        case Some(base) => assert(survivorSide == base,
          s"factor $factor: curation survivor counts $survivorSide != " +
            s"first-factor $base — dedup failed to collapse the cliques")
      }
      val nSurvivorDocs = survivorSide.values.sum
      val expectedDups = (factor - 1).toLong * nSurvivorDocs
      assert(curCounts.getOrElse("dropped_duplicate", 0L) == expectedDups,
        s"factor $factor: dropped_duplicate ${curCounts.get("dropped_duplicate")} " +
          s"!= expected $expectedDups ((factor-1) x $nSurvivorDocs keepers)")

      // r13 pipeline stages over the same duplication-shaped corpus:
      // BOTH run on the post-dedup SURVIVOR set, which the clique
      // collapse holds CONSTANT across factors — so each stage's own
      // cost is flat and only the shared scan/dedup front grows
      // (linearly). Asserted structurally: the cut-doc count and the
      // ppl tertile distribution must be IDENTICAL at every factor.
      val (tCurV, nCutDocs) = timeIt(
        operators.Pipeline.curateOn(dupDocs, verbatimCuts = true)
          .filter(col("n_tokens_removed") > 0).count())
      spark.catalog.clearCache()
      curVerbatimCuts match {
        case None => curVerbatimCuts = Some(nCutDocs)
        case Some(base) => assert(nCutDocs == base,
          s"factor $factor: verbatim-stage cut docs $nCutDocs != " +
            s"first-factor $base — the cut must run on the collapsed survivor set")
      }
      val pplRefFrame = Tables.documents(spark, sfDir)
        .filter(col("lang") === "en").select(col("text"))
      val (tCurP, pplDist) = {
        val t0 = System.nanoTime()
        val d = operators.Pipeline.curateOn(dupDocs,
            pplRef = Some(pplRefFrame), pplVocab = 16)
          .filter(col("ppl_bucket").isNotNull)
          .groupBy(col("ppl_bucket")).count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        ((System.nanoTime() - t0) / 1e9, d)
      }
      spark.catalog.clearCache()
      curPplDist match {
        case None => curPplDist = Some(pplDist)
        case Some(base) => assert(pplDist == base,
          s"factor $factor: ppl tertile distribution $pplDist != " +
            s"first-factor $base — scoring must cover only the collapsed survivors")
      }

      // INCREMENTAL curation: the committed state grows with the factor
      // (init over the factor-sized corpus is untimed fixture work —
      // the historical ingest cost), the delivery batch stays
      // base-sized. The timed increment = judge + commit: the judge
      // probes the state's fingerprints (fp rows, not text), the banded
      // near-dup index (batch keys x bucket occupancy), and the stored
      // eval grams; the commit appends batch-sized artifacts. Time must
      // track the state-table SCANS (linear ceiling) — committed TEXT is
      // never re-read, and nothing is corpus x corpus.
      //
      // Gate-compatible replication: [[replicatedDocs]]' per-token
      // mangling zeroes the stopword profile, so every copy would die
      // at the language gate and the state would commit EMPTY. Each
      // copy here keeps the base text and INSERTS a unique marker
      // before every 10th token — the lang/quality profile survives
      // (~10% dilution), while each inserted token kills its ~3
      // covering shingles, putting cross-copy Jaccard well under the
      // 0.8 bar: the identity tables genuinely grow with the factor.
      // The delivery batch (ids above every state id — the
      // arrival-order contract) carries its own marker tag, so the
      // gates pay full probe cost without state hits collapsing it.
      def gateSafeMark(df: DataFrame, tag: String): DataFrame =
        df.select(col("doc_id"), array_join(
          transform(split(col("text"), " "), (t, j) =>
            when(j % 10 === 0,
              concat(lit(s"zc${tag}p"), j.cast("string"), lit(" "), t))
              .otherwise(t)), " ").as("text"))
      val curateStride = Tables.documents(spark, sfDir)
        .agg(max(col("doc_id"))).head().getLong(0) + 1
      val curateState = (0 until factor).map { i =>
        val shifted = Tables.documents(spark, sfDir)
          .select((col("doc_id") + lit(i * curateStride)).as("doc_id"), col("text"))
        if (i == 0) shifted else gateSafeMark(shifted, i.toString)
      }.reduce(_ union _)
      val curateStateRoot = s"target/scale_smoke_curate/f$factor"
      // init removes any previous state at the root itself
      graft.sources.CurateState.init(curateState, curateStateRoot,
        contamMinPct = 40L)
      val nStateFps = spark.read.parquet(s"$curateStateRoot/fps").count()
      val curateBatch = gateSafeMark(
        Tables.documents(spark, sfDir)
          .select((col("doc_id") + lit(factor.toLong * curateStride)).as("doc_id"),
            col("text")), "b")
      val (tCurI, nCurI) = timeIt(graft.sources.CurateState
        .increment(curateBatch, curateStateRoot, "d1").count())
      spark.catalog.clearCache()

      // SQ8 two-stage retrieval over a factor-sized embedding corpus,
      // base-sized query set: the coarse pass is a linear scan of the
      // int8 codes (the 4x-smaller artifact), the exact re-rank touches
      // only rerank-per-query candidates — growth must track the code
      // scan (linear), never corpus x corpus
      val embSq = replicatedEmbeddings(spark, sfDir, factor)
      val sqQueries = Tables.embeddings(spark, sfDir)
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
      val (tSq, nSq) = timeIt(operators.Similarity.annTopKSqOn(
        embSq, broadcast(sqQueries), k = 5, rerank = 20).count())
      spark.catalog.clearCache()

      // stored ANN probes over a factor-sized EMBEDDING corpus, base-
      // sized query set (the serving shape): index written once untimed,
      // probe time has the stored-index scan as its linear ceiling —
      // LSH buckets and IVF cells each hold ~1/buckets resp. ~1/nlist
      // of the corpus, so candidate re-scoring grows linearly with
      // occupancy, never corpus x corpus
      val embN = replicatedEmbeddings(spark, sfDir, factor)
      val queries = Tables.embeddings(spark, sfDir)
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
      val annRoot = s"target/scale_smoke_idx/f$factor"
      sources.SimilarityIndexes.writeLshIndex(embN, s"$annRoot/lsh")
      val (skN, vecN, (nT, bits, lshDim)) =
        sources.SimilarityIndexes.readLshIndex(spark, s"$annRoot/lsh")
      val (tLsh, nLsh) = timeIt(operators.Similarity.annTopKLshFromIndex(
        skN, vecN, queries, nTables = nT, bitsPerTable = bits, dim = lshDim).count())
      spark.catalog.clearCache()
      sources.SimilarityIndexes.writeIvfIndex(embN, s"$annRoot/ivf",
        qKey = s"smoke-f$factor")
      val (centN, cellsN) =
        sources.SimilarityIndexes.readIvfIndex(spark, s"$annRoot/ivf")
      val (tIvf, nIvf) = timeIt(operators.Similarity.annTopKIvfFromIndex(
        centN, cellsN, queries).count())
      spark.catalog.clearCache()

      // PQ stored probe over the same factor-sized corpus: codebooks +
      // 16-byte codes written once untimed (index build, like the LSH/
      // IVF writes above), the timed probe is the ADC scan of the code
      // table (16x fewer bytes than the float corpus) + the rerank-
      // bounded exact join — linear in the corpus, never corpus x corpus
      sources.SimilarityIndexes.writePqIndex(embN, s"$annRoot/pq",
        qKey = s"smoke-pq-f$factor")
      val (pqB, pqC, pqV) =
        sources.SimilarityIndexes.readPqIndex(spark, s"$annRoot/pq")
      val (tPq, nPq) = timeIt(operators.Similarity.annTopKPqFromIndex(
        pqB, pqC, pqV, queries).count())
      spark.catalog.clearCache()

      // PCA stored probe over the same factor-sized corpus: basis +
      // reduced table written once untimed (index build), the timed
      // probe is the coarse scan of the HALF-WIDTH reduced table + the
      // rerank-bounded exact join — linear in the corpus like its
      // siblings, never corpus x corpus
      sources.SimilarityIndexes.writePcaIndex(embN, s"$annRoot/pca",
        qKey = s"smoke-pca-f$factor")
      val (pcaB, pcaR, pcaV) =
        sources.SimilarityIndexes.readPcaIndex(spark, s"$annRoot/pca")
      val (tPca, nPca) = timeIt(operators.Similarity.annTopKPcaFromIndex(
        pcaB, pcaR, pcaV, queries).count())
      spark.catalog.clearCache()

      // NB classifier over the factor-sized corpus (planted doc_id%3
      // labels): one token aggregate for the weights (vocab-capped,
      // broadcast) + one broadcast-join scoring scan — two linear
      // passes, the only corpus-sized shuffle is the doc-keyed agg
      val (tNb, nNb) = timeIt(operators.Classifier
        .nbClassifyOn(docs, col("doc_id") % 3 =!= 0).count())
      spark.catalog.clearCache()

      // cluster pruning over the same factor-sized embedding corpus:
      // the quantizer fit is warmed untimed (it is the stored artifact
      // — ingest-time cost, like the index writes above); the timed
      // prune is one scan-fused assignment (centroid literals, no
      // shuffle) + one cell-keyed rank window — constant nlist, cell
      // populations grow linearly, so time must stay near-linear and
      // the verdict count equals the corpus exactly
      operators.Similarity.fitQuantizer(embN, s"smoke-prune-f$factor", 16)
      val (tPrune, nPrune) = timeIt(operators.Clustering.clusterPruneOn(
        embN, s"smoke-prune-f$factor", 16, 50, "central").count())
      spark.catalog.clearCache()

      val events = replicatedEvents(spark, sfDir, factor)
      val (tSes, nSes) = timeIt(AsOf.sessionizeSaltedEvents(events).count())
      val (tSesPlain, _) = timeIt(AsOf.sessionizeEvents(events).count())

      // as-of under the same hot-user skew: every replicated event
      // labeled with the user's latest prior order (orders NOT
      // replicated — the skew lives on the probe side)
      val evTs = events.select(col("event_id"), col("user_id"),
        expr("timestamp_micros(us)").as("ts"))
      val orders = Tables.orders(spark, sfDir)
      val (tAsof, nAsof) = timeIt(AsOf.asOfJoinBanded(
        evTs, col("user_id"), col("ts"), col("event_id"),
        orders, col("o_custkey"), col("o_orderdate"),
        col("o_orderkey"), "o").count())
      val (tAsofPlain, _) = timeIt(AsOf.asOfJoin(
        evTs, col("user_id"), col("ts"), col("event_id"),
        orders, col("o_custkey"), col("o_orderdate"),
        col("o_orderkey"), "o").count())

      // ntile under priority skew: every replica collapses onto ONE
      // priority, so the hot partition is factor × the orders table;
      // orderkeys strided per replica keep the sort key a total order
      val oBase = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_totalprice"))
      val oStride = oBase.agg(max(col("o_orderkey"))).head().getLong(0) + 1
      val hotOrders = (0 until factor).map { i =>
        oBase.select(lit("1-HOT").as("o_orderpriority"),
          col("o_totalprice"),
          (col("o_orderkey") + lit(i * oStride)).as("o_orderkey"))
      }.reduce(_ union _)
      val (tNt, nNt) = timeIt(Relational.ntileRevenueSkewSafeOn(hotOrders).count())
      val (tNtPlain, _) = timeIt(Relational.ntileRevenuePlainOn(hotOrders).count())

      // novelty: gram df via equi-join (AQE-splittable) — replicas share
      // no grams (token suffixes), so both the distinct-gram frame and
      // the join grow linearly with the factor
      val (tNov, nNov) = timeIt(
        graft.operators.TextAnalysis.noveltyOn(docs).count())
      spark.catalog.clearCache()

      // BPE: the corpus is touched once (word-freq pass); every merge
      // iteration runs on the vocabulary frame. Suffixed replicas grow
      // the vocab linearly, so runtime must stay near-linear — a
      // corpus-sized per-iteration term would show as factor × merges
      val (tBpe, nBpe) = timeIt(
        graft.operators.Bpe.learnMergesOn(docs.select(col("text")), 4).count())
      spark.catalog.clearCache()

      // event analytics on a TYPED events replica (strided users,
      // event_type preserved): all three are keyed aggregates + user
      // equi-joins, linear in events; gap-fill's output itself grows
      // users × days (days constant here), the operator's contract
      val teBase = Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val teStride = teBase.agg(max(col("event_id"))).head().getLong(0) + 1
      val tuStride = teBase.agg(max(col("user_id"))).head().getLong(0) + 1
      val typedEv = (0 until factor).map { i =>
        teBase.select(
          (col("event_id") + lit(i * teStride)).as("event_id"),
          (col("user_id") + lit(i * tuStride)).as("user_id"),
          col("event_type"),
          expr("timestamp_micros(us)").as("ts"))
      }.reduce(_ union _)
      val (tFun, nFun) = timeIt(graft.operators.EventAnalytics
        .funnelOn(typedEv, Seq("view", "click", "purchase")).count())
      val (tRet, nRet) = timeIt(
        graft.operators.EventAnalytics.retentionOn(typedEv).count())
      val (tGap, nGap) = timeIt(
        graft.operators.EventAnalytics.dailyGapFillOn(typedEv, "purchase").count())
      spark.catalog.clearCache()

      // rolling 7-day actives: cover-day fan-out is O(window × activity)
      // — users grow with the factor (fresh user ids per replica), days
      // stay fixed, so rows and time must track the factor linearly
      val (tRoll, nRoll) = timeIt(
        graft.operators.EventAnalytics.rollingActivesOn(typedEv, 7).count())
      spark.catalog.clearCache()

      // heavy hitters: the MG buffer is O(k) regardless of corpus size
      // and the recount touches candidate keys only — time must track
      // the two token scans (linear), with the replica-suffixed vocab
      // (31·factor distinct tokens) proving state does NOT grow with
      // the vocabulary: k=100 < vocab at factor >= 4
      val (tHh, nHh) = timeIt(
        graft.operators.TextAnalysis.heavyHittersOn(docs, 100).count())
      spark.catalog.clearCache()

      // CDC apply: changelog = one delivery per doc (replica i updates
      // key doc_id mod stride), base = the factor-sized corpus keyed
      // frame — one arg-max agg + one key join, linear in base+changes
      val cdcBase = docs.select(col("doc_id").as("key"),
        length(col("text")).cast("long").as("v"))
      val cdcChanges = docs.select(
        col("doc_id").as("key"), col("doc_id").as("seq"),
        when(col("doc_id") % 13 === 0, lit("D")).otherwise(lit("U")).as("op"),
        (length(col("text")) + 1L).cast("long").as("v"))
      val (tCdc, nCdc) = timeIt(graft.operators.Snapshot
        .applyChangelogOn(cdcBase, cdcChanges, "key", "seq", "op").count())
      spark.catalog.clearCache()

      // fuzzy match: catalog size grows with the factor (replica-
      // suffixed tokens are distinct names), variant frames are
      // |names|·(len+1) — candidate buckets stay vocabulary-shaped, so
      // growth must stay near-linear, never |A|×|B|
      val nameCat = docs
        .select(explode(split(col("text"), " ")).as("n")).distinct()
      val (tFz, nFz) = timeIt(graft.operators.FuzzyMatch
        .matchNamesOn(nameCat, nameCat).count())
      spark.catalog.clearCache()

      // bloom-pruned semi join: big side grows with the factor, the
      // filter build side stays base-sized — the prune is a per-row
      // codegen probe, so growth tracks the big-side scan linearly
      val bloomSmall = docs.filter(col("doc_id") % 17 === 0)
        .select(col("doc_id").as("j"))
      val (tBl, nBl) = timeIt(graft.operators.Relational
        .bloomSemiJoinOn(docs.select(col("doc_id"), col("text")),
          "doc_id", bloomSmall, "j").count())
      spark.catalog.clearCache()

      // per-source cap: 5 synthetic sources each factor-growing; the
      // banded exact rank keeps every window partition at
      // n_source/16 — growth must stay near-linear, and the kept set
      // is 5·cap regardless of factor
      val sourced = docs.select(col("doc_id"),
        concat(lit("s"), (col("doc_id") % 5).cast("string")).as("source"))
      val (tCap, nCap) = timeIt(graft.operators.TextAnalysis
        .capPerSourceOn(sourced, 200L).count())
      spark.catalog.clearCache()

      // revenue concentration: population grows with the factor, the
      // cut is located on the bounded value-band frame, only the
      // boundary band pays a window — near-linear in the agg scan
      val conc = docs.select(col("doc_id").as("o_custkey"),
        (xxhash64(col("doc_id")) % 100000L + 100000L).as("cents"))
      val (tCon, nCon) = timeIt(graft.operators.Relational
        .revenueConcentrationOn(conc, 1, 10000L).count())
      spark.catalog.clearCache()

      // co-purchase graph family over DISJOINT replicated subgraphs
      // (orderkeys AND partkeys shift per replica): edge/triangle/rank
      // volume scales linearly with the factor while per-order pair
      // fan-out stays constant — super-linear growth here would expose
      // an all-pairs term hiding in the edge build, the 5-step rank
      // loop, or the adjacency-intersection triangle pass
      val glines = replicatedLines(spark, sfDir, factor)
      val (tGe, nGe) = timeIt(
        graft.operators.Graph.copurchaseEdgesOn(glines).count())
      spark.catalog.clearCache()
      val gedges = graft.operators.Graph.copurchaseEdgesOn(glines)
      val (tGpr, nGpr) = timeIt(
        graft.operators.Graph.pageRankOn(gedges, 5).count())
      spark.catalog.clearCache()
      val (tGtri, nGtri) = timeIt(
        graft.operators.Graph.triangleStatsOn(gedges).count())
      spark.catalog.clearCache()

      println(s"""{"factor":$factor,"minhash_sec":$tMh,"minhash_pairs":$nMh,""" +
        s""""cluster_sec":$tCl,"cluster_docs":$nCl,""" +
        s""""incremental_sec":$tInc,"incremental_new":$nInc,""" +
        s""""incr_near_sec":$tIncN,"incr_near_rows":$nIncN,""" +
        s""""incr_verbatim_sec":$tIncV,"incr_verbatim_rows":$nIncV,""" +
        s""""idx_near_probe_sec":$tIdxN,"idx_near_probe_rows":$nIdxN,""" +
        s""""idx_near_append_sec":$tAppN,""" +
        s""""idx_near_vs_inline":${tIdxN2 / tIncN2},""" +
        s""""idx_verbatim_probe_sec":$tIdxV,"idx_verbatim_probe_rows":$nIdxV,""" +
        s""""idx_verbatim_append_sec":$tAppV,""" +
        s""""idx_verbatim_vs_inline":${tIdxV2 / tIncV2},""" +
        s""""grep_inline_sec":$tGrepInl,"grep_idx_sec":$tGrepIdx,""" +
        s""""grep_idx_vs_inline":${tGrepIdx2 / tGrepInl2},"grep_rows":$nGrepInl,""" +
        s""""ann_sq_sec":$tSq,"ann_sq_rows":$nSq,""" +
        s""""ann_lsh_probe_sec":$tLsh,"ann_lsh_rows":$nLsh,""" +
        s""""ann_ivf_probe_sec":$tIvf,"ann_ivf_rows":$nIvf,""" +
        s""""ann_pq_probe_sec":$tPq,"ann_pq_rows":$nPq,""" +
        s""""ann_pca_probe_sec":$tPca,"ann_pca_rows":$nPca,""" +
        s""""nb_classifier_sec":$tNb,"nb_docs":$nNb,""" +
        s""""embprune_sec":$tPrune,"embprune_rows":$nPrune,""" +
        s""""ctxgrep_sec":$tCtx,"ctxgrep_rows":$nCtx,""" +
        s""""decontaminate_sec":$tDec,"decontaminate_docs":$nDec,""" +
        s""""curate_sec":$tCur,"curate_survivors":${curCounts.filter { case (k, _) =>
          k == "train" || k == "eval" || k == "dropped_contaminated" }.values.sum},""" +
        s""""curate_dup_drops":${curCounts.getOrElse("dropped_duplicate", 0L)},""" +
        s""""curate_verbatim_sec":$tCurV,"curate_verbatim_cut_docs":$nCutDocs,""" +
        s""""curate_ppl_sec":$tCurP,"curate_ppl_survivors":${pplDist.values.sum},""" +
        s""""curate_incr_sec":$tCurI,"curate_incr_rows":$nCurI,""" +
        s""""curate_state_fps":$nStateFps,""" +
        s""""ngram_sec":$tNg,"ngram_pairs":$nNg,""" +
        s""""ngram_adv_sec":$tAdv,"ngram_adv_pairs":$nAdv,""" +
        s""""verbatim_sec":$tVr,"verbatim_pairs":$nVr,""" +
        s""""verbatim_adv_sec":$tVrAdv,"verbatim_adv_pairs":$nVrAdv,""" +
        s""""verbatim_clean_sec":$tVc,"verbatim_clean_docs":$nVc,""" +
        s""""line_dedup_sec":$tLd,"line_dedup_docs":$nLd,""" +
        s""""session_salted_sec":$tSes,"session_plain_sec":$tSesPlain,"sessions":$nSes,""" +
        s""""asof_banded_sec":$tAsof,"asof_plain_sec":$tAsofPlain,"asof_rows":$nAsof,""" +
        s""""ntile_banded_sec":$tNt,"ntile_plain_sec":$tNtPlain,"ntile_rows":$nNt,""" +
        s""""novelty_sec":$tNov,"novelty_docs":$nNov,""" +
        s""""bpe_sec":$tBpe,"bpe_merges":$nBpe,""" +
        s""""funnel_sec":$tFun,"funnel_users":$nFun,""" +
        s""""retention_sec":$tRet,"retention_rows":$nRet,""" +
        s""""gapfill_sec":$tGap,"gapfill_cells":$nGap,""" +
        s""""rolling_sec":$tRoll,"rolling_days":$nRoll,""" +
        s""""heavyhit_sec":$tHh,"heavyhit_rows":$nHh,""" +
        s""""cdc_sec":$tCdc,"cdc_rows":$nCdc,""" +
        s""""fuzzy_sec":$tFz,"fuzzy_pairs":$nFz,""" +
        s""""bloomsemi_sec":$tBl,"bloomsemi_rows":$nBl,""" +
        s""""sourcecap_sec":$tCap,"sourcecap_rows":$nCap,""" +
        s""""concentration_sec":$tCon,"concentration_rows":$nCon,""" +
        s""""graph_edges_sec":$tGe,"graph_edges":$nGe,""" +
        s""""graph_pagerank_sec":$tGpr,"graph_nodes":$nGpr,""" +
        s""""graph_tri_sec":$tGtri,"graph_tri_rows":$nGtri}""")
    }

    // --- IVF drift canary (factor-independent): the re-fit signal
    // exercised on a DELIBERATELY drifted index. Base fit over the real
    // embeddings; then two appends — one drawn from the same
    // distribution (circular shift: identical isotropic geometry) and
    // one from a shifted distribution (per-coordinate abs + offset:
    // every vector collapses into the all-positive orthant, far from
    // every fitted centroid and concentrated in the few cells nearest
    // the new mode). ivfDriftStats must flag ONLY the drifted ingest
    // (asserted — the deterministic half). Recall at a tight nprobe is
    // measured against exhaustive search (nprobe = nlist over the same
    // stored cells — the exact baseline, no external oracle) for both a
    // base-mode and a drifted-mode query set, and the two numbers READ
    // TOGETHER are the lesson: drifted queries often keep high recall
    // (their whole mode shares a few cells) while the skew ratio is
    // what explodes — those few cells hold the entire appended mass, so
    // each "cheap" probe scans corpus-scale cells. That is why the
    // re-fit signal keys on distance + skew, not on a recall probe.
    {
      val embBase = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
      val stride = embBase.agg(max(col("vec_id"))).head().getLong(0) + 1
      val same = embBase.select((col("vec_id") + lit(stride)).as("vec_id"),
        concat(slice(col("embedding"), 2, 63), slice(col("embedding"), 1, 1))
          .as("embedding"))
      val drifted = embBase.select((col("vec_id") + lit(2 * stride)).as("vec_id"),
        transform(col("embedding"), x => abs(x) + lit(1.0f)).as("embedding"))
      val driftIdx = "target/scale_smoke_idx/drift/ivf"
      sources.SimilarityIndexes.writeIvfIndex(embBase, driftIdx, "drift-canary")
      sources.SimilarityIndexes.appendIvf(same, driftIdx, "same")
      sources.SimilarityIndexes.appendIvf(drifted, driftIdx, "drifted")
      val stats = sources.SimilarityIndexes.ivfDriftStats(spark, driftIdx)
        .collect().map(r => r.getAs[String]("ingest") ->
          ((r.getAs[Boolean]("refit_due"), r.getAs[Double]("dist_ratio"),
            r.getAs[Double]("skew_ratio")))).toMap
      assert(!stats("same")._1,
        s"same-distribution append must not trip the re-fit flag: ${stats("same")}")
      assert(stats("drifted")._1,
        s"shifted-distribution append must trip the re-fit flag: ${stats("drifted")}")
      val (cent, cells) = sources.SimilarityIndexes.readIvfIndex(spark, driftIdx)
      val cellsP = cells.persist()
      cellsP.count()
      def recallAt(idLo: Long, nprobe: Int): Double = {
        val qs = cellsP.filter(col("vec_id") >= idLo && col("vec_id") < idLo + 10)
          .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
        val approx = operators.Similarity.annTopKIvfFromIndex(cent, cellsP, qs,
            nprobe = nprobe)
          .select(col("query_id"), col("neighbor_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val exact = operators.Similarity.annTopKIvfFromIndex(cent, cellsP, qs,
            nprobe = cent.size)
          .select(col("query_id"), col("neighbor_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        if (exact.isEmpty) 1.0 else approx.intersect(exact).size.toDouble / exact.size
      }
      val recallBase = recallAt(0L, nprobe = 4)
      val recallDrifted = recallAt(2 * stride, nprobe = 4)
      cellsP.unpersist()
      println(s"""{"drift_canary":{"same_flagged":${stats("same")._1},""" +
        s""""drifted_flagged":${stats("drifted")._1},""" +
        s""""drifted_dist_ratio":${stats("drifted")._2},""" +
        s""""drifted_skew_ratio":${stats("drifted")._3},""" +
        s""""recall_base_nprobe4":$recallBase,""" +
        s""""recall_drifted_nprobe4":$recallDrifted}}""")
    }
    spark.stop()
  }
}
