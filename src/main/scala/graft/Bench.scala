package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // machine-speed canaries FIRST — before the SparkSession exists, so
    // they measure the host, not this JVM's concurrent Spark load. Two
    // of them since r17: the single-thread canary (per-core speed) and
    // the MULTI-THREAD canary (aggregate parallel throughput) — three
    // documented rounds of flag adjudication ended in "boot-level
    // multi-thread drift the single-thread canary cannot capture";
    // measuring it turns that re-derivation into a recorded ratio.
    val canary = BenchContract.canarySeconds()
    val canaryMt = BenchContract.canaryMtSeconds()
    // third control (r17 verdict #1): the r17 driver boot's mt canary
    // was FASTER than the close's while its suite ran 4.6% slower —
    // CPU canaries alone cannot explain such a boot. This one reads
    // the sf dir's actual bytes, so a cold page cache / slow I/O path
    // at boot becomes a recorded number instead of a hypothesis.
    val canaryIo = BenchContract.canaryIoSeconds(sfDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.quietKnownBenignWindowWarnings()
    def runOnce(name: String, fn: (SparkSession, String) => DataFrame): Option[String] =
      try {
        // noop sink materializes every result column (count() would let
        // Spark prune final projections and under-measure them)
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        None
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          Some(e.getClass.getSimpleName)
      }
    // operators that persist() shared projections (dedup suite) hand
    // cache ownership to the caller — drop between queries so no query
    // is measured against another's (or the warm-up's) cache; called
    // OUTSIDE the timed region so cleanup isn't charged to the query
    def dropCaches(): Unit = spark.catalog.clearCache()
    // Optional isolation filter for regression triage: run ONLY the named
    // queries (comma-separated). Never set by the driver — the contract
    // line's shape is unchanged, just over fewer queries.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a typo'd name must fail loudly — a silent zero-query run reads as
    // "query now instant" in regression triage
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names no such queries: ${unknown.mkString(", ")}")
    }
    val queries = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    // Queries whose CORRECT result is zero rows at any SF (their whole
    // point is proving an empty set). Everything else returning 0 rows
    // in the warm-up pass is treated as a FAILURE: a 0-row result
    // usually means an empty fixture read (a scratch-dir write that
    // silently produced nothing — the r11 `All paths were ignored`
    // class), and timing it would report an empty scan as a speedup.
    // Same loud-rename guard as noisyReps. Empty since r16:
    // q_cust_no_orders was re-parameterized ("dormant since 2000") to
    // be non-vacuous at every SF — the 0==0 certificate was weak.
    val expectedEmpty = Set.empty[String]
    require((expectedEmpty -- SparkEntry.queries.keySet).isEmpty,
      s"expectedEmpty names unknown queries: ${(expectedEmpty -- SparkEntry.queries.keySet).mkString(", ")}")
    // One full UNTIMED pass first: JIT/codegen compilation, parquet
    // footer caches, and shuffle machinery warm up on the queries
    // themselves. Round 2 charged ~33 s of first-query JVM warm-up to
    // two innocent queries (22.7 s recorded vs 0.34 s steady state) —
    // a token warm-up does not touch decimal-agg/window/wide-scan
    // codegen paths, so warm up with the real thing. The warm-up pass
    // doubles as the NON-EMPTINESS probe (a limit-1 action, untimed):
    // flagged queries are still timed, but report as failures — they
    // can never pass for fast.
    val emptyFlagged = queries.flatMap { case (name, fn) =>
      val failed = runOnce(name, fn).isDefined
      val flag =
        if (failed) None // exception already reported through runOnce
        else {
          // a probe-time exception is a FAILURE like any other, never
          // "non-empty": a query that succeeds in runOnce but throws
          // non-deterministically here must surface, not silently pass
          // the emptiness check (r13 ADVICE)
          val probed =
            try Right(fn(spark, sfDir).isEmpty)
            catch { case e: Throwable =>
              System.err.println(s"[bench] $name probe FAILED: $e")
              Left(e.getClass.getSimpleName)
            }
          probed match {
            case Left(err) => Some(name -> err)
            case Right(isEmpty) =>
              BenchContract.emptyResultError(name, isEmpty, expectedEmpty)
                .map(name -> _)
          }
        }
      dropCaches()
      flag
    }.toMap
    // the warm-up pass leaves a heap full of 74 queries' garbage; collect
    // it OUTSIDE the timed region so the first timed query doesn't pay
    // for it (r7 charged ~2 s of post-warm-up GC to q_verbatim_spans,
    // the first map entry, every rep — see Dedup.verbatimRunSpans)
    System.gc()
    // (name -> (seconds, error)); a failed query must NEVER pass for a
    // fast one — its error is logged and reported in the JSON line.
    // MEDIAN of `reps` timed repetitions per query: a single long-lived
    // JVM running 50+ queries takes occasional multi-second GC/JIT
    // stalls that land on whichever query is running (observed 1.2 s →
    // 12.3 s on an identical plan across runs); the median is immune to
    // one such spike per query where a single sample is not.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    require(reps >= 1, s"SPARK_GRAFT_BENCH_REPS must be >= 1, got $reps")
    // Noisy-query override: queries whose r7 bench_detail max/min spread
    // exceeded ~3x (persist-heavy plans that eat whatever GC/JIT stall
    // lands on them) get 5 reps so the reported median settles — ~2 min
    // of extra bench time for decisively quieter round-over-round diffs.
    // SPARK_GRAFT_BENCH_REPS above the override wins (triage runs).
    val noisyReps = Set("q_ngram_jaccard", "q_verbatim_spans",
      "q_verbatim_runs", "q_embed_ann_lsh", "q_lineitem_rollup",
      "q_semantic_dedup")
    // a renamed/removed query must fail loudly here too — otherwise the
    // 5-rep override silently stops applying and the noisy tail's median
    // quietly degrades back to 3 samples (mirrors the BENCH_ONLY guard)
    require((noisyReps -- SparkEntry.queries.keySet).isEmpty,
      s"noisyReps names unknown queries: ${(noisyReps -- SparkEntry.queries.keySet).mkString(", ")}")
    def repsFor(name: String): Int =
      if (noisyReps(name)) math.max(reps, 5) else reps
    val allSamples: Map[String, (Seq[Double], Option[String])] =
      queries.map { case (name, fn) =>
        val reps = repsFor(name)
        val samples = (0 until reps).map { _ =>
          val t0 = System.nanoTime()
          val err = runOnce(name, fn)
          val sec = (System.nanoTime() - t0) / 1e9
          dropCaches()
          // collect in the UNTIMED gap: a long-lived JVM accumulates
          // garbage across 60+ queries and a collection landing mid-query
          // shows up as a multi-second spike on an innocent plan
          // (BENCH_r05 charged 4.9 s to a 0.8 s broadcast-join query)
          System.gc()
          (sec, err)
        }
        // an empty-result flag from the warm-up probe is a failure like
        // an exception: excluded from the queries map and the total,
        // listed in failed_queries — never timed-and-green
        name -> ((samples.map(_._1),
          samples.flatMap(_._2).headOption.orElse(emptyFlagged.get(name))))
      }
    val results: Map[String, (Double, Option[String])] =
      allSamples.map { case (name, (secs, err)) =>
        name -> ((secs.sorted.apply(secs.size / 2), err))
      }
    // -- SAME-BOOT ISOLATION TAIL PHASE (r13 verdict #1): three
    // consecutive rounds burned judge/builder cycles adjudicating
    // >1.4x flags that turned out to be N-queries-one-JVM pressure
    // (q_grep_multi_idx r11, q_events_by_day_partitioned r12/13,
    // q_lm_buckets + q_grep_freq_idx r13). Structural fix: any query
    // whose in-suite median exceeds 1.4x its tracked BENCH_DETAIL
    // baseline (same sf, canary-normalized) is RE-MEASURED here, after
    // the timed loop, in a quiet tail — caches dropped, heap collected,
    // no interleaved suite — and BOTH numbers are recorded so the
    // pressure-vs-real verdict ships with the artifact instead of
    // requiring a post-hoc BENCH_ISOLATION session. Never in triage
    // runs (SPARK_GRAFT_BENCH_ONLY IS the isolation) and never without
    // a same-sf baseline (first round at a new sf has nothing to
    // compare against). Untimed: runs after every result is taken. --
    val baseline = BenchContract.readBaseline("BENCH_DETAIL.json", sfDir)
    val isoFlags: Seq[String] =
      if (only.nonEmpty) Nil
      else BenchContract.isolationFlags(
        results.collect { case (n, (sec, None)) => n -> sec },
        baseline.medians,
        canaryRatio = BenchContract.canaryRatioOf(canary, canaryMt, baseline))
    // bound the tail phase (5 reps each) so a pathological round — a
    // genuinely slower machine flags everything — cannot double bench
    // time. Raised 8 → 12 after the r17 driver boot flagged 21 (r17
    // verdict #1); whatever still drops spills its EVIDENCE (in-suite
    // median + baseline) into BENCH_DETAIL.json's flags_dropped map —
    // a stderr line the harness tail never captures is not a record
    val isoCap = 12
    if (isoFlags.size > isoCap)
      System.err.println(s"[bench] isolation tail capped at $isoCap of " +
        s"${isoFlags.size} flags; dropped: ${isoFlags.drop(isoCap).mkString(", ")}")
    val droppedFlags: Seq[String] = isoFlags.drop(isoCap)
    val isolated: Map[String, (Double, Double)] =
      isoFlags.take(isoCap).map { name =>
        dropCaches(); System.gc()
        val secs = (0 until 5).map { _ =>
          val t0 = System.nanoTime()
          runOnce(name, queries(name))
          val sec = (System.nanoTime() - t0) / 1e9
          dropCaches(); System.gc()
          sec
        }
        name -> ((secs.sorted.apply(secs.size / 2), secs.min))
      }.toMap
    // END-of-run mt canary (r17 verdict #1): the boot canaries run
    // before the suite; load arriving DURING a ~4-minute run (the
    // documented faster-canary-yet-slower-suite driver boot) is
    // invisible to them. Re-measuring the same workload after the last
    // query bounds the run's machine era from both ends.
    val canaryMtEnd = BenchContract.canaryMtSeconds()
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    // The driver captures only the LAST 2000 chars of merged output and
    // line-scans it for JSON (BENCH_r01..r05 all have parsed:null: the
    // full-precision line overflowed the window and sbt's "[info] "
    // LoggedOutput prefix made every line unparseable besides). Keep the
    // whole contract line inside the window: millisecond precision is
    // plenty for per-query diagnostics and keeps 61 queries ≈ 1.7 kB.
    def ms(sec: Double) = BigDecimal(sec).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    // DECIsecond precision INSIDE the per-query map: at 78 queries the
    // centisecond spelling hit 1976 chars, which plus the trailing
    // total-only line overflows the 2000-char tail window and the map
    // stops parsing driver-side; one decimal keeps map+total ≈ 1.97 kB.
    // Tracked BENCH_DETAIL.json keeps full milliseconds for triage.
    def cs(sec: Double) = BigDecimal(sec).setScale(1, BigDecimal.RoundingMode.HALF_UP)
    // queries stays strictly {"name": seconds} for the driver — and holds
    // ONLY queries that ran to completion: a failed query's sample is
    // time-to-exception, not runtime, and recording it presented round
    // 10's nine AnalysisException queries as ~10x "speedups". Failures
    // live in "query_errors" (map line) and "failed_queries" (canonical
    // total line, see BenchContract.lines) so a failing round can never
    // read as green from either parse target.
    val qs = results.collect { case (k, (sec, None)) => s""""${esc(k)}":${cs(sec)}""" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, (_, Some(e))) => s""""${esc(k)}":"${esc(e)}"""" }
      .mkString("{", ",", "}")
    val errsField = if (errs == "{}") "" else s""","query_errors":$errs"""
    val failedNames = results.collect { case (k, (_, Some(_))) => k }.toSeq.sorted
    // the total likewise sums SUCCEEDED queries only — a round with
    // failures reports the honest cost of what actually ran, flagged
    val total = ms(results.collect { case (_, (sec, None)) => sec }.sum)
    // Per-query sample spread to a LOCAL file for regression triage (is a
    // round-over-round delta noise or real?) — never stdout: the driver's
    // 2000-char tail window must stay reserved for the contract line.
    try {
      // per-entry "reps": the noisy-query override means sample counts
      // differ per query — the spread is only judgeable next to its own
      // sample size, so the top-level field records the BASE count only
      val detail = allSamples.toSeq.sortBy(_._1).map { case (name, (secs, err)) =>
        // a failed query's entry carries its error CLASS and no timings:
        // its samples are time-to-exception (round 10 recorded nine
        // AnalysisException queries as ~10x faster) — flag, don't time
        // a flagged query's entry carries its baseline, BOTH isolated
        // numbers, and the mechanical verdict — the full adjudication
        // the BENCH_ISOLATION.md protocol used to reconstruct by hand
        val iso = isolated.get(name).map { case (isoMed, isoMin) =>
          val b = baseline.medians(name)
          s""","baseline_median":${ms(b)},"isolated_median":${ms(isoMed)},""" +
            s""""isolated_min":${ms(isoMin)},"isolated_verdict":"${
              BenchContract.isolationVerdict(isoMed, b)}""""
        }.getOrElse("")
        val body = err match {
          case Some(e) => s""""err":"${esc(e)}","reps":${secs.size}"""
          case None =>
            s""""min":${ms(secs.min)},"median":${ms(results(name)._1)},"max":${ms(secs.max)},"reps":${secs.size}$iso"""
        }
        s""""${esc(name)}":{$body}"""
      }.mkString("{", ",", "}")
      // cap-dropped isolation flags keep their evidence in the tracked
      // artifact (in-suite median + the baseline it tripped), so a
      // judge can adjudicate them without this boot's stderr
      val droppedJson = droppedFlags.map { name =>
        s""""${esc(name)}":{"median":${ms(results(name)._1)},"baseline_median":${ms(baseline.medians(name))}}"""
      }.mkString("{", ",", "}")
      val droppedField =
        if (droppedFlags.isEmpty) "" else s""","flags_dropped":$droppedJson"""
      val payload =
        s"""{"base_reps":$reps,"sf":"$sfDir","canary_sec":${ms(canary)},"canary_mt_sec":${ms(canaryMt)},"canary_io_sec":${ms(canaryIo)},"canary_mt_end_sec":${ms(canaryMtEnd)}$droppedField,"queries":$detail}"""
          .getBytes("UTF-8")
      val p = java.nio.file.Paths.get("target/bench_detail.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, payload)
      // ALSO to a git-tracked path: the driver captures only the 2000-char
      // stdout tail, so the per-query spread would otherwise never leave
      // the machine — committing BENCH_DETAIL.json each round keeps
      // fast-query regressions diffable round-over-round (judge request).
      // NEVER from a SPARK_GRAFT_BENCH_ONLY triage run: a filtered map
      // would clobber the tracked full-suite detail with a partial one.
      if (only.isEmpty)
        java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DETAIL.json"), payload)
    } catch { case e: Throwable => System.err.println(s"[bench] detail write failed: $e") }
    val lines = BenchContract.lines(total.toString, qs, errsField, sfDir,
      ms(canary).toString, ms(canaryMt).toString, failedNames,
      extraFields = s""","canary_io_sec":${ms(canaryIo)},"canary_mt_end_sec":${ms(canaryMtEnd)}""")
    lines.init.foreach(println)
    spark.stop()
    // The headline total prints LAST, after spark.stop(), so a
    // last-JSON-line parser finds it even if future query growth pushes
    // the long line's head back out of the tail window. Same metric
    // name on purpose: the driver records ONE parsed object, so either
    // line parsing yields the same total (no summing consumer exists).
    println(lines.last)
  }
}

/** The stdout contract-line assembly, factored out so its one hard
  * invariant is unit-testable without a SparkSession: the driver
  * captures only the LAST `TailWindow` chars of merged output and
  * line-scans them for JSON, so EVERYTHING printed must fit that window
  * REGARDLESS of how many queries the suite grows to. At 80 queries the
  * per-query map line sits at ~1.93 kB — one more query would push the
  * window past 2000 and the driver's tail parse would truncate
  * mid-line. The formatter therefore keeps the per-query map only while
  * it provably fits next to the total-only line; past that it drops the
  * map from STDOUT entirely (BENCH_DETAIL.json is the tracked per-query
  * artifact — stdout never was the triage surface) rather than letting
  * growth silently break the parse.
  */
object BenchContract {
  /** The driver's documented stdout-tail capture size. */
  val TailWindow = 2000

  /** The warm-up pass's non-emptiness verdict for one query: a 0-row
    * result is an error ("EmptyResult") unless the query is on the
    * expected-empty allowlist. Factored out of the main loop so the
    * red path is unit-testable without a SparkSession: a query whose
    * fixture read silently came back empty must land in
    * `failed_queries`, not in the timed map (the third
    * measurement-integrity class, after time-to-exception billing and
    * unsurfaced failures).
    */
  def emptyResultError(name: String, isEmpty: Boolean,
                       expectedEmpty: Set[String]): Option[String] =
    if (isEmpty && !expectedEmpty(name)) Some("EmptyResult") else None

  /** The tracked BENCH_DETAIL.json contents the isolation phase
    * compares against: per-query medians plus the recording boot's two
    * canaries (canaryMtSec = 0.0 for artifacts written before r17 —
    * the single-thread fallback in [[canaryRatioOf]] covers them).
    */
  case class Baseline(medians: Map[String, Double],
                      canarySec: Double, canaryMtSec: Double)
  object Baseline { val empty: Baseline = Baseline(Map.empty, 0.0, 0.0) }

  /** Previous round's tracked per-query medians + its canaries, read
    * from the committed BENCH_DETAIL.json — the isolation tail phase's
    * baseline. Empty when the file is missing, unparseable, or recorded
    * at a DIFFERENT sf (a local sf0.01 full run must never baseline an
    * sf0.1 driver run — their medians differ 10× and everything would
    * flag).
    */
  def readBaseline(path: String, sfDir: String): Baseline =
    try {
      val p = java.nio.file.Paths.get(path)
      if (!java.nio.file.Files.exists(p)) Baseline.empty
      else parseBaseline(
        new String(java.nio.file.Files.readAllBytes(p), "UTF-8"), sfDir)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] baseline read failed (isolation phase off): $e")
      Baseline.empty
    }

  /** [[readBaseline]]'s parse, factored for unit tests: Jackson tree
    * over the detail schema this file itself writes. Failed entries
    * (err, no median) are skipped.
    */
  def parseBaseline(json: String, sfDir: String): Baseline = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    // path-NORMALIZED compare: a respelled-but-identical sf dir (trailing
    // slash, relative form) must not silently disable the isolation phase
    // (r14 ADVICE) — and a genuine mismatch logs, like the read-failure
    // branch, instead of turning the phase off without a trace
    def norm(p: String) =
      try java.nio.file.Paths.get(p).toAbsolutePath.normalize.toString
      catch { case _: Throwable => p }
    val fileSf = root.path("sf").asText("")
    if (norm(fileSf) != norm(sfDir)) {
      System.err.println(s"[bench] baseline sf '$fileSf' != run sf '$sfDir'" +
        " (isolation phase off)")
      Baseline.empty
    } else {
      val canary = root.path("canary_sec").asDouble(0.0)
      val canaryMt = root.path("canary_mt_sec").asDouble(0.0)
      val qs = root.path("queries")
      import scala.jdk.CollectionConverters._
      val medians = qs.fields().asScala.flatMap { e =>
        val med = e.getValue.path("median")
        if (med.isNumber) Some(e.getKey -> med.asDouble) else None
      }.toMap
      Baseline(medians, canary, canaryMt)
    }
  }

  /** The cross-boot normalization ratio the flagging phase scales
    * baselines by: the MULTI-THREAD canary ratio when both boots
    * recorded one — Spark queries on local[32] are parallel workloads,
    * and the documented boot-drift class is exactly "multi-thread
    * throughput moved while the single-thread canary stayed equal"
    * (BENCH_ISOLATION.md r10/r14/r16) — falling back to the
    * single-thread ratio against pre-r17 artifacts, and to 1.0 when
    * there is no baseline at all.
    */
  def canaryRatioOf(thisCanary: Double, thisCanaryMt: Double,
                    baseline: Baseline): Double =
    if (baseline.canaryMtSec > 0 && thisCanaryMt > 0)
      thisCanaryMt / baseline.canaryMtSec
    else if (baseline.canarySec > 0 && thisCanary > 0)
      thisCanary / baseline.canarySec
    else 1.0

  /** Which succeeded queries the isolation tail re-measures: in-suite
    * median > 1.4× the canary-adjusted baseline median AND current
    * median >= 0.5 s (sub-0.5 s deltas are the documented noise band —
    * r13 explicitly declined to count three such flags). canaryRatio =
    * thisCanary / baselineCanary scales the baseline to this boot's
    * single-thread speed so a uniformly slower machine doesn't flag the
    * whole suite. Ordered by ABSOLUTE regressed seconds
    * (sec − baseline×ratio) worst-first, not by ratio: the r14 cap of 8
    * dropped q_pipeline_curate_clf (+2.1 s over baseline, ratio 1.4×)
    * while re-measuring sub-second queries at 3× (+0.4 s each) — the
    * user-visible cost of a regression is seconds, so the cap must
    * spend its budget on seconds (r14 verdict #1 / ADVICE).
    */
  def isolationFlags(medians: Map[String, Double],
                     baselineMedians: Map[String, Double],
                     canaryRatio: Double): Seq[String] = {
    val ratio = math.max(canaryRatio, 0.1)
    medians.toSeq.collect {
      case (name, sec) if sec >= 0.5 &&
        baselineMedians.get(name).exists(b => sec > 1.4 * b * ratio) =>
        (name, sec - baselineMedians(name) * ratio)
    }.sortBy(-_._2).map(_._1)
  }

  /** The mechanical pressure-vs-elevated call, the rule the r12/r13
    * hand adjudications converged on: quiet-tail median back within
    * 1.2× baseline (or within 150 ms absolute — small queries jitter
    * more than 20%) ⇒ the in-suite number was JVM pressure; still
    * above ⇒ genuinely elevated, a real investigation target.
    */
  def isolationVerdict(isolatedMedian: Double, baselineMedian: Double): String =
    if (isolatedMedian <= 1.2 * baselineMedian ||
        isolatedMedian <= baselineMedian + 0.15) "pressure" else "elevated"

  /** Machine-speed canary: a FIXED, deterministic, Spark-free
    * single-thread integer workload (an xxhash-style avalanche loop
    * over a constant array — ~134M mul/rotate/xor steps per pass),
    * timed as the min of three passes after one JIT warm-up pass.
    * Recorded into bench_detail and the stdout contract line so
    * cross-round totals can be NORMALIZED: rounds 7–9 each re-litigated
    * "is this regression host drift?" from ad-hoc re-runs (±32%
    * identical-code variance documented in r9); dividing two rounds'
    * canary times turns that argument into a measured ratio. Constants
    * are decimal spellings of the xxhash64 primes; the pass result is
    * folded into a sink check so the loop cannot be dead-code
    * eliminated.
    */
  def canarySeconds(): Double = {
    val arr = Array.tabulate(1 << 15)(i => i.toLong * -7046029254386353131L)
    def pass(): Long = {
      var h = 2870177450012600261L
      var r = 0
      while (r < 4096) {
        var i = 0
        while (i < arr.length) {
          h = java.lang.Long.rotateLeft(
            h ^ (arr(i) * -4417276706812531889L), 31) * -7046029288634856825L
          i += 1
        }
        r += 1
      }
      h
    }
    var sink = pass() // JIT warm-up; result consumed below
    val times = (0 until 3).map { _ =>
      val t0 = System.nanoTime()
      sink ^= pass()
      (System.nanoTime() - t0) / 1e9
    }
    require(sink != 42L, "unreachable — anchors the loop against DCE")
    times.min
  }

  /** I/O / page-cache canary (r17 verdict #1): one timed sequential
    * pass over the sf dir's regular files (sorted by name — a
    * deterministic byte stream), 1 MiB reads folded into a checksum
    * sink, capped at 256 MiB. Run BEFORE the SparkSession exists, so
    * it records the storage state the suite's first reads will see: a
    * boot with freshly regenerated testdata (cold page cache) or a
    * contended I/O path reports seconds-per-fixed-bytes where the CPU
    * canaries — which the r17 driver boot passed while its suite ran
    * 4.6% slower — are blind. Reading the bytes also WARMS the cache,
    * identically on every boot, so the canary equalizes what it
    * measures. 0.0 when the dir is missing/unreadable (a canary must
    * never fail the bench).
    */
  def canaryIoSeconds(sfDir: String): Double =
    try {
      import scala.jdk.CollectionConverters._
      val dir = java.nio.file.Paths.get(sfDir)
      if (!java.nio.file.Files.isDirectory(dir)) 0.0
      else {
        // the listing stream must be closed (r18 ADVICE: an unclosed
        // Files.list leaks a directory fd per bench boot, and the
        // catch-all below would mask the eventual EMFILE as a 0.0)
        val listing = java.nio.file.Files.list(dir)
        val files =
          try listing.iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            .toSeq.sortBy(_.getFileName.toString)
          finally listing.close()
        val buf = new Array[Byte](1 << 20)
        val cap = 256L << 20
        var read = 0L
        var sink = 0L
        val t0 = System.nanoTime()
        files.foreach { f =>
          if (read < cap) {
            val in = java.nio.file.Files.newInputStream(f)
            try {
              var n = in.read(buf)
              while (n > 0 && read < cap) {
                read += n
                sink ^= buf(0).toLong + buf(n - 1).toLong + n
                n = in.read(buf)
              }
            } finally in.close()
          }
        }
        val sec = (System.nanoTime() - t0) / 1e9
        require(sink != Long.MinValue, "unreachable — anchors the reads against DCE")
        sec
      }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] io canary failed (recorded as 0): $e")
      0.0
    }

  /** MULTI-THREAD machine-speed canary (r16 verdict #2): `threads`
    * Java threads each run the [[canarySeconds]] avalanche pass over
    * their OWN array, and one parallel pass is timed wall-clock (min of
    * three after a warm-up pass) — the aggregate parallel throughput
    * the single-thread canary provably cannot see. Three rounds of
    * flag adjudication (BENCH_ISOLATION.md r10/r14/r16) ended in
    * "boot-level multi-thread drift at equal single-thread canary";
    * this records that drift as a number so cross-boot comparisons
    * normalize by it ([[canaryRatioOf]]) instead of re-litigating the
    * class by hand. Per-thread work equals the single canary's, so
    * canary_mt_sec ≈ canary_sec under ideal scaling and the mt/single
    * ratio reads directly as parallel efficiency. Spark-free,
    * deterministic, DCE-anchored like its single-thread twin.
    */
  def canaryMtSeconds(threads: Int = 32): Double = {
    val arrays = Array.tabulate(threads)(t =>
      Array.tabulate(1 << 15)(i => (i + t).toLong * -7046029254386353131L))
    val sinks = new java.util.concurrent.atomic.AtomicLong(0L)
    def parallelPass(): Unit = {
      val ts = (0 until threads).map { t =>
        new Thread(() => {
          val arr = arrays(t)
          var h = 2870177450012600261L
          var r = 0
          while (r < 4096) {
            var i = 0
            while (i < arr.length) {
              h = java.lang.Long.rotateLeft(
                h ^ (arr(i) * -4417276706812531889L), 31) * -7046029288634856825L
              i += 1
            }
            r += 1
          }
          sinks.addAndGet(h)
        })
      }
      ts.foreach(_.start())
      ts.foreach(_.join())
    }
    parallelPass() // JIT warm-up
    val times = (0 until 3).map { _ =>
      val t0 = System.nanoTime()
      parallelPass()
      (System.nanoTime() - t0) / 1e9
    }
    require(sinks.get() != 42L, "unreachable — anchors the loops against DCE")
    times.min
  }

  /** The lines to print, in order; the LAST line is always the compact
    * full-schema total (the canonical parse target) and the total of
    * all line lengths + newlines is <= [[TailWindow]] by construction.
    */
  def lines(total: String, queriesJson: String, errsField: String,
            sfDir: String, canarySec: String, canaryMtSec: String,
            failedNames: Seq[String] = Nil,
            extraFields: String = ""): Seq[String] = {
    // Failures ride the CANONICAL total line — the one parse the driver
    // is guaranteed to record — so a failing round cannot read as green
    // (round 10's summary showed rc=0 / total=63.1s while nine queries
    // threw AnalysisException, visible only in the raw tail). The count
    // always fits; the name list is included only while the line stays
    // inside the tail window (names are also in query_errors on the map
    // line and in BENCH_DETAIL.json).
    // extraFields (io / end-of-run canaries) ride the canonical line
    // like the boot canaries — diagnostics must survive the map-line
    // drop, and the canonical line is the one parse that always lands
    def totalWith(failedField: String) =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","canary_sec":$canarySec,"canary_mt_sec":$canaryMtSec$extraFields$failedField}"""
    val totalLine =
      if (failedNames.isEmpty) totalWith("")
      else {
        val withList = totalWith(
          s""","failed":${failedNames.size},"failed_queries":[${failedNames.map(n => s""""$n"""").mkString(",")}]""")
        if (withList.length + 1 <= TailWindow) withList
        else totalWith(s""","failed":${failedNames.size}""")
      }
    // no "sf"/"unit" on the map line — every byte counts against the
    // tail window and the trailing total-only line carries the full
    // schema; a schema-strict parser that skips the map line still
    // lands on the total-only line
    val mapLine = s"""{"metric":"total","value":$total,"queries":$queriesJson$errsField}"""
    if (mapLine.length + 1 + totalLine.length + 1 <= TailWindow)
      Seq(mapLine, totalLine)
    else Seq(totalLine)
  }
}
