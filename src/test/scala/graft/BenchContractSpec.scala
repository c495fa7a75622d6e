package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench stdout contract: everything printed must fit the driver's
  * 2000-char tail window REGARDLESS of query count (round-8 verdict: the
  * 80-query map line sat at 1,913 chars — the 81st would have broken the
  * driver's tail parse). Pure string logic — no SparkSession.
  */
class BenchContractSpec extends AnyFunSuite {

  private def fakeMap(n: Int): String =
    (1 to n).map(i => s""""q_fake_query_name_$i":1.2""").mkString("{", ",", "}")

  test("small suites keep the per-query map line plus the total line") {
    val lines = BenchContract.lines("12.345", fakeMap(10), "", "/root/testdata/sf0.1", "0.321", "0.456")
    assert(lines.size === 2)
    assert(lines.head.contains("\"queries\":{"), "map line first")
    assert(lines.last ===
      """{"metric":"total","value":12.345,"unit":"sec","sf":"/root/testdata/sf0.1","canary_sec":0.321,"canary_mt_sec":0.456}""")
  }

  test("oversized suites drop the map line, never the canonical total line") {
    val lines = BenchContract.lines("99.9", fakeMap(200), "", "/root/testdata/sf0.1", "0.321", "0.456")
    assert(lines.size === 1)
    assert(lines.head.contains("\"unit\":\"sec\""), "the survivor is the full-schema total")
    assert(lines.head.contains("\"canary_sec\":0.321"),
      "the canary must survive the map-line drop — it rides the canonical line")
  }

  test("printed bytes stay inside the tail window at EVERY query count") {
    for (n <- Seq(0, 1, 50, 80, 81, 100, 500, 2000)) {
      val lines = BenchContract.lines("123.456", fakeMap(n),
        s""","query_errors":{"q_fake_query_name_1":"IllegalStateException"}""",
        "/root/testdata/sf0.1", "12.345", "13.579")
      val printed = lines.map(_.length + 1).sum // + newline per println
      assert(printed <= BenchContract.TailWindow,
        s"at $n queries the contract output is $printed chars — overflows the tail window")
      assert(lines.last.startsWith("""{"metric":"total","value":123.456,"unit":"sec""""),
        "the last line is always the canonical full-schema total")
      assert(lines.last.contains("\"canary_sec\":12.345"),
        "every contract line carries the machine-speed canary")
    }
  }

  test("failed queries ride the canonical total line, never silently green") {
    val lines = BenchContract.lines("12.345", fakeMap(10),
      ""","query_errors":{"q_events_daily":"AnalysisException"}""",
      "/root/testdata/sf0.1", "0.321", "0.456", Seq("q_events_daily", "q_cust_activity_full"))
    assert(lines.last.contains(""""failed":2"""),
      "the failure count must be on the canonical (last) line — the one " +
        "parse the driver is guaranteed to record")
    assert(lines.last.contains(""""failed_queries":["q_events_daily","q_cust_activity_full"]"""))
    assert(lines.head.contains("query_errors"), "map line keeps the error classes")
  }

  test("a huge failure list degrades to the count, never overflows the window") {
    val many = (1 to 200).map(i => s"q_fake_query_name_$i")
    val lines = BenchContract.lines("99.9", fakeMap(200), "",
      "/root/testdata/sf0.1", "0.321", "0.456", many)
    val printed = lines.map(_.length + 1).sum
    assert(printed <= BenchContract.TailWindow,
      s"failure reporting overflowed the tail window ($printed chars)")
    assert(lines.last.contains(""""failed":200"""), "the count always survives")
    assert(!lines.last.contains("failed_queries"),
      "the name list is dropped when it cannot fit")
  }

  test("zero failures leave the canonical line byte-identical to before") {
    val lines = BenchContract.lines("12.345", fakeMap(10), "",
      "/root/testdata/sf0.1", "0.321", "0.456", Nil)
    assert(lines.last ===
      """{"metric":"total","value":12.345,"unit":"sec","sf":"/root/testdata/sf0.1","canary_sec":0.321,"canary_mt_sec":0.456}""")
  }

  test("extra canary fields ride the canonical line and survive the map drop") {
    val extras = ""","canary_io_sec":0.042,"canary_mt_end_sec":0.512"""
    val small = BenchContract.lines("12.345", fakeMap(10), "",
      "/root/testdata/sf0.1", "0.321", "0.456", Nil, extras)
    assert(small.last ===
      """{"metric":"total","value":12.345,"unit":"sec","sf":"/root/testdata/sf0.1","canary_sec":0.321,"canary_mt_sec":0.456,"canary_io_sec":0.042,"canary_mt_end_sec":0.512}""")
    // oversized suite: map line drops, the diagnostics do not
    val big = BenchContract.lines("99.9", fakeMap(200), "",
      "/root/testdata/sf0.1", "0.321", "0.456", Nil, extras)
    assert(big.size === 1)
    assert(big.head.contains("\"canary_io_sec\":0.042") &&
      big.head.contains("\"canary_mt_end_sec\":0.512"),
      "the io / end-of-run canaries must survive the map-line drop")
    // and the window invariant still holds with extras + failures
    val printed = BenchContract.lines("99.9", fakeMap(2000), "",
      "/root/testdata/sf0.1", "0.321", "0.456",
      (1 to 200).map(i => s"q_fake_query_name_$i"), extras)
      .map(_.length + 1).sum
    assert(printed <= BenchContract.TailWindow)
  }

  test("io canary: deterministic read of a dir's files; missing dir reads 0") {
    assert(BenchContract.canaryIoSeconds("/no/such/dir/anywhere") === 0.0)
    val dir = java.nio.file.Files.createTempDirectory("iocanary")
    java.nio.file.Files.write(dir.resolve("a.bin"), Array.fill[Byte](1 << 16)(7))
    java.nio.file.Files.write(dir.resolve("b.bin"), Array.fill[Byte](1 << 16)(9))
    val sec = BenchContract.canaryIoSeconds(dir.toString)
    assert(sec > 0.0 && sec < 5.0, s"128 KiB must read in bounded time, got $sec")
  }

  test("a 0-row bench query is classified EmptyResult and reports as failed") {
    // the red path of the empty-read class (r12 verdict ask): a query
    // whose fixture read silently came back empty must be flagged...
    val allow = Set("q_cust_no_orders")
    assert(BenchContract.emptyResultError("q_events_by_day_partitioned",
      isEmpty = true, allow) === Some("EmptyResult"))
    // ...and the flag must surface on the canonical contract line, the
    // one parse the driver is guaranteed to record
    val lines = BenchContract.lines("12.345", fakeMap(10),
      ""","query_errors":{"q_events_by_day_partitioned":"EmptyResult"}""",
      "/root/testdata/sf0.1", "0.321", "0.456", Seq("q_events_by_day_partitioned"))
    assert(lines.last.contains(""""failed":1"""))
    assert(lines.last.contains(""""failed_queries":["q_events_by_day_partitioned"]"""))
  }

  test("expected-empty and non-empty queries pass the emptiness probe") {
    val allow = Set("q_cust_no_orders")
    assert(BenchContract.emptyResultError("q_cust_no_orders",
      isEmpty = true, allow) === None,
      "a query whose correct result IS the empty set stays green")
    assert(BenchContract.emptyResultError("q_grep_freq",
      isEmpty = false, allow) === None)
  }

  test("isolation flags: >1.4x-of-baseline AND >=0.5s, canary-scaled, worst first") {
    val baseline = Map("q_a" -> 1.0, "q_b" -> 2.0, "q_c" -> 0.2, "q_d" -> 1.0)
    val medians = Map(
      "q_a" -> 1.5,  // 1.5x, +0.5s: flagged
      "q_b" -> 5.0,  // 2.5x, +3.0s: flagged, worse — must sort first
      "q_c" -> 0.4,  // 2.0x but sub-0.5s: the documented noise band, not counted
      "q_d" -> 1.3,  // 1.3x: under the threshold
      "q_new" -> 9.9) // no baseline: nothing to compare against
    assert(BenchContract.isolationFlags(medians, baseline, canaryRatio = 1.0)
      === Seq("q_b", "q_a"))
    // ABSOLUTE-seconds ranking (r14 verdict #1): a modest-ratio
    // large-absolute regression (+2.1s at 1.42x — the r14
    // q_pipeline_curate_clf shape) must outrank a fast query at 3x
    // (+0.9s), so a cap spends its budget on seconds, not ratios
    val b2 = baseline ++ Map("q_big" -> 5.0, "q_hot" -> 0.45)
    val m2 = medians ++ Map("q_big" -> 7.1, "q_hot" -> 1.35)
    assert(BenchContract.isolationFlags(m2, b2, canaryRatio = 1.0)
      === Seq("q_b", "q_big", "q_hot", "q_a"))
    // a uniformly 2x-slower boot (canary ratio 2.0) un-flags proportional
    // elevation — the whole point of normalizing: q_b's 2.5x raw is
    // 1.25x normalized, under the threshold
    assert(BenchContract.isolationFlags(medians, baseline, canaryRatio = 2.0)
      === Nil)
  }

  test("isolation verdict: back-within-1.2x (or 150ms absolute) is pressure") {
    assert(BenchContract.isolationVerdict(1.1, 1.0) === "pressure")
    assert(BenchContract.isolationVerdict(2.8, 1.0) === "elevated")
    // small queries jitter more than 20% — the absolute band covers them
    assert(BenchContract.isolationVerdict(0.7, 0.6) === "pressure")
  }

  test("baseline parse: detail schema round-trip, failed entries skipped, sf-guarded") {
    val json = """{"base_reps":3,"sf":"/root/testdata/sf0.1","canary_sec":0.209,
      "queries":{"q_a":{"min":1.0,"median":1.2,"max":2.0,"reps":3},
                 "q_bad":{"err":"AnalysisException","reps":3}}}"""
    val parsed = BenchContract.parseBaseline(json, "/root/testdata/sf0.1")
    assert(parsed.medians === Map("q_a" -> 1.2))
    assert(parsed.canarySec === 0.209)
    // pre-r17 artifact: no multi-thread canary recorded — parses as 0.0
    // so canaryRatioOf falls back to the single-thread ratio
    assert(parsed.canaryMtSec === 0.0)
    // a detail file recorded at a DIFFERENT sf must never baseline this
    // run — sf0.01 medians would flag every sf0.1 query 10x over
    assert(BenchContract.parseBaseline(json, "/root/testdata/sf0.01")
      === BenchContract.Baseline.empty)
    // ... but a RESPELLED-identical path (trailing slash, dot segments)
    // must not silently disable the phase (r14 ADVICE): the compare is
    // path-normalized, not string equality
    assert(BenchContract.parseBaseline(json, "/root/testdata/sf0.1/")
      .medians === Map("q_a" -> 1.2))
    assert(BenchContract.parseBaseline(json, "/root/testdata/./sf0.1")
      .medians === Map("q_a" -> 1.2))
    // r17+ artifact: the multi-thread canary rides along
    val json17 = """{"base_reps":3,"sf":"/root/testdata/sf0.1","canary_sec":0.209,
      "canary_mt_sec":0.412,"queries":{"q_a":{"median":1.2,"reps":3}}}"""
    assert(BenchContract.parseBaseline(json17, "/root/testdata/sf0.1")
      === BenchContract.Baseline(Map("q_a" -> 1.2), 0.209, 0.412))
  }

  test("cross-boot ratio prefers the multi-thread canary, falls back cleanly") {
    import BenchContract.{Baseline, canaryRatioOf}
    // both boots recorded mt: the mt ratio wins — the documented
    // boot-drift class is mt throughput moving at EQUAL single-thread
    // canary, which the single ratio (here 1.0) would miss entirely
    assert(canaryRatioOf(0.210, 0.600, Baseline(Map.empty, 0.210, 0.400))
      === 0.600 / 0.400)
    // pre-r17 baseline (mt absent): single-thread fallback
    assert(canaryRatioOf(0.300, 0.500, Baseline(Map.empty, 0.200, 0.0))
      === 0.300 / 0.200)
    // no baseline at all: neutral ratio
    assert(canaryRatioOf(0.300, 0.500, Baseline.empty) === 1.0)
  }

  test("the multi-thread canary is deterministic work at a plausible cost") {
    // small thread count keeps the unit test cheap; the plausibility
    // band is the same contract as the single-thread canary's
    val a = BenchContract.canaryMtSeconds(threads = 4)
    assert(a > 0.005 && a < 30.0,
      s"mt canary measured $a s — outside any plausible machine-speed " +
        "band, the workload constant has drifted")
  }

  test("benign-warning allowlist is exactly the documented pair, message-scoped") {
    // the allowlist is the single source of truth for harness-tail
    // suppression: adding a logger here requires a documented reason and
    // a guard spec (PlanInvariantsSpec for WindowExec, CacheScopeSpec
    // for CacheManager) — this pin makes a drive-by suppression fail.
    // Since r16 the suppression is a per-message DENY RegexFilter, not a
    // logger-level change: pin that each row carries the exact known
    // message class so an undocumented broadening fails here.
    assert(Sessions.benignWarnAllowlist.map(_._1).sorted === Seq(
      "org.apache.spark.sql.execution.CacheManager",
      "org.apache.spark.sql.execution.window.WindowExec"))
    val patterns = Sessions.benignWarnAllowlist.map(t => t._1 -> t._2).toMap
    assert(patterns("org.apache.spark.sql.execution.window.WindowExec")
      .contains("No Partition Defined for Window operation"))
    assert(patterns("org.apache.spark.sql.execution.CacheManager")
      .contains("Asked to cache already cached data"))
    assert(Sessions.benignWarnAllowlist.forall(_._3.nonEmpty))
    // the known-benign messages match their patterns; a different WARN
    // from the same loggers does not (it would surface in the tail)
    assert("No Partition Defined for Window operation! Moving all data to a single partition."
      .matches(patterns("org.apache.spark.sql.execution.window.WindowExec")))
    assert("Asked to cache already cached data."
      .matches(patterns("org.apache.spark.sql.execution.CacheManager")))
    assert(!"Asked to re-cache at a conflicting storage level MEMORY_ONLY."
      .matches(patterns("org.apache.spark.sql.execution.CacheManager")))
  }

  test("the machine-speed canary is deterministic work at a plausible cost") {
    val a = BenchContract.canarySeconds()
    assert(a > 0.005 && a < 30.0,
      s"canary measured $a s — outside any plausible machine-speed band, " +
        "the workload constant has drifted")
  }
}
