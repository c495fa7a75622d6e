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
  /** The structural harness-tail warning allowlist (r14 verdict #6):
    * each entry names ONE logger whose WARN class is benign AT A KNOWN
    * CALL SITE in this repo, with the reason pinned here and the
    * benign-by-construction claim enforced by a named spec. Suppressing
    * a logger WITHOUT a row here is not allowed — the allowlist is the
    * single source of truth ([[quietKnownBenignWindowWarnings]] applies
    * exactly these), and BenchContractSpec pins the set so a new
    * suppression must arrive with its documented reason + guard spec.
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
  val benignWarnAllowlist: Seq[(String, String)] = Seq(
    "org.apache.spark.sql.execution.window.WindowExec" ->
      "bounded side-frame windows only (PlanInvariantsSpec)",
    "org.apache.spark.sql.execution.CacheManager" ->
      "same-plan re-persist is a deduped no-op (CacheScopeSpec)")

  /** Raise each [[benignWarnAllowlist]] logger to ERROR for a harness
    * run, so the driver tail shows only the JSON contract lines plus
    * GENUINELY unexpected warnings — a real regression's warning must
    * not drown in a known-benign flood (r12 verdict #8, r14 #6).
    * Scoped: called by the Bench/Verify mains only — tests and ad-hoc
    * sessions keep every warning.
    */
  def quietKnownBenignWindowWarnings(): Unit =
    benignWarnAllowlist.foreach { case (logger, _) =>
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        logger, org.apache.logging.log4j.Level.ERROR)
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
