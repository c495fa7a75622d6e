package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** CSV and JSON sources/sinks (SURVEY.md §2.2 scans row).
  *
  * The testdata is parquet-only, so format coverage is exercised as a
  * round-trip: parquet → write fmt → read fmt back with the ORIGINAL
  * schema (never inference — header/inferSchema double-scans the data and
  * guesses types; at 100 TB the schema is a contract, not a guess).
  * Doubles survive both formats bit-exactly (Spark serializes them via
  * shortest round-trip representation), so downstream aggregates match
  * the parquet-side oracle.
  */
object Roundtrip {

  /** Scratch dir for format round-trips; under the build dir, per-table
    * and per-source so concurrent SFs don't collide.
    */
  private def scratch(fmt: String, sfDir: String, table: String): String = {
    // stripPrefix: a leading "_" makes the dir name hidden to Spark's
    // path filter — every read logged the "All paths were ignored"
    // WARN (see DedupIndexes.scratch, the shared fix)
    val tag = sfDir.replaceAll("[^A-Za-z0-9.]+", "_").stripPrefix("_")
    s"target/roundtrip/$fmt/${tag}_$table"
  }

  /** Paths already written THIS JVM: the write is fixture build (like
    * the IVF quantizer fit or a bucketed-table write), not query work —
    * re-writing identical data on every query call would charge sink
    * cost to every scan benchmark. Deterministic input → the memo can
    * never change a result.
    *
    * "Done" is recorded ONLY once the target verifiably holds at least
    * one data file (recursive, so day-partitioned layouts count their
    * partition dirs): a silently-empty write memoized as done would pin
    * every later read of this JVM to an empty fixture, and the bench
    * would time empty scans as if they were the query (the r11
    * `All paths were ignored` artifact class on exactly these scratch
    * dirs). One recursive listing per JVM per fixture, never timed.
    */
  private val written = scala.collection.concurrent.TrieMap.empty[String, Unit]

  private def writeOnce(path: String)(write: => Unit): Unit =
    written.getOrElseUpdate(path, {
      write
      if (!DedupIndexes.hasData(SparkSession.active, path))
        throw new IllegalStateException(
          s"writeOnce at $path completed without producing any data file " +
            "— refusing to memoize an empty fixture")
    })

  /** Load `table`, bounce it through `fmt` on disk (once per JVM), read
    * it back with the original schema. `fmt` ∈ {csv, json}.
    */
  def via(fmt: String)(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val orig = Tables.load(spark, sfDir, table)
    val path = scratch(fmt, sfDir, table)
    writeOnce(path) {
      val writer = orig.write.mode("overwrite")
      (fmt match {
        case "csv" => writer.option("header", "true")
        case _     => writer
      }).format(fmt).save(path)
    }
    val reader = spark.read.schema(orig.schema)
    (fmt match {
      case "csv" => reader.option("header", "true")
      case _     => reader
    }).format(fmt).load(path)
  }

  def csv(spark: SparkSession, sfDir: String, table: String): DataFrame =
    via("csv")(spark, sfDir, table)

  def json(spark: SparkSession, sfDir: String, table: String): DataFrame =
    via("json")(spark, sfDir, table)

  /** ORC: the other columnar format Spark bundles — vectorized reads,
    * predicate pushdown, and column pruning work like parquet's.
    */
  def orc(spark: SparkSession, sfDir: String, table: String): DataFrame =
    via("orc")(spark, sfDir, table)

  /** Day-partitioned parquet layout of the events table — the canonical
    * large-table organization: one directory per day so per-day queries
    * prune whole partitions at planning time (`PartitionFilters` in the
    * scan, asserted in TextAnalysisSpec) instead of reading 100 TB to
    * filter 1 TB. Returns the read-back DataFrame whose `day` column is
    * the (string) partition column.
    *
    * PERF NOTE (closes the r5→r7 q_events_by_day_partitioned watch
    * item): isolated re-measure (7 reps, sf0.1) = 0.307 min / 0.328
    * median — the honest steady state for this query, which is pure
    * per-task overhead: 30 day partitions × 1 file each, a count-only
    * scan reading no data columns, so ~0.3 s is 30 task schedulings +
    * parquet footer opens on a cold-ish FS cache. The in-suite ~0.54 s
    * adds the usual long-JVM suite pressure; r5's one-off 0.16 s was a
    * fully warm OS page cache over the same 30 footers. The fixture
    * write itself never lands in a timed rep (writeOnce + bench
    * warm-up pass). Plan unchanged since r5: partition-column-only
    * aggregation over the pruned scan.
    */
  def eventsPartitionedByDay(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val path = scratch("parquet_by_day", sfDir, "events")
    writeOnce(path) {
      Tables.events(spark, sfDir)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .write.mode("overwrite").partitionBy("day").parquet(path)
    }
    // partitionColumnTypeInference is off in Sessions, so `day` comes
    // back as StringType; the cast is a no-op belt-and-braces for
    // sessions built elsewhere
    spark.read.parquet(path)
      .withColumn("day", col("day").cast("string"))
  }

  /** Dynamic partition-overwrite UPSERT into a day-partitioned layout:
    * rewrites ONLY the day partitions present in `delta`, leaving every
    * other partition's files physically untouched — the late-arriving-
    * data pattern at 100 TB (re-materialize the affected days, never the
    * table; static overwrite mode would truncate everything first). The
    * option is per-write, so the table needs no session-level config.
    */
  def upsertEventsByDay(delta: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions._
    delta
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day").parquet(path)
  }

  /** Compacted, layout-controlled parquet rewrite of the events table:
    * exactly `files` output files (repartition on the access key), each
    * sorted within by (user_id, ts).
    *
    * This is the small-files + data-layout control a 100 TB ingest needs:
    * streaming/micro-batch sinks emit thousands of KB-sized files whose
    * per-file open/footer overhead dominates scans, and unsorted row
    * groups make parquet min/max statistics useless. Hash-repartitioning
    * on the dominant access key fixes the file count; the within-file
    * sort makes each row group's (user_id, ts) range tight so point/range
    * reads skip row groups. The same two lines are the batch compaction
    * job you would schedule behind [[graft.streaming.StreamingOps
    * .ingestNewDocs]].
    */
  /** SCHEMA EVOLUTION read: two generations of the events table — an
    * early ingest WITHOUT the `source_tag` column and a later one WITH
    * it — merged by `mergeSchema` into one unified frame, old rows
    * back-filled with NULL. This is the append-only lake contract a
    * long-lived corpus store lives by: adding a column must never
    * require rewriting history, and readers of mixed generations get
    * the union schema. (mergeSchema scans footers of every file — at
    * 100 TB pin the schema in a table catalog instead and keep this
    * for ad-hoc reads; the CONTRACT is the same either way.)
    */
  def eventsEvolved(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val path = scratch("parquet_evolve", sfDir, "events")
    writeOnce(path) {
      val ev = Tables.events(spark, sfDir)
      ev.filter(col("event_id") % 2 === 0)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .write.mode("overwrite").parquet(s"$path/gen=1")
      ev.filter(col("event_id") % 2 =!= 0)
        .select(col("event_id"), col("user_id"), col("event_type"),
          lit("crawl-2").as("source_tag"))
        .write.mode("overwrite").parquet(s"$path/gen=2")
    }
    spark.read.option("mergeSchema", "true").parquet(path)
  }

  def eventsCompacted(spark: SparkSession, sfDir: String,
                      files: Int = 4): DataFrame = {
    import org.apache.spark.sql.functions._
    val path = scratch("parquet_compact", sfDir, "events")
    writeOnce(path) {
      Tables.events(spark, sfDir)
        .repartition(files, col("user_id"))
        .sortWithinPartitions(col("user_id"), col("ts"))
        .write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }
}
