package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver testdata
  * (/root/repo/TESTDATA.md, schemas in /root/repo/FIXTURES.md).
  *
  * NOTE on `events.ts`: the parquet stores TIMESTAMP(NANOS) which Spark's
  * vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). All graft sessions
  * set `spark.sql.legacy.parquet.nanosAsLong=true` (see [[Sessions]]), so
  * the raw column arrives as LongType nanos and [[events]] converts it to
  * a proper microsecond timestamp column.
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
  /** events with `ts` converted from raw nanos (LongType) to TimestampType
    * (microsecond precision — Spark's native resolution).
    */
  def events(s: SparkSession, d: String): DataFrame =
    load(s, d, "events")
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
}

/** One place for session construction so every entry point (Verify, Bench,
  * CLI, tests) gets identical, oracle-compatible configuration.
  */
object Sessions {
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
