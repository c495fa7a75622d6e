package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[Tables.events]] must normalize `ts` to TimestampType whatever physical
  * spelling the driver-regenerated parquet carries. The driver has shipped
  * TWO generations so far — TIMESTAMP(NANOS) (read as LongType nanos under
  * the nanosAsLong legacy flag) and, since round 10, TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) (read as TIMESTAMP_NTZ). Round 10 hard-coded the
  * nanos branch and all nine events-reading queries threw
  * DATATYPE_MISMATCH; this suite pins the branch-on-schema fix by writing
  * one fixture per spelling and asserting identical normalized instants.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // one reference wall-clock instant, expressed per physical spelling
  private val microsEpoch = 1704284096123456L // 2024-01-03 12:14:56.123456 UTC

  private def writeFixture(dir: String, tsCol: org.apache.spark.sql.Column,
                           tsType: DataType): String = {
    val base = java.nio.file.Files.createTempDirectory("tables-spec").toString
    Seq((1L, microsEpoch), (2L, microsEpoch + 1000000L))
      .toDF("event_id", "us")
      .select(col("event_id"), tsCol.cast(tsType).as("ts"))
      .write.mode("overwrite").parquet(s"$base/$dir/events.parquet")
    s"$base/$dir"
  }

  test("long-nanos generation: ts normalizes to TimestampType micros") {
    val dir = writeFixture("nanos", col("us") * 1000L, LongType)
    val out = Tables.events(spark, dir)
    assert(out.schema("ts").dataType === TimestampType)
    val got = out.orderBy("event_id").select(unix_micros(col("ts"))).as[Long].collect()
    assert(got.toSeq === Seq(microsEpoch, microsEpoch + 1000000L))
  }

  test("round-10 NTZ-micros generation: ts normalizes to the same instants") {
    val dir = writeFixture("ntz", timestamp_micros(col("us")), TimestampNTZType)
    val out = Tables.events(spark, dir)
    assert(out.schema("ts").dataType === TimestampType)
    val got = out.orderBy("event_id").select(unix_micros(col("ts"))).as[Long].collect()
    assert(got.toSeq === Seq(microsEpoch, microsEpoch + 1000000L),
      "session tz is pinned UTC, so the NTZ→TZ cast must be value-preserving")
  }

  test("already-TimestampType generation passes through untouched") {
    val dir = writeFixture("tz", timestamp_micros(col("us")), TimestampType)
    val out = Tables.events(spark, dir)
    assert(out.schema("ts").dataType === TimestampType)
    val got = out.orderBy("event_id").select(unix_micros(col("ts"))).as[Long].collect()
    assert(got.toSeq === Seq(microsEpoch, microsEpoch + 1000000L))
  }

  test("an unsupported ts type fails loudly instead of mis-converting") {
    val dir = writeFixture("str", timestamp_micros(col("us")).cast(StringType), StringType)
    val e = intercept[IllegalStateException] { Tables.events(spark, dir) }
    assert(e.getMessage.contains("unsupported type"))
  }

  test("the shipped testdata loads and its ts is TimestampType") {
    val out = Tables.events(spark, TestSpark.sf0001)
    assert(out.schema("ts").dataType === TimestampType)
    assert(out.count() > 0)
  }
}
