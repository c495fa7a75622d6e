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

  // ---- regeneration sentinel over ALL driver tables -----------------------
  //
  // The driver regenerates /root/testdata between rounds and has already
  // changed physical types twice (events.ts nanos→NTZ-micros broke nine
  // queries in round 10; o_orderdate/l_shipdate silently moved ms→us the
  // same round). This sentinel turns the NEXT such change into one red
  // test that names the table and column, instead of AnalysisExceptions
  // scattered across the query surface. Time-like columns assert only the
  // time-like FAMILY (Date/Timestamp/TimestampNTZ all compare correctly
  // against the date literals the queries use — respellings within the
  // family are benign); everything else asserts its exact type.
  //
  // LongType is tolerated ONLY for events.ts — the one column whose
  // loader branches on it (TIMESTAMP(NANOS) under the nanosAsLong legacy
  // read). Tables.orders/lineitem pass their date columns through RAW,
  // so a driver regeneration to TIMESTAMP(NANOS) there would surface as
  // LongType and break every date-comparing query; the sentinel must go
  // red for those, not tolerate them (r11 ADVICE).

  private val timeLike: Set[DataType] = Set(DateType, TimestampType, TimestampNTZType)

  private val expected: Map[String, Seq[(String, Either[DataType, String])]] = Map(
    "region" -> Seq("r_regionkey" -> Left(IntegerType), "r_name" -> Left(StringType)),
    "nation" -> Seq("n_nationkey" -> Left(IntegerType), "n_name" -> Left(StringType),
      "n_regionkey" -> Left(IntegerType)),
    "customer" -> Seq("c_custkey" -> Left(LongType), "c_name" -> Left(StringType),
      "c_nationkey" -> Left(IntegerType), "c_acctbal" -> Left(DoubleType),
      "c_mktsegment" -> Left(StringType)),
    "supplier" -> Seq("s_suppkey" -> Left(LongType), "s_name" -> Left(StringType),
      "s_nationkey" -> Left(IntegerType), "s_acctbal" -> Left(DoubleType)),
    "part" -> Seq("p_partkey" -> Left(LongType), "p_name" -> Left(StringType),
      "p_brand" -> Left(StringType), "p_type" -> Left(StringType),
      "p_size" -> Left(IntegerType), "p_retailprice" -> Left(DoubleType)),
    "orders" -> Seq("o_orderkey" -> Left(LongType), "o_custkey" -> Left(LongType),
      "o_orderstatus" -> Left(StringType), "o_totalprice" -> Left(DoubleType),
      "o_orderdate" -> Right("time-like"), "o_orderpriority" -> Left(StringType)),
    "lineitem" -> Seq("l_orderkey" -> Left(LongType), "l_partkey" -> Left(LongType),
      "l_suppkey" -> Left(LongType), "l_linenumber" -> Left(IntegerType),
      "l_quantity" -> Left(DoubleType), "l_extendedprice" -> Left(DoubleType),
      "l_discount" -> Left(DoubleType), "l_tax" -> Left(DoubleType),
      "l_returnflag" -> Left(StringType), "l_linestatus" -> Left(StringType),
      "l_shipdate" -> Right("time-like")),
    "documents" -> Seq("doc_id" -> Left(LongType), "text" -> Left(StringType),
      "lang" -> Left(StringType), "source" -> Left(StringType),
      "n_chars" -> Left(LongType)),
    "embeddings" -> Seq("vec_id" -> Left(LongType),
      "embedding" -> Left(ArrayType(FloatType)), "label" -> Left(IntegerType)),
    "events" -> Seq("event_id" -> Left(LongType),
      "ts" -> Right("time-like-or-long"), "user_id" -> Left(LongType),
      "event_type" -> Left(StringType), "value" -> Left(DoubleType),
      "props" -> Left(StringType))
  )

  test("driver-testdata regeneration sentinel: every table/column type is accounted for") {
    val problems = expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val df = Tables.load(spark, TestSpark.sf0001, table)
      val actual = df.schema.map(f => f.name -> f.dataType).toMap
      val missing = cols.collect { case (n, _) if !actual.contains(n) =>
        s"$table.$n: column MISSING (driver regenerated testdata?)" }
      val wrong = cols.collect {
        case (n, Left(t)) if actual.get(n).exists(_ != t) =>
          s"$table.$n: expected $t, got ${actual(n)}"
        case (n, Right("time-like")) if actual.get(n).exists(dt =>
            !timeLike.contains(dt)) =>
          // strict: this column's loader does NOT normalize LongType, so
          // a TIMESTAMP(NANOS) regeneration (read as raw longs under the
          // nanosAsLong legacy flag) must go red here, not surface as
          // AnalysisExceptions across the query set
          s"$table.$n: expected a time-like type, got ${actual(n)} " +
            "(if this is TIMESTAMP(NANOS)-as-long, the loader needs a " +
            "normalizing branch like Tables.events)"
        case (n, Right("time-like-or-long")) if actual.get(n).exists(dt =>
            !timeLike.contains(dt) && dt != LongType) =>
          // events.ts only: its loader branches on LongType nanos
          s"$table.$n: expected a time-like (or long-nanos) type, got ${actual(n)}"
      }
      missing ++ wrong
    }
    assert(problems.isEmpty,
      "testdata schema drift detected — review the Tables loaders and every " +
        "query reading the named columns before trusting the round:\n  " +
        problems.mkString("\n  "))
  }
}
