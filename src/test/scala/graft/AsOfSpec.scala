package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import java.sql.Timestamp

class AsOfSpec extends SparkSpec {
  import spark.implicits._
  val sf = TestSpark.sf0001

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of semantics on a hand-built case: ties, equal-time, no-prior") {
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 10:00:00"), 101L), // equal time: larger val wins
      (1L, ts("2024-01-01 12:00:00"), 102L),
      (2L, ts("2024-01-01 11:00:00"), 200L),
    ).toDF("k", "t", "v")
    val left = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10L), // before any order -> null
      (1L, ts("2024-01-01 10:00:00"), 11L), // exactly at -> 101 (at-or-before, tie-break)
      (1L, ts("2024-01-01 11:59:59"), 12L), // between -> 101
      (1L, ts("2024-01-01 12:00:00"), 13L), // exactly at second -> 102
      (2L, ts("2024-01-02 00:00:00"), 20L), // other key -> 200
      (3L, ts("2024-01-02 00:00:00"), 30L), // key with no right rows -> null
    ).toDF("k", "t", "id")
    val got = AsOf.asOfJoin(left, col("k"), col("t"), col("id"),
        right, col("k"), col("t"), col("v"), "v")
      .as[(Long, Option[Long])].collect().toMap
    assert(got === Map(
      10L -> None, 11L -> Some(101L), 12L -> Some(101L),
      13L -> Some(102L), 20L -> Some(200L), 30L -> None))
  }

  test("banded as-of handles ties, equal-time, no-prior identically") {
    // same hand-built case as above, with a band width small enough (1h)
    // that the rows spread across many bands and the carry path runs
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 10:00:00"), 101L),
      (1L, ts("2024-01-01 12:00:00"), 102L),
      (2L, ts("2024-01-01 11:00:00"), 200L),
    ).toDF("k", "t", "v")
    val left = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10L),
      (1L, ts("2024-01-01 10:00:00"), 11L),
      (1L, ts("2024-01-01 11:59:59"), 12L),
      (1L, ts("2024-01-01 12:00:00"), 13L),
      (2L, ts("2024-01-02 00:00:00"), 20L),
      (3L, ts("2024-01-02 00:00:00"), 30L),
    ).toDF("k", "t", "id")
    val got = AsOf.asOfJoinBanded(left, col("k"), col("t"), col("id"),
        right, col("k"), col("t"), col("v"), "v", bandUs = 3600L * 1000000L)
      .as[(Long, Option[Long])].collect().toMap
    assert(got === Map(
      10L -> None, 11L -> Some(101L), 12L -> Some(101L),
      13L -> Some(102L), 20L -> Some(200L), 30L -> None))
  }

  test("null right values: banded carries the band's earlier non-null like plain") {
    // regression for the bandLast null-v fix: the band's LATEST right row
    // has null v — max_by over (t, v) without the isNotNull filter would
    // carry null and lose 100, while the plain last(v, ignoreNulls)
    // window keeps it
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(100L)),
      (1L, ts("2024-01-01 10:30:00"), Option.empty[Long]), // latest in band, null v
      (1L, ts("2024-01-03 10:00:00"), Some(101L)),
    ).toDF("k", "t", "v")
    val left = Seq(
      (1L, ts("2024-01-01 11:00:00"), 10L), // same band, after the null row
      (1L, ts("2024-01-02 11:00:00"), 11L), // later band: carry must be 100
      (1L, ts("2024-01-03 11:00:00"), 12L), // after the next non-null: 101
    ).toDF("k", "t", "id")
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.as[(Long, Option[Long])].collect().toMap
    val plain = run(AsOf.asOfJoin(left, col("k"), col("t"), col("id"),
      right, col("k"), col("t"), col("v"), "v"))
    val banded = run(AsOf.asOfJoinBanded(left, col("k"), col("t"), col("id"),
      right, col("k"), col("t"), col("v"), "v"))
    assert(plain === Map(10L -> Some(100L), 11L -> Some(100L), 12L -> Some(101L)))
    assert(banded === plain, "null-v right rows must not erase the carry")
  }

  test("banded as-of equals union+window under a hot key across many bands") {
    // one hot key: 400 left rows at 30s spacing, right rows every 5min,
    // band = 10min → ~20 bands, every band boundary exercised; plus a
    // cold key and a right-only key
    val base = ts("2024-01-01 00:00:00").getTime
    val right = ((0 until 40).map(i => (1L, new Timestamp(base + i * 300000L), 1000L + i)) ++
      Seq((2L, new Timestamp(base + 1000L), 5L))).toDF("k", "t", "v")
    val left = ((0 until 400).map(i => (1L, new Timestamp(base + i * 30000L), i.toLong)) ++
      Seq((3L, new Timestamp(base), 9999L))).toDF("k", "t", "id")
    val banded = AsOf.asOfJoinBanded(left, col("k"), col("t"), col("id"),
        right, col("k"), col("t"), col("v"), "v", bandUs = 600L * 1000000L)
      .as[(Long, Option[Long])].collect().toMap
    val plain = AsOf.asOfJoin(left, col("k"), col("t"), col("id"),
        right, col("k"), col("t"), col("v"), "v")
      .as[(Long, Option[Long])].collect().toMap
    assert(banded === plain)
  }

  test("union+window equals the naive join+rank spelling on real data") {
    val fast = AsOf.asOfJoin(
        Tables.events(spark, sf), col("user_id"), col("ts"), col("event_id"),
        Tables.orders(spark, sf), col("o_custkey"), col("o_orderdate"),
        col("o_orderkey"), "o_orderkey")
      .as[(Long, Option[Long])].collect().toMap
    // naive: per-event fan-out join + top-1 window (the spelling that
    // explodes at scale, kept here as ground truth)
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"))
    val ord = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val naive = ev.join(ord,
        col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"),
        "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("o_orderkey"))
      .as[(Long, Option[Long])].collect().toMap
    assert(fast === naive)
  }

  test("plain as-of plan is one shuffle + sort: no join operator at all") {
    val plan = AsOf.asOfJoin(
        Tables.events(spark, sf), col("user_id"), col("ts"), col("event_id"),
        Tables.orders(spark, sf), col("o_custkey"), col("o_orderdate"),
        col("o_orderkey"), "o_orderkey")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"union+window must not join:\n$plan")
    assert(plan.contains("Window"))
  }

  test("banded as-of (production path) equals plain on real data; equi-join only") {
    val banded = AsOf.eventsAsOfOrders(spark, sf)
    val plain = AsOf.asOfJoin(
        Tables.events(spark, sf), col("user_id"), col("ts"), col("event_id"),
        Tables.orders(spark, sf), col("o_custkey"), col("o_orderdate"),
        col("o_orderkey"), "o_orderkey")
      .as[(Long, Option[Long])].collect().toMap
    assert(banded.as[(Long, Option[Long])].collect().toMap === plain)
    // the carry join is on (key, band) — never a row-fan-out or cartesian
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
