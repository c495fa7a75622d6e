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

  test("union+window equals the naive join+rank spelling on real data") {
    val fast = AsOf.eventsAsOfOrders(spark, sf)
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

  test("as-of plan is one shuffle + sort: no join operator at all") {
    val plan = AsOf.eventsAsOfOrders(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"union+window must not join:\n$plan")
    assert(plan.contains("Window"))
  }
}
