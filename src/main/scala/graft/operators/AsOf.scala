package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** As-of (point-in-time) join — the canonical operator Spark's built-in
  * join surface lacks (SURVEY.md §7.3 custom-operator class, route (a):
  * composed from existing ops).
  *
  * Implemented the scale-correct way: UNION both sides tagged, one
  * shuffle on the key, one per-key sort, and a running `last(...,
  * ignoreNulls)` window carries the most recent right-side value forward
  * into each left row. Cost is O((|L|+|R|) log) per key with NO join
  * fan-out — the naive spelling (equi-join on key + time filter + window
  * rank) multiplies each left row by every earlier right row before
  * discarding all but one, which explodes on active keys at scale.
  * AsOfSpec asserts both spellings agree.
  *
  * Tie semantics: a right row at exactly the left row's time IS visible
  * ("at or before"); among right rows with equal time the largest
  * `rightVal` wins (deterministic).
  */
object AsOf {

  /** Generic as-of: for each left row, the `rightVal` of the latest
    * right row with rightTime <= leftTime on the same key; null when no
    * prior right row exists. Output: leftId, value columns.
    */
  def asOfJoin(left: DataFrame, leftKey: Column, leftTime: Column, leftId: Column,
               right: DataFrame, rightKey: Column, rightTime: Column,
               rightVal: Column, outName: String): DataFrame = {
    val r = right.select(rightKey.as("k"), rightTime.as("t"),
      lit(0).as("tag"), rightVal.as("v"), lit(null).cast("long").as("lid"))
    val l = left.select(leftKey.as("k"), leftTime.as("t"),
      lit(1).as("tag"), lit(null).cast("long").as("v"), leftId.as("lid"))
    // sort (time, tag, v): right rows precede left rows at equal time
    // ("at or before"), and among equal-time right rows the running
    // last() lands on the largest v — the deterministic tie-break
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t").asc, col("tag").asc, col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.union(l)
      .withColumn("asof_v", last(col("v"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("lid"), col("asof_v").as(outName))
  }

  /** Each event matched to the user's most recent order at or before the
    * event time: the point-in-time feature-join shape (label events with
    * the state that was current when they happened).
    */
  def eventsAsOfOrders(spark: SparkSession, sfDir: String): DataFrame =
    asOfJoin(
      Tables.events(spark, sfDir), col("user_id"), col("ts"), col("event_id"),
      Tables.orders(spark, sfDir), col("o_custkey"), col("o_orderdate"),
      col("o_orderkey"), "o_orderkey")
      .withColumnRenamed("lid", "event_id")

  /** Gap-based sessionization: events of a user belong to one session
    * while consecutive gaps stay <= `gapSec`. Classic two-window shape —
    * lag() marks session starts, a running sum numbers them — so the
    * whole operator is ONE shuffle on user_id and two sorts that
    * Catalyst collapses into one (same window spec). Output: one row per
    * session with integer-microsecond bounds (engine-portable).
    */
  def sessionize(spark: SparkSession, sfDir: String,
                 gapSec: Long = 600): DataFrame = {
    val gapUs = gapSec * 1000000L
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("new_session",
        when(col("us") - lag(col("us"), 1).over(w) <= gapUs, lit(0L)).otherwise(lit(1L)))
      .withColumn("session_seq", sum(col("new_session")).over(w))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"), max(col("us")).as("end_us"))
  }

  /** Banded range (interval) self-join: pairs of events from the same
    * user within `windowSec` of each other — the sessionization shape.
    *
    * A naive spelling joins on user and filters |Δt| — per-user
    * quadratic with the time predicate applied AFTER the fan-out. The
    * banded layout buckets time into `windowSec`-wide bands; any
    * qualifying pair lands in the same or adjacent band, so joining on
    * (user, band) ∪ (user, band+1) (via a 2-way explode of one side)
    * bounds each join group to two bands' worth of rows, then the exact
    * time predicate filters band-local candidates. Time arithmetic is
    * integer microseconds end to end — identical truncation on both
    * engines, no interval-type semantics in play.
    */
  def eventPairsWithin(spark: SparkSession, sfDir: String,
                       windowSec: Long = 600): DataFrame = {
    val winUs = windowSec * 1000000L
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("band", floor(col("us") / winUs))
    // the probe side covers its own band and the next, so every
    // qualifying pair is found with the earlier-or-equal-band event as
    // probe; least/greatest + distinct collapses the equal-band case
    // where both role assignments match
    val probe = ev.select(col("event_id").as("id_x"), col("user_id"),
        col("us").as("us_x"), explode(array(col("band"), col("band") + 1)).as("band"))
    val build = ev.select(col("event_id").as("id_y"), col("user_id"),
      col("us").as("us_y"), col("band"))
    probe.join(build, Seq("user_id", "band"))
      .filter(col("id_x") =!= col("id_y") &&
        abs(col("us_x") - col("us_y")) <= winUs)
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"))
      .distinct()
  }
}
