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
    // null padding must carry the REAL column types or the union either
    // fails type resolution or silently widens — resolve them against
    // each side's schema (analysis-only, no execution)
    val vType = right.select(rightVal.as("v")).schema.head.dataType
    val lidType = left.select(leftId.as("lid")).schema.head.dataType
    val r = right.select(rightKey.as("k"), rightTime.as("t"),
      lit(0).as("tag"), rightVal.as("v"), lit(null).cast(lidType).as("lid"))
    val l = left.select(leftKey.as("k"), leftTime.as("t"),
      lit(1).as("tag"), lit(null).cast(vType).as("v"), leftId.as("lid"))
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

  /** Skew-safe banded as-of join: identical semantics to [[asOfJoin]],
    * but the per-key running window is split into time bands of `bandUs`
    * microseconds, so a hot key's history is processed by MANY tasks
    * (one per band) instead of one. Two phases:
    *
    *   1. in-band: the same running `last(v, ignoreNulls)` window, now
    *      partitioned by (key, band) — resolves every left row that has
    *      a right row at-or-before it WITHIN its own band;
    *   2. carry: one row per (key, band) — the band's final right value
    *      (max_by over (t, v), i.e. the same tie-break as the window) —
    *      then a tiny per-key window over BANDS carries the latest
    *      non-null value forward; left rows unresolved in-band coalesce
    *      to their band's carry.
    *
    * The event-level shuffle/sort is on (key, band) — under power-law
    * skew the hottest task shrinks by the band factor; the per-key
    * serial work drops from O(events) to O(bands). AsOfSpec asserts
    * exact equality with [[asOfJoin]] on the fixture and on a synthetic
    * hot-key dataset. Time columns must be TimestampType (banded via
    * unix_micros).
    */
  def asOfJoinBanded(left: DataFrame, leftKey: Column, leftTime: Column, leftId: Column,
                     right: DataFrame, rightKey: Column, rightTime: Column,
                     rightVal: Column, outName: String,
                     bandUs: Long = 90L * 86400L * 1000000L): DataFrame = {
    val vType = right.select(rightVal.as("v")).schema.head.dataType
    val lidType = left.select(leftId.as("lid")).schema.head.dataType
    val r = right.select(rightKey.as("k"), rightTime.as("t"),
      lit(0).as("tag"), rightVal.as("v"), lit(null).cast(lidType).as("lid"))
    val l = left.select(leftKey.as("k"), leftTime.as("t"),
      lit(1).as("tag"), lit(null).cast(vType).as("v"), leftId.as("lid"))
    val u = r.union(l).withColumn("band", floor(unix_micros(col("t")) / bandUs))
    val wIn = Window.partitionBy(col("k"), col("band"))
      .orderBy(col("t").asc, col("tag").asc, col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBand = u.withColumn("v_run", last(col("v"), ignoreNulls = true).over(wIn))
    // the band's final NON-NULL right value under the SAME (t, v)
    // ordering the window uses — max_by on the (t, v) struct compares
    // lexicographically. Null-v right rows are dropped here to match the
    // plain spelling's `last(v, ignoreNulls)` window exactly: a band
    // whose latest right row has null v must still carry the band's
    // earlier non-null value (and nulls sort FIRST under v asc, so the
    // equal-time tie-break is unchanged).
    val bandLast = u.filter(col("tag") === 0 && col("v").isNotNull)
      .groupBy(col("k"), col("band"))
      .agg(max_by(col("v"), struct(col("t"), col("v"))).as("band_v"))
    // one row per (key, band) that OCCURS on either side; carry = latest
    // non-null band_v over strictly earlier bands
    val wB = Window.partitionBy(col("k")).orderBy(col("band").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = u.select(col("k"), col("band")).distinct()
      .join(bandLast, Seq("k", "band"), "left")
      .withColumn("carry_v", last(col("band_v"), ignoreNulls = true).over(wB))
      .select(col("k"), col("band"), col("carry_v"))
    inBand.filter(col("tag") === 1)
      .join(carry, Seq("k", "band"))
      .select(col("lid"), coalesce(col("v_run"), col("carry_v")).as(outName))
  }

  /** Each event matched to the user's most recent order at or before the
    * event time: the point-in-time feature-join shape (label events with
    * the state that was current when they happened). Uses the skew-safe
    * banded spelling — on this fixture every order (1995-2001) precedes
    * every event (2024), so the cross-band carry path does all the work.
    */
  def eventsAsOfOrders(spark: SparkSession, sfDir: String): DataFrame =
    asOfJoinBanded(
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
                 gapSec: Long = 600): DataFrame =
    sessionizeEvents(
      Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us")),
      gapSec)

  /** Event-level single-window sessionization over (event_id, user_id,
    * us) — the simple spelling; a hot user's entire history lands in one
    * task. Production path is [[sessionizeSaltedEvents]].
    */
  def sessionizeEvents(ev: DataFrame, gapSec: Long = 600): DataFrame = {
    val gapUs = gapSec * 1000000L
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    ev
      .withColumn("new_session",
        when(col("us") - lag(col("us"), 1).over(w) <= gapUs, lit(0L)).otherwise(lit(1L)))
      .withColumn("session_seq", sum(col("new_session")).over(w))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"), max(col("us")).as("end_us"))
  }

  /** Skew-safe two-phase ("salted") sessionization — identical output to
    * [[sessionizeEvents]], proven in RangeJoinSpec.
    *
    * Phase 1 partitions the event-level window by (user, time band): the
    * heavy per-event lag/sum sort is split across bands, so a hot user's
    * history is processed by #bands tasks instead of one. Within each
    * band this produces session FRAGMENTS (maximal runs with gaps <=
    * gapUs). Phase 2 re-runs the same gap rule over the fragments — one
    * row per fragment, events/sessions-fold smaller — merging fragments
    * whose boundary gap (next.start - prev.end, exactly the event-level
    * boundary gap) is within gapUs, and numbering merged sessions in
    * start order, which equals the event-order numbering because session
    * starts strictly increase per user.
    *
    * Correctness: bands are time-disjoint, so fragments never interleave
    * and every in-band gap was already resolved by phase 1; the only
    * gaps phase 1 cannot see are between the last event of band b and
    * the first of band b' > b — exactly prev.end → next.start. A session
    * spanning many bands merges chainwise. `bandSec` only shifts work
    * between phases (any value is correct); default 1 day >> any
    * plausible gap.
    */
  def sessionizeSaltedEvents(ev: DataFrame, gapSec: Long = 600,
                             bandSec: Long = 86400L): DataFrame = {
    val gapUs = gapSec * 1000000L
    val bandUs = bandSec * 1000000L
    val w1 = Window.partitionBy(col("user_id"), col("band"))
      .orderBy(col("us").asc, col("event_id").asc)
    val frags = ev
      .withColumn("band", floor(col("us") / bandUs))
      .withColumn("new_frag",
        when(col("us") - lag(col("us"), 1).over(w1) <= gapUs, lit(0L)).otherwise(lit(1L)))
      .withColumn("frag_seq", sum(col("new_frag")).over(w1))
      .groupBy(col("user_id"), col("band"), col("frag_seq"))
      .agg(count(lit(1)).as("n_ev"),
        min(col("us")).as("f_start"), max(col("us")).as("f_end"))
    val w2 = Window.partitionBy(col("user_id")).orderBy(col("f_start").asc)
    frags
      .withColumn("new_session",
        when(col("f_start") - lag(col("f_end"), 1).over(w2) <= gapUs, lit(0L))
          .otherwise(lit(1L)))
      .withColumn("session_seq", sum(col("new_session")).over(w2))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(sum(col("n_ev")).as("n_events"),
        min(col("f_start")).as("start_us"), max(col("f_end")).as("end_us"))
  }

  /** [[sessionizeSaltedEvents]] over the events table — the production
    * sessionization path (q_event_sessions).
    */
  def sessionizeSalted(spark: SparkSession, sfDir: String,
                       gapSec: Long = 600): DataFrame =
    sessionizeSaltedEvents(
      Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us")),
      gapSec)

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
