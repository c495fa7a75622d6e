package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics staples over the events stream — gap-filled
  * activity matrices, funnel progression, and retention cohorts. These
  * are the dashboard queries of any event pipeline; each is spelled so
  * the DuckDB oracle is bit-identical (dates via `to_date`/CAST AS
  * DATE, the q_events_daily precedent; week buckets as integer
  * day-offsets `DIV 7` — pure arithmetic, no engine week-start
  * license).
  *
  * 100 TB shape: everything is keyed aggregation on user_id/day — the
  * natural event-table partitioning — with map-side combine; the only
  * non-equi construct is gap-fill's dense frame, which is the OUTPUT of
  * that operator by definition (users × days), built from a broadcast
  * 1-row span crossJoin, never an event-by-event product.
  */
object EventAnalytics {

  /** Per-user DAILY activity matrix for one event type with missing
    * days filled at zero over the corpus-wide [min-day, max-day] span —
    * the dense input retention/engagement models train on (a missing
    * row and a zero row are different facts, and downstream models
    * only see rows).
    *
    * Plan: one 1-row (min, max) aggregate → `sequence` explode to the
    * day axis (span-sized, broadcast) → crossJoin with the distinct
    * user axis → left join of the sparse per-(user, day) counts. The
    * crossJoin IS the contract: the output is the dense matrix; its
    * size is users × days regardless of spelling.
    */
  def dailyGapFill(spark: SparkSession, sfDir: String,
                   eventType: String = "purchase"): DataFrame =
    dailyGapFillOn(Tables.events(spark, sfDir), eventType)

  def dailyGapFillOn(events: DataFrame, eventType: String): DataFrame = {
    val withDay = events.select(col("user_id"), col("event_type"),
      to_date(col("ts")).as("day"))
    val span = withDay.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val days = span.select(explode(
      sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val users = withDay.select(col("user_id")).distinct()
    val counts = withDay.filter(col("event_type") === eventType)
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n"))
    users.crossJoin(broadcast(days))
      .join(counts, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n"), lit(0L)).as("n_events"))
  }

  /** Ordered FUNNEL progression per user: stage 1 = earliest `view`,
    * stage 2 = earliest `click` strictly after it, stage 3 = earliest
    * `purchase` strictly after that. Emits (user_id, funnel_stage
    * 0..3) for every user in the events table — the strict-ordering
    * semantics (a purchase before the first click does not count) that
    * separates a funnel from three independent counts.
    *
    * Plan: three filtered per-user min-aggregates chained by user-keyed
    * equi-joins — each stage's input is one event-type slice, each
    * aggregate map-side combines, and the join key is the table's
    * natural user partitioning. No windows, no self-join on time.
    */
  def funnel(spark: SparkSession, sfDir: String): DataFrame =
    funnelOn(Tables.events(spark, sfDir), Seq("view", "click", "purchase"))

  /** [[funnelOn]] with a CONVERSION WINDOW: stage i counts only when it
    * happens within `maxGapUs` microseconds of the (first) reach of
    * stage i−1 — "clicked within a day of the first view", the funnel
    * product analytics actually reports. The gate anchors on the
    * previous stage's FIRST reach (the same anchoring the strict-order
    * funnel uses), so the windowed stages are monotone ≤ the unwindowed
    * ones by construction. Same plan shape: per-stage filtered
    * min-aggregates chained by user-keyed equi-joins.
    */
  def funnelWithin(spark: SparkSession, sfDir: String,
                   maxGapUs: Long = 86400000000L): DataFrame =
    funnelOn(Tables.events(spark, sfDir), Seq("view", "click", "purchase"),
      Some(maxGapUs))

  def funnelOn(events: DataFrame, stages: Seq[String],
               maxGapUs: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnelOn needs at least one stage")
    val users = events.select(col("user_id")).distinct()
    // fold: frame of (user_id, reach_ts) for users reaching each stage
    val reached: Seq[DataFrame] = stages.zipWithIndex
      .foldLeft(List.empty[DataFrame]) { case (acc, (stage, i)) =>
        val slice = events.filter(col("event_type") === stage)
          .select(col("user_id"), col("ts"))
        val gated = acc.headOption match {
          case None => slice
          case Some(prev) =>
            val joined = slice.join(prev.select(col("user_id"),
              col("reach_ts").as("prev_ts")), "user_id")
              .filter(col("ts") > col("prev_ts"))
            maxGapUs.fold(joined)(gap => joined.filter(
                unix_micros(col("ts")) - unix_micros(col("prev_ts")) <= gap))
              .select(col("user_id"), col("ts"))
        }
        gated.groupBy(col("user_id"))
          .agg(min(col("ts")).as("reach_ts")) :: acc
      }.reverse
    reached.zipWithIndex.foldLeft(
      users.withColumn("funnel_stage", lit(0L))) { case (acc, (r, i)) =>
      acc.join(r.select(col("user_id"), lit(1L).as(s"s$i")), Seq("user_id"), "left")
        .withColumn("funnel_stage",
          when(col(s"s$i") === 1L, lit(i + 1L)).otherwise(col("funnel_stage")))
        .drop(s"s$i")
    }.select(col("user_id"), col("funnel_stage"))
  }

  /** RETENTION cohorts: users grouped by their first-activity day, and
    * for each week offset k = (day − cohort_day) DIV 7, how many cohort
    * members were active in that week. Week buckets are integer
    * day-offset arithmetic — no calendar-week license (DuckDB and Spark
    * agree on `date_trunc('week')` today, but an integer DIV cannot
    * drift, and product retention is anchored to signup anyway, not to
    * Mondays).
    *
    * Plan: per-user first-day aggregate (user-keyed), distinct
    * (user, day) activity, one user-keyed equi-join, then the
    * (cohort_day, week_k) rollup — all map-side-combining aggregates on
    * natural keys.
    */
  def retention(spark: SparkSession, sfDir: String): DataFrame =
    retentionOn(Tables.events(spark, sfDir))

  def retentionOn(events: DataFrame): DataFrame = {
    val activity = events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val cohorts = activity.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    activity.join(cohorts, "user_id")
      .select(col("user_id"), col("cohort_day"),
        expr("CAST(datediff(day, cohort_day) AS BIGINT) DIV 7").as("week_k"))
      .distinct()
      .groupBy(col("cohort_day"), col("week_k"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** COHORT REVENUE MATRIX — [[retentionOn]]'s monetized sibling: per
    * (signup-day cohort, week offset), the distinct active users, the
    * event count, and the revenue in cents fixed-point (per-event
    * decimal(18,2)·100 cast BEFORE the sum, so the aggregate is a
    * deterministic long sum — the money convention everywhere in this
    * repo). The LTV-curve input every growth dashboard starts from.
    *
    * Plan: one per-user min-day aggregate joined back (user-keyed
    * shuffles), one (cohort, week) aggregate with map-side combine;
    * the distinct-user count rides the same aggregate.
    */
  def cohortRevenue(spark: SparkSession, sfDir: String): DataFrame =
    cohortRevenueOn(Tables.events(spark, sfDir))

  def cohortRevenueOn(events: DataFrame): DataFrame = {
    val withDay = events.select(col("user_id"), to_date(col("ts")).as("day"),
      (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val cohorts = withDay.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    withDay.join(cohorts, "user_id")
      .select(col("user_id"), col("cohort_day"), col("cents"),
        expr("CAST(datediff(day, cohort_day) AS BIGINT) DIV 7").as("week_k"))
      .groupBy(col("cohort_day"), col("week_k"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        sum(col("cents")).as("rev_cents"))
  }

  /** WEEKLY CHURN — per global week index (days since the corpus-wide
    * first day, DIV 7): how many users were active, and how many of
    * those are GONE the following week. The last observed week has no
    * following week to judge against, so it reports actives only
    * (n_churned 0 by convention) — absence of evidence, not churn.
    *
    * Plan: one (user, week) distinct (the activity set), a LEFT ANTI
    * self-join shifted by one week for the churn bit, two week-keyed
    * counts joined on the ~weeks-sized axis. The global min/max days
    * arrive as a broadcast 1-row frame (the gap-fill precedent); all
    * shuffles key on user or week — the table's natural partitions.
    */
  def weeklyChurn(spark: SparkSession, sfDir: String): DataFrame =
    weeklyChurnOn(Tables.events(spark, sfDir))

  def weeklyChurnOn(events: DataFrame): DataFrame = {
    val days = events.select(col("user_id"), to_date(col("ts")).as("day"))
    val span = days.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val weeks = days.crossJoin(broadcast(span))
      .select(col("user_id"),
        expr("CAST(datediff(day, d0) AS BIGINT) DIV 7").as("week_k"),
        expr("CAST(datediff(d1, d0) AS BIGINT) DIV 7").as("max_week"))
      .distinct()
    val gone = weeks.as("w").join(
        weeks.select(col("user_id"), (col("week_k") - 1L).as("week_k")).as("n"),
        Seq("user_id", "week_k"), "left_anti")
      .filter(col("week_k") < col("max_week"))
      .groupBy(col("week_k")).agg(count(lit(1)).as("n_churned"))
    weeks.groupBy(col("week_k")).agg(count(lit(1)).as("n_active"))
      .join(gone, Seq("week_k"), "left")
      .select(col("week_k"), col("n_active"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }

  /** EVENT-TYPE TRANSITION MATRIX — the first-order Markov view of the
    * event stream: for every (current, next) event-type pair, the
    * transition count and probability in ppm of the CURRENT type's
    * outgoing total. Adjacency is per user in (ts, event_id) order
    * (the [[topEventPathsOn]] determinism contract); probabilities are
    * exact integer division, rows sum to ≤ 10^6 per source type
    * (truncation only).
    *
    * Plan: one lead() window per user partition, one pair-keyed count
    * (types² rows at most), and the outgoing totals join back on the
    * tiny type axis — corpus touched once.
    */
  def eventTransitions(spark: SparkSession, sfDir: String): DataFrame =
    eventTransitionsOn(Tables.events(spark, sfDir))

  def eventTransitionsOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("event_type"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    val outTotals = pairs.groupBy(col("event_type"))
      .agg(sum(col("n")).as("out_n"))
    pairs.join(broadcast(outTotals), Seq("event_type"))
      .select(col("event_type"), col("next_type"), col("n"),
        expr("n * 1000000 DIV out_n").as("p_ppm"))
  }

  /** TOP EVENT PATHS — the most common length-3 event-type sequences
    * users actually walk (the "view > view > click" navigation mining
    * behind funnel design). Consecutive means adjacent in the user's
    * own (ts, event_id)-ordered stream — event_id breaks timestamp
    * ties, so the sequence (and thus every count) is deterministic on
    * any engine. Top 10 by count, path string as the tiebreak.
    *
    * Plan: two lead() windows PARTITIONED BY user (event-time order
    * within a user's partition — no global sort), then one path-keyed
    * count and a TakeOrdered top-k. Skew bound: a window over one
    * user's events is that user's history, the same bound every
    * sessionization op in the suite lives with.
    */
  def topEventPaths(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame =
    topEventPathsOn(Tables.events(spark, sfDir), k)

  def topEventPathsOn(events: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_type"),
        lead(col("event_type"), 1).over(w).as("e2"),
        lead(col("event_type"), 2).over(w).as("e3"))
      .filter(col("e3").isNotNull)
      .select(concat_ws(" > ", col("event_type"), col("e2"), col("e3"))
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(k)
  }

  /** USER GROWTH CURVE — per day, how many users appeared for the
    * FIRST time and how many have been seen in total so far: the
    * acquisition panel. One user-keyed min-day aggregate collapses the
    * corpus, a day-keyed count collapses that to the ~days frame, and
    * the cumulative sum runs over THAT bounded frame only (the
    * tokenShards global-window exemption class — never the corpus).
    */
  def userGrowth(spark: SparkSession, sfDir: String): DataFrame =
    userGrowthOn(Tables.events(spark, sfDir))

  def userGrowthOn(events: DataFrame): DataFrame = {
    val firstDay = events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy(col("user_id")).agg(min(col("day")).as("day"))
    firstDay.groupBy(col("day")).agg(count(lit(1)).as("n_new"))
      .select(col("day"), col("n_new"),
        sum(col("n_new")).over(Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, 0)).as("n_total"))
  }

  /** ROLLING 7-DAY ACTIVE USERS — for every day, how many distinct
    * users were active in the trailing `window` days (the WAU panel
    * metric). Exact, not a sketch, via the standard cover-day trick:
    * each (user, active-day) row fans out to the ≤`window` future days
    * it keeps the user "active" for, the fan-out deduplicates, and one
    * count-per-day aggregate reads off the answer — O(window ×
    * activity) rows total, never a per-day distinct scan and never a
    * sliding-window state machine. Cover days past the corpus-wide
    * last day are clipped (a day after the data ends is not a metric).
    *
    * Plan: (user, day) distinct → broadcast 1-row max-day → sequence
    * explode (≤window per row) → distinct → day-keyed count. All
    * shuffles key on user or day.
    */
  def rollingActives(spark: SparkSession, sfDir: String,
                     window: Int = 7): DataFrame =
    rollingActivesOn(Tables.events(spark, sfDir), window)

  def rollingActivesOn(events: DataFrame, window: Int): DataFrame = {
    require(window >= 1, s"rollingActives needs window >= 1, got $window")
    val act = events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val last = act.agg(max(col("day")).as("d1"))
    act.crossJoin(broadcast(last))
      .select(col("user_id"), explode(sequence(col("day"),
        least(date_add(col("day"), window - 1), col("d1")))).as("day"))
      .distinct()
      .groupBy(col("day"))
      // the output column names its own window so rollingActivesOn(df,
      // 30) reads n_active_30d, not a misleading hardcoded 7d (r12
      // ADVICE)
      .agg(count(lit(1)).as(s"n_active_${window}d"))
  }

  /** FIRST/LAST-TOUCH ATTRIBUTION — per user, the event type of their
    * earliest and latest events plus their event count: the two-ends
    * summary marketing attribution starts from. The arg-min/arg-max
    * rides `min/max(struct(ts, event_id, event_type))` — event_id
    * breaks timestamp ties, so both touches are deterministic on any
    * engine — in ONE hash aggregate with map-side combine: no windows,
    * no sort, state two structs per user.
    */
  def firstLastTouch(spark: SparkSession, sfDir: String): DataFrame =
    firstLastTouchOn(Tables.events(spark, sfDir))

  def firstLastTouchOn(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("event_type"))).as("f"),
        max(struct(col("ts"), col("event_id"), col("event_type"))).as("l"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("f.event_type").as("first_touch"),
        col("l.event_type").as("last_touch"),
        col("n_events"))

  /** PER-TYPE DAILY-VOLUME TREND — the ordinary-least-squares slope of
    * each event type's daily count series, in events-per-day scaled to
    * ppm, computed ENTIRELY from sufficient statistics:
    * slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) with x the day offset
    * from the corpus-wide first day and y the daily count. Every term
    * is an integer sum, so the scaled integer division is bit-exact on
    * any engine — no float regression, no sketch. A single-day series
    * has no slope (NULL, not 0 — "flat" is a claim, "unjudgeable" is
    * not). Magnitude bound: day-grain series keep n·Σxy·10^6 within
    * BIGINT for ~10-year spans at ~10^9 events/day; split into eras
    * beyond that.
    *
    * Plan: one (type, day) hash aggregate collapses the corpus, the
    * day-0 anchor rides a broadcast 1-row frame, and the five sums fold
    * in one more aggregate over the ~types×days frame — map-side
    * combine end to end, output one row per type.
    */
  def dailyTrend(spark: SparkSession, sfDir: String): DataFrame =
    dailyTrendOn(Tables.events(spark, sfDir))

  def dailyTrendOn(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("y"))
    val d0 = daily.agg(min(col("day")).as("d0"))
    val pts = daily.crossJoin(broadcast(d0))
      .select(col("event_type"),
        expr("CAST(datediff(day, d0) AS BIGINT)").as("x"), col("y"))
    pts.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("event_type"), col("n_days"),
        when(col("n_days") * col("sxx") - col("sx") * col("sx") =!= 0L,
          expr("(n_days * sxy - sx * sy) * 1000000 DIV " +
            "(n_days * sxx - sx * sx)"))
          .as("slope_ppm"))
  }

  /** INTER-EVENT LATENCY HISTOGRAM — the distribution of gaps between a
    * user's consecutive events in LOG2 buckets (bucket = bit length of
    * the gap in microseconds, the integer `length(bin(x))` staircase
    * the LM scorers already share across engines): the latency panel of
    * an event pipeline without a single float or percentile sketch.
    * Same-timestamp neighbors land in bucket 1 (bin(0) = "0").
    *
    * Plan: one lag() window per user partition (event-time order
    * within a user — the sessionization skew bound), then one
    * ~64-bucket hash aggregate. Nothing global, nothing unbounded.
    */
  def latencyHistogram(spark: SparkSession, sfDir: String): DataFrame =
    latencyHistogramOn(Tables.events(spark, sfDir))

  def latencyHistogramOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .select((col("us") - lag(col("us"), 1).over(w)).as("delta"))
      .filter(col("delta").isNotNull)
      .select(length(bin(col("delta"))).cast("long").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** DAILY REVENUE ANOMALY FLAGS — the monitoring query of an event
    * pipeline: per day, total revenue in cents plus a z-score-style flag
    * against the TRAILING 7 observed days (the day itself excluded, so a
    * spike cannot absorb itself into its own baseline). Days without a
    * full 7-day history emit flag 0 — a cold-start day is unjudgeable,
    * not anomalous.
    *
    * The test is exact INTEGER arithmetic end-to-end, so any engine
    * agrees bit-for-bit (no sqrt, no float variance):
    * |x − μ| > 2σ  ⇔  (n·x − S)² > 4·(n·Q − S²), with S = Σcents,
    * Q = Σcents² over the window — the driver-hash-stable spelling of
    * "two sample standard deviations". Magnitude bound: per-day cents
    * up to ~10^9 keep n·Q − S² within BIGINT; beyond that, bucket days
    * into shards or drop to per-source series first.
    *
    * Plan: one (day) hash aggregate (map-side combine over the natural
    * event-time partitioning) collapses the table to ~days rows, then
    * ONE window pass over that tiny frame computes the three running
    * sums in a single exchange — the window never sees event-level
    * rows, so the operator's shuffle is O(days) regardless of corpus
    * size.
    */
  def dailyAnomalies(spark: SparkSession, sfDir: String): DataFrame =
    dailyAnomaliesOn(Tables.events(spark, sfDir))

  def dailyAnomaliesOn(events: DataFrame): DataFrame = {
    val daily = events
      .select(to_date(col("ts")).as("day"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy(col("day"))
      .agg(sum(col("cents")).as("cents"))
    val win = Window.orderBy(col("day")).rowsBetween(-7, -1)
    daily
      .select(col("day"), col("cents"),
        count(lit(1)).over(win).as("n"),
        sum(col("cents")).over(win).as("s"),
        sum(col("cents") * col("cents")).over(win).as("q"))
      .select(col("day"), col("cents"),
        when(col("n") === 7 &&
          (lit(7L) * col("cents") - col("s")) *
            (lit(7L) * col("cents") - col("s")) >
            lit(4L) * (lit(7L) * col("q") - col("s") * col("s")),
          lit(1L)).otherwise(lit(0L)).as("is_anomaly"))
  }
}
