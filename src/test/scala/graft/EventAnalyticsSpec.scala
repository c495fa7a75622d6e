package graft

import graft.operators.EventAnalytics
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Event analytics (q_events_gapfill / q_event_funnel /
  * q_event_retention): values are hash-checked against DuckDB by the
  * driver; this suite pins the semantics the rollups can't show —
  * zero-fill coverage, strict funnel ordering, and cohort anchoring.
  */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, String)*) =
    rows.map { case (u, t, e) => (u, ts(t), e) }
      .toDF("user_id", "ts", "event_type")

  test("gap-fill: every (user, day) cell exists over the global span, zeros included") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "purchase"),
      (1L, "2024-01-03 10:00:00", "purchase"),
      (2L, "2024-01-02 10:00:00", "view")) // defines span but no purchase
    val got = EventAnalytics.dailyGapFillOn(events, "purchase")
      .select(col("user_id"), col("day").cast("string"), col("n_events"))
      .as[(Long, String, Long)].collect().toSet
    assert(got === Set(
      (1L, "2024-01-01", 1L), (1L, "2024-01-02", 0L), (1L, "2024-01-03", 1L),
      (2L, "2024-01-01", 0L), (2L, "2024-01-02", 0L), (2L, "2024-01-03", 0L)))
  }

  test("gap-fill: two same-day events count 2, span from ALL event types") {
    val events = ev(
      (1L, "2024-01-05 01:00:00", "purchase"),
      (1L, "2024-01-05 02:00:00", "purchase"),
      (1L, "2024-01-07 03:00:00", "error"))
    val got = EventAnalytics.dailyGapFillOn(events, "purchase")
      .select(col("day").cast("string"), col("n_events"))
      .as[(String, Long)].collect().toMap
    assert(got === Map("2024-01-05" -> 2L, "2024-01-06" -> 0L,
      "2024-01-07" -> 0L))
  }

  test("cohort revenue: per-cohort week offsets, distinct users, exact cents") {
    val events = Seq(
      // user 1: cohort 01-01; week 0 twice (same day + day 6), week 1
      (1L, ts("2024-01-01 10:00:00"), 1.50),
      (1L, ts("2024-01-01 11:00:00"), 2.25),
      (1L, ts("2024-01-07 09:00:00"), 0.10),
      (1L, ts("2024-01-08 09:00:00"), 4.00),
      // user 2: cohort 01-01 as well — shares the cohort row
      (2L, ts("2024-01-01 12:00:00"), 10.00),
      // user 3: its own 01-05 cohort
      (3L, ts("2024-01-05 12:00:00"), 3.33)
    ).toDF("user_id", "ts", "value")
    val got = EventAnalytics.cohortRevenueOn(events)
      .select(col("cohort_day").cast("string"), col("week_k"),
        col("n_users"), col("n_events"), col("rev_cents"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("2024-01-01", 0L, 2L, 4L, 1385L), // 150+225+10+1000 (day 6 is week 0)
      ("2024-01-01", 1L, 1L, 1L, 400L),  // day 7 starts week 1
      ("2024-01-05", 0L, 1L, 1L, 333L)))
  }

  test("funnel: strict ordering — a purchase before the first click doesn't count") {
    val events = ev(
      // user 1: full ordered funnel
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 11:00:00", "click"),
      (1L, "2024-01-01 12:00:00", "purchase"),
      // user 2: purchase BEFORE the click -> stops at stage 2
      (2L, "2024-01-01 10:00:00", "view"),
      (2L, "2024-01-01 10:30:00", "purchase"),
      (2L, "2024-01-01 11:00:00", "click"),
      // user 3: click with no prior view -> stage 0
      (3L, "2024-01-01 10:00:00", "click"),
      // user 4: view only
      (4L, "2024-01-01 10:00:00", "view"))
    val got = EventAnalytics.funnelOn(events, Seq("view", "click", "purchase"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 2L, 3L -> 0L, 4L -> 1L))
  }

  test("funnel: equal timestamps do not advance (strictly-after gate)") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:00:00", "click"))
    val got = EventAnalytics.funnelOn(events, Seq("view", "click"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L))
  }

  test("retention: cohorts anchor to first activity, week = day-offset DIV 7") {
    val events = ev(
      // user 1: first day Jan 1, active again day 6 (week 0) and day 8 (week 1)
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-07 10:00:00", "click"),
      (1L, "2024-01-09 10:00:00", "view"),
      // user 2: first day Jan 2, never again
      (2L, "2024-01-02 10:00:00", "view"))
    val got = EventAnalytics.retentionOn(events)
      .select(col("cohort_day").cast("string"), col("week_k"), col("n_users"))
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 1L, 1L),
      ("2024-01-02", 0L, 1L)))
  }

  test("retention: multiple same-week actives count the user once per week") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-02 10:00:00", "view"),
      (1L, "2024-01-03 10:00:00", "view"))
    val got = EventAnalytics.retentionOn(events)
      .as[(java.sql.Date, Long, Long)].collect()
    assert(got.length === 1 && got(0)._2 === 0L && got(0)._3 === 1L)
  }

  test("driver spellings: funnel stages and retention weeks non-vacuous on the fixture") {
    val f = EventAnalytics.funnel(spark, TestSpark.sf0001)
      .groupBy("funnel_stage").count().as[(Long, Long)].collect().toMap
    assert(f.keySet.contains(3L), "no user completes the funnel on the fixture")
    val r = EventAnalytics.retention(spark, TestSpark.sf0001)
      .select("week_k").distinct().as[Long].collect().toSet
    assert(r.size > 1, "single retention week — gap semantics unexercised")
    val g = EventAnalytics.dailyGapFill(spark, TestSpark.sf0001)
    val zeros = g.filter(col("n_events") === 0L).count()
    assert(zeros > 0, "no zero cell — gap-fill vacuous on the fixture")
  }

  test("windowed funnel: gap gate drops late conversions, anchors on first reach") {
    val events = ev(
      // u1: click 30min after view -> stage 2 under a 1h window
      (1L, "2024-01-01 10:00:00", "view"), (1L, "2024-01-01 10:30:00", "click"),
      // u2: click 2h after view -> stays stage 1 under 1h, stage 2 unwindowed
      (2L, "2024-01-01 10:00:00", "view"), (2L, "2024-01-01 12:00:00", "click"),
      // u3: SECOND view 11:30 is in range of the 12:00 click, but the
      // anchor is the FIRST view (10:00) -> still dropped
      (3L, "2024-01-01 10:00:00", "view"), (3L, "2024-01-01 11:30:00", "view"),
      (3L, "2024-01-01 12:00:00", "click"))
    val hour = 3600000000L
    val got = EventAnalytics.funnelOn(events,
      Seq("view", "click", "purchase"), Some(hour))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
    val plain = EventAnalytics.funnelOn(events, Seq("view", "click", "purchase"))
      .as[(Long, Long)].collect().toMap
    assert(plain === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // windowed stages are monotone <= unwindowed on the fixture
    val fw = EventAnalytics.funnelWithin(spark, TestSpark.sf0001)
      .as[(Long, Long)].collect().toMap
    val fp = EventAnalytics.funnel(spark, TestSpark.sf0001)
      .as[(Long, Long)].collect().toMap
    fw.foreach { case (u, s) => assert(s <= fp(u), s"user $u") }
    assert(fw.values.sum < fp.values.sum, "the window must bite on the fixture")
  }

  test("transitions: per-user adjacency, exact ppm shares of outgoing edges") {
    val events = Seq(
      // u1: v->c, c->v, v->c  (v out: 2, c out: 1 within u1)
      (10L, 1L, ts("2024-01-01 10:00:00"), "v"),
      (11L, 1L, ts("2024-01-01 10:01:00"), "c"),
      (12L, 1L, ts("2024-01-01 10:02:00"), "v"),
      (13L, 1L, ts("2024-01-01 10:03:00"), "c"),
      // u2: v->p  (no cross-user edge from u1's trailing 'c')
      (20L, 2L, ts("2024-01-02 10:00:00"), "v"),
      (21L, 2L, ts("2024-01-02 10:01:00"), "p"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = EventAnalytics.eventTransitionsOn(events)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // v out-edges: v->c x2, v->p x1 -> 666666 / 333333 ppm; c->v 1/1
    assert(got === Map(
      ("v", "c") -> (2L, 666666L), ("v", "p") -> (1L, 333333L),
      ("c", "v") -> (1L, 1000000L)))
    // ppm rows per source type sum to <= 1e6 (truncation only) on the fixture
    val fix = EventAnalytics.eventTransitions(spark, TestSpark.sf0001)
      .groupBy(col("event_type")).agg(sum(col("p_ppm")).as("s"))
      .as[(String, Long)].collect()
    fix.foreach { case (t, s) =>
      assert(s <= 1000000L && s > 990000L, s"$t ppm sum $s out of bounds")
    }
  }

  test("growth curve: first appearance counted once, cumulative total monotone") {
    // u1 appears day 1 (active again day 3 - not new), u2 day 1, u3 day 3
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view"), (1L, "2024-01-03 10:00:00", "view"),
      (2L, "2024-01-01 11:00:00", "view"),
      (3L, "2024-01-03 09:00:00", "view"))
    val got = EventAnalytics.userGrowthOn(events)
      .as[(java.sql.Date, Long, Long)].collect()
      .map(r => r._1.toString -> (r._2, r._3)).toMap
    assert(got === Map("2024-01-01" -> (2L, 2L), "2024-01-03" -> (1L, 3L)))
    // fixture sanity: final total == distinct users, totals monotone
    val fix = EventAnalytics.userGrowth(spark, TestSpark.sf0001)
      .orderBy(col("day")).as[(java.sql.Date, Long, Long)].collect()
    val distinctUsers = Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id")).distinct().count()
    assert(fix.last._3 === distinctUsers)
    assert(fix.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) < p(1)))
  }

  test("rolling actives: cover-day fan-out == per-day distinct scan") {
    // u1 active days 1,9; u2 active days 2,3; u3 active day 8 —
    // windows overlap, dedup within a window matters (u2 days 2+3
    // both cover day 4, counted once)
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view"), (1L, "2024-01-09 10:00:00", "view"),
      (2L, "2024-01-02 10:00:00", "view"), (2L, "2024-01-03 11:00:00", "view"),
      (3L, "2024-01-08 10:00:00", "view"))
    val got = EventAnalytics.rollingActivesOn(events, 7)
      .as[(java.sql.Date, Long)].collect()
      .map(r => r._1.toString -> r._2).toMap
    // brute force: for each day in [01-01, 01-09], distinct users with
    // an active day in [d-6, d]
    val activity = Map(1L -> Set(1, 9), 2L -> Set(2, 3), 3L -> Set(8))
    val want = (1 to 9).map { d =>
      f"2024-01-$d%02d" -> activity.count {
        case (_, ds) => ds.exists(a => a <= d && a > d - 7) }.toLong
    }.toMap
    assert(got === want)
    // window=1 degenerates to plain daily distinct actives
    val daily = EventAnalytics.rollingActivesOn(events, 1)
      .as[(java.sql.Date, Long)].collect().map(r => r._1.toString -> r._2).toMap
    assert(daily === Map("2024-01-01" -> 1L, "2024-01-02" -> 1L,
      "2024-01-03" -> 1L, "2024-01-08" -> 1L, "2024-01-09" -> 1L))
  }

  test("attribution: (ts, event_id) total order decides both touches") {
    val events = Seq(
      // u1: clear first (view) and last (purchase)
      (10L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (11L, 1L, ts("2024-01-02 10:00:00"), "click"),
      (12L, 1L, ts("2024-01-03 10:00:00"), "purchase"),
      // u2: ALL at one ts — event_id order decides: first 20, last 22
      (20L, 2L, ts("2024-01-05 09:00:00"), "a"),
      (21L, 2L, ts("2024-01-05 09:00:00"), "b"),
      (22L, 2L, ts("2024-01-05 09:00:00"), "c"),
      // u3: single event is both touches
      (30L, 3L, ts("2024-01-06 09:00:00"), "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = EventAnalytics.firstLastTouchOn(events)
      .as[(Long, String, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got === Map(
      1L -> ("view", "purchase", 3L),
      2L -> ("a", "c", 3L),
      3L -> ("view", "view", 1L)))
  }

  test("trend: exact-line slopes, negative trends, single-day NULL") {
    // type "up": 1,3,5,7 events on days 0..3 -> slope exactly 2/day;
    // type "down": 5,3,1 on days 0..2 -> slope exactly -2/day;
    // type "one": a single day -> unjudgeable (NULL)
    val rows = Seq(
      "up" -> Seq(1, 3, 5, 7), "down" -> Seq(5, 3, 1), "one" -> Seq(4))
    val events = rows.flatMap { case (t, daily) =>
      daily.zipWithIndex.flatMap { case (n, d) =>
        (0 until n).map(i =>
          (1L, ts(f"2024-03-${d + 1}%02d 10:0$i:00"), t))
      }
    }
    val got = EventAnalytics.dailyTrendOn(
      events.toDF("user_id", "ts", "event_type"))
      .as[(String, Long, Option[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === Map(
      "up" -> (4L, Some(2000000L)),
      "down" -> (3L, Some(-2000000L)),
      "one" -> (1L, None)))
  }

  test("trend: truncating integer division is the documented contract") {
    // days 0,1,2 with 1,1,2 events: slope = (3*5 - 3*4) / (3*5 - 9)
    // = 3/6 -> 500000 ppm exactly
    val events = Seq(
      (1L, ts("2024-03-01 10:00:00"), "e"),
      (1L, ts("2024-03-02 10:00:00"), "e"),
      (1L, ts("2024-03-03 10:00:00"), "e"),
      (1L, ts("2024-03-03 10:01:00"), "e"))
      .toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.dailyTrendOn(events)
      .as[(String, Long, Option[Long])].head()
    assert(got === ("e", 3L, Some(500000L)))
  }

  test("latency histogram: bitlen buckets, per-user pairing only") {
    val events = Seq(
      // u1: gaps 0us (same ts), 1us, 6us -> buckets 1, 1, 3
      (1L, 1L, "2024-01-01 00:00:00.000000"),
      (2L, 1L, "2024-01-01 00:00:00.000000"),
      (3L, 1L, "2024-01-01 00:00:00.000001"),
      (4L, 1L, "2024-01-01 00:00:00.000007"),
      // u2: one event - no gap; its ts far from u1's must not pair
      (5L, 2L, "2024-06-01 00:00:00")
    ).map { case (e, u, t) => (e, u, java.sql.Timestamp.valueOf(t)) }
      .toDF("event_id", "user_id", "ts")
    val got = EventAnalytics.latencyHistogramOn(events)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 3L -> 1L))
  }

  test("anomaly: planted spike flagged, baseline days and cold start not") {
    // 8 flat days (100.00/day), then a 10x spike, then flat again:
    // days 1-7 have no full trailing window (flag 0 by contract), the
    // spike must flag, and the post-spike flat day must NOT (the spike
    // inflates its baseline variance enough to absorb a return to flat)
    def day(d: Int, v: Double) =
      (1L, ts(f"2024-01-$d%02d 12:00:00"), "purchase", v)
    val events = ((1 to 8).map(day(_, 100.0)) :+ day(9, 1000.0) :+ day(10, 100.0))
      .toDF("user_id", "ts", "event_type", "value")
    val got = EventAnalytics.dailyAnomaliesOn(events)
      .as[(java.sql.Date, Long, Long)].collect()
      .map(r => r._1.toString -> (r._2, r._3)).toMap
    assert(got.size === 10)
    (1 to 7).foreach(d =>
      assert(got(f"2024-01-$d%02d") === (10000L, 0L), s"cold-start day $d"))
    assert(got("2024-01-08") === (10000L, 0L), "flat day with full window")
    assert(got("2024-01-09") === (100000L, 1L), "spike must flag")
    assert(got("2024-01-10")._2 === 0L, "post-spike flat day must not flag")
  }

  test("anomaly: zero-variance window flags any deviation, integer-exactly") {
    // seven identical days then a +1-cent day: var = 0 so ANY deviation
    // trips (4·(nQ−S²) = 0 < (n·x−S)²=1) — the integer spelling has no
    // epsilon floor to hide behind
    def day(d: Int, v: Double) =
      (1L, ts(f"2024-02-$d%02d 12:00:00"), "view", v)
    val events = ((1 to 7).map(day(_, 50.0)) :+ day(8, 50.01))
      .toDF("user_id", "ts", "event_type", "value")
    val got = EventAnalytics.dailyAnomaliesOn(events)
      .filter(col("is_anomaly") === 1L)
      .as[(java.sql.Date, Long, Long)].collect()
    assert(got.map(_._1.toString).toSeq === Seq("2024-02-08"))
    assert(got(0)._2 === 5001L)
  }

  test("churn: leaver counted, stayer not, returner churns in the gap week") {
    // weeks 0..2; u1 active wk0 only (churns wk0), u2 active all weeks
    // (never churns), u3 active wk0 and wk2 (churns wk0 — the return
    // does not retro-heal the gap), wk2 is last (unjudged: churned 0)
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (2L, "2024-01-01 10:00:00", "view"),
      (2L, "2024-01-08 10:00:00", "view"),
      (2L, "2024-01-15 10:00:00", "view"),
      (3L, "2024-01-02 10:00:00", "view"),
      (3L, "2024-01-16 10:00:00", "view"))
    val got = EventAnalytics.weeklyChurnOn(events)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === Map(0L -> (3L, 2L), 1L -> (1L, 0L), 2L -> (2L, 0L)))
  }

  test("churn: single-week corpus judges nothing") {
    val got = EventAnalytics.weeklyChurnOn(ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (2L, "2024-01-03 10:00:00", "view")))
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq === Seq((0L, 2L, 0L)))
  }

  test("event paths: per-user adjacency, ts ties broken by event_id") {
    val events = Seq(
      // u1 walks v,c,p then p again: paths v>c>p and c>p>p
      (10L, 1L, ts("2024-01-01 10:00:00"), "v"),
      (11L, 1L, ts("2024-01-01 10:01:00"), "c"),
      (12L, 1L, ts("2024-01-01 10:02:00"), "p"),
      (13L, 1L, ts("2024-01-01 10:03:00"), "p"),
      // u2: two events at the SAME ts — event_id 21 before 22
      (20L, 2L, ts("2024-01-02 09:00:00"), "v"),
      (21L, 2L, ts("2024-01-02 09:05:00"), "c"),
      (22L, 2L, ts("2024-01-02 09:05:00"), "p"),
      // u3: only two events — no trigram
      (30L, 3L, ts("2024-01-03 09:00:00"), "v"),
      (31L, 3L, ts("2024-01-03 09:01:00"), "c"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = EventAnalytics.topEventPathsOn(events, 10)
      .as[(String, Long)].collect().toMap
    assert(got === Map("v > c > p" -> 2L, "c > p > p" -> 1L))
  }

  test("event paths: top-k cut is deterministic under count ties") {
    // 4 distinct paths, all count 1; k=2 must keep the 2 lexicographically
    // smallest — the (n desc, path asc) total order
    val events = (0 until 4).flatMap { u =>
      val types = Seq(Seq("a", "b", "c"), Seq("b", "c", "d"),
        Seq("c", "d", "e"), Seq("d", "e", "f"))(u)
      types.zipWithIndex.map { case (t, i) =>
        (u * 10L + i, u.toLong, ts(f"2024-01-01 10:0$i:00"), t) }
    }.toDF("event_id", "user_id", "ts", "event_type")
    val got = EventAnalytics.topEventPathsOn(events, 2)
      .as[(String, Long)].collect().map(_._1).toSeq
    assert(got === Seq("a > b > c", "b > c > d"))
  }

  test("anomaly driver spelling: both flag classes non-vacuous on the fixture") {
    val flags = EventAnalytics.dailyAnomalies(spark, TestSpark.sf0001)
      .groupBy(col("is_anomaly")).count().as[(Long, Long)].collect().toMap
    assert(flags.keySet === Set(0L, 1L),
      s"anomaly flag classes on the fixture: $flags")
  }
}
