package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._
  val sf = TestSpark.sf0001

  test("banded range join equals the naive per-user quadratic join") {
    val got = AsOf.eventPairsWithin(spark, sf)
      .as[(Long, Long)].collect().toSet
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long, Long)].collect()
    val byUser = ev.groupBy(_._2)
    val want = (for {
      es <- byUser.values.map(_.toSeq).toSeq
      x <- es
      y <- es
      if x._1 < y._1 && math.abs(x._3 - y._3) <= 600000000L
    } yield (x._1, y._1)).toSet
    assert(got === want)
  }

  test("sessionization: session count and bounds match a driver-side scan") {
    val got = AsOf.sessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long, Long)].collect()
    val want = ev.groupBy(_._2).toSeq.flatMap { case (user, es) =>
      val sorted = es.sortBy(e => (e._3, e._1))
      var seq = 0L
      var prev = Long.MinValue
      val sessions = scala.collection.mutable.Map.empty[Long, Vector[Long]]
      sorted.foreach { case (_, _, us) =>
        if (prev == Long.MinValue || us - prev > 600000000L) seq += 1
        sessions(seq) = sessions.getOrElse(seq, Vector.empty) :+ us
        prev = us
      }
      sessions.map { case (s, uss) =>
        (user, s, uss.length.toLong, uss.min, uss.max)
      }
    }.toSet
    assert(got === want)
  }

  test("salted sessionization equals single-window on the fixture") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val plain = AsOf.sessionizeEvents(ev)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // band = 1h (fixture spans 30 days → many bands per user)
    val salted = AsOf.sessionizeSaltedEvents(ev, bandSec = 3600L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(salted === plain)
  }

  test("salted sessionization equals single-window under a hot key, sessions spanning bands") {
    // hot user 1: 3000 events at 90s spacing (continuous run: gap 90s <
    // 600s, so ONE session spanning ~75 one-hour bands — every band
    // boundary must merge); users 2-10: sparse events forming many
    // small sessions; plus exact-boundary gaps (== 600s stays in
    // session, 601s splits)
    val hot = (0 until 3000).map(i => (i.toLong, 1L, i * 90000000L))
    val sparse = for (u <- 2L to 10L; i <- 0 until 30)
      yield (10000L + u * 100 + i, u, i * 3600000000L + u * 7000000L)
    val boundary = Seq(
      (20001L, 11L, 0L), (20002L, 11L, 600000000L),   // gap == 600s: same session
      (20003L, 11L, 1201000000L))                     // gap 601s: new session
    val ev = (hot ++ sparse ++ boundary).toDF("event_id", "user_id", "us")
    val plain = AsOf.sessionizeEvents(ev)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val salted = AsOf.sessionizeSaltedEvents(ev, bandSec = 3600L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(salted === plain)
    // sanity: the hot user really is one session spanning many bands
    assert(plain.count(_._1 == 1L) === 1)
  }

  test("train/eval split is deterministic, complete, and ~80/20") {
    val rows = graft.operators.TextAnalysis.trainEvalSplit(spark, sf)
      .as[(String, Long, Long)].collect().map { case (k, n, _) => k -> n }.toMap
    val total = Tables.documents(spark, sf).count()
    assert(rows.values.sum === total, "every doc lands in exactly one split")
    val frac = rows.getOrElse("train", 0L).toDouble / total
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac off the cc/256 target")
    // determinism: re-running yields identical counts
    val again = graft.operators.TextAnalysis.trainEvalSplit(spark, sf)
      .as[(String, Long, Long)].collect().map { case (k, n, _) => k -> n }.toMap
    assert(again === rows)
  }

  test("pairs straddling a band boundary are found (adjacent-band probe)") {
    // two events 1s apart but in different 600s bands: 599.5 and 600.5
    val ev = Seq(
      (1L, 7L, 599500000L), (2L, 7L, 600500000L), // adjacent bands, |d|=1s
      (3L, 7L, 1800000000L),                      // far away
      (4L, 8L, 600000000L),                       // other user
    ).toDF("event_id", "user_id", "us")
    // exercise the same banding logic inline
    val winUs = 600000000L
    val banded = ev.withColumn("band", floor(col("us") / winUs))
    val probe = banded.select(col("event_id").as("id_x"), col("user_id"),
      col("us").as("us_x"), explode(array(col("band"), col("band") + 1)).as("band"))
    val build = banded.select(col("event_id").as("id_y"), col("user_id"),
      col("us").as("us_y"), col("band"))
    val pairs = probe.join(build, Seq("user_id", "band"))
      .filter(col("id_x") =!= col("id_y") &&
        abs(col("us_x") - col("us_y")) <= winUs)
      .select(least(col("id_x"), col("id_y")).as("a"),
        greatest(col("id_x"), col("id_y")).as("b"))
      .distinct().as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }
}
