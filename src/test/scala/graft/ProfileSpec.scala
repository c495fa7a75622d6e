package graft

import graft.operators.Profile
import org.apache.spark.sql.functions._

/** Corpus card / column profiler / blocklist (q_corpus_card,
  * q_profile_orders, q_blocklist): the values are hash-checked against
  * DuckDB by the driver; this suite asserts the semantics the rollups
  * can't show — tie-breaks, formatter branches, null accounting, and
  * the small-list == join-spelling equivalence.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private val sf = TestSpark.sf0001

  test("corpus card: hand-built corpus, top-lang tie broken by lang asc") {
    val docs = Seq(
      (1L, "a b", "en", "s1", 3L),
      (2L, "c", "en", "s1", 1L),
      (3L, "d e f", "fr", "s1", 5L),
      (4L, "g h", "fr", "s1", 3L), // en and fr tie at 2 docs -> "en" wins
      (5L, "x", "de", "s2", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Profile.corpusCardOn(docs).orderBy("source")
      .as[(String, Long, Long, Long, Long, Long, Long, String, Long)]
      .collect()
    assert(got(0) === (("s1", 4L, 8L, 1L, 5L, 3L, 2L, "en", 500000L)))
    assert(got(1) === (("s2", 1L, 1L, 1L, 1L, 1L, 1L, "de", 1000000L)))
  }

  test("corpus card: token sum counts occurrences, avg_chars truncates") {
    val docs = Seq(
      (1L, "t t t", "en", "s", 5L),
      (2L, "u", "en", "s", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Profile.corpusCardOn(docs).head()
    assert(r.getAs[Long]("n_tokens") === 4L)
    assert(r.getAs[Long]("avg_chars") === 3L) // 7 DIV 2, truncated
  }

  test("column profiler: nulls, distincts, and per-type formatter branches") {
    val df = Seq(
      (Some(3L), Some(1.5), Some("b")),
      (Some(1L), None, Some("a")),
      (None, Some(10.0), Some("a")))
      .toDF("k", "price", "tag")
    val got = Profile.profileColumns(df, Seq("k", "price", "tag"))
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("k") === ((1L, 2L, "1", "3")))
    // double renders through DECIMAL(18,2): fixed two decimals, so the
    // string min/max agrees with numeric order on same-magnitude values
    assert(got("price") === ((1L, 2L, "1.50", "10.00")))
    assert(got("tag") === ((0L, 2L, "a", "b")))
  }

  test("column profiler output has one row per requested column") {
    val df = Tables.orders(spark, sf)
    val prof = Profile.profileColumns(df, Seq("o_orderkey", "o_totalprice"))
    assert(prof.count() === 2L)
    assert(prof.columns.toSeq ===
      Seq("col_name", "n_nulls", "n_distinct", "min_value", "max_value"))
    // orderkey is the PK of the fixture: zero nulls, all-distinct
    val pk = prof.filter(col("col_name") === "o_orderkey").head()
    assert(pk.getAs[Long]("n_nulls") === 0L)
    assert(pk.getAs[Long]("n_distinct") === df.count())
  }

  test("blocklist: hits counted per occurrence, case-insensitive, whole-token") {
    val docs = Seq(
      (1L, "DUP dup dups"), // 2 whole-token hits; "dups" is NOT a hit
      (2L, "clean text"),
      (3L, "spamword")).toDF("doc_id", "text")
    val terms = Seq("dup", "spamword").toDF("term")
    val got = Profile.blocklistVerdictOn(docs, terms)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(1L -> ((2L, false)), 2L -> ((0L, true)),
      3L -> ((1L, false))))
  }

  test("blocklist: small-list spelling agrees with the join spelling on kept") {
    val docs = Tables.documents(spark, sf)
    val terms = Profile.driverBlocklist.toDF("term")
    val joinKept = Profile.blocklistVerdictOn(docs, terms)
      .select("doc_id", "kept")
    val smallKept = Profile.blocklistVerdictSmallOn(docs, Profile.driverBlocklist)
    assert(joinKept.exceptAll(smallKept).isEmpty &&
      smallKept.exceptAll(joinKept).isEmpty)
    // both outcome classes non-vacuous on the fixture
    val byKept = joinKept.groupBy("kept").count().as[(Boolean, Long)]
      .collect().toMap
    assert(byKept.getOrElse(true, 0L) > 0 && byKept.getOrElse(false, 0L) > 0)
  }

  test("blocklist plan: term side arrives as a broadcast equi-join") {
    val docs = Tables.documents(spark, sf)
    val plan = Profile.blocklistVerdictOn(docs, Profile.driverBlocklist.toDF("term"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("key skew: hot key surfaces with exact ppm share, ties break on value") {
    // 10 rows on key 7, one row each on keys 1..10 except 7 -> 19 rows
    val df = (Seq.fill(10)(7L) ++ (1L to 10L).filter(_ != 7L))
      .toDF("k")
    val got = Profile.keySkewOn(df, "k", 3)
      .as[(String, Long, Long)].collect().toSeq
    assert(got.head === ("7", 10L, 10L * 1000000L / 19L))
    // remaining singletons tie at 1 row — STRING-ascending keys win
    // ("1" then "10", not numeric order; the cast is part of the API)
    assert(got.drop(1).map(_._1) === Seq("1", "10"))
    assert(got.map(_._3) === Seq(526315L, 52631L, 52631L))
  }

  test("key skew driver spelling: 5 rows, shares consistent with totals") {
    val total = Tables.events(spark, sf).count()
    val got = Profile.eventsUserSkew(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(got.length === 5)
    got.foreach { case (_, n, ppm) =>
      assert(ppm === n * 1000000L / total, "ppm must be exact integer share")
    }
    // ordered by weight then key — the total order the top-k cut needs
    assert(got.map(r => (-r._2, r._1)).toSeq === got.map(r => (-r._2, r._1)).sortBy(identity).toSeq)
  }
}
