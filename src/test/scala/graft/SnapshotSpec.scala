package graft

import graft.operators.Snapshot
import org.apache.spark.sql.functions._

/** Snapshot diff (q_snapshot_diff): the rollup values are hash-checked
  * against DuckDB by the driver; this suite asserts the semantics the
  * rollup can't show — content keying (doc_id churn is not corpus
  * churn), side-of-record counting, and conservation against the raw
  * snapshots.
  */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private val sf = TestSpark.sf0001

  test("hand-built diff: added / removed / retained each counted on the deciding side") {
    val old = Seq((1L, "doc a", "s1"), (2L, "doc b", "s1"))
      .toDF("doc_id", "text", "source")
    val nw = Seq((7L, "doc b", "s1"), (8L, "doc b", "s1"),
      (9L, "doc c c", "s2")).toDF("doc_id", "text", "source")
    val got = Snapshot.snapshotDiffOn(old, nw)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // "doc a" removed (old-side counts), "doc b" retained with NEW-side
    // doc count 2 (doc_id churn 2->7 is invisible; re-crawl dup counted
    // as docs, once as fp), "doc c c" added with its 3 tokens
    assert(got === Map(
      ("s1", "removed") -> (1L, 1L, 2L),
      ("s1", "retained") -> (1L, 2L, 4L),
      ("s2", "added") -> (1L, 1L, 3L)))
  }

  test("pure doc_id reshuffle of identical content is 100% retained") {
    val old = Seq((1L, "x y", "s1"), (2L, "z", "s2")).toDF("doc_id", "text", "source")
    val nw = Seq((10L, "x y", "s1"), (20L, "z", "s2")).toDF("doc_id", "text", "source")
    val got = Snapshot.snapshotDiffOn(old, nw)
      .groupBy("status").agg(sum(col("n_fps")).as("f"))
      .as[(String, Long)].collect().toMap
    assert(got === Map("retained" -> 2L))
  }

  test("canonicalization: whitespace/case variants are the same content") {
    val old = Seq((1L, "Hello  World", "s1")).toDF("doc_id", "text", "source")
    val nw = Seq((2L, "hello world", "s1")).toDF("doc_id", "text", "source")
    val got = Snapshot.snapshotDiffOn(old, nw).select("status")
      .as[String].collect()
    assert(got.toSeq === Seq("retained"))
  }

  test("driver spelling conserves fingerprints against the raw snapshots") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("source"))
    val fp = md5(regexp_replace(trim(lower(col("text"))), "\\s+", " "))
    val oldFps = docs.filter(col("doc_id") % 20 =!= 3).select(fp.as("fp"))
      .distinct().count()
    val newFps = docs.filter(col("doc_id") % 20 =!= 7).select(fp.as("fp"))
      .distinct().count()
    val d = Snapshot.snapshotDiff(spark, sf)
      .groupBy("status").agg(sum(col("n_fps")).as("f"))
      .as[(String, Long)].collect().toMap
    assert(d.keySet === Set("added", "removed", "retained"),
      "a diff status went vacuous on the fixture carving")
    assert(d("added") + d("retained") === newFps)
    assert(d("removed") + d("retained") === oldFps)
  }

  test("source overlap: containment keyed to the smaller side, content-level") {
    // s1 = {A, B, C}; s2 = {B, C} (via a re-crawl dup and a case
    // variant — content keying); shared 2, containment = 2/2 of s2
    val docs = Seq(
      ("doc a", "s1"), ("doc b", "s1"), ("doc c", "s1"),
      ("doc b", "s2"), ("Doc  B", "s2"), ("doc c", "s2"))
      .toDF("text", "source")
    val got = Snapshot.sourceOverlapOn(docs)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(got.toSeq === Seq(("s1", "s2", 2L, 3L, 2L, 1000000L)))
  }

  test("source overlap: disjoint sources produce no row") {
    val docs = Seq(("x", "s1"), ("y", "s2")).toDF("text", "source")
    assert(Snapshot.sourceOverlapOn(docs).isEmpty)
  }

  test("source overlap: a fp carried by k sources yields k(k-1)/2 pair rows") {
    val docs = Seq(("x", "s1"), ("x", "s2"), ("x", "s3")).toDF("text", "source")
    val rows = Snapshot.sourceOverlapOn(docs)
      .select("src_a", "src_b").as[(String, String)].collect().toSet
    assert(rows === Set(("s1", "s2"), ("s1", "s3"), ("s2", "s3")))
  }

  test("driver overlap spelling is non-vacuous (planted cross-source dups)") {
    val n = Snapshot.sourceOverlap(spark, sf).count()
    assert(n > 0, "planted cross-source duplicates produced no overlap row")
  }

  test("cdc apply: tombstone, revive, insert, update, pass-through") {
    val base = Seq((1L, 10L, "N"), (2L, 20L, "N"), (3L, 30L, "N"),
      (4L, 40L, "N")).toDF("key", "v", "st")
    val changes = Seq(
      (1L, 1L, "U", 11L, "A"), (1L, 5L, "D", 0L, "A"),   // delete wins
      (2L, 2L, "D", 0L, "A"), (2L, 9L, "U", 22L, "B"),   // revived after D
      (3L, 3L, "U", 31L, "C"),                            // plain update
      (9L, 4L, "U", 99L, "I"),                            // insert (not in base)
      (8L, 6L, "D", 0L, "X")                              // delete of a ghost key
    ).toDF("key", "seq", "op", "v", "st")
    val got = Snapshot.applyChangelogOn(base, changes, "key", "seq", "op")
      .as[(Long, Long, String)].collect().toSet
    assert(got === Set((2L, 22L, "B"), (3L, 31L, "C"),
      (4L, 40L, "N"), (9L, 99L, "I")))
    // latest-wins must not depend on physical row order / partitioning
    val re = Snapshot.applyChangelogOn(base.repartition(5),
      changes.orderBy($"seq".desc).repartition(7), "key", "seq", "op")
      .as[(Long, Long, String)].collect().toSet
    assert(re === got)
  }

  test("cdc apply plans the documented shape: partial-combining SortAggregate, no window") {
    // the winner pick is max(struct(seq, op, payload...)): Spark cannot
    // hash-aggregate a struct-typed max buffer, so the documented plan
    // is a SortAggregate in BOTH phases — crucially WITH the partial
    // phase (map-side combine before the exchange). Asserted so (a) the
    // scaladoc's claim stays true to the plan and (b) a future Spark
    // version changing the shape (e.g. hash-aggregating structs) is
    // noticed as a doc update, not silently drifted past.
    val base = Seq((1L, 10L, "N")).toDF("key", "v", "st")
    val changes = Seq((1L, 1L, "U", 11L, "A")).toDF("key", "seq", "op", "v", "st")
    val plan = Snapshot.applyChangelogOn(base, changes, "key", "seq", "op")
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortAggregate"),
      "the struct arg-max no longer SortAggregates — update the scaladoc " +
        "to the new shape before relying on it")
    assert(plan.contains("partial_max"),
      "the partial (map-side combine) phase vanished — the delta would " +
        "ride the exchange uncombined at changelog scale")
    assert(!plan.contains("Window"),
      "the arg-max must stay an aggregate, never a per-key window")
  }

  test("cdc apply: missing changelog columns fail loudly") {
    val base = Seq((1L, 10L)).toDF("key", "v")
    val changes = Seq((1L, 1L, "U")).toDF("key", "seq", "op") // no payload v
    val e = intercept[IllegalArgumentException] {
      Snapshot.applyChangelogOn(base, changes, "key", "seq", "op")
    }
    assert(e.getMessage.contains("missing columns: v"))
  }

  test("derive: minimal I/U/D stream; apply(old, derive) == new (round-trip law)") {
    val old = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"),
      (4L, 40L, "d")).toDF("key", "v", "s")
    val nw = Seq((1L, 10L, "a"),   // unchanged -> no row
      (2L, 21L, "b"),              // payload changed -> U
      (4L, 40L, "d2"),             // second payload col changed -> U
      (9L, 90L, "i"))              // new key -> I; key 3 gone -> D
      .toDF("key", "v", "s")
    val ops = Snapshot.deriveChangelogOn(old, nw, "key", seq = 7L)
    val got = ops.as[(Long, Long, String, Long, String)].collect()
      .map(r => r._1 -> (r._3, r._4, r._5)).toMap
    assert(got === Map(
      2L -> ("U", 21L, "b"), 4L -> ("U", 40L, "d2"),
      9L -> ("I", 90L, "i"), 3L -> ("D", 30L, "c")))
    // the round-trip law: applying the derived stream reproduces new
    val applied = Snapshot.applyChangelogOn(old, ops, "key", "seq", "op")
      .as[(Long, Long, String)].collect().toSet
    assert(applied === nw.as[(Long, Long, String)].collect().toSet)
  }

  test("derive: null payloads compare null-safely; schema drift refused") {
    val old = Seq[(Long, Option[Long])]((1L, None), (2L, Some(2L)))
      .toDF("key", "v")
    val nw = Seq[(Long, Option[Long])]((1L, None), (2L, None))
      .toDF("key", "v")
    // key 1: NULL == NULL -> unchanged, NO row; key 2: 2 -> NULL is U
    val got = Snapshot.deriveChangelogOn(old, nw, "key", 1L)
      .select($"key", $"op").as[(Long, String)].collect().toSet
    assert(got === Set((2L, "U")))
    val e = intercept[IllegalArgumentException] {
      Snapshot.deriveChangelogOn(old, nw.withColumnRenamed("v", "w"), "key", 1L)
    }
    assert(e.getMessage.contains("schemas differ"))
  }

  test("derive driver spelling: all three op classes, round-trip on the fixture") {
    val ops = Snapshot.deriveChangelog(spark, sf)
    val byOp = ops.groupBy($"op").count().as[(String, Long)].collect().toMap
    assert(byOp.keySet === Set("I", "U", "D"), s"op classes: $byOp")
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"n_chars")
    val old = docs.filter($"doc_id" % 20 =!= 3)
    val applied = Snapshot.applyChangelogOn(old, ops, "doc_id", "seq", "op")
      .as[(Long, String, Long)].collect().toSet
    val nw = docs.filter($"doc_id" % 20 =!= 7)
      .select($"doc_id",
        when($"doc_id" % 20 === 11, concat($"source", lit("-v2")))
          .otherwise($"source").as("source"), $"n_chars")
      .as[(Long, String, Long)].collect().toSet
    assert(applied === nw, "apply(old, derive(old, new)) must equal new")
  }

  test("ivm: merged partials == from-scratch rollup; retractions subtract") {
    val a = Seq((1L, 2L, 100L), (2L, 1L, 50L)).toDF("k", "n", "total")
    val b = Seq((1L, 1L, 30L), (3L, 4L, 400L)).toDF("k", "n", "total")
    val got = Snapshot.mergeRollupsOn(Seq(a, b), Seq("k"), Seq("n", "total"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 3L, 130L), (2L, 1L, 50L), (3L, 4L, 400L)))
    // a retraction is a negated-counter row: un-counts one k=1 order
    val retract = Seq((1L, -1L, -30L)).toDF("k", "n", "total")
    val healed = Snapshot.mergeRollupsOn(Seq(a, b, retract),
      Seq("k"), Seq("n", "total")).as[(Long, Long, Long)].collect().toSet
    assert(healed === Set((1L, 2L, 100L), (2L, 1L, 50L), (3L, 4L, 400L)))
  }

  test("ivm driver spelling: 80/20 merge == one-pass rollup, carve non-trivial") {
    val orders = Tables.orders(spark, sf)
    assert(orders.filter($"o_orderkey" % 10 >= 8).count() > 0,
      "delta carve empty — the merge would be vacuous")
    val scratch = orders
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        sum(($"o_totalprice".cast("decimal(18,2)") * 100).cast("long"))
          .as("total_cents"))
      .as[(Long, Long, Long)].collect().toSet
    val merged = Snapshot.incrementalRollup(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(merged === scratch)
  }

  test("cdc driver spelling: every outcome class non-vacuous at sf0.001") {
    val out = Snapshot.cdcApply(spark, sf)
    val base = Tables.customer(spark, sf)
      .select($"c_custkey".as("key")).as[Long].collect().toSet
    val keys = out.select($"key").as[Long].collect().toSet
    assert((keys -- base).nonEmpty, "planted inserts (key >= 1e6) missing")
    assert((base -- keys).nonEmpty, "no customer was tombstoned")
    val untouched = out.filter($"last_status" === "N").count()
    assert(untouched > 0, "pass-through base rows missing")
    assert(out.filter($"last_status" =!= "N" && $"key" < 1000000L).count() > 0,
      "updated-in-place rows missing")
    // one row per surviving key — the compaction invariant
    assert(out.count() === keys.size.toLong)
  }

  test("scd2: version chaining, delete closes without emitting, current flag") {
    import spark.implicits._
    // key 1: I@10 -> U@20 -> D@30 (tombstoned, no current version)
    // key 2: I@15 -> U@40 (open current version)
    // key 3: I@50 only (immediately current)
    val ch = Seq(
      (1L, 10L, 100L, "I"), (1L, 20L, 110L, "U"), (1L, 30L, 110L, "D"),
      (2L, 15L, 200L, "I"), (2L, 40L, 210L, "U"),
      (3L, 50L, 300L, "I")).toDF("key", "seq", "cents", "op")
    val got = Snapshot.scd2On(ch, "key", "seq", "op")
      .select($"key", $"cents", $"valid_from", $"valid_to", $"is_current")
      .as[(Long, Long, Long, Option[Long], Long)].collect().toSet
    assert(got === Set(
      (1L, 100L, 10L, Some(20L), 0L),
      (1L, 110L, 20L, Some(30L), 0L), // CLOSED by the delete's seq
      (2L, 200L, 15L, Some(40L), 0L),
      (2L, 210L, 40L, None, 1L),
      (3L, 300L, 50L, None, 1L)))
    // intervals tile per key: no gaps, no overlaps, one current at most
    assert(got.count(r => r._1 == 1L && r._5 == 1L) === 0,
      "a tombstoned key must end with no current version")
  }
}
