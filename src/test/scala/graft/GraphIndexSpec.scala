package graft

import graft.operators.Graph
import graft.sources.GraphIndexes
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stored co-purchase ledger (q_graph_pagerank_idx / q_graph_recs_idx):
  * the driver hash-checks the probes against the inline oracles; this
  * suite pins the ledger mechanics those rollups can't show — delta
  * additivity, replay idempotence, manifest anti-join, meta fork
  * prevention, and compaction equivalence.
  */
class GraphIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    s"target/test_graph_idx/$tag-${java.util.UUID.randomUUID().toString.take(8)}"

  // 6 orders over 6 parts, enough shared pairs to make weights > 1
  private def fixture: DataFrame = Seq(
    (1L, 10L), (1L, 20L), (1L, 30L),
    (2L, 10L), (2L, 20L),
    (3L, 20L), (3L, 30L), (3L, 40L),
    (4L, 10L), (4L, 40L),
    (5L, 50L), (5L, 60L),
    (6L, 10L), (6L, 20L)).toDF("l_orderkey", "l_partkey")

  private def edgeSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.as[(Long, Long, Long)].collect().toSet

  test("build + append reconcile to the inline edge set (delta additivity)") {
    val path = tmp("additivity")
    val base = fixture.filter($"l_orderkey" <= 4)
    val delta = fixture.filter($"l_orderkey" > 4)
    GraphIndexes.writeGraphIndex(base, path)
    GraphIndexes.appendGraph(delta, path, "d1")
    assert(edgeSet(GraphIndexes.readGraphEdges(spark, path)) ===
      edgeSet(Graph.copurchaseEdgesOn(fixture)))
    // and the manifest claims exactly the ingested orders
    assert(GraphIndexes.indexedOrderIds(spark, path)
      .as[Long].collect().toSet === (1L to 6L).toSet)
  }

  test("append replay is idempotent by label ownership") {
    val path = tmp("replay")
    GraphIndexes.writeGraphIndex(fixture.filter($"l_orderkey" <= 4), path)
    val delta = fixture.filter($"l_orderkey" > 4)
    GraphIndexes.appendGraph(delta, path, "d1")
    val once = edgeSet(GraphIndexes.readGraphEdges(spark, path))
    GraphIndexes.appendGraph(delta, path, "d1") // failure replay
    assert(edgeSet(GraphIndexes.readGraphEdges(spark, path)) === once,
      "re-running the same (batch, label) must rewrite, not double-count")
  }

  test("appendGraphNewOrders anti-joins already-claimed orders") {
    val path = tmp("antijoin")
    GraphIndexes.writeGraphIndex(fixture.filter($"l_orderkey" <= 4), path)
    // delivery overlaps order 4 (already in base) plus new orders 5, 6
    GraphIndexes.appendGraphNewOrders(
      fixture.filter($"l_orderkey" >= 4), path, "d1")
    assert(edgeSet(GraphIndexes.readGraphEdges(spark, path)) ===
      edgeSet(Graph.copurchaseEdgesOn(fixture)),
      "order 4's pairs must not be double-counted")
  }

  test("appendGraphNewOrders on a fully already-indexed delivery writes no vacant label") {
    val path = tmp("novacant")
    GraphIndexes.writeGraphIndex(fixture, path)
    val before = edgeSet(GraphIndexes.readGraphEdges(spark, path))
    // every order in this delivery is already claimed by the base build:
    // the append must SKIP, not write empty edges/manifest directories
    // per overlapping delivery (r17 ADVICE — the streaming sink's
    // no-vacant-label guard, now at the API level)
    GraphIndexes.appendGraphNewOrders(fixture, path, "dup")
    assert(spark.read.parquet(s"$path/edges").select("ingest")
      .distinct().as[String].collect().toSeq === Seq("base"),
      "no vacant ingest generation may appear")
    assert(spark.read.parquet(s"$path/manifest").select("ingest")
      .distinct().as[String].collect().toSeq === Seq("base"))
    assert(edgeSet(GraphIndexes.readGraphEdges(spark, path)) === before)
    // the skip path still validates the target: a bogus path refuses
    assert(intercept[IllegalArgumentException] {
      GraphIndexes.appendGraphNewOrders(fixture, tmp("absent"), "dup")
    }.getMessage.contains("no graph-index meta"))
  }

  test("exclude-ingest read leaves a crashed batch's own deltas out") {
    val path = tmp("exclude")
    val base = fixture.filter($"l_orderkey" <= 4)
    GraphIndexes.writeGraphIndex(base, path)
    GraphIndexes.appendGraph(fixture.filter($"l_orderkey" > 4), path, "d1")
    assert(edgeSet(GraphIndexes.readGraphEdges(spark, path,
      excludeIngest = Some("d1"))) === edgeSet(Graph.copurchaseEdgesOn(base)))
  }

  test("label and meta contracts refuse misuse") {
    val path = tmp("contracts")
    GraphIndexes.writeGraphIndex(fixture, path)
    assert(intercept[IllegalArgumentException] {
      GraphIndexes.appendGraph(fixture, path, "base")
    }.getMessage.contains("must not collide"))
    // un-built path: no meta — refuse probe and append
    assert(intercept[IllegalArgumentException] {
      GraphIndexes.readGraphEdges(spark, tmp("absent"))
    }.getMessage.contains("no graph-index meta"))
    // foreign meta kind — refuse the mix
    val foreign = tmp("foreign")
    Seq("cocitation").toDF("kind")
      .write.mode("overwrite").parquet(s"$foreign/meta")
    assert(intercept[IllegalArgumentException] {
      GraphIndexes.readGraphEdges(spark, foreign)
    }.getMessage.contains("refusing"))
  }

  test("compaction preserves the reconciled ledger without the order log") {
    val src = tmp("compact-src")
    GraphIndexes.writeGraphIndex(fixture.filter($"l_orderkey" <= 3), src)
    GraphIndexes.appendGraph(fixture.filter($"l_orderkey" === 4), src, "d1")
    GraphIndexes.appendGraph(fixture.filter($"l_orderkey" > 4), src, "d2")
    val dst = tmp("compact-dst")
    GraphIndexes.compactGraphTo(spark, src, dst)
    assert(edgeSet(GraphIndexes.readGraphEdges(spark, dst)) ===
      edgeSet(GraphIndexes.readGraphEdges(spark, src)))
    assert(GraphIndexes.indexedOrderIds(spark, dst).as[Long].collect().toSet ===
      GraphIndexes.indexedOrderIds(spark, src).as[Long].collect().toSet)
    // a compacted ledger holds exactly one ingest generation
    assert(spark.read.parquet(s"$dst/edges").select("ingest")
      .distinct().as[String].collect().toSeq === Seq("base"))
    assert(intercept[IllegalArgumentException] {
      GraphIndexes.compactGraphTo(spark, src, s"$src/nested")
    }.getMessage.contains("non-overlapping"))
  }

  test("SQL views answer exactly like the Scala stored probes") {
    val path = tmp("sql")
    GraphIndexes.writeGraphIndex(fixture.filter($"l_orderkey" <= 4), path)
    GraphIndexes.appendGraph(fixture.filter($"l_orderkey" > 4), path, "d1")
    graft.sources.IndexSql.registerGraphRecs(spark, "g_recs_view", path, k = 2)
    assert(spark.sql("SELECT * FROM g_recs_view")
      .as[(Long, Long, Long, Long)].collect().toSet ===
      Graph.itemRecsOn(GraphIndexes.readGraphEdges(spark, path), 2)
        .as[(Long, Long, Long, Long)].collect().toSet)
    graft.sources.IndexSql.registerGraphPageRank(spark, "g_pr_view", path, iters = 3)
    assert(spark.sql("SELECT * FROM g_pr_view")
      .as[(Long, Long)].collect().toSet ===
      Graph.pageRankOn(GraphIndexes.readGraphEdges(spark, path), 3)
        .as[(Long, Long)].collect().toSet)
  }

  test("compaction generation swap: pointer flip serves the new tree atomically") {
    import graft.sources.DedupIndexes
    val root = tmp("pointered")
    val gen1 = s"$root/gen1"
    GraphIndexes.writeGraphIndex(fixture.filter($"l_orderkey" <= 4), gen1)
    GraphIndexes.appendGraph(fixture.filter($"l_orderkey" > 4), gen1, "d1")
    DedupIndexes.flipPointer(spark, root, "gen1")
    val before = edgeSet(GraphIndexes.readGraphEdges(spark, root))
    // compact into gen2, flip — reads through the ROOT see the same
    // reconciled ledger from the fresh single-generation tree
    val gen2 = s"$root/gen2"
    GraphIndexes.compactGraphTo(spark, gen1, gen2)
    DedupIndexes.flipPointer(spark, root, "gen2")
    assert(edgeSet(GraphIndexes.readGraphEdges(spark, root)) === before)
    assert(GraphIndexes.indexedOrderIds(spark, root).as[Long].collect().toSet ===
      (1L to 6L).toSet)
    // a manifest-less target is refused — the old generation keeps serving
    assert(intercept[IllegalArgumentException] {
      DedupIndexes.flipPointer(spark, root, "gen3-absent")
    }.getMessage.contains("refusing"))
    assert(edgeSet(GraphIndexes.readGraphEdges(spark, root)) === before)
  }

  test("stored probes equal their inline twins on the fixture tables") {
    val sf = TestSpark.sf0001
    val inlinePr = Graph.pageRank(spark, sf).as[(Long, Long)].collect().toSet
    val storedPr = GraphIndexes.pageRankProbe(spark, sf)
      .as[(Long, Long)].collect().toSet
    assert(storedPr === inlinePr)
    val inlineRecs = Graph.itemRecs(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    val storedRecs = GraphIndexes.recsProbe(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(storedRecs === inlineRecs)
    val inlineReach = Graph.reachability(spark, sf, seedMod = 200, maxHops = 2)
      .as[(Long, Long, Long)].collect().toSet
    val storedReach = GraphIndexes.reachProbe(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(storedReach === inlineReach)
  }
}
