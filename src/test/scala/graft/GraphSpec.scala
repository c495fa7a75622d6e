package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Co-purchase graph analytics (q_graph_edges / q_graph_pagerank /
  * q_graph_triangles / q_graph_recs): values are hash-checked against
  * DuckDB by the driver; this suite pins the laws the rollups can't
  * show — pair-expansion exactness, PageRank fixed-point/mass
  * conservation, orientation invariance of the triangle count, and
  * the recommendation tiebreak.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def lines(rows: (Long, Long)*) =
    rows.toDF("l_orderkey", "l_partkey")

  test("edges: per-order pair expansion, canonical a<b, weight = shared orders") {
    val e = Graph.copurchaseEdgesOn(lines(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 20L), (2L, 10L),           // reversed arrival order, same pair
      (3L, 30L),                      // singleton order contributes nothing
      (4L, 10L), (4L, 10L), (4L, 20L) // duplicate line collapses first
    )).as[(Long, Long, Long)].collect().toSet
    assert(e === Set(
      (10L, 20L, 3L), (10L, 30L, 1L), (20L, 30L, 1L)))
  }

  test("edges: a mega-basket above MaxBasket is excluded, not paired or truncated") {
    // order 1 is a normal basket; order 99 holds MaxBasket + 1 distinct
    // parts — the pathological bulk order whose O(basket^2) pair
    // expansion the gate exists to refuse (Graph.MaxBasket scaladoc)
    val mega = (0 until Graph.MaxBasket + 1).map(i => (99L, 1000L + i))
    val e = Graph.copurchaseEdgesOn(
      lines((Seq((1L, 10L), (1L, 20L)) ++ mega): _*))
      .as[(Long, Long, Long)].collect().toSet
    // the normal order's pair survives with its exact weight; NOTHING
    // from the mega-basket leaks through — exclusion is whole-basket,
    // never a prefix truncation that would keep an arbitrary pair subset
    assert(e === Set((10L, 20L, 1L)))
    // the temporal build shares the gate: the monthly edge sets must
    // partition exactly the corpus the plain build pairs
    val om = Seq((1L, 100L), (99L, 100L)).toDF("l_orderkey", "mo")
    val t = Graph.trendingPairsOn(
      lines((Seq((1L, 10L), (1L, 20L)) ++ mega): _*), om, k = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(t === Set((10L, 20L, 100L, 1L, 1L)))
  }

  test("pagerank: a regular graph is an exact fixed point at 1_000_000 ppm") {
    // 4-cycle, unit weights: every node has wdeg 2 and two in-edges, so
    // each step computes 150000 + 2 * ((850 * 1000000) DIV 2000) =
    // exactly 1000000 — no truncation drift on regular graphs
    val cycle = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (1L, 4L, 1L))
      .toDF("part_a", "part_b", "w")
    val ranks = Graph.pageRankOn(cycle, iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(ranks === Map(1L -> 1000000L, 2L -> 1000000L,
      3L -> 1000000L, 4L -> 1000000L))
  }

  test("pagerank: hub outranks leaves; mass conserved up to truncation loss") {
    // star: hub 1 with 4 leaves
    val star = Seq((1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L), (1L, 5L, 1L))
      .toDF("part_a", "part_b", "w")
    val ranks = Graph.pageRankOn(star, iters = 5)
      .as[(Long, Long)].collect().toMap
    val hub = ranks(1L)
    val leaves = ranks.filterNot(_._1 == 1L).values
    assert(leaves.forall(hub > _), s"hub $hub must outrank leaves $leaves")
    assert(leaves.toSet.size === 1, "symmetric leaves must tie exactly")
    // each of the 8 directed edges truncates < 1 ppm unit per step; the
    // 0.85 damping factor caps the accumulated loss well under 8 * 5
    val total = ranks.values.sum
    assert(total <= 5L * 1000000L)
    assert(total >= 5L * 1000000L - 40L)
  }

  test("pagerank: iteration-count contract is guarded") {
    val e = Seq((1L, 2L, 1L)).toDF("part_a", "part_b", "w")
    intercept[IllegalArgumentException](Graph.pageRankOn(e, iters = 0))
    intercept[IllegalArgumentException](Graph.pageRankOn(e, iters = 21))
  }

  test("triangles: K4 minus one edge — counts, zero rows, cc bounds") {
    // edges ab ac bc bd cd: triangles abc, bcd
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .map { case (a, b) => (a, b, 1L) }.toDF("part_a", "part_b", "w")
    val got = Graph.triangleStatsOn(e)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 2L, 1L, 1000000L),      // deg 2, 1 triangle -> cc = 1
      (2L, 3L, 2L, 666666L),       // 2*2*1e6 DIV (3*2)
      (3L, 3L, 2L, 666666L),
      (4L, 2L, 1L, 1000000L)))
  }

  test("triangles: a triangle-free node with deg >= 2 appears with tri = 0") {
    val path = Seq((1L, 2L, 1L), (2L, 3L, 1L)).toDF("part_a", "part_b", "w")
    val got = Graph.triangleStatsOn(path)
      .as[(Long, Long, Long, Long)].collect().toSet
    // only node 2 has deg >= 2
    assert(got === Set((2L, 2L, 0L, 0L)))
  }

  test("triangles: adjacency-intersection spelling matches the naive id-ordered count") {
    // deterministic pseudo-random graph: 18 nodes, edge iff the pair
    // hash lands under the threshold — dense enough for many triangles
    val all = for {
      a <- 1L to 18L; b <- (a + 1) to 18L
      if ((a * 2654435761L + b * 40503L) % 97) < 30
    } yield (a, b)
    assert(all.size > 30, s"fixture too sparse: ${all.size} edges")
    val edgeSet = all.toSet
    val naivePerNode = scala.collection.mutable.Map[Long, Long]()
    for {
      (a, b) <- all; c <- (b + 1) to 18L
      if edgeSet.contains((b, c)) && edgeSet.contains((a, c))
    } {
      Seq(a, b, c).foreach(n => naivePerNode(n) = naivePerNode.getOrElse(n, 0L) + 1L)
    }
    val e = all.map { case (a, b) => (a, b, 1L) }.toDF("part_a", "part_b", "w")
    val got = Graph.triangleStatsOn(e)
      .select(col("part"), col("tri")).as[(Long, Long)].collect().toMap
    val degOk = all.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).collect { case (n, xs) if xs.size >= 2 => n }.toSet
    assert(got.keySet === degOk)
    got.foreach { case (n, tri) =>
      assert(tri === naivePerNode.getOrElse(n, 0L),
        s"node $n: engine $tri vs naive ${naivePerNode.getOrElse(n, 0L)}")
    }
  }

  test("triangles: forward orientation bounds hub state below the unoriented list") {
    // hub graph: node 1 joined to 2..40 plus a small clique — the skew
    // shape where the unoriented adjacency held a 39-element hub row
    val star = (2L to 40L).map(b => (1L, b))
    val cross = Seq((2L, 3L), (3L, 4L), (2L, 4L))
    val e = (star ++ cross).map { case (a, b) => (a, b, 1L) }
      .toDF("part_a", "part_b", "w")
    val und = e.select(col("part_a").as("a"), col("part_b").as("b"))
    val directed = und.unionAll(und.select(col("b").as("a"), col("a").as("b")))
    val deg = directed.groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("deg"))
    val fwd = Graph.forwardAdjacency(directed, deg)
      .select(col("node"), size(col("nbrs")).as("n")).as[(Long, Int)]
      .collect().toMap
    // the deg-39 hub is the HIGHEST-ordered node: every edge points AT
    // it, so its forward list is absent/empty while the unoriented list
    // held all 39 neighbors; no node's forward list exceeds its clique
    assert(!fwd.contains(1L), "hub must carry no forward adjacency state")
    assert(fwd.values.max <= 3,
      s"forward lists must stay clique-sized on the hub graph: $fwd")
    // and the oriented spelling still counts every triangle at the hub:
    // {1,2,3} {1,3,4} {1,2,4} {2,3,4}
    val got = Graph.triangleStatsOn(e).select(col("part"), col("tri"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L) === 3L && got(2L) === 3L && got(3L) === 3L && got(4L) === 3L)
  }

  test("degrees: log2 staircase buckets with exact in-bucket extremes") {
    // star center 1 with 5 leaves, plus an edge between leaves 2-3:
    // degrees = {1: 5, 2: 2, 3: 2, 4: 1, 5: 1, 6: 1}
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L), (2L, 3L))
      .map { case (a, b) => (a, b, 1L) }.toDF("part_a", "part_b", "w")
    val got = Graph.degreeHistogramOn(e)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 3L, 1L, 1L),   // deg 1 -> bin "1"  (len 1): nodes 4, 5, 6
      (2L, 2L, 2L, 2L),   // deg 2 -> bin "10" (len 2): nodes 2, 3
      (3L, 1L, 5L, 5L)))  // deg 5 -> bin "101" (len 3): node 1
  }

  test("reach: chain frontier growth, cycle plateau, seed excluded") {
    // chain 10 - 1 - 2 - 3: each hop reaches one more node
    val chain = Seq((1L, 10L, 1L), (1L, 2L, 1L), (2L, 3L, 1L))
      .toDF("part_a", "part_b", "w")
    val got = Graph.reachabilityOn(chain, seedMod = 10, maxHops = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((10L, 1L, 1L), (10L, 2L, 2L), (10L, 3L, 3L)))
    // triangle 10-1-2: closure saturates at hop 1 and PLATEAUS; the
    // seed itself never counts even though the cycle returns to it
    val tri = Seq((1L, 10L, 1L), (2L, 10L, 1L), (1L, 2L, 1L))
      .toDF("part_a", "part_b", "w")
    val sat = Graph.reachabilityOn(tri, seedMod = 10, maxHops = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(sat === Set((10L, 1L, 2L), (10L, 2L, 2L), (10L, 3L, 2L)))
    intercept[IllegalArgumentException](Graph.reachabilityOn(chain, 10, 0))
    intercept[IllegalArgumentException](Graph.reachabilityOn(chain, 10, 6))
  }

  test("trending: per-month weights, lag delta per pair, deterministic top-k") {
    // month 100: one order with {10, 20}; month 101: three such orders
    // plus one bringing in part 30
    val ls = lines(
      (1L, 10L), (1L, 20L),
      (3L, 10L), (3L, 20L), (4L, 10L), (4L, 20L), (5L, 10L), (5L, 20L),
      (6L, 10L), (6L, 30L))
    val om = Seq((1L, 100L), (3L, 101L), (4L, 101L), (5L, 101L), (6L, 101L))
      .toDF("l_orderkey", "mo")
    val all = Graph.trendingPairsOn(ls, om, k = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(all === Seq(
      (10L, 20L, 101L, 3L, 2L), // 3 vs last month's 1
      (10L, 20L, 100L, 1L, 1L), // first observed month: delta = w
      (10L, 30L, 101L, 1L, 1L)))
    // the k cut respects the (dw desc, a, b, mo) total order
    val top = Graph.trendingPairsOn(ls, om, k = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(top === all.take(2))
  }

  test("custrecs: item-item CF scoring, ownership exclusion, per-cust ranks") {
    val edges = Seq((10L, 20L, 3L), (10L, 30L, 1L), (20L, 30L, 1L))
      .toDF("part_a", "part_b", "w")
    val owned = Seq((150L, 10L), (151L, 20L), (300L, 10L), (300L, 20L))
      .toDF("cust", "part")
    val got = Graph.customerRecsOn(edges, owned, seedMod = 150, k = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      // cust 150 owns {10}: 20 scores 3, 30 scores 1
      (150L, 20L, 3L, 1L), (150L, 30L, 1L, 2L),
      // cust 300 owns {10, 20}: both routes land on 30 (1 + 1); the
      // owned candidates 10 and 20 are excluded
      (300L, 30L, 2L, 1L)))
    // cust 151 is not a seed (151 % 150 != 0)
    assert(!got.exists(_._1 == 151L))
    intercept[IllegalArgumentException](Graph.customerRecsOn(edges, owned, 0, 5))
    intercept[IllegalArgumentException](Graph.customerRecsOn(edges, owned, 150, 0))
  }

  test("linkpred: RA weighting, neighbor exclusion, seed anchoring") {
    // path fixture: seed 10 - {1, 3} - 2 - 4; candidate 2 is reachable
    // through BOTH selective brokers (deg 2 each) -> RA = 2 * 500000
    val e1 = Seq((1L, 10L, 1L), (1L, 2L, 1L), (3L, 10L, 1L),
      (2L, 3L, 1L), (2L, 4L, 1L)).toDF("part_a", "part_b", "w")
    val got1 = Graph.linkPredictOn(e1, seedMod = 10, k = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got1 === Set((10L, 2L, 1000000L, 1L)))
    // add the direct edge (10, 2): 2 is now a NEIGHBOR and must leave;
    // the next candidate is 4, brokered only by 2 (deg 4 -> 250000)
    val e2 = e1.unionByName(Seq((2L, 10L, 1L)).toDF("part_a", "part_b", "w"))
    val got2 = Graph.linkPredictOn(e2, seedMod = 10, k = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got2 === Set((10L, 4L, 250000L, 1L)))
    // every node seeded: ranks are per-seed, dense from 1, capped at k
    val all = Graph.linkPredictOn(e1, seedMod = 1, k = 1)
      .as[(Long, Long, Long, Long)].collect()
    assert(all.forall(_._4 === 1L), "k = 1 keeps only the top candidate")
    assert(all.map(_._1).distinct.length === all.length,
      "one row per seed at k = 1")
    intercept[IllegalArgumentException](Graph.linkPredictOn(e1, 0, 5))
    intercept[IllegalArgumentException](Graph.linkPredictOn(e1, 10, 0))
  }

  test("itemsim: weighted-Jaccard normalization, exact ppm, k cut on the total order") {
    // wdeg: 1 -> 4, 2 -> 4, 3 -> 2
    val e = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 1L))
      .toDF("part_a", "part_b", "w")
    val all = Graph.itemSimilarityOn(e, k = 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(all === Seq(
      (1L, 2L, 3L, 600000L),   // 3e6 DIV (4+4-3)
      (1L, 3L, 1L, 200000L),   // 1e6 DIV (4+2-1) — sim tie vs (2,3)...
      (2L, 3L, 1L, 200000L)))  // ...broken by (part_a, part_b)
    assert(Graph.itemSimilarityOn(e, k = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq === all.take(2))
    intercept[IllegalArgumentException](Graph.itemSimilarityOn(e, 0))
  }

  test("labelprop: min labels travel exactly one hop per round; islands stay apart") {
    // chain 5 - 3 - 8 - 10 plus the disconnected edge 20 - 21
    val e = Seq((3L, 5L, 1L), (3L, 8L, 1L), (8L, 10L, 1L), (20L, 21L, 1L))
      .toDF("part_a", "part_b", "w")
    val r1 = Graph.labelPropagationOn(e, rounds = 1)
      .as[(Long, Long)].collect().toMap
    // after ONE round the min label 3 reaches only direct neighbors:
    // node 10 sees only {10, 8} and settles on 8 for now
    assert(r1 === Map(3L -> 3L, 5L -> 3L, 8L -> 3L, 10L -> 8L,
      20L -> 20L, 21L -> 20L))
    val r2 = Graph.labelPropagationOn(e, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(r2 === Map(3L -> 3L, 5L -> 3L, 8L -> 3L, 10L -> 3L,
      20L -> 20L, 21L -> 20L),
      "round 2 must carry the chain minimum one more hop, islands untouched")
    intercept[IllegalArgumentException](Graph.labelPropagationOn(e, 0))
    intercept[IllegalArgumentException](Graph.labelPropagationOn(e, 11))
  }

  test("components: exact partition by min id, beyond any fixed round budget") {
    // a 12-node chain (diameter 11 — far past labelprop's 5-round
    // budget) plus a separate triangle: the convergent member must
    // label the WHOLE chain with its minimum while the bounded member
    // provably cannot
    val chain = (1L until 12L).map(i => (i, i + 1, 1L))
    val tri = Seq((20L, 21L, 1L), (21L, 22L, 1L), (20L, 22L, 1L))
    val e = (chain ++ tri).toDF("part_a", "part_b", "w")
    val got = Graph.componentsOn(e).as[(Long, Long)].collect().toMap
    assert(got === ((1L to 12L).map(_ -> 1L) ++ Seq(20L, 21L, 22L).map(_ -> 20L)).toMap)
    // the fixed-round sibling at 5 rounds leaves the chain's far end
    // unconverged — exactly the trade the two members exist to offer
    val bounded = Graph.labelPropagationOn(e, rounds = 5)
      .as[(Long, Long)].collect().toMap
    assert(bounded(12L) > 1L, "a 5-round budget must not reach 11 hops")
    assert(got(12L) === 1L)
  }

  test("recs: strength ranking with id tiebreak, bounded at k per part") {
    val e = Seq(
      (1L, 2L, 5L), (1L, 3L, 5L), (1L, 4L, 7L), (1L, 5L, 1L),
      (2L, 3L, 2L)).toDF("part_a", "part_b", "w")
    val got = Graph.itemRecsOn(e, k = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 4L, 7L, 1L), (1L, 2L, 5L, 2L), // w tie 2-vs-3 broken by id
      (2L, 1L, 5L, 1L), (2L, 3L, 2L, 2L),
      (3L, 1L, 5L, 1L), (3L, 2L, 2L, 2L),
      (4L, 1L, 7L, 1L),
      (5L, 1L, 1L, 1L)))
  }

  test("native pair_structs equals the HOF pair expansion (values AND order)") {
    // fixture baskets at sf0.001 plus hand shapes: size-2, size-5, the
    // MaxBasket-boundary path is covered by the edge tests above
    val baskets = Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
      .filter(size(col("parts")) >= 2)
    def hof(parts: org.apache.spark.sql.Column) =
      flatten(transform(sequence(lit(1), size(parts) - 1), i =>
        transform(sequence(i + 1, size(parts)), j =>
          struct(element_at(parts, i).as("part_a"),
            element_at(parts, j).as("part_b")))))
    val both = baskets.select(col("l_orderkey"),
      graft.functions.PairStructs.pairStructs(col("parts")).as("nat"),
      hof(col("parts")).as("ref"))
    assert(both.count() > 0)
    assert(both.filter(not(col("nat") === col("ref"))).isEmpty,
      "native pair expansion diverged from the HOF spelling")
  }
}
