package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over the part CO-PURCHASE graph — the item-item
  * structure every recommender / "customers also bought" pipeline
  * derives from an order log. Nodes are parts; an undirected edge
  * (a, b) with weight w means w distinct orders contained both parts.
  *
  * Everything is spelled in integer fixed-point (ppm ranks, integer
  * DIV) so the DuckDB oracle is bit-identical — the same discipline as
  * the tf-idf / LM score families (floating PageRank would hash-differ
  * on summation order; truncating integer division does not).
  *
  * 100 TB shape: the edge build is ONE shuffle (groupBy orderkey) with
  * per-group state bounded by [[MaxBasket]] (TPC-H orders hold ≤ 7
  * lines; pathological mega-baskets are excluded, see
  * [[copurchaseEdgesOn]]) — the pair expansion is a HOF over a bounded
  * sorted array, never a self-join that would shuffle the fact table
  * twice; PageRank iterations reuse ONE persisted src-partitioned
  * adjacency across all steps, so each step shuffles only the
  * node-sized rank frame plus the contribution aggregate; triangle
  * enumeration is COMPACT-FORWARD since r19 ([[forwardAdjacency]]):
  * each undirected edge is oriented up the (degree, id) order and the
  * orientation filter runs BEFORE the groupBy, so no aggregation
  * state ever holds a hub's full neighbor set — per-node forward
  * lists are bounded by O(sqrt m), the classic compact-forward
  * guarantee. Crediting all three corners per triangle is a per-edge
  * explode over the intersected lists ([[triangleStatsOn]]), cheap
  * next to the state bound it buys.
  */
object Graph {

  /** Largest basket (distinct parts per order) the edge build pairs.
    * The per-group collect_set and the quadratic pair HOF are bounded
    * by basket size — fine on order logs shaped like TPC-H (≤ 7 lines
    * per order), but ONE mega-order with 10⁴ distinct parts would
    * materialize a 10⁴-element array row and explode ~5·10⁷ pairs from
    * a single group, breaking the "bounded per-group state" contract.
    * Baskets larger than this are EXCLUDED, the standard market-basket
    * treatment (a bulk/institutional order that large carries no
    * item-affinity signal — every pair in it is noise at weight ~1
    * each); exclusion is deterministic (a size predicate on the
    * distinct-part set, never a prefix truncation that would silently
    * keep an arbitrary subset of a basket's pairs). The bound sits far
    * above TPC-H's ≤ 7-part baskets, so on the fixtures the gated and
    * ungated edge sets are IDENTICAL at every SF and the unbounded
    * DuckDB self-join oracles remain exact (GraphSpec plants a
    * mega-basket to pin the exclusion itself).
    */
  val MaxBasket = 256

  /** Distinct co-purchase edges (part_a < part_b, w = number of
    * distinct orders containing both parts).
    *
    * Plan: distinct (orderkey, partkey) → groupBy orderkey with a
    * sorted collect_set (bounded by [[MaxBasket]]) → HOF pair
    * expansion (i < j over the array) → explode → count per pair. One
    * wide shuffle on orderkey + the final pair aggregate; the DuckDB
    * oracle arrives at the same bag through an orderkey equi-self-join.
    */
  def copurchaseEdges(spark: SparkSession, sfDir: String): DataFrame =
    copurchaseEdgesOn(
      Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_partkey")))

  /** All (i, j) i < j pairs of a SORTED part array as structs — the
    * shared pair expansion of the plain and per-month edge builds.
    * NATIVE since r20 ([[graft.functions.PairStructs]], guide §4): the
    * HOF spelling (flatten of nested transforms over sequences) was
    * interpreted per basket and paid a closure + sequence allocation per
    * outer index at every graph query's edge build; the native loop
    * emits the identical array (GraphSpec pins it). Callers filter
    * size >= 2; the expression is total anyway.
    */
  private def pairStructs(parts: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.PairStructs.pairStructs(parts)

  def copurchaseEdgesOn(lines: DataFrame): DataFrame = {
    // size gate AFTER the collect (Spark has no capped collect_set, so
    // the collected array is O(basket) for the one pathological group)
    // but BEFORE the pair HOF — the O(basket²) expansion, the part
    // that actually breaks at scale, never runs on a mega-basket
    val sets = lines.distinct()
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
      .filter(size(col("parts")).between(2, MaxBasket))
    sets.select(explode(pairStructs(col("parts"))).as("pr"))
      .select(col("pr.part_a"), col("pr.part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("w"))
  }

  /** Weighted PageRank in ppm fixed-point over the co-purchase graph,
    * a FIXED number of synchronous iterations (the training-signal
    * spelling: "how central is this item in the purchase structure").
    *
    * Exact integer contract (mirrored by the unrolled-CTE oracle):
    * rank₀ = 1 000 000 per node; each step
    *   rankᵥ = 150 000 + Σᵤ→ᵥ (850·rankᵤ·w) DIV (1000·wdegᵤ)
    * with per-EDGE truncation — both engines truncate at the same
    * point, so results are bit-identical where float PageRank would
    * depend on summation order. Every node in the (bidirected) edge
    * set has in- and out-edges, so no dangling-mass term is needed.
    *
    * Plan: the adjacency (src, dst, w, wdegᵤ) is built once,
    * REPARTITIONED BY src and persisted — each iteration shuffles only
    * the node-sized rank frame to src and the edge contributions to
    * dst (two node/edge-keyed exchanges per step, nothing rescans the
    * fact table). Lineage grows linearly in `iters` (≤ 20 by guard),
    * no checkpoint needed.
    */
  def pageRank(spark: SparkSession, sfDir: String, iters: Int = 5): DataFrame =
    pageRankOn(copurchaseEdges(spark, sfDir), iters)

  def pageRankOn(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 20,
      s"pageRank needs 1 <= iters <= 20 (fixed-step contract), got $iters")
    // materialize the edge list FIRST (the connected-components
    // precedent, Dedup.clusterPairs): the adjacency assembly below
    // references it four times (two union branches + their wdeg
    // aggregate), which un-checkpointed replays the fact-table edge
    // build 4x — measured 6.3 s -> 3.1 s at sf0.1
    val e = edges.localCheckpoint(false)
    val directed = e.select(col("part_a").as("src"), col("part_b").as("dst"), col("w"))
      .unionAll(e.select(col("part_b").as("src"), col("part_a").as("dst"), col("w")))
    val wdeg = directed.groupBy(col("src")).agg(sum(col("w")).as("wdeg"))
    // the wdeg equi-join already shuffles both sides by src, so its
    // output IS src-partitioned; checkpointed so every iteration
    // replays RDD blocks — ONE fact scan total, however many steps.
    // Deliberately EAGER where the rest of the family went lazy (r20):
    // the 5-step loop query references adj at five nesting depths and
    // its broadcast subtrees race to compute the same lazy blocks —
    // measured min 4.46 s eager vs 4.83–5.13 s lazy at sf0.1; the
    // single-consumer checkpoints around it stay lazy (one job saved
    // each, no contended first-compute).
    val adj = directed.join(wdeg, "src").localCheckpoint()
    var ranks = wdeg.select(col("src").as("node"), lit(1000000L).as("rank_ppm"))
    (1 to iters).foreach { _ =>
      ranks = adj
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst"))
        .agg(sum(expr("(850 * rank_ppm * w) DIV (1000 * wdeg)")).as("contrib"))
        .select(col("dst").as("node"),
          (lit(150000L) + col("contrib")).as("rank_ppm"))
    }
    ranks
  }

  /** Per-node triangle participation + local clustering coefficient
    * (ppm) over the UNWEIGHTED co-purchase graph — the density signal
    * community detection and spam-structure analysis start from.
    *
    * Plan (COMPACT-FORWARD edge iterator, r18 verdict #2): order nodes
    * by (degree, id) and orient every undirected edge toward its
    * higher-ordered endpoint, so the per-node adjacency list holds only
    * FORWARD neighbors — O(√m) per node on ANY graph (a node of
    * forward-degree d has d neighbors of degree ≥ its own, so
    * d² ≤ Σdeg = 2m), where the unoriented spelling held O(deg_max)
    * and a 100×-skew hub's row became a task-OOM risk. Each triangle
    * {x,y,z} (ordered x<y<z) is found exactly once, at its lowest
    * corner edge (x,y), as z ∈ N⁺(x) ∩ N⁺(y) — a per-row array
    * intersection inside codegen, never a wedge-set shuffle (the first
    * spelling materialized the Σ C(deg,2) wedge join: 15M rows and 4×
    * this cost at sf0.1). The intersected witnesses are exploded
    * (output-sized: one row per triangle) and each triangle credits
    * its three corners once; degrees ride the same union-aggregate.
    * The id-ordered wedge-join DuckDB oracle enumerates the same
    * triangle bag — spelling changes the plan, never the result.
    */
  def triangleStats(spark: SparkSession, sfDir: String): DataFrame =
    triangleStatsOn(copurchaseEdges(spark, sfDir))

  /** (node, nbrs) with nbrs = the node's HIGHER-(degree, id)-ordered
    * neighbors only — the bounded-state adjacency [[triangleStatsOn]]
    * intersects (exposed for the spec's state-bound assertion). The
    * orientation filter runs BEFORE the groupBy, so no aggregation
    * state ever holds a hub's full neighbor set; `deg` is node-sized
    * (the optimizer broadcasts it at any realistic node count).
    * `directed` is the both-ways edge frame; each undirected edge
    * survives the filter exactly once, pointing up the order.
    */
  private[graft] def forwardAdjacency(directed: DataFrame, deg: DataFrame): DataFrame =
    directed
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .filter(col("da") > col("db") ||
        (col("da") === col("db") && col("a") > col("b")))
      .groupBy(col("b").as("node"))
      .agg(sort_array(collect_set(col("a"))).as("nbrs"))

  def triangleStatsOn(edges: DataFrame): DataFrame = {
    // edge list materialized once (the pageRankOn checkpoint note:
    // un-checkpointed, the fact-table edge build replays per
    // reference); the node-sized degree + forward adjacency once more —
    // each feeds multiple joins
    val und = edges.select(col("part_a").as("a"), col("part_b").as("b"))
      .localCheckpoint(false)
    val directed = und.unionAll(und.select(col("b").as("a"), col("a").as("b")))
    val deg = directed.groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("deg")).localCheckpoint(false)
    val adj = forwardAdjacency(directed, deg).localCheckpoint(false)
    // forward edges re-derived FROM adj (u paired with each v in its
    // list) so the edge frame and the intersected lists cannot disagree;
    // inner joins: u always has a forward list (v is in it); an edge
    // whose v has no forward neighbors hosts no triangle at this corner
    val perEdge = adj.select(col("node").as("u"), col("nbrs").as("nu"),
        explode(col("nbrs")).as("v"))
      .join(adj.select(col("node").as("v"), col("nbrs").as("nv")), "v")
      .select(col("u"), col("v"),
        array_intersect(col("nu"), col("nv")).as("ws"))
      .filter(size(col("ws")) > 0)
    // one output-sized explode credits all three corners: the two low
    // corners get the edge's whole count (2 rows per triangle-bearing
    // edge), each witness w gets 1 — rows ≈ triangles + 2·edges, not
    // 3·triangles
    // native credit structs (r21, guide §4): the composed
    // `concat(array(struct(u, size), struct(v, size)), transform(ws,
    // w => struct(w, 1L)))` paid an interpreted transform closure per
    // witness plus a concat copy per edge row (GraphSpec pins native ==
    // composed parity, values and order)
    val credits = perEdge.select(explode(graft.functions.CreditStructs
        .creditStructs(col("u"), col("v"), col("ws"))).as("x"))
      .groupBy(col("x.n").as("node")).agg(sum(col("x.c")).as("tri"))
    deg.filter(col("deg") >= 2)
      .join(credits, Seq("node"), "left")
      .select(col("node").as("part"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"),
        expr("(2 * coalesce(tri, 0) * 1000000) DIV (deg * (deg - 1))").as("cc_ppm"))
  }

  /** Degree DISTRIBUTION of the co-purchase graph in log₂ buckets
    * (the repo's `length(bin(x))` integer staircase — q_event_latency_
    * hist's spelling, bit-identical in DuckDB): bucket b holds nodes
    * with 2^(b-1) ≤ degree < 2^b, with exact min/max inside each. The
    * shape question (is this graph power-law or flat?) every
    * partitioning/skew decision on graph data starts from — ~64
    * buckets of state regardless of graph size.
    */
  def degreeHistogram(spark: SparkSession, sfDir: String): DataFrame =
    degreeHistogramOn(copurchaseEdges(spark, sfDir))

  def degreeHistogramOn(edges: DataFrame): DataFrame = {
    val und = edges.select(col("part_a").as("a"), col("part_b").as("b"))
    val deg = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    deg.groupBy(expr("CAST(length(bin(deg)) AS BIGINT)").as("bucket"))
      .agg(count(lit(1)).as("n_nodes"),
        min(col("deg")).as("min_deg"), max(col("deg")).as("max_deg"))
  }

  /** Multi-hop REACHABILITY from seed parts — the traversal member of
    * the family: for each seed, how many distinct parts are within
    * 1, 2, …, maxHops co-purchase hops (seed itself excluded). The
    * "assortment radius" question a catalog/recommendation audit asks.
    *
    * Plan: FRONTIER-DELTA expansion (textbook BFS): each hop joins
    * only the nodes REACHED LAST HOP to the adjacency — on a dense
    * graph the closure saturates in 2–3 hops, and re-joining the whole
    * saturated closure multiplies |closure| × avg-degree rows per hop
    * for nothing (the naive spelling measured 42.7 s at sf0.1; this
    * one 2.4 s at the same answer). Frontier and closure are
    * localCheckpoint'ed per hop (each feeds two consumers). Seed-
    * anchored like [[linkPredict]]: state is |seeds| × reachable,
    * never all-pairs. The oracle unrolls the same closure as chained
    * CTEs — closure counts are spelling-independent.
    */
  def reachability(spark: SparkSession, sfDir: String,
                   seedMod: Int = 100, maxHops: Int = 3): DataFrame =
    reachabilityOn(copurchaseEdges(spark, sfDir), seedMod, maxHops)

  def reachabilityOn(edges: DataFrame, seedMod: Int, maxHops: Int): DataFrame = {
    require(seedMod >= 1, s"reachability needs seedMod >= 1, got $seedMod")
    require(maxHops >= 1 && maxHops <= 5,
      s"reachability needs 1 <= maxHops <= 5 (each hop is a join round), got $maxHops")
    val e = edges.localCheckpoint(false)
    val directed = e.select(col("part_a").as("src"), col("part_b").as("dst"))
      .unionAll(e.select(col("part_b").as("src"), col("part_a").as("dst")))
    val seeds = directed.select(col("src")).distinct()
      .filter(pmod(col("src"), lit(seedMod.toLong)) === 0L)
    var reached = seeds.select(col("src").as("seed"), col("src").as("node"))
    var frontier = reached
    val perHop = (1 to maxHops).map { h =>
      val expanded = frontier
        .join(directed.withColumnRenamed("src", "node"), "node")
        .select(col("seed"), col("dst").as("node"))
        .distinct()
      frontier = expanded.join(reached, Seq("seed", "node"), "left_anti")
      // checkpoint the closure only from depth 2 on: at shallow hops
      // the whole expansion is one query whose shared subtrees Spark
      // reuses, and an eager materialization barrier per hop costs
      // more than it saves; from hop 2 the frontier recursion starts
      // compounding and the barrier wins — except at the FINAL hop,
      // where nothing expands further and the closure's one remaining
      // consumer is its own count (a barrier there is pure overhead)
      reached = reached.unionAll(frontier)
      if (h >= 2 && h < maxHops) {
        reached = reached.localCheckpoint(false); frontier = frontier.localCheckpoint(false)
      }
      reached.groupBy(col("seed"))
        .agg((count(lit(1)) - 1L).as("n_reachable"))
        .select(col("seed").as("part"), lit(h.toLong).as("hop"),
          col("n_reachable"))
    }
    perHop.reduce(_ unionAll _)
  }

  /** TRENDING co-purchase pairs — the temporal cut of the graph: edge
    * weights per ORDER MONTH (an order's month is its o_orderdate, so
    * each order lands in exactly one bucket and the monthly edge sets
    * partition the corpus), month-over-month delta per pair via a
    * per-pair lag window (delta is vs the previous OBSERVED month —
    * zero-activity months don't gap-fill a pair that by definition has
    * no row), global top-k movers with a full deterministic tiebreak.
    *
    * Plan: the pair expansion rides the same bounded per-order HOF as
    * [[copurchaseEdgesOn]] with the month attached before the
    * explode; the lag window partitions by PAIR (never global); the
    * cut is a TakeOrdered.
    */
  def trendingPairs(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame = {
    val lines = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
    val orderMonths = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("mo"))
    trendingPairsOn(lines, orderMonths, k)
  }

  def trendingPairsOn(lines: DataFrame, orderMonths: DataFrame,
                      k: Int): DataFrame = {
    require(k >= 1, s"trendingPairs needs k >= 1, got $k")
    val sets = lines.distinct()
      .join(orderMonths, "l_orderkey")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"),
        // one month per order by construction; max is the spelling
        // that is deterministic BY TYPE, not by data shape
        max(col("mo")).as("mo"))
      // same MaxBasket gate as copurchaseEdgesOn — the monthly edge
      // sets must partition exactly the corpus the plain build pairs
      .filter(size(col("parts")).between(2, MaxBasket))
    val pairs = sets.select(col("mo"),
      explode(pairStructs(col("parts"))).as("pr"))
    val monthly = pairs
      .select(col("mo"), col("pr.part_a"), col("pr.part_b"))
      .groupBy(col("mo"), col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("w"))
    val byPair = Window.partitionBy(col("part_a"), col("part_b"))
      .orderBy(col("mo").asc)
    monthly
      .withColumn("dw", col("w") - coalesce(lag(col("w"), 1).over(byPair), lit(0L)))
      .select(col("part_a"), col("part_b"), col("mo"), col("w"), col("dw"))
      .orderBy(col("dw").desc, col("part_a").asc, col("part_b").asc, col("mo").asc)
      .limit(k)
  }

  /** CUSTOMER recommendations through the item-item structure — the
    * serving composition of the co-purchase graph: a candidate part's
    * score for a customer is the summed co-purchase weight from every
    * part the customer already bought, already-owned parts excluded —
    * classic item-item collaborative filtering, integer-exact (scores
    * are edge-weight sums).
    *
    * Plan: seed customers' ownership rows fan out through the
    * bidirected edge set (ownership ⋈ adjacency on part — candidate
    * volume bounded by |seed ownership| · avg-degree, the linkPredict
    * anchoring), one (cust, candidate) aggregate, a left-anti join
    * back onto ownership, and a per-customer top-k window.
    */
  def customerRecs(spark: SparkSession, sfDir: String,
                   seedMod: Int = 150, k: Int = 5): DataFrame = {
    val owned = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey").as("o_orderkey"), col("l_partkey")),
        "o_orderkey")
      .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      .distinct()
    customerRecsOn(copurchaseEdges(spark, sfDir), owned, seedMod, k)
  }

  /** [[customerRecs]] over any (part_a, part_b, w) edge set and
    * (cust, part) ownership frame — spec entry point.
    */
  def customerRecsOn(edges: DataFrame, owned: DataFrame,
                     seedMod: Int, k: Int): DataFrame = {
    require(seedMod >= 1, s"customerRecs needs seedMod >= 1, got $seedMod")
    require(k >= 1, s"customerRecs needs k >= 1, got $k")
    val e = edges.localCheckpoint(false)
    val directed = e.select(col("part_a").as("part"), col("part_b").as("v"), col("w"))
      .unionAll(e.select(col("part_b").as("part"), col("part_a").as("v"), col("w")))
    val seedOwned = owned.filter(pmod(col("cust"), lit(seedMod.toLong)) === 0L)
    val scored = seedOwned
      .join(directed, "part")
      .groupBy(col("cust"), col("v"))
      .agg(sum(col("w")).as("score"))
      .join(owned.select(col("cust"), col("part").as("v")),
        Seq("cust", "v"), "left_anti")
    val byCust = Window.partitionBy(col("cust"))
      .orderBy(col("score").desc, col("v").asc)
    scored
      .withColumn("rnk", row_number().over(byCust).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("cust"), col("v").as("candidate"), col("score"), col("rnk"))
  }

  /** LINK PREDICTION from seed parts via the Resource-Allocation
    * index: for each seed u, score every distance-2 candidate v (not
    * already a neighbor) as RA(u,v) = Σ_{z ∈ N(u)∩N(v)} 10⁶ DIV deg(z)
    * — common neighbors count more when they are SELECTIVE (a hub that
    * co-occurs with everything predicts nothing). Integer ppm
    * spelling, so the oracle is bit-identical where the float 1/deg
    * (or Adamic-Adar's 1/log deg) would hash-drift.
    *
    * Plan: seed-ANCHORED two-hop expansion — seed out-edges (u, z)
    * join the adjacency (z, v), never the all-pairs wedge set (the
    * full RA matrix is Σ C(deg, 2) rows; anchoring bounds it by
    * |seed edges| · avg-degree). Existing edges leave via a
    * left-anti join on the directed edge set; the per-seed top-k is a
    * per-node window (partition key = seed, never global).
    */
  def linkPredict(spark: SparkSession, sfDir: String,
                  seedMod: Int = 100, k: Int = 5): DataFrame =
    linkPredictOn(copurchaseEdges(spark, sfDir), seedMod, k)

  def linkPredictOn(edges: DataFrame, seedMod: Int, k: Int): DataFrame = {
    require(seedMod >= 1, s"linkPredict needs seedMod >= 1, got $seedMod")
    require(k >= 1, s"linkPredict needs k >= 1, got $k")
    val e = edges.localCheckpoint(false)
    val directed = e.select(col("part_a").as("src"), col("part_b").as("dst"))
      .unionAll(e.select(col("part_b").as("src"), col("part_a").as("dst")))
    val deg = directed.groupBy(col("src").as("z"))
      .agg(count(lit(1)).as("zdeg"))
    val seedEdges = directed.filter(pmod(col("src"), lit(seedMod.toLong)) === 0L)
      .select(col("src").as("u"), col("dst").as("z"))
    val hop2 = seedEdges
      .join(directed.select(col("src").as("z"), col("dst").as("v")), "z")
      .filter(col("v") =!= col("u"))
      .join(deg, "z")
    val scored = hop2
      .groupBy(col("u"), col("v"))
      .agg(sum(expr("1000000 DIV zdeg")).as("score_ppm"))
      .join(directed.select(col("src").as("u"), col("dst").as("v")),
        Seq("u", "v"), "left_anti")
    val bySeed = Window.partitionBy(col("u"))
      .orderBy(col("score_ppm").desc, col("v").asc)
    scored
      .withColumn("rnk", row_number().over(bySeed).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("u").as("part"), col("v").as("candidate"),
        col("score_ppm"), col("rnk"))
  }

  /** WEIGHTED-JACCARD item similarity — the normalized cut of the raw
    * co-purchase weight: sim(a, b) = w(a,b) / (wdeg(a) + wdeg(b) −
    * w(a,b)) in ppm (integer DIV, oracle-exact) — the union-normalized
    * overlap that demotes pairs that merely involve POPULAR items
    * (raw w ranks bestseller pairs first even when neither item is
    * specific to the other; the normalized score ranks mutual
    * specificity). Top-k pairs globally with the full (sim, a, b)
    * deterministic tiebreak.
    *
    * Plan: two broadcast-sized joins of the edge set against the
    * node-sized weighted-degree frame, then a TakeOrdered — no new
    * shuffle shape beyond the edge build.
    */
  def itemSimilarity(spark: SparkSession, sfDir: String, k: Int = 50): DataFrame =
    itemSimilarityOn(copurchaseEdges(spark, sfDir), k)

  def itemSimilarityOn(edges: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"itemSimilarity needs k >= 1, got $k")
    val e = edges.localCheckpoint(false)
    val deg = e.select(col("part_a").as("p"), col("w"))
      .unionAll(e.select(col("part_b").as("p"), col("w")))
      .groupBy(col("p")).agg(sum(col("w")).as("wdeg"))
    e.join(deg.select(col("p").as("part_a"), col("wdeg").as("deg_a")), "part_a")
      .join(deg.select(col("p").as("part_b"), col("wdeg").as("deg_b")), "part_b")
      .select(col("part_a"), col("part_b"), col("w"),
        expr("(w * 1000000) DIV (deg_a + deg_b - w)").as("sim_ppm"))
      .orderBy(col("sim_ppm").desc, col("part_a").asc, col("part_b").asc)
      .limit(k)
  }

  /** FIXED-ROUND min-label propagation — bounded-round connected-
    * component / community bootstrapping: label₀(v) = v; each round,
    * labelₜ₊₁(v) = min(labelₜ(v), min over neighbors labelₜ(u)). After
    * r rounds two nodes share a label iff a path of ≤ r "min-carrying"
    * hops connects them to the same minimum — the standard BSP
    * label-propagation step, integer-exact and therefore hash-green
    * against an unrolled-CTE oracle (exact components need unbounded
    * rounds; the repo's exact-component member is [[Dedup]]
    * .clusterPairs — one-hop min-label propagation run to convergence,
    * O(diameter) rounds with a maxIter guard, falling back to the
    * O(log n) large-star/small-star contraction
    * ([[Dedup]].clusterPairsStar) only on non-convergence — used where
    * convergence is the contract; THIS member is the fixed-budget scan
    * a 1000-executor nightly job actually schedules).
    *
    * Plan: self-loops fold the keep-own-label term into the SAME
    * neighbor-min aggregate, so each round is exactly ONE edge-keyed
    * join + node-keyed aggregate over a checkpointed adjacency —
    * [[pageRankOn]]'s loop shape; lineage linear in rounds (≤ 10 by
    * guard). No PER-ROUND cut is needed (unlike [[Dedup]].clusterPairs,
    * which checkpoints inside its loop): here only the NODE frame grows
    * a fixed join+aggregate per round against the one checkpointed
    * adjacency — ≤ 10 stacked two-operator layers on a two-column frame
    * — where the convergent clusterer rewrites its EDGE frame each
    * round and would compound without cuts.
    */
  def labelPropagation(spark: SparkSession, sfDir: String,
                       rounds: Int = 5): DataFrame =
    labelPropagationOn(copurchaseEdges(spark, sfDir), rounds)

  def labelPropagationOn(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 10,
      s"labelPropagation needs 1 <= rounds <= 10 (fixed-round contract), got $rounds")
    val e = edges.localCheckpoint(false)
    val directed = e.select(col("part_a").as("src"), col("part_b").as("dst"))
      .unionAll(e.select(col("part_b").as("src"), col("part_a").as("dst")))
    val nodes = directed.select(col("src")).distinct()
    // src-REPARTITIONED before the checkpoint (pageRankOn's adjacency
    // note, made explicit here because the self-loop union destroys
    // any incidental partitioning): every round's equi-join then
    // reuses the stored partitioning and shuffles only the node-sized
    // label frame — measured 5.9 s -> 4.9 s at sf0.1 over 5 rounds
    // (the residual is the per-round aggregate, the pageRankOn shape)
    val adj = directed
      .unionAll(nodes.select(col("src"), col("src").as("dst")))
      .repartition(col("src"))
      .localCheckpoint(false)
    var labels = nodes.select(col("src").as("node"), col("src").as("label"))
    (1 to rounds).foreach { _ =>
      labels = adj
        .join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst"))
        .agg(min(col("label")).as("label"))
        .select(col("dst").as("node"), col("label"))
    }
    labels
  }

  /** EXACT connected components of the co-purchase graph — each part
    * labeled with its component's MINIMUM part id. The convergent
    * sibling of [[labelPropagation]]: where the fixed-round member
    * buys a bounded scan budget, this one buys the exact partition —
    * by REUSING the engine's proven component machinery
    * ([[Dedup.clusterPairs]]: min-label propagation with per-round
    * localCheckpoint lineage cuts and a label-sum convergence check,
    * the same code path the MinHash near-dup clusters ship on), so
    * graph components and dedup clusters can never fork semantics.
    * Exact vs a recursive-CTE oracle (min label over the reachability
    * closure) — the convergence loop is engine-side only; the RESULT
    * is spelling-independent.
    */
  def components(spark: SparkSession, sfDir: String): DataFrame =
    componentsOn(copurchaseEdges(spark, sfDir))

  def componentsOn(edges: DataFrame): DataFrame =
    Dedup.clusterPairs(edges.select(
        col("part_a").as("doc_a"), col("part_b").as("doc_b")))
      .select(col("doc_id").as("part"), col("cluster_id").as("component"))

  /** Top-k "also bought" recommendations per part: the k strongest
    * co-purchase neighbors, ranked by edge weight (count of shared
    * orders) with neighbor id as the deterministic tiebreak — the
    * item-item collaborative-filtering serving table.
    *
    * Plan: bidirect the edge set, rank within each src partition
    * (row_number over a per-node window — partition key = src, so no
    * single-task global sort), keep rank <= k. Output is bounded at
    * k rows per part regardless of degree.
    */
  def itemRecs(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame =
    itemRecsOn(copurchaseEdges(spark, sfDir), k)

  def itemRecsOn(edges: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"itemRecs needs k >= 1, got $k")
    // both union branches reference the edge build — materialize once
    val e = edges.localCheckpoint(false)
    val directed = e.select(col("part_a").as("part"), col("part_b").as("rec"), col("w"))
      .unionAll(e.select(col("part_b").as("part"), col("part_a").as("rec"), col("w")))
    val byStrength = Window.partitionBy(col("part"))
      .orderBy(col("w").desc, col("rec").asc)
    directed
      .withColumn("rnk", row_number().over(byStrength).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("part"), col("rec"), col("w"), col("rnk"))
  }
}
