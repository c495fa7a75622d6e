package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational operator suite over the TPC-H-ish star schema
  * (/root/repo/FIXTURES.md §2): typed scans, aggregation, broadcast joins,
  * window functions, semi/anti joins, rollup, set ops.
  *
  * The reference has NO relational operators (SURVEY.md §2.2) — this is the
  * capability-class generalization required by the north star
  * (/root/repo/BASELINE.json).
  *
  * Scale notes (100 TB design):
  *   - Fact tables (lineitem/orders) are never broadcast; dimension tables
  *     (nation/region/customer at TPC-H ratios) are tiny relative to facts
  *     and get explicit `broadcast()` hints, turning the join into a
  *     map-side BroadcastHashJoin with zero shuffle of the fact side.
  *   - Aggregates are declared via groupBy().agg() so Catalyst plans
  *     partial (map-side) aggregation before the single hash exchange.
  *   - Money math is done in DECIMAL(18,2): exact, associative, and
  *     reproducible regardless of partitioning/merge order — double sums
  *     would make results partitioning-dependent, which breaks both the
  *     oracle compare and cross-run determinism at scale. Result columns
  *     surface as integer minor units (cents, BIGINT) rather than DECIMAL:
  *     engines serialize decimals with differing precision/scale metadata
  *     (the round-1 driver hash diverged on representation while every
  *     value matched), and integer types are bit-identical everywhere.
  */
object Relational {

  /** Cast a money/quantity double column to exact decimal for aggregation. */
  private def dec(c: String) = col(c).cast("decimal(18,2)")

  /** Exact decimal sum surfaced as integer minor units (BIGINT).
    * `scale` is the power of ten: 100 for cents on DECIMAL(18,2) sums.
    */
  private def sumAsMinorUnits(c: org.apache.spark.sql.Column, scale: Int) =
    (sum(c) * scale).cast("long")

  /** TPC-H Q1-style pricing summary: scan-heavy single-pass aggregate.
    * Filter is pushed to the parquet scan; one shuffle on the 6-ish
    * distinct (returnflag, linestatus) keys after partial aggregation.
    */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumAsMinorUnits(dec("l_quantity"), 100).as("sum_qty"),
        sumAsMinorUnits(dec("l_extendedprice"), 100).as("sum_base_price"),
        sumAsMinorUnits((dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
          .cast("decimal(18,4)"), 10000).as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  /** Revenue per nation: fact ⋈ dim ⋈ dim with explicit broadcast of the
    * dimension side. Plan: one scan of orders/customer, BroadcastHashJoin
    * against nation (25 rows at any scale), then agg.
    */
  def revenueByNation(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val nation = Tables.nation(spark, sfDir)
    val orders = Tables.orders(spark, sfDir)
    orders
      .join(cust, orders("o_custkey") === cust("c_custkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sumAsMinorUnits(dec("o_totalprice"), 100).as("revenue"),
        count(lit(1)).as("n_orders"))
  }

  /** TPC-H Q3-style shipping priority: the top-k still-unshipped orders
    * of one market segment by discounted revenue — orders placed before
    * the cutoff whose lineitems ship after it. The segment filter
    * collapses customer to a ~1/5-sized key list broadcast into the
    * orders scan (semi-join shape — only `c_custkey` travels); the one
    * real shuffle is lineitem ⋈ orders on the order key followed by the
    * (orderkey, orderdate)-keyed aggregate, and the top-k is a
    * TakeOrderedAndProject — each partition keeps k rows, no global
    * sort. Ties break deterministically on the order key.
    */
  def shippingPriority(spark: SparkSession, sfDir: String,
                       segment: String = "BUILDING",
                       cutoff: String = "1998-01-01",
                       k: Int = 10): DataFrame = {
    val segCust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === segment)
      .select(col("c_custkey"))
    val openOrders = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
      .join(broadcast(segCust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"))
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
      .join(openOrders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sumAsMinorUnits(
        (dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
          .cast("decimal(18,4)"), 10000).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(k)
  }

  /** TPC-H Q10-style returned-item ranking: the top-k customers by
    * revenue lost to returns in a date window. Deliberately NOT the
    * textbook group-by-every-customer-attribute spelling: the revenue
    * aggregate runs first on the bare customer KEY (fact-sized shuffle
    * carries one long), and the ≤|customers|-sized result then picks up
    * name/balance/nation through one dim join + one 25-row broadcast —
    * at scale the wide customer attributes never ride the fact shuffle.
    * Equal to the textbook grouping since c_custkey is the key. Balance
    * surfaces as integer cents (the house money rule); ties break on
    * the customer key.
    */
  def returnedItemRanking(spark: SparkSession, sfDir: String,
                          from: String = "1997-01-01",
                          to: String = "1997-07-01",
                          k: Int = 20): DataFrame = {
    val winOrders = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(to).cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val lostRev = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .join(winOrders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sumAsMinorUnits(
        (dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
          .cast("decimal(18,4)"), 10000).as("revenue"))
    val cust = Tables.customer(spark, sfDir)
    val nation = Tables.nation(spark, sfDir)
    lostRev
      .join(cust, col("o_custkey") === cust("c_custkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        (dec("c_acctbal") * 100).cast("long").as("acctbal_cents"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(k)
  }

  /** Top-2 orders per customer by total price: window function
    * (row_number over partitionBy(custkey)). Deterministic tie-break by
    * orderkey. Scales as one shuffle on custkey; no global sort.
    */
  def topOrdersPerCustomer(spark: SparkSession, sfDir: String, k: Int = 2): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      // BIGINT rn to match DuckDB's ROW_NUMBER() output type
      .select(col("o_custkey"), col("o_orderkey"), col("rn").cast("long").as("rn"))
  }

  /** Skew-safe two-phase per-key top-k — identical output to
    * [[topOrdersPerCustomer]] (proven in RelationalSpec). Phase 1 ranks
    * within (custkey, salt) and keeps each salt's top k, so a hot key's
    * rows sort across `salts` tasks instead of one; phase 2 re-ranks the
    * <= k·salts survivors per key — every true global top-k row is in
    * its salt's top k, and every row globally above it also survives, so
    * the re-rank reproduces exact global ranks. The salt is a hash of
    * the row's own key column (deterministic, no RNG).
    */
  def topOrdersPerCustomerSkewSafe(spark: SparkSession, sfDir: String,
                                   k: Int = 2, salts: Int = 8): DataFrame = {
    val w1 = Window.partitionBy(col("o_custkey"), col("salt"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val w2 = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, sfDir)
      .withColumn("salt", pmod(hash(col("o_orderkey")), lit(salts)))
      .withColumn("rn1", row_number().over(w1))
      .filter(col("rn1") <= k)
      .withColumn("rn", row_number().over(w2))
      .filter(col("rn") <= k)
      .select(col("o_custkey"), col("o_orderkey"), col("rn").cast("long").as("rn"))
  }

  /** Customers with no orders SINCE a cutoff — left ANTI join
    * (NOT EXISTS) with the date predicate pushed into the right-side
    * scan. At scale this is a shuffled hash anti-join on custkey;
    * Spark plans broadcast automatically when the (filtered) right
    * side is small enough. The cutoff keeps the query NON-VACUOUS on
    * the driver fixture (every customer has at least one order overall,
    * so the unfiltered spelling certifies 0 == 0 — a weak check;
    * "dormant since 2000" yields 14/135/1355 rows at sf0.001/0.01/0.1).
    */
  def customersWithoutOrders(spark: SparkSession, sfDir: String,
                             since: String = "2000-01-01"): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val orders = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit(since).cast("timestamp"))
      .select(col("o_custkey"))
    cust.join(orders, cust("c_custkey") === orders("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  /** Customers with at least one big order — left SEMI join (EXISTS).
    * The orders side is filtered BEFORE the join so the pushed-down
    * predicate shrinks the build side.
    */
  def customersWithBigOrders(spark: SparkSession, sfDir: String,
                             minTotal: Double = 400.0): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val big = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > minTotal).select(col("o_custkey"))
    cust.join(big, cust("c_custkey") === big("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
  }

  /** Rollup over (returnflag, linestatus): grouping-sets aggregation.
    * One pass, Expand + single exchange.
    */
  def lineitemRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumAsMinorUnits(dec("l_quantity"), 100).as("sum_qty"),
        count(lit(1)).as("n"))

  /** Cube over (returnflag, linestatus): all 2^2 grouping sets in one
    * pass — same Expand + single-exchange shape as [[lineitemRollup]]
    * with 4 instead of 3 grouping sets.
    */
  def lineitemCube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumAsMinorUnits(dec("l_quantity"), 100).as("sum_qty"),
        count(lit(1)).as("n"))

  /** Set operation: custkeys that placed an order INTERSECT custkeys with
    * positive balance. Planned as a distinct + hash semi-join.
    */
  def activePositiveCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val ordered = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("custkey"))
    val positive = Tables.customer(spark, sfDir)
      .filter(col("c_acctbal") > 0).select(col("c_custkey").as("custkey"))
    ordered.intersect(positive)
  }

  /** Events daily summary: timestamp → date bucketing + two-key agg.
    * (The `events` table is streaming-shaped; this is its batch view —
    * the streaming counterpart is
    * [[graft.streaming.StreamingOps.windowedEventCounts]], and
    * StreamingSpec asserts the two agree per day in batch mode.)
    */
  def eventsDaily(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        sumAsMinorUnits(dec("value"), 100).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))

  /** LEFT OUTER join: every customer with their order statistics,
    * customers with no orders surviving at zero (coalesced — the output
    * contract is total, not partial). Aggregate-THEN-join: the orders
    * side collapses to one row per customer before the join, so the
    * outer join matches at most one row and never fans out; both sides
    * shuffle on the key (sort-merge at scale, no broadcast — both grow
    * with the data).
    */
  def customerOrderStats(spark: SparkSession, sfDir: String): DataFrame = {
    val perCust = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sumAsMinorUnits(dec("o_totalprice"), 100).as("total_cents"))
    Tables.customer(spark, sfDir)
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("total_cents"), lit(0L)).as("total_cents"))
  }

  /** FULL OUTER join: order activity ∪ event activity per key — entities
    * present on EITHER side survive, absent sides coalesce to zero. The
    * reconciliation shape (comparing two systems' views of the same key
    * space); same aggregate-then-join discipline as
    * [[customerOrderStats]].
    */
  def customerActivityFull(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey").as("key"))
      .agg(count(lit(1)).as("n_orders"))
    val e = Tables.events(spark, sfDir)
      .groupBy(col("user_id").as("key"))
      .agg(count(lit(1)).as("n_events"))
    o.join(e, Seq("key"), "full")
      .select(col("key"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  /** Known event-type vocabulary for the pivot — enumerated explicitly
    * so the plan is ONE aggregation pass (see [[eventsDailyPivot]]).
    */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** Daily event counts PIVOTED to one column per event type — the
    * wide/report reshaping surface (`RelationalGroupedDataset.pivot`).
    * The pivot values are enumerated explicitly: without the list Spark
    * first runs a DISTINCT over the pivot column to discover values — an
    * extra full pass at 100 TB, and a nondeterministic schema besides
    * (columns appearing/disappearing with the data); a pivot over an
    * unbounded-cardinality column is the wrong operator at any scale.
    * Absent cells are filled to 0 to match SQL's COUNT(CASE ...)
    * spelling. One shuffle on day; the pivot itself is map-side width.
    */
  def eventsDailyPivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("day"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)

  /** JSON extraction over the events.props column: get_json_object →
    * pushdown-friendly scan + scalar projection, aggregated per key value.
    */
  def eventsPropsAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"))

  /** Revenue per region: two dimension hops (customer → nation → region),
    * both tiny at any TPC-H scale and explicitly broadcast — the fact
    * side never shuffles for the joins, only for the final 5-key agg.
    */
  def revenueByRegion(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val nation = Tables.nation(spark, sfDir)
    val region = Tables.region(spark, sfDir)
    Tables.orders(spark, sfDir)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        sumAsMinorUnits(dec("o_totalprice"), 100).as("revenue"),
        count(lit(1)).as("n_orders"))
  }

  /** Revenue by part type: fact ⋈ part dimension. `part` grows with SF
    * (unlike nation/region), so no forced broadcast — Spark/AQE picks
    * broadcast under the threshold and a shuffled hash join above it.
    */
  def partTypeRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"))
      .agg(
        sumAsMinorUnits(dec("l_extendedprice"), 100).as("revenue"),
        count(lit(1)).as("n_items"))

  /** Shipped quantity per supplier nation: lineitem ⋈ supplier ⋈ nation.
    * Covers the supplier dimension; same broadcast-dim shape as
    * [[revenueByNation]].
    */
  def supplierNationVolume(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sumAsMinorUnits(dec("l_quantity"), 100).as("sum_qty"),
        count(lit(1)).as("n_items"))

  /** Approximate distinct users per event type via HyperLogLog++
    * (`approx_count_distinct`, rsd 2%) next to the exact count. At 100 TB
    * the exact distinct is the expensive path (exchange carries every
    * distinct (type, user) pair); the sketch is fixed-size per group and
    * merges associatively. Sketch values are engine-specific, so this
    * query is verified by RelationalSpec's error-bound test rather than
    * the DuckDB oracle.
    */
  def eventTypeApproxUsers(spark: SparkSession, sfDir: String,
                           rsd: Double = 0.02): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))

  /** Set op UNION (distinct): customers with a big order ∪ customers in
    * debt. Planned as union + hash-distinct — one exchange on the key.
    * Default threshold sits in the upper quintile of o_totalprice so both
    * sides contribute and overlap non-trivially.
    */
  def bigOrderOrDebtCustomers(spark: SparkSession, sfDir: String,
                              minTotal: Double = 400000.0): DataFrame = {
    val big = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > minTotal)
      .select(col("o_custkey").as("custkey"))
    val debt = Tables.customer(spark, sfDir)
      .filter(col("c_acctbal") < 0)
      .select(col("c_custkey").as("custkey"))
    big.union(debt).distinct()
  }

  /** Globally ordered orders projection — the standalone total-order
    * operator (SURVEY §2.2 sorts row): a full Sort with a
    * RangePartitioning exchange, NOT a top-k (no limit, so Spark cannot
    * plan TakeOrderedAndProject). At scale this is the one operator that
    * genuinely needs range partitioning: Spark samples the sort keys to
    * build balanced range bounds, so output files come out globally
    * sorted and evenly sized. Sort key is the exact integer cents value
    * (monotone in o_totalprice) with orderkey tie-break — total order,
    * deterministic on any engine. RelationalSpec asserts the
    * rangepartitioning exchange is in the plan.
    */
  def ordersRanked(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        (dec("o_totalprice") * 100).cast("long").as("o_totalprice_cents"))
      .orderBy(col("o_totalprice_cents").desc, col("o_orderkey").asc)

  /** Set op EXCEPT (distinct): customers who ordered but never above the
    * threshold. Planned as a hash anti-join after distinct.
    */
  def onlySmallOrderCustomers(spark: SparkSession, sfDir: String,
                              minTotal: Double = 400000.0): DataFrame = {
    val all = Tables.orders(spark, sfDir).select(col("o_custkey").as("custkey"))
    val big = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > minTotal)
      .select(col("o_custkey").as("custkey"))
    all.except(big)
  }

  /** Per-customer inter-order gap statistics via LAG: days between
    * consecutive orders (ordered by date, orderkey tie-break), aggregated
    * to one row per customer. Covers the offset window functions
    * (lag/lead are mirrors). Gap values depend only on the ordered DATE
    * sequence, so equal-date ties cannot perturb the result — exact on
    * any engine.
    *
    * Scale: the window partitions on o_custkey (TPC-H ~10 orders per
    * customer — per-key work is naturally bounded; a pathological hot
    * customer would take the [[graft.operators.AsOf.sessionizeSalted]]
    * banding treatment), and the same exchange feeds the groupBy, so the
    * whole query is one shuffle.
    */
  def orderGaps(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      .withColumn("gap_days",
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)).cast("long"))
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        count(col("gap_days")).as("n_gaps"),
        coalesce(max(col("gap_days")), lit(0L)).as("max_gap_days"),
        coalesce(sum(col("gap_days")), lit(0L)).cast("long").as("sum_gap_days"))
  }

  /** Reference spelling of quartile revenue: ntile(4) within each order
    * priority over (price, orderkey) — a total order, so bucket
    * assignment is deterministic. KEPT AS THE EQUIVALENCE BASELINE for
    * [[ntileRevenueSkewSafe]] (RelationalSpec asserts the two agree);
    * o_orderpriority has ~5 distinct values, so this window serializes
    * each priority through one task — fine at test SF, wrong at 100 TB.
    */
  def ntileRevenuePlain(spark: SparkSession, sfDir: String, k: Int = 4): DataFrame =
    ntileRevenuePlainOn(Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey")), k)

  /** [[ntileRevenuePlain]] over any (o_orderpriority, o_totalprice,
    * o_orderkey) frame — lets ScaleSmoke plant a hot priority.
    */
  def ntileRevenuePlainOn(rows: DataFrame, k: Int = 4): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    rows
      .withColumn("quartile", ntile(k).over(w).cast("long"))
      .groupBy(col("o_orderpriority"), col("quartile"))
      .agg(count(lit(1)).as("n_orders"),
        sumAsMinorUnits(dec("o_totalprice"), 100).as("revenue"))
  }

  /** Skew-safe EXACT ntile: quartile revenue per order priority without
    * ever sorting a whole priority in one task. Same blockwise
    * prefix-sum idea as [[TextAnalysis.tokenShards]]:
    *
    *   1. band rows by VALUE (floor(price / bandWidth)) — bands are
    *      monotone in the sort key, so (band, within-band rank) IS the
    *      global (price, orderkey) order;
    *   2. rank within each (priority, band) — the only per-row window,
    *      task-bounded by band occupancy, never by priority size;
    *   3. per-band counts (one agg row per band) get cumulative offsets
    *      and priority totals via a window over that TINY aggregated
    *      frame, broadcast back;
    *   4. global position = band offset + local rank, and the standard
    *      ntile split (first cnt % k buckets take one extra row) is pure
    *      integer arithmetic on (position, cnt).
    *
    * Proven row-identical to [[ntileRevenuePlain]] in RelationalSpec
    * (including a non-default k). The driver query runs THIS spelling.
    */
  def ntileRevenueSkewSafe(spark: SparkSession, sfDir: String, k: Int = 4,
                           bandWidth: Int = 20000): DataFrame =
    ntileRevenueSkewSafeOn(Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey")),
      k, bandWidth)

  /** [[ntileRevenueSkewSafe]] over any (o_orderpriority, o_totalprice,
    * o_orderkey) frame — the entry ScaleSmoke drives with a planted hot
    * priority so the per-band task bound is demonstrated on the SHIPPED
    * path.
    */
  def ntileRevenueSkewSafeOn(input: DataFrame, k: Int = 4,
                             bandWidth: Int = 20000): DataFrame = {
    val rows = input
      .select(col("o_orderpriority").as("pri"), col("o_totalprice"),
        col("o_orderkey"))
      .withColumn("band", floor(col("o_totalprice") / bandWidth).cast("long"))
    val wLocal = Window.partitionBy(col("pri"), col("band"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val local = rows.withColumn("rn_local", row_number().over(wLocal).cast("long"))
    val bandCounts = rows.groupBy(col("pri"), col("band"))
      .agg(count(lit(1)).as("bc"))
    val wOff = Window.partitionBy(col("pri")).orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bandCounts
      .withColumn("off", coalesce(sum(col("bc")).over(wOff), lit(0L)))
      .withColumn("cnt", sum(col("bc")).over(Window.partitionBy(col("pri"))))
      .select(col("pri"), col("band"), col("off"), col("cnt"))
    local
      .join(broadcast(offsets), Seq("pri", "band"))
      .withColumn("rn", col("off") + col("rn_local"))
      // ntile(k) split: r = cnt % k leading buckets hold s + 1 rows, the
      // rest hold s = cnt DIV k; s = 0 (cnt < k) only ever takes the
      // first branch, so the DIV by s is never reached
      .withColumn("quartile", expr(
        s"""CASE WHEN rn <= (cnt % $k) * (cnt DIV $k + 1)
           |     THEN (rn - 1) DIV (cnt DIV $k + 1) + 1
           |     ELSE (cnt % $k) + (rn - (cnt % $k) * (cnt DIV $k + 1) - 1) DIV (cnt DIV $k) + 1
           |END""".stripMargin))
      .groupBy(col("pri").as("o_orderpriority"), col("quartile"))
      .agg(count(lit(1)).as("n_orders"),
        sumAsMinorUnits(dec("o_totalprice"), 100).as("revenue"))
  }

  /** TPC-H Q6 analogue — the forecast-revenue-change quantifier: one
    * tight filter + one global aggregate, no join, no group. The point
    * at 100 TB is the SCAN: all three predicates and the two-column
    * projection must reach the parquet reader (PushedFilters +
    * ReadSchema — RelationalSpec asserts both), so the query reads a
    * fraction of two columns and nothing else. Revenue
    * Σ extendedprice·discount surfaces as integer 10^-4 units (the
    * q_ship_priority convention).
    */
  def forecastRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.02 && col("l_discount") <= 0.04 &&
        col("l_quantity") < 24.0)
      .agg(sumAsMinorUnits(
        (dec("l_extendedprice") * dec("l_discount")).cast("decimal(18,4)"),
        10000).as("revenue"))

  /** TPC-H Q14 analogue — promo revenue share: the share of one
    * month's revenue earned by ECONOMY-type parts, as integer ppm.
    * Conditional aggregation over a fact⋈dim join: part collapses to
    * (partkey, is-promo bit) BEFORE the join and broadcasts; both
    * sums fold into ONE aggregate over the joined frame. Per-row cents
    * first (BIGINT), so the ppm division is engine-exact.
    */
  def promoRevenueShare(spark: SparkSession, sfDir: String): DataFrame = {
    val part = Tables.part(spark, sfDir)
      .select(col("p_partkey"),
        (col("p_type") === "ECONOMY").cast("long").as("promo"))
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .select(col("l_partkey"),
        (dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") -
          dec("l_discount"))).cast("decimal(18,4)").as("rev"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(
        sumAsMinorUnits(when(col("promo") === 1L, col("rev"))
          .otherwise(lit(0).cast("decimal(18,4)")), 10000).as("promo_rev"),
        sumAsMinorUnits(col("rev"), 10000).as("total_rev"))
      .select(col("promo_rev"), col("total_rev"),
        expr("promo_rev * 1000000 DIV total_rev").as("promo_ppm"))
  }

  /** REVENUE CONCENTRATION — what share of total revenue the top
    * `pct`% of customers hold (the Pareto panel number), EXACTLY and
    * without a global sort: per-customer revenue bands by value
    * (band ascending == cents descending, ties always co-banded so the
    * (cents desc, custkey asc) global rank is band-consistent), band
    * counts prefix-sum over the bounded band frame to locate the k-th
    * customer, whole bands above the cut contribute their stored sums,
    * and ONLY the one boundary band pays a within-band window
    * (≤ bandWidth-of-value customers, never the population). k =
    * max(n·pct DIV 100, 1); output one row with exact integer ppm.
    */
  def revenueConcentration(spark: SparkSession, sfDir: String,
                           pct: Int = 1,
                           bandWidth: Long = 1000000L): DataFrame =
    revenueConcentrationOn(
      Tables.orders(spark, sfDir)
        .groupBy(col("o_custkey"))
        .agg(sumAsMinorUnits(dec("o_totalprice"), 100).as("cents")),
      pct, bandWidth)

  /** [[revenueConcentration]] over any (o_custkey, cents) frame. */
  def revenueConcentrationOn(rev: DataFrame, pct: Int,
                             bandWidth: Long): DataFrame = {
    require(pct >= 1 && pct <= 100, s"pct must be in [1,100], got $pct")
    val stats = rev.agg(count(lit(1)).as("nc"), sum(col("cents")).as("total_cents"))
      .withColumn("k", greatest(expr(s"nc * $pct DIV 100"), lit(1L)))
    val banded = rev.withColumn("band", -expr(s"cents DIV $bandWidth"))
    val bandAgg = banded.groupBy(col("band"))
      .agg(count(lit(1)).as("bc"), sum(col("cents")).as("bs"))
    val wOff = Window.orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withCum = bandAgg
      .withColumn("cum0", coalesce(sum(col("bc")).over(wOff), lit(0L)))
      .crossJoin(broadcast(stats.select(col("k"))))
    val fullSum = withCum.filter(col("cum0") + col("bc") <= col("k"))
      .agg(coalesce(sum(col("bs")), lit(0L)).as("full_cents"))
    val boundary = withCum
      .filter(col("cum0") < col("k") && col("cum0") + col("bc") > col("k"))
      .select(col("band"), (col("k") - col("cum0")).as("take"))
    val wIn = Window.partitionBy(col("band"))
      .orderBy(col("cents").desc, col("o_custkey").asc)
    val boundarySum = banded.join(broadcast(boundary), Seq("band"))
      .withColumn("rn", row_number().over(wIn).cast("long"))
      .filter(col("rn") <= col("take"))
      .agg(coalesce(sum(col("cents")), lit(0L)).as("edge_cents"))
    stats.crossJoin(broadcast(fullSum)).crossJoin(broadcast(boundarySum))
      .select(col("nc").as("n_customers"), col("k"),
        (col("full_cents") + col("edge_cents")).as("top_cents"),
        col("total_cents"),
        expr("(full_cents + edge_cents) * 1000000 DIV total_cents")
          .as("share_ppm"))
  }

  /** BLOOM-PRUNED SEMI JOIN — the shuffle-reduction pattern for a
    * selective fact⋈fact semi join: build one m-bit Bloom filter over
    * the small side's keys ([[graft.functions.BloomFilter]] — O(m/8)
    * mergeable state, map-side combined, broadcast as ONE row), prune
    * the big side with the codegen'd `bloom_contains` probe BEFORE its
    * shuffle, then run the exact semi join over the survivors. No
    * false negatives means the output EQUALS the plain semi join (the
    * oracle); false positives only cost verify-join input, at the
    * textbook (1−e^(−kn/m))^k rate. This is the user-space spelling of
    * engine runtime filters, available where AQE declines to inject
    * one — and at 100 TB the pruned shuffle is the win: only rows that
    * (probably) match ever leave their scan partition.
    */
  def bloomSemiJoinOn(big: DataFrame, bigKey: String,
                      small: DataFrame, smallKey: String,
                      mBits: Int = 1 << 17): DataFrame = {
    import graft.functions.{BloomFilter, BloomContains}
    // collision-resistant internal name: a caller's big frame may
    // legitimately carry a `bf` column, and the crossJoin would then
    // produce an ambiguous reference (r12 ADVICE)
    val bloom = small.agg(
      BloomFilter.bloomAgg(xxhash64(col(smallKey)), mBits, BloomContains.K)
        .as("__graft_bf"))
    big.crossJoin(broadcast(bloom))
      .filter(BloomFilter.bloomContains(col("__graft_bf"), xxhash64(col(bigKey))))
      .drop("__graft_bf")
      .join(small.select(col(smallKey).as(bigKey)).distinct(),
        Seq(bigKey), "left_semi")
  }

  /** Driver spelling: lineitem rows whose order is URGENT-priority
    * (a ~20% key set), rolled up per return flag — the oracle is the
    * plain semi join, so a hash-green row certifies the bloom prune
    * dropped nothing it shouldn't.
    */
  def urgentLineitemsBloom(spark: SparkSession, sfDir: String): DataFrame = {
    val urgent = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    bloomSemiJoinOn(
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity")),
      "l_orderkey", urgent, "o_orderkey")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sumAsMinorUnits(dec("l_quantity"), 100).as("sum_qty"))
  }
}
