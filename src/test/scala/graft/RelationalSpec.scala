package graft

import graft.operators.Relational
import org.apache.spark.sql.execution.SparkPlan

class RelationalSpec extends SparkSpec {
  import spark.implicits._
  val sf = TestSpark.sf0001

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("pricing summary: 6 groups, decimal-exact sums") {
    val rows = Relational.pricingSummary(spark, sf).collect()
    assert(rows.length > 0 && rows.length <= 8)
    // decimal columns are exact: re-running yields identical values
    val again = Relational.pricingSummary(spark, sf).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("revenue by nation: plan uses a broadcast join on the dimension") {
    val df = Relational.revenueByNation(spark, sf)
    assert(executedPlan(df).contains("BroadcastHashJoin"),
      "nation dim must be broadcast, not shuffled")
    assert(df.count() === 25)
  }

  test("revenue by region: both dimension hops are broadcast joins") {
    val plan = executedPlan(Relational.revenueByRegion(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"nation AND region must broadcast:\n$plan")
  }

  test("shipping priority (Q3): top-k shape, broadcast segment keys, ordered output") {
    val df = Relational.shippingPriority(spark, sf)
    val plan = executedPlan(df)
    assert(plan.contains("BroadcastHashJoin"),
      "segment customer keys must broadcast into the orders scan")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-k must plan as TakeOrderedAndProject, not a global sort")
    val rows = df.collect()
    assert(rows.length > 0 && rows.length <= 10)
    val revs = rows.map(_.getAs[Long]("revenue"))
    assert(revs.sameElements(revs.sorted.reverse), "revenue descending")
  }

  test("returned-item ranking (Q10): agg-before-dims, top-k, cents-exact balance") {
    val df = Relational.returnedItemRanking(spark, sf)
    val plan = executedPlan(df)
    assert(plan.contains("TakeOrderedAndProject"),
      "top-k must plan as TakeOrderedAndProject")
    val rows = df.collect()
    assert(rows.length > 0 && rows.length <= 20)
    val revs = rows.map(_.getAs[Long]("revenue"))
    assert(revs.sameElements(revs.sorted.reverse), "revenue descending")
    // every surfaced customer exists with its exact cents balance
    val cust = Tables.customer(spark, sf)
      .selectExpr("c_custkey",
        "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(cust(r.getAs[Long]("c_custkey")) === r.getAs[Long]("acctbal_cents"))
    }
  }

  test("pricing summary: shipdate filter is pushed to the parquet scan") {
    val plan = executedPlan(Relational.pricingSummary(spark, sf))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"expected pushed filter in:\n$plan")
  }

  test("window top-k per customer: rn bounded, deterministic tie-break") {
    val rows = Relational.topOrdersPerCustomer(spark, sf, 2).collect()
    assert(rows.forall(_.getLong(2) <= 2L))
    val perCust = rows.groupBy(_.getLong(0))
    assert(perCust.values.forall(_.length <= 2))
  }

  test("skew-safe two-phase top-k equals the single-window spelling") {
    val plain = Relational.topOrdersPerCustomer(spark, sf, 2)
      .as[(Long, Long, Long)].collect().toSet
    // salts > 1 so phase 1 genuinely splits keys across salt groups
    val salted = Relational.topOrdersPerCustomerSkewSafe(spark, sf, 2, salts = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(salted === plain)
  }

  test("skew-safe blockwise ntile equals the plain window spelling") {
    val plain = Relational.ntileRevenuePlain(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSet
    // bandWidth small enough that every priority spans MANY value bands,
    // so the offset/merge arithmetic is genuinely exercised
    val banded = Relational.ntileRevenueSkewSafe(spark, sf, bandWidth = 5000)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(banded === plain)
    // non-default k hits the uneven-bucket branch (cnt % k != 0 paths)
    val plain7 = Relational.ntileRevenuePlain(spark, sf, k = 7)
      .as[(String, Long, Long, Long)].collect().toSet
    val banded7 = Relational.ntileRevenueSkewSafe(spark, sf, k = 7, bandWidth = 5000)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(banded7 === plain7)
  }

  test("ntile buckets are count-balanced: sizes differ by at most one per priority") {
    val rows = Relational.ntileRevenueSkewSafe(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (pri, qs) =>
      assert(qs.length === 4, s"$pri must fill all 4 quartiles")
      val sizes = qs.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$pri sizes $sizes not balanced")
    }
  }

  test("order gaps: per-customer invariants hold") {
    val rows = Relational.orderGaps(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (cust, nOrders, nGaps, maxGap, sumGap) =>
      assert(nGaps === nOrders - 1, s"customer $cust: one gap per consecutive pair")
      assert(maxGap >= 0 && sumGap >= maxGap * math.min(nGaps, 1),
        s"customer $cust: gap aggregates inconsistent")
    }
    // totals line up with the orders table
    val totalOrders = Tables.orders(spark, sf).count()
    assert(rows.map(_._2).sum === totalOrders)
  }

  test("orders_ranked plans a global sort: range partitioning, no top-k") {
    val df = Relational.ordersRanked(spark, sf)
    val rows = df.collect() // AQE finalizes the plan
    val plan = executedPlan(df).toLowerCase
    assert(plan.contains("rangepartitioning"),
      s"global sort needs a range exchange:\n$plan")
    assert(plan.contains("sort "), s"expected a Sort node:\n$plan")
    assert(!plan.contains("takeorderedandproject"),
      "no limit — must not degrade to top-k")
    // output really is globally ordered: cents desc, orderkey asc
    val keys = rows.map(r => (-r.getLong(2), r.getLong(0)))
    assert(keys.sameElements(keys.sorted), "rows not in global sort order")
  }

  test("anti join semantics on synthetic data") {
    val cust = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("c_custkey", "c_name")
    val ords = Seq((10L, 1L), (11L, 1L), (12L, 3L)).toDF("o_orderkey", "o_custkey")
    val out = cust.join(ords, cust("c_custkey") === ords("o_custkey"), "left_anti")
      .select("c_custkey").as[Long].collect()
    assert(out.toSet === Set(2L))
  }

  test("customersWithoutOrders is non-vacuous on the fixture (r15 ask #8)") {
    import org.apache.spark.sql.functions.{col, lit}
    // Every fixture customer has SOME order, so the unfiltered anti-join
    // certified 0 == 0 — a passing-but-empty check. The dormant-since
    // cutoff makes the driver row a real certificate: rows > 0 and every
    // surfaced customer truly has no order on/after the cutoff.
    val out = Relational.customersWithoutOrders(spark, sf)
    val n = out.count()
    assert(n > 0, "cutoff spelling must be non-vacuous on the fixture")
    val recent = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey")).distinct()
    assert(out.join(recent, out("c_custkey") === recent("o_custkey")).count() === 0L,
      "anti-join must exclude every customer with a post-cutoff order")
    val totalCust = Tables.customer(spark, sf).count()
    val withRecent = recent.count()
    assert(n === totalCust - withRecent, "anti-join cardinality law")
  }

  test("rollup includes subtotal and grand-total rows") {
    val rows = Relational.lineitemRollup(spark, sf).collect()
    val nulls2 = rows.count(r => r.isNullAt(0) && r.isNullAt(1))
    val nulls1 = rows.count(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(nulls2 === 1, "exactly one grand-total row")
    assert(nulls1 >= 1, "per-returnflag subtotals present")
  }

  test("cube adds the per-linestatus grouping set rollup lacks") {
    val cube = Relational.lineitemCube(spark, sf).collect()
    val rollup = Relational.lineitemRollup(spark, sf).collect()
    // cube ⊇ rollup rows, plus (null, linestatus) subtotals
    val statusOnly = cube.count(r => r.isNullAt(0) && !r.isNullAt(1))
    assert(statusOnly >= 1, "per-linestatus subtotals present")
    assert(cube.length === rollup.length + statusOnly)
  }

  test("intersect returns distinct keys present in both sides") {
    val out = Relational.activePositiveCustomers(spark, sf)
    assert(out.count() === out.distinct().count())
  }

  test("approx distinct users within the configured relative error of exact") {
    val rows = Relational.eventTypeApproxUsers(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.10,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("events daily: nanos ts converts to sensible dates") {
    val rows = Relational.eventsDaily(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDate(1).toString.startsWith("2024")))
  }

  test("left outer order stats: complete over customers, zeros for the orderless") {
    import org.apache.spark.sql.functions._
    val out = Relational.customerOrderStats(spark, sf)
    assert(out.count() === graft.Tables.customer(spark, sf).count(),
      "left outer must keep every customer")
    // total orders reconcile exactly; orderless customers carry 0 not null
    assert(out.agg(sum("n_orders")).head.getLong(0) ===
      graft.Tables.orders(spark, sf).count())
    assert(out.filter(col("n_orders").isNull || col("total_cents").isNull).isEmpty)
  }

  test("full outer activity: keys equal the union of both sides, zero-filled") {
    import org.apache.spark.sql.functions._
    val out = Relational.customerActivityFull(spark, sf)
      .as[(Long, Long, Long)].collect()
    val oKeys = graft.Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().as[Long].collect().toSet
    val eKeys = graft.Tables.events(spark, sf)
      .select(col("user_id")).distinct().as[Long].collect().toSet
    assert(out.map(_._1).toSet === (oKeys ++ eKeys))
    // one-sided keys carry a zero on the absent side, never null/drop
    out.foreach { case (k, nO, nE) =>
      assert((nO > 0) === oKeys(k), s"key $k orders side")
      assert((nE > 0) === eKeys(k), s"key $k events side")
    }
    assert(out.exists(r => r._2 == 0L) || out.exists(r => r._3 == 0L),
      "fixture must exercise at least one one-sided key")
  }

  test("pivot matches the long-form daily counts cell for cell") {
    import org.apache.spark.sql.functions._
    val long = graft.Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).cast("string").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val wide = Relational.eventsDailyPivot(spark, sf).collect()
    assert(wide.nonEmpty)
    for (r <- wide; (t, i) <- Relational.EventTypes.zipWithIndex) {
      val want = long.getOrElse((r.getDate(0).toString, t), 0L)
      assert(r.getLong(i + 1) === want, s"day ${r.getDate(0)} type $t")
    }
    // every long-form cell is accounted for (no silent value drop)
    assert(wide.map(r => Relational.EventTypes.map(t => r.getLong(
      Relational.EventTypes.indexOf(t) + 1)).sum).sum === long.values.sum)
  }

  test("revenue concentration: banded cut == plain ranked reference, edges exact") {
    // k lands INSIDE a band: 10 customers, pct=20 -> k=2; bandWidth 100
    // puts {250, 240} in band -2 with 230 — the boundary window must
    // take exactly 2 of the 3
    val rev = Seq((1L, 250L), (2L, 240L), (3L, 230L), (4L, 130L), (5L, 120L),
      (6L, 110L), (7L, 40L), (8L, 30L), (9L, 20L), (10L, 10L))
      .toDF("o_custkey", "cents")
    val got = Relational.revenueConcentrationOn(rev, 20, 100L)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got === ((10L, 2L, 490L, 1180L, 490L * 1000000L / 1180L)))
    // ties on the k boundary: custkey asc decides, band-consistent
    val tied = Seq((5L, 100L), (3L, 100L), (4L, 100L), (9L, 1L))
      .toDF("o_custkey", "cents")
    val t = Relational.revenueConcentrationOn(tied, 50, 10L)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(t._2 === 2L && t._3 === 200L, s"ties must cut at custkey order: $t")
    // fixture: banded == the plain global-window reference
    import org.apache.spark.sql.functions.sum
    val fixtureRev = Tables.orders(spark, sf).groupBy($"o_custkey")
      .agg((sum($"o_totalprice".cast("decimal(18,2)")) * 100).cast("long").as("cents"))
    val banded = Relational.revenueConcentrationOn(fixtureRev, 1, 1000000L)
      .as[(Long, Long, Long, Long, Long)].head()
    val rows = fixtureRev.as[(Long, Long)].collect()
      .sortBy { case (ck, c) => (-c, ck) }
    val k = math.max(rows.length / 100, 1)
    val top = rows.take(k).map(_._2).sum
    val total = rows.map(_._2).sum
    assert(banded === ((rows.length.toLong, k.toLong, top, total,
      top * 1000000L / total)))
  }

  test("forecast revenue (Q6): every predicate reaches the parquet scan") {
    val df = Relational.forecastRevenue(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains("lineitem"))
      .getOrElse(fail("no lineitem scan in the plan"))
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(scanLine.substring(scanLine.indexOf("PushedFilters")).contains(c),
        s"predicate on $c not pushed to the scan")
    val schema = scanLine.substring(scanLine.indexOf("ReadSchema:"))
    assert(!schema.contains("l_orderkey") && !schema.contains("l_returnflag"),
      "scan must read only the filter/aggregate columns")
    assert(df.as[Long].head() > 0L, "window must select revenue on the fixture")
  }

  test("promo share (Q14): broadcast dim join, ppm within bounds, non-vacuous") {
    val df = Relational.promoRevenueShare(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "part side must broadcast")
    val (promo, total, ppm) = df.as[(Long, Long, Long)].head()
    assert(promo > 0L && promo < total, "both promo and non-promo revenue present")
    assert(ppm === promo * 1000000L / total)
  }
}
