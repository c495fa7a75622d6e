package graft

import graft.operators.Audit
import org.apache.spark.sql.functions._

/** Constraint audit (q_dq_audit): the driver hash-checks the report
  * values; this suite pins the check semantics — planted violation
  * counts, zero-rows-kept, and the one-pass row-check shape.
  */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("row checks: one aggregate pass, zeros kept, nulls countable") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 5L), (2L, null), (3L, 500L), (4L, 5L))
      .toDF("id", "v")
    val got = Audit.rowChecksOn(df, Seq(
      "v_null" -> col("v").isNull,
      "v_big" -> (col("v") > 100L),
      "v_negative" -> (col("v") < 0L)))
      .as[(String, Long)].collect().toMap
    assert(got === Map("v_null" -> 1L, "v_big" -> 1L, "v_negative" -> 0L))
    // all row checks ride ONE aggregate — no per-check job
    val aggs = Audit.rowChecksOn(df, Seq(
      "a" -> col("v").isNull, "b" -> (col("v") > 0L)))
      .queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
    assert(aggs.size === 1, "row checks must fuse into a single aggregate")
  }

  test("check names are pure data: quotes, spaces, and SQL text never reach a parser") {
    // the r12 ADVICE red path: under the old stack() interpolation each
    // of these either failed to parse or injected into expr()
    val df = Seq((1L, 5L), (2L, 200L)).toDF("id", "v")
    val hostile = Seq(
      "has 'quotes' and spaces" -> (col("v") > 100L),
      "semi; colons), drop--" -> col("v").isNull,
      "check" -> (col("v") < 0L)) // a reserved word as a name
    val got = Audit.rowChecksOn(df, hostile)
      .as[(String, Long)].collect().toMap
    assert(got === Map(
      "has 'quotes' and spaces" -> 1L,
      "semi; colons), drop--" -> 0L,
      "check" -> 0L))
  }

  test("row checks on an empty frame report zero, not null") {
    val got = Audit.rowChecksOn(
      Seq.empty[(Long, Long)].toDF("id", "v"),
      Seq("v_null" -> col("v").isNull))
      .as[(String, Long)].collect().toMap
    assert(got === Map("v_null" -> 0L))
  }

  test("pk and fk checks count violating entities, not rows") {
    val child = Seq((1L, 1), (1L, 1), (1L, 1), (2L, 1), (9L, 1), (9L, 2))
      .toDF("k", "ln")
    // (1,1) appears 3x -> ONE violating key; (9,*) distinct -> clean
    val pk = Audit.pkCheckOn(child, "pk", Seq("k", "ln"))
      .as[(String, Long)].head()
    assert(pk === ("pk", 1L))
    // parent {1,2}: the two k=9 rows are orphans (row-grain by design —
    // each bad row needs quarantining)
    val fk = Audit.fkCheckOn(child, "k",
      Seq(1L, 2L).toDF("pk"), "pk", "fk")
      .as[(String, Long)].head()
    assert(fk === ("fk", 2L))
  }

  test("driver spelling: planted counts are exactly the carved slices") {
    // orders is PK/FK-clean on the fixture (asserted below), so every
    // violation the audit reports traces to a planted slice
    val sf = TestSpark.sf0001
    val o = Tables.orders(spark, sf)
    assert(o.select($"o_orderkey").distinct().count() === o.count(),
      "fixture o_orderkey must be unique for the planted-PK accounting")
    val range = o.filter($"o_orderkey" % 1000 === 7).count()
    val orphan = o.filter($"o_orderkey" % 1000 === 13).count()
    val dupKeys = o.filter($"o_orderkey" % 1000 === 21).count()
    val got = Audit.ordersAudit(spark, sf)
      .as[(String, Long)].collect().toMap
    assert(got === Map(
      "totalprice_positive" -> range,
      "totalprice_not_null" -> 0L,
      "pk_orderkey" -> dupKeys,
      "fk_customer_exists" -> orphan))
    assert(range > 0 && orphan > 0 && dupKeys > 0,
      "planted slices must be non-empty at sf0.001")
  }
}
