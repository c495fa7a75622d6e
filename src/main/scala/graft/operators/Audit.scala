package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DATA-QUALITY CONSTRAINT AUDIT — the landing-zone gate of a
  * production ingest (the Deequ/expectations pattern): evaluate a set
  * of named constraints over a table and emit one (check, n_violations)
  * row per constraint, zeros included — "this check ran and found
  * nothing" is an asserted fact, not an absence.
  *
  * Three constraint shapes, each in its cheapest plan:
  * - ROW checks (range / null / format): ONE scan-fused aggregate of
  *   `sum(violation_bit)` columns — any number of row checks cost one
  *   pass with map-side combine, never one job per check.
  * - PK check (duplicate keys): one count-per-key aggregate, count the
  *   keys seen more than once.
  * - FK check (orphans): LEFT ANTI join against the DISTINCT parent
  *   key set — at 100 TB the parent side collapses to its key column
  *   before the join, and broadcast applies when the parent is a dim.
  * The per-shape frames union into the report — a constant-sized frame
  * regardless of table size.
  */
object Audit {

  /** One row per row-check: scan-fused violation-bit sums. Check NAMES
    * are pure data: the per-check sums ride internal positional
    * columns and the unpivot is built with Column APIs (explode over an
    * inline struct array), so a name containing quotes, spaces, or SQL
    * never reaches a parser — the former stack() SQL interpolation made
    * names act as identifiers and injectable text (r12 ADVICE).
    */
  def rowChecksOn(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "rowChecksOn needs at least one check")
    val sums = df.agg(
      sum(when(checks.head._2, 1L).otherwise(0L)).as("__graft_c0"),
      checks.tail.zipWithIndex.map { case ((_, c), i) =>
        sum(when(c, 1L).otherwise(0L)).as(s"__graft_c${i + 1}") }: _*)
    // unpivot: k sums on the 1-row aggregate -> k (check, n) rows
    sums.select(explode(array(checks.zipWithIndex.map { case ((n, _), i) =>
        struct(lit(n).as("check_name"),
          coalesce(col(s"__graft_c$i"), lit(0L)).as("n_violations")) }: _*))
        .as("kv"))
      .select(col("kv.check_name"), col("kv.n_violations"))
  }

  /** Keys appearing more than once, reported as one count. */
  def pkCheckOn(df: DataFrame, name: String, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1L)
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Child rows whose key has no parent (FK orphans). */
  def fkCheckOn(child: DataFrame, childKey: String,
                parent: DataFrame, parentKey: String,
                name: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Driver spelling: audit a deterministically DIRTIED orders landing
    * zone (orders is the fixture table with a REAL primary key —
    * o_orderkey is unique and o_custkey referentially clean, so the
    * planted violations are the only ones and an all-zero audit would
    * certify nothing). Planted on both engines identically:
    * `o_orderkey % 1000 = 7` rows carry a negated total price (range
    * violation), `% 1000 = 13` rows point at customer key + 10^9 (FK
    * orphan), and the `% 1000 = 21` slice is appended AGAIN (PK
    * duplicate). Null check stays zero — the ran-and-clean row.
    */
  def ordersAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val dirty = o
      .select(
        col("o_orderkey"),
        when(col("o_orderkey") % 1000 === 13,
          col("o_custkey") + 1000000000L)
          .otherwise(col("o_custkey")).as("o_custkey"),
        when(col("o_orderkey") % 1000 === 7, -col("o_totalprice"))
          .otherwise(col("o_totalprice")).as("o_totalprice"))
      .unionAll(o.filter(col("o_orderkey") % 1000 === 21))
    val customer = Tables.customer(spark, sfDir)
    rowChecksOn(dirty, Seq(
        "totalprice_positive" -> (col("o_totalprice") <= 0.0),
        "totalprice_not_null" -> col("o_totalprice").isNull))
      .unionByName(pkCheckOn(dirty, "pk_orderkey", Seq("o_orderkey")))
      .unionByName(fkCheckOn(dirty, "o_custkey",
        customer.select(col("c_custkey")), "c_custkey", "fk_customer_exists"))
  }
}
