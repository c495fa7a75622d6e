package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Bucketed-table co-location: the storage-level answer to repeated
  * large-fact joins at 100 TB. Writing both sides bucketed (and
  * bucket-sorted) on the join key lets Spark plan the join with ZERO
  * shuffle — each task merge-joins bucket i of one table against bucket
  * i of the other — amortizing the exchange across every downstream
  * query that joins or aggregates on that key. BucketingSpec asserts
  * the exchange-free plan.
  *
  * At cluster scale, pick bucket counts so one bucket of the larger
  * table fits a task comfortably (buckets ≈ table_size / 128-256 MB)
  * and keep both sides' counts equal (or integer multiples, which
  * Spark can coalesce).
  */
object Bucketing {

  /** Write orders and customer bucketed+sorted by the join key as
    * external tables under `pathDir` (idempotent: overwrite).
    */
  def writeBucketed(spark: SparkSession, sfDir: String, pathDir: String,
                    buckets: Int = 8): Unit = {
    Tables.orders(spark, sfDir).write.mode("overwrite")
      .bucketBy(buckets, "o_custkey").sortBy("o_custkey")
      .option("path", s"$pathDir/orders_bucketed")
      .saveAsTable("orders_bucketed")
    Tables.customer(spark, sfDir).write.mode("overwrite")
      .bucketBy(buckets, "c_custkey").sortBy("c_custkey")
      .option("path", s"$pathDir/customer_bucketed")
      .saveAsTable("customer_bucketed")
  }

  /** Per-customer revenue over the bucketed tables: join AND aggregation
    * both run on the bucket key, so the whole plan needs no exchange —
    * the bucketing satisfies the join's clustering and the aggregation's
    * (c_custkey ⊆ grouping keys) distribution requirements.
    */
  def bucketedRevenuePerCustomer(spark: SparkSession): DataFrame =
    spark.table("orders_bucketed")
      .join(spark.table("customer_bucketed"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        (sum(col("o_totalprice").cast("decimal(18,2)")) * 100).cast("long")
          .as("revenue_cents"),
        count(lit(1)).as("n_orders"))

  import org.apache.spark.sql.Column

  /** Z-ORDER layout key: the Morton interleave of the low `bits` bits
    * of two integer columns — bit i of `a` lands at position 2i, bit i
    * of `b` at 2i+1. Sorting by this key clusters rows so that EVERY
    * prefix range is a small rectangle in (a, b) space: a file of
    * consecutive keys covers a narrow band of BOTH columns at once,
    * which is what makes parquet min/max stats prune files for
    * two-dimensional predicates — a single-column sort gives perfect
    * pruning on that column and none on the other.
    *
    * Spelled entirely in codegen'd builtins (shift/and/or fold — no
    * UDF); columns are masked to `bits`, so callers pick bits to cover
    * their value range (16 covers 65k distinct values; beyond that,
    * bucket or offset first).
    */
  def mortonKey(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"mortonKey needs 1 <= bits <= 31, got $bits")
    (0 until bits).map { i =>
      val abit = shiftleft(shiftrightunsigned(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
      val bbit = shiftleft(shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
      abit.bitwiseOR(bbit)
    }.reduce(_ bitwiseOR _)
  }

  /** Write the events table z-ordered on (user_id, day): both
    * dimensions are first NORMALIZED onto the same `gridBits` grid
    * ((v − min) · (2^g − 1) DIV range — without this the wider
    * dimension owns every high interleave bit and the narrow one gets
    * no clustering, the classic z-order implementation mistake), then
    * range-partitioned on the Morton key into `files` files and sorted
    * within each. The layout is the optimization — readers filter on
    * user ranges AND time ranges against the same copy, and both
    * predicates prune at file/row-group grain via parquet min/max
    * stats. BucketingSpec asserts the bounding-box property against a
    * single-column-sorted control layout. The min/max frame is a
    * broadcast 1-row crossJoin (write-side fixture cost, paid once).
    */
  def writeZOrderedEvents(spark: SparkSession, sfDir: String,
                          pathDir: String, files: Int = 8,
                          gridBits: Int = 8): Unit = {
    val grid = (1L << gridBits) - 1L
    val ev = Tables.events(spark, sfDir)
      .withColumn("day", datediff(to_date(col("ts")), lit("1970-01-01")))
    val stats = ev.agg(
      min(col("user_id")).as("u0"), max(col("user_id")).as("u1"),
      min(col("day")).as("d0"), max(col("day")).as("d1"))
    ev.crossJoin(broadcast(stats))
      .withColumn("un",
        expr(s"(user_id - u0) * $grid DIV greatest(u1 - u0, 1L)"))
      .withColumn("dn",
        expr(s"(day - d0) * $grid DIV greatest(d1 - d0, 1L)"))
      .withColumn("zkey", mortonKey(col("un"), col("dn"), gridBits))
      .repartitionByRange(files, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .drop("zkey", "day", "un", "dn", "u0", "u1", "d0", "d1")
      .write.mode("overwrite").parquet(pathDir)
  }
}
