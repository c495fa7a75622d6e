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
}
