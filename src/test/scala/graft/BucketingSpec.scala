package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._
  val sf = TestSpark.sf0001

  test("bucketed join + aggregation on the bucket key plans ZERO exchanges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-buckets").toString
    // force the merge-join path: a broadcast would hide the co-location
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(spark, sf, dir)
      val df = Bucketing.bucketedRevenuePerCustomer(spark)
      val rows = df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed-on-key join/agg must be exchange-free:\n$plan")
      // correctness: matches the plain (shuffled) spelling
      val want = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100).cast("long")
          .as("revenue_cents"), count(lit(1)).as("n_orders"))
        .as[(Long, String, Long, Long)].collect().toSet
      assert(rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet === want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    }
  }
}
