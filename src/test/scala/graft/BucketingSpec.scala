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

  test("morton key == driver-side bit interleave") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((a >>> i) & 1L) << (2 * i)) | (((b >>> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L),
      (12345L, 54321L), (65535L, 1L))
    val got = pairs.toDF("a", "b")
      .select(Bucketing.mortonKey(col("a"), col("b"), 16).as("z"))
      .as[Long].collect()
    assert(got.toSeq === pairs.map(p => ref(p._1, p._2, 16)))
    // masking: bits above the budget are ignored
    val masked = Seq((65536L + 3L, 5L)).toDF("a", "b")
      .select(Bucketing.mortonKey(col("a"), col("b"), 16).as("z"))
      .as[Long].head()
    assert(masked === ref(3L, 5L, 16))
  }

  test("z-order layout bounds BOTH dimensions per file; single-sort only one") {
    import org.apache.spark.sql.functions._
    import java.nio.file.Files
    val zdir = Files.createTempDirectory("graft-z").resolve("z").toString
    Bucketing.writeZOrderedEvents(spark, TestSpark.sf0001, zdir, files = 8)
    // control: same data, same file count, sorted on user_id only
    val cdir = Files.createTempDirectory("graft-z").resolve("u").toString
    Tables.events(spark, TestSpark.sf0001)
      .repartitionByRange(8, col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts"))
      .write.mode("overwrite").parquet(cdir)

    def fileRanges(dir: String): Seq[(Double, Double)] = {
      val fs = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      fs.toSeq.map { f =>
        val r = spark.read.parquet(f)
          .agg(min("user_id"), max("user_id"),
            min(to_date(col("ts"))), max(to_date(col("ts"))))
          .head()
        val uRange = (r.getLong(1) - r.getLong(0)).toDouble
        val dRange = (r.getDate(3).toLocalDate.toEpochDay -
          r.getDate(2).toLocalDate.toEpochDay).toDouble
        (uRange, dRange)
      }
    }
    val g = spark.read.parquet(zdir)
      .agg(max("user_id") - min("user_id"),
        datediff(max(to_date(col("ts"))), min(to_date(col("ts"))))).head()
    val (gu, gd) = (g.getLong(0).toDouble, g.getInt(1).toDouble)
    val z = fileRanges(zdir)
    val c = fileRanges(cdir)
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    val zU = mean(z.map(_._1)) / gu; val zD = mean(z.map(_._2)) / gd
    val cD = mean(c.map(_._2)) / gd
    // single-column sort leaves the day dimension unclustered...
    assert(cD > 0.85, s"control day spread should be ~global, got $cD")
    // ...while the z-layout bounds BOTH dimensions well below global
    assert(zU < 0.7, s"z-order user spread per file too wide: $zU")
    assert(zD < 0.7, s"z-order day spread per file too wide: $zD")
    // and the data survives the round-trip intact
    assert(spark.read.parquet(zdir).count() ===
      Tables.events(spark, TestSpark.sf0001).count())
  }
}
