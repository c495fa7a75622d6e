package graft

import org.apache.spark.sql.functions._

/** Join-key skew at scale: windowed operators get the salted two-phase
  * spellings (AsOf/Relational); shuffled JOINS rely on AQE's runtime
  * skew-join split. This spec proves that reliance is real: a hot key
  * that dwarfs every other partition gets split by
  * OptimizeSkewedJoin (visible as skew=true on the merge join) with
  * results identical to the unsplit join.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition (skew=true) with exact results") {
    // thresholds lowered so test-sized data qualifies as skewed; the
    // same mechanism fires at defaults (256 MB) on real partitions
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // forbid broadcast so the join stays a shuffled merge join
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // hot key 1 carries 100k rows; 999 cold keys carry ~100 each
      val left = spark.range(0, 200000)
        .select(when(col("id") < 100000, lit(1L))
          .otherwise(col("id") % 999 + 2).as("k"), col("id").as("v"))
      val right = spark.range(1, 1001).select(col("id").as("k"), (col("id") * 10).as("w"))
      val joined = left.join(right, "k")
      // collect() on THIS DataFrame so queryExecution holds the final
      // AQE-optimized plan (count() would execute a separate plan)
      val rows = joined.collect().length
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected merge join:\n${plan.take(2000)}")
      assert(plan.contains("skew=true"),
        s"AQE must mark the hot partition skewed:\n${plan.take(2000)}")
      // exact row count: hot key fans out 100k*1, cold side the rest
      val want = left.as[(Long, Long)].collect()
        .groupBy(_._1).map { case (k, xs) => if (k >= 1 && k <= 1000) xs.length else 0 }.sum
      assert(rows === want)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
