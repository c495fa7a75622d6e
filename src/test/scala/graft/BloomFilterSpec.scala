package graft

import graft.functions.{BloomContains, BloomFilter}
import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Bloom filter build/probe + the pruned semi join: no false
  * negatives (the correctness contract), bounded false positives (the
  * efficiency contract), mergeability across partitions, and
  * output-equality of the pruned join with the plain one.
  */
class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  private def buildOver(keys: Seq[Long], mBits: Int, parts: Int): Array[Byte] =
    keys.toDF("k").repartition(parts)
      .agg(BloomFilter.bloomAgg(xxhash64($"k"), mBits, BloomContains.K).as("bf"))
      .as[Array[Byte]].head()

  test("no false negatives, any partitioning (merge = wordwise OR)") {
    val keys = (0L until 5000L).map(_ * 7919L)
    for (parts <- Seq(1, 8)) {
      val bf = buildOver(keys, 1 << 17, parts)
      val misses = keys.toDF("k")
        .filter(!BloomFilter.bloomContains(lit(bf), xxhash64($"k")))
        .count()
      assert(misses === 0L, s"parts=$parts: a bloom filter NEVER misses a member")
    }
  }

  test("false-positive rate near the textbook bound") {
    val n = 5000
    val m = 1 << 17 // k=5, n/m ~ 0.038 -> fpr ~ (1-e^(-5n/m))^5 ~ 0.02%
    val bf = buildOver((0L until n.toLong).map(_ * 7919L), m, 4)
    val probes = (1L to 100000L).map(i => i * 7919L + 13L) // disjoint keys
    val fp = probes.toDF("k")
      .filter(BloomFilter.bloomContains(lit(bf), xxhash64($"k")))
      .count()
    assert(fp < 200L, s"fpr ${fp / 1000.0}% far above the k=5 textbook bound")
  }

  test("empty build side probes nothing in") {
    val bf = buildOver(Seq.empty, 1 << 10, 2)
    val hits = (1L to 1000L).toDF("k")
      .filter(BloomFilter.bloomContains(lit(bf), xxhash64($"k"))).count()
    assert(hits === 0L)
  }

  test("bloom semi join == plain semi join; SQL registration works") {
    val big = (0L until 2000L).map(k => (k, s"p${k % 7}")).toDF("k", "payload")
    val small = (0L until 2000L by 13L).toDF("j")
    val pruned = Relational.bloomSemiJoinOn(big, "k", small, "j", 1 << 14)
      .as[(Long, String)].collect().toSet
    val plain = big.join(small.select($"j".as("k")), Seq("k"), "left_semi")
      .as[(Long, String)].collect().toSet
    assert(pruned === plain)
    // SQL surface: build in one subquery, probe in the outer select
    val viaSql = spark.sql(
      """SELECT count(*) FROM (SELECT id FROM range(100)) r,
        |  (SELECT bloom_agg(xxhash64(id), 1024, 5) AS bf
        |   FROM range(0, 100, 2)) b
        |WHERE bloom_contains(bf, xxhash64(r.id), 5)""".stripMargin)
      .as[Long].head()
    assert(viaSql >= 50L && viaSql < 75L,
      s"all 50 evens admitted, few of the 50 odds ($viaSql)")
  }

  test("driver spelling: plan prunes before the semi join, arity guard") {
    val df = Relational.urgentLineitemsBloom(spark, TestSpark.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_contains"),
      "the probe must appear as a pre-join filter in the physical plan")
    val e = intercept[IllegalArgumentException] {
      graft.functions.BloomAgg(
        org.apache.spark.sql.graft.CatalystBridge.expression(lit(1L)),
        100, 5) // m not divisible by 64
    }
    assert(e.getMessage.contains("divisible by 64"))
  }
}
