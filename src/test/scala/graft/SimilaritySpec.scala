package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._
  val sf = TestSpark.sf0001

  /** Driver-side brute-force cosine ground truth. */
  private lazy val vecs: Map[Long, Array[Double]] = {
    Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
      .map { case (id, v) =>
        val d = v.map(_.toDouble).toArray
        val n = math.sqrt(d.map(x => x * x).sum)
        id -> d.map(_ / n)
      }.toMap
  }
  private def cos(a: Long, b: Long): Double =
    vecs(a).zip(vecs(b)).map { case (x, y) => x * y }.sum

  test("cosine near-dup pairs equal brute force at >= 0.45") {
    val got = Similarity.cosineNearDupPairs(spark, sf)
      .as[(Long, Long)].collect().toSet
    val want = (for {
      a <- vecs.keys; b <- vecs.keys if a < b && cos(a, b) >= 0.45
    } yield (a, b)).toSet
    assert(got === want)
  }

  test("near-dup plan is a blocked equi-join: no cartesian/nested-loop operator") {
    val plan = Similarity.cosineNearDupPairs(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"pair enumeration must shuffle on block-pair keys, got:\n$plan")
  }

  test("near-dup emits each unordered pair exactly once across block layouts") {
    for (blocks <- Seq(1, 3, 8)) {
      val rows = Similarity.cosineNearDupPairs(spark, sf, blocks = blocks)
        .as[(Long, Long)].collect()
      assert(rows.length === rows.toSet.size, s"dup pairs at blocks=$blocks")
      assert(rows.forall { case (a, b) => a < b })
    }
  }

  test("brute-force ANN top-5 matches driver-side ranking") {
    val got = Similarity.annTopKBrute(spark, sf)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.sortBy(_._3).map(_._2).toSeq
      }
    val want = vecs.keys.filter(_ < 10).map { q =>
      q -> vecs.keys.filter(_ != q).toSeq
        .sortBy(c => (-cos(q, c), c)).take(5)
    }.toMap
    assert(got === want)
  }

  test("LSH ANN recall >= 0.9 vs brute force at defaults") {
    val brute = Similarity.annTopKBrute(spark, sf)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    val lsh = Similarity.annTopKLsh(spark, sf)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    val recall = (lsh & brute).size.toDouble / brute.size
    info(f"LSH ANN recall = $recall%.2f (${lsh.size} returned)")
    assert(recall >= 0.9, f"recall $recall%.2f below bound")
  }

  test("LSH ANN plan dedups candidates on ids, not array payloads") {
    val plan = Similarity.annTopKLsh(spark, sf).queryExecution.executedPlan.toString
    // the dedup aggregation must key on (query_id, neighbor_id); if an
    // embedding array ever appears among grouping keys the shuffle carries
    // ~0.5 KB of key per row
    val aggLines = plan.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggLines.nonEmpty)
    assert(!aggLines.exists(l => l.contains("keys=[") &&
      (l.contains("embedding") || l.contains("eq"))),
      s"array-typed grouping key in:\n${aggLines.mkString("\n")}")
  }

  test("LSH ANN ranks are contiguous from 1 per query") {
    val byQuery = Similarity.annTopKLsh(spark, sf)
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    byQuery.values.foreach { rs =>
      assert(rs.map(_._3).sorted.toSeq === (1 to rs.length))
    }
  }
}
