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

  test("LSH ANN recall >= 0.6 vs brute force at defaults") {
    val brute = Similarity.annTopKBrute(spark, sf)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    val lsh = Similarity.annTopKLsh(spark, sf)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    val recall = (lsh & brute).size.toDouble / brute.size
    info(f"LSH ANN recall = $recall%.2f (${lsh.size} returned)")
    assert(recall >= 0.6, f"recall $recall%.2f below bound")
  }

  test("LSH ANN ranks are contiguous from 1 per query") {
    val byQuery = Similarity.annTopKLsh(spark, sf)
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    byQuery.values.foreach { rs =>
      assert(rs.map(_._3).sorted.toSeq === (1 to rs.length))
    }
  }
}
