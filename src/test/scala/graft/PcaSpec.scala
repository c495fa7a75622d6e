package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

/** Distributed PCA (q_embed_pca): rows-only at the driver (float
  * partial-sum order makes low ulps engine-specific), so this suite
  * owns the algebra — the covariance aggregate against a driver-side
  * reference, Jacobi against a hand-solved matrix, orthonormality and
  * eigenvalue ordering on the real fixture, planted-direction
  * recovery, projection == driver dot products, and the stored
  * moments' merge contract.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val sf = TestSpark.sf0001

  test("jacobi eigendecomposition solves a hand-built symmetric matrix") {
    // [[2,1],[1,2]] has eigenvalues 3 (along [1,1]/√2) and 1
    val (vals, vecs) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    val inv = 1.0 / math.sqrt(2.0)
    assert(math.abs(vecs(0)(0) - inv) < 1e-12 && math.abs(vecs(0)(1) - inv) < 1e-12,
      s"dominant eigenvector must be [1,1]/sqrt(2), got ${vecs(0).toSeq}")
  }

  test("cov_stats aggregate equals the driver-computed moments exactly") {
    val vecs = Seq(
      Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f),
      Array(-1.0f, 0.5f, 2.5f), Array(0.0f, 0.0f, 1.0f))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
    val got = Pca.momentsOn(df, 3)
    // driver reference: n, sums, upper-triangle products
    val exp = new Array[Double](graft.functions.CovStatsAgg.statsLen(3))
    vecs.foreach { v =>
      exp(0) += 1.0
      var p = 4
      for (i <- 0 until 3) {
        exp(1 + i) += v(i)
        for (j <- i until 3) { exp(p) += v(i).toDouble * v(j).toDouble; p += 1 }
      }
    }
    got.zip(exp).zipWithIndex.foreach { case ((g, e), i) =>
      assert(math.abs(g - e) < 1e-9, s"moment slot $i: $g != $e")
    }
  }

  test("a wrong-length vector fails loudly instead of biasing the moments") {
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[org.apache.spark.SparkException] {
      Pca.momentsOn(df, 3)
    }
    assert(e.getMessage.contains("!= declared dim") ||
      Option(e.getCause).exists(_.getMessage.contains("!= declared dim")))
  }

  test("fixture fit: orthonormal components, descending non-negative eigenvalues") {
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val m = Pca.fitPcaOn(emb, dim = 64, k = 8)
    for (i <- 0 until 8; j <- i until 8) {
      val dot = (0 until 64).map(t => m.components(i)(t) * m.components(j)(t)).sum
      val expected = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expected) < 1e-8,
        s"components $i . $j = $dot, expected $expected")
    }
    m.eigenvalues.sliding(2).foreach { case Array(a, b) =>
      assert(a >= b - 1e-12, s"eigenvalues must descend: ${m.eigenvalues.toSeq}")
    }
    assert(m.eigenvalues.forall(_ >= -1e-9),
      s"covariance eigenvalues must be non-negative: ${m.eigenvalues.toSeq}")
    assert(m.n === emb.count())
  }

  test("a planted dominant direction is recovered as PC1") {
    // x_t = t·u + tiny orthogonal wiggle: the spectrum is one huge
    // eigenvalue along u plus crumbs
    val d = 8
    val u = Array.tabulate(d)(i => if (i % 2 == 0) 0.5 else -0.5) // unit norm
    val rows = (0 until 200).map { t =>
      val scale = (t - 100).toDouble
      (t.toLong, Array.tabulate(d)(i =>
        (scale * u(i) + 0.01 * math.sin(t * (i + 1))).toFloat).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.fitPcaOn(df, dim = d, k = 2)
    val cos = math.abs((0 until d).map(i => m.components(0)(i) * u(i)).sum)
    assert(cos > 0.9999, s"PC1 must align with the planted direction, |cos| = $cos")
    assert(m.eigenvalues(0) > 100 * m.eigenvalues(1),
      s"planted spectrum must dominate: ${m.eigenvalues.toSeq}")
  }

  test("projectOn equals driver-side centered dot products") {
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val m = Pca.fitPcaOn(emb, dim = 64, k = 3)
    val got = Pca.projectOn(emb, m)
      .select($"vec_id", $"pc").as[(Long, Seq[Double])]
      .collect().toMap
    val raw = emb.as[(Long, Seq[Float])].collect()
    raw.take(50).foreach { case (id, v) =>
      val exp = m.components.map(c =>
        (0 until 64).map(i => c(i) * (v(i).toDouble - m.mean(i))).sum)
      got(id).zip(exp).foreach { case (g, e) =>
        assert(math.abs(g - e) < 1e-6, s"vec $id: $g != $e")
      }
    }
  }

  test("stored moments merge: init + append == fresh fit of the union") {
    import graft.sources.PcaModels
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val root = java.nio.file.Files.createTempDirectory("pca-model").toString
    PcaModels.writePcaStats(emb.filter($"vec_id" % 2 === 0), s"$root/m", dim = 64)
    PcaModels.appendPca(emb.filter($"vec_id" % 2 =!= 0), s"$root/m", "b2")
    val stored = PcaModels.readPcaModel(spark, s"$root/m", k = 4)
    val fresh = Pca.fitPcaOn(emb, dim = 64, k = 4)
    assert(stored.n === fresh.n)
    stored.mean.zip(fresh.mean).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, "merged mean must equal the fresh fit's") }
    stored.eigenvalues.zip(fresh.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6 * math.max(1.0, math.abs(b)),
        s"merged eigenvalue $a != fresh $b") }
    stored.components.zip(fresh.components).foreach { case (sc, fc) =>
      val cos = math.abs((0 until 64).map(i => sc(i) * fc(i)).sum)
      assert(cos > 1.0 - 1e-8, s"merged component must match fresh fit, |cos| = $cos")
    }
    // same-label replay: overwrite-on-own-label, the model is unchanged
    PcaModels.appendPca(emb.filter($"vec_id" % 2 =!= 0), s"$root/m", "b2")
    assert(PcaModels.readPcaModel(spark, s"$root/m", k = 4).n === fresh.n,
      "replaying an append must not double its moments")
    // dimension is pinned: a mismatched append refuses via the moments pass
    val bad = emb.select($"vec_id", slice($"embedding", 1, 32).as("embedding"))
    intercept[Exception] {
      PcaModels.appendPca(bad, s"$root/m", "b3")
    }
  }

  test("q_embed_pca_idx: the stored-moments twin equals the inline fit " +
    "within the PCA float slack") {
    val inline = Pca.embedPca(spark, sf)
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> Seq(r._3, r._4, r._5, r._6)).toMap
    val stored = Pca.embedPcaStored(spark, sf)
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> Seq(r._3, r._4, r._5, r._6)).toMap
    assert(stored.keySet === inline.keySet && stored.nonEmpty,
      "stored twin must cover exactly the inline row set")
    // the only slack is double partial-sum order between the committed
    // moments and a fresh aggregation — at the x1e6 integer surface
    // that is at most one unit on a floor boundary
    stored.foreach { case (id, s) =>
      s.zip(inline(id)).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1L,
          s"vec $id: stored pc $a vs inline $b beyond the float slack")
      }
    }
  }

  test("q_embed_pca surfaces one integer-scaled row per vector") {
    val out = Pca.embedPca(spark, sf)
    assert(out.count() === Tables.embeddings(spark, sf).count())
    assert(out.columns.toSeq ===
      Seq("vec_id", "label", "pc1_x1e6", "pc2_x1e6", "pc3_x1e6", "pc4_x1e6"))
    // PC1 carries real variance: not all projections collapse to a point
    assert(out.select(countDistinct($"pc1_x1e6")).as[Long].head > 10L)
  }
}
