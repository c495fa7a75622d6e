package graft

import graft.operators.Clustering

/** Cluster-based corpus pruning (operators.Clustering): semantics pinned
  * on PLANTED separable clusters (where the kept sets are hand-computable
  * regardless of k-means init) plus invariants on the real embeddings
  * fixture (rows-only at the driver — the kmeans-seeded-cells precedent).
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._
  val sf = TestSpark.sf0001

  /** Two well-separated planted clusters in R^4: four vectors along e1
    * with decreasing prototypicality, three along e2. K-means with k=2
    * must split them on the axis boundary whatever the seed does.
    */
  private lazy val planted = Seq(
    (0L, Seq(1.0f, 0.00f, 0f, 0f)),   // exactly on the e1 centroid side
    (1L, Seq(1.0f, 0.05f, 0f, 0f)),
    (2L, Seq(1.0f, 0.20f, 0f, 0f)),
    (3L, Seq(1.0f, 0.60f, 0f, 0f)),   // least prototypical of cluster A
    (4L, Seq(0.00f, 1.0f, 0f, 0f)),
    (5L, Seq(0.05f, 1.0f, 0f, 0f)),
    (6L, Seq(0.40f, 1.0f, 0f, 0f))    // least prototypical of cluster B
  ).toDF("vec_id", "embedding")

  test("planted clusters: assignment separates them; central keeps the prototypical half") {
    val out = Clustering.clusterPruneOn(planted, "spec_planted", nlist = 2,
        keepPct = 50, policy = "central")
      .as[(Long, Int, Long, Long, Long)].collect()
    assert(out.length === 7, "one row per vector")
    val cellOf = out.map(r => r._1 -> r._2).toMap
    // the two axis groups land in different cells, each internally whole
    assert(Set(0L, 1L, 2L, 3L).map(cellOf).size === 1, "cluster A stays whole")
    assert(Set(4L, 5L, 6L).map(cellOf).size === 1, "cluster B stays whole")
    assert(cellOf(0L) !== cellOf(4L), "the two clusters must separate")
    // central @ 50%: A (n=4) keeps its 2 most centroid-like, B (n=3)
    // keeps max(1, 3*50 DIV 100) = 1. The centroid of A sits between its
    // members but closest to the tight {0,1} pair; 3 (the straggler) must
    // always drop, and B's straggler 6 likewise.
    val kept = out.filter(_._5 == 1L).map(_._1).toSet
    assert(kept.size === 3, s"quotas 2+1, got $kept")
    assert(!kept.contains(3L) && !kept.contains(6L),
      s"stragglers must drop under the central policy, got $kept")
    // outlier is the mirror: stragglers are exactly what it keeps first
    val keptOut = Clustering.clusterPruneOn(planted, "spec_planted", nlist = 2,
        keepPct = 50, policy = "outlier")
      .as[(Long, Int, Long, Long, Long)].collect()
      .filter(_._5 == 1L).map(_._1).toSet
    assert(keptOut.contains(3L) && keptOut.contains(6L),
      s"outlier policy must keep the stragglers first, got $keptOut")
  }

  test("real fixture: quota arithmetic, rank determinism, and the central/dropped sim ordering") {
    val out = Clustering.clusterPrune(spark, sf, nlist = 8, keepPct = 40)
      .as[(Long, Int, Long, Long, Long)].collect()
    val total = Tables.embeddings(spark, sf).count()
    assert(out.length.toLong === total, "every vector verdicted exactly once")
    assert(out.map(_._1).distinct.length === out.length, "vec_ids unique")
    out.groupBy(_._2).foreach { case (cell, rows) =>
      val n = rows.length.toLong
      val quota = math.max(1L, n * 40L / 100L)
      assert(rows.count(_._5 == 1L).toLong === quota,
        s"cell $cell: quota $quota of $n")
      // ranks are a permutation of 1..n
      assert(rows.map(_._3).sorted.toSeq === (1L to n).toSeq,
        s"cell $cell: ranks must be 1..$n")
      // central policy: no dropped row is strictly more prototypical
      // than a kept one (ppm comparison tolerates the floor rounding)
      val keptMin = rows.filter(_._5 == 1L).map(_._4).min
      val dropMax = if (rows.exists(_._5 == 0L)) rows.filter(_._5 == 0L).map(_._4).max
                    else Long.MinValue
      assert(keptMin >= dropMax,
        s"cell $cell: kept sims must dominate dropped sims")
    }
  }

  test("profile: one row per populated cell, populations sum to the corpus, spread ordered") {
    val prof = Clustering.clusterProfile(spark, sf, nlist = 8)
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(prof.map(_._2).sum === Tables.embeddings(spark, sf).count())
    assert(prof.map(_._1).distinct.length === prof.length, "cells unique")
    prof.foreach { case (cell, n, mean, mn, mx) =>
      assert(n > 0)
      assert(mn <= mean && mean <= mx, s"cell $cell: min<=mean<=max in ppm")
    }
    // profile and prune agree on the cell populations (same quantizer
    // via the shared fit cache)
    val pruneN = Clustering.clusterPrune(spark, sf, nlist = 8)
      .groupBy("cell").count().as[(Int, Long)].collect().toMap
    assert(prof.map(r => r._1 -> r._2).toMap === pruneN)
  }

  test("cluster stats against the stored IVF index's centroids (the production wiring)") {
    import graft.streaming.StreamingOps
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val root = java.nio.file.Files.createTempDirectory("graft-ivfstats")
    val idx = root.resolve("ivf").toString
    graft.sources.SimilarityIndexes.writeIvfIndex(emb, idx, qKey = "clspec")
    val (centroids, _) = graft.sources.SimilarityIndexes.readIvfIndex(spark, idx)
    val dir = root.resolve("stats").toString
    StreamingOps.clusterStatsBatch(emb, dir, "b0", centroids)
    assert(Clustering.clusterProfileFromStats(spark, dir)
        .orderBy("cell").collect().map(_.toString).toSeq ===
      Clustering.clusterProfileWith(emb, centroids)
        .orderBy("cell").collect().map(_.toString).toSeq,
      "stats ingested under the index's centroids must equal the batch profile on them")
  }

  test("streaming cluster stats: merged stored partials == batch profile, replay-idempotent") {
    import graft.streaming.StreamingOps
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sf)
    val centroids = Similarity.fitQuantizer(emb, sf, 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-clstats")
      .resolve("stats").toString
    // two disjoint deliveries, driven through the factored batch body
    // (the same-label crash-replay surface)
    val (d1, d2) = (emb.filter($"vec_id" % 2 === 0), emb.filter($"vec_id" % 2 === 1))
    StreamingOps.clusterStatsBatch(d1, dir, "b0", centroids)
    StreamingOps.clusterStatsBatch(d2, dir, "b1", centroids)
    def profMap(df: org.apache.spark.sql.DataFrame) =
      df.as[(Int, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val batch = profMap(Clustering.cellStats(
      Clustering.assignWithSim(emb, centroids))
      .select($"cell", $"n_vecs", org.apache.spark.sql.functions.expr("sum_sim_ppm DIV n_vecs"),
        $"min_sim_ppm", $"max_sim_ppm"))
    val stored = profMap(Clustering.clusterProfileFromStats(spark, dir))
    assert(stored === batch,
      "merged per-ingest partials must equal the batch profile EXACTLY (integer ppm measures)")
    // crash replay: delivering b1 again under its own label changes nothing
    StreamingOps.clusterStatsBatch(d2, dir, "b1", centroids)
    assert(profMap(Clustering.clusterProfileFromStats(spark, dir)) === batch,
      "same-label replay must be idempotent")
    // an empty recovery replay appends no vacant label
    StreamingOps.clusterStatsBatch(emb.filter($"vec_id" < -1), dir, "b2", centroids)
    assert(!new java.io.File(s"$dir/ingest=b2").exists(),
      "empty delivery must not write a vacant ingest label")
  }
}
