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

  test("semantic dedup: exact-verified pairs, recall >= 0.8, representative invariants") {
    val out = Similarity.semanticDedup(spark, sf)
      .as[(Long, Long, Long)].collect()
    // one verdict per vector; rep is the component MIN so rep_id <= vec_id;
    // the is_rep bit is consistent; every named rep keeps itself
    assert(out.length === vecs.size, "one row per input vector")
    val repOf = out.map(r => r._1 -> r._2).toMap
    out.foreach { case (id, rep, isRep) =>
      assert(rep <= id, s"vec $id: rep $rep must be the component min")
      assert(isRep === (if (rep == id) 1L else 0L))
      assert(repOf(rep) === rep, s"rep $rep of $id must keep itself")
    }
    // cluster membership must respect the exact >= 0.45 pair graph:
    // precision 1.0 by construction (candidates are exact-verified), so
    // every non-singleton assignment traces back to a true pair; recall
    // vs the exact blocked all-pairs ground truth is the approximate part
    val truePairs = (for {
      a <- vecs.keys; b <- vecs.keys if a < b && cos(a, b) >= 0.45
    } yield (a, b)).toSet
    val clustered = out.filter(r => r._2 != r._1).map(_._1).toSet
    val trueClustered = truePairs.flatMap(p => Seq(p._1, p._2))
    assert(clustered.subsetOf(trueClustered),
      "no vector may be merged without a true qualifying pair")
    val found = truePairs.count { case (a, b) => repOf(a) == repOf(b) }
    if (truePairs.nonEmpty) {
      val recall = found.toDouble / truePairs.size
      assert(recall >= 0.8, s"semantic dedup recall $recall < 0.8 " +
        s"($found of ${truePairs.size} true pairs share a representative)")
    }
    // full assignment (nassign = nlist) degrades to exact: every true
    // pair must then share a representative
    val full = Similarity.semanticDedupOn(spark,
        Tables.embeddings(spark, sf), sf, nassign = 16)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    truePairs.foreach { case (a, b) =>
      assert(full(a) === full(b),
        s"full-probe semantic dedup must merge true pair ($a,$b)")
    }
  }

  test("ivfRecallCurve: recall and scan monotone in nprobe, exact-brute " +
      "and full-scan endpoints at nprobe = nlist, honest denominators") {
    val nlist = 16
    val rows = Similarity.ivfRecallCurve(spark, sf,
        nprobes = Seq(1, 4, 8, nlist), nlist = nlist)
      .orderBy($"nprobe")
      .select($"nprobe", $"hits", $"scanned", $"n_truth", $"n_queries",
        $"n_corpus", $"recall_ppm", $"scan_ppm")
      .as[(Int, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq === Seq(1, 4, 8, nlist))
    // a wider fan-out is a candidate SUPERSET: recall and scanned cost
    // are non-decreasing by construction, not just in expectation
    assert(rows.map(_._7).toSeq === rows.map(_._7).toSeq.sorted,
      s"recall_ppm must be monotone in nprobe: ${rows.map(_._7).toSeq}")
    assert(rows.map(_._3).toSeq === rows.map(_._3).toSeq.sorted,
      s"scanned must be monotone in nprobe: ${rows.map(_._3).toSeq}")
    // nprobe = nlist probes every cell: the probe IS brute force and
    // the coarse join reads every (query, other-vector) pair once
    val full = rows.last
    assert(full._7 === 1000000L,
      s"nprobe=nlist must recall the exact top-k in full (got ${full._7} ppm)")
    assert(full._8 === 1000000L,
      s"nprobe=nlist must scan every candidate pair (got ${full._8} ppm)")
    assert(full._3 === full._5 * (full._6 - 1),
      "full scan count must equal n_queries * (n_corpus - 1)")
    // denominators are the measured sample, not the requested params
    assert(full._4 === full._5 * 5, "n_truth = n_queries * k at the default k")
    // the narrowest probe reads a strict subset on this 16-cell layout
    assert(rows.head._3 < full._3)

    // stored-index twin: the curve over a MATERIALIZED (centroids,
    // cells) index equals the inline measurement — same qKey, so the
    // memoized fit pins identical centroids and any divergence is in
    // the curve arithmetic itself. The SQL view serves the same rows.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivf-recall").toString
    graft.sources.SimilarityIndexes.writeIvfIndex(
      Tables.embeddings(spark, sf), s"$dir/idx", qKey = sf)
    val (cent, cells) = graft.sources.SimilarityIndexes
      .readIvfIndex(spark, s"$dir/idx")
    val queries = Tables.embeddings(spark, sf).filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("eq"))
    val stored = Similarity.ivfRecallCurveFromIndex(cent, cells, queries,
      nprobes = Seq(1, 4, 8, nlist))
    val inline = Similarity.ivfRecallCurve(spark, sf,
      nprobes = Seq(1, 4, 8, nlist), nlist = nlist)
    assert(stored.collect().map(_.toString).sorted.toSeq ===
      inline.collect().map(_.toString).sorted.toSeq,
      "recall curve over the stored index must equal the inline measurement")
    queries.createOrReplaceTempView("recall_queries")
    graft.sources.IndexSql.registerIvfRecallCurve(spark, "ivf_recall_sql",
      s"$dir/idx", "recall_queries", nprobes = Seq(1, 4, 8, nlist))
    assert(spark.sql("SELECT * FROM ivf_recall_sql")
      .collect().map(_.toString).sorted.toSeq ===
      stored.collect().map(_.toString).sorted.toSeq,
      "SQL view must serve the same curve as the Scala stored probe")
  }

  test("pcaRecallCurve: full-rotation exactness endpoint at k' = dim, honest " +
      "byte/scan axes, stored-index and SQL twins identical") {
    val rows = Similarity.pcaRecallCurve(spark, sf,
        kprimes = Seq(8, 16, 32, 64))
      .orderBy($"kprime")
      .select($"kprime", $"hits", $"scanned", $"n_truth", $"n_queries",
        $"n_corpus", $"recall_ppm", $"scan_ppm", $"byte_ppm")
      .as[(Int, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq === Seq(8, 16, 32, 64))
    // k' = dim is a full orthonormal rotation: cosine ranking is
    // preserved exactly, so the shortlist contains the true top-k and
    // the exact re-rank recovers it in full
    assert(rows.last._7 === 1000000L,
      s"k'=dim must recall the exact top-k in full (got ${rows.last._7} ppm)")
    // PCA prunes BYTES, not candidates: every step scores every
    // (query, other-vector) pair — scanned is step-constant at
    // n_queries * (n_corpus - 1) and scan_ppm reads 10^6 throughout
    // (the honest contrast with IVF/LSH); byte_ppm is the real axis
    rows.foreach { r =>
      assert(r._3 === r._5 * (r._6 - 1),
        s"k'=${r._1}: scanned ${r._3} != n_queries*(n_corpus-1)")
      assert(r._8 === 1000000L)
      assert(r._9 === r._1.toLong * 1000000L / 64L,
        s"k'=${r._1}: byte_ppm ${r._9} is not the width share")
    }
    // the fixture's documented near-isotropic cliff: 32 of 64
    // components hold recall, 16 do not — the decision the curve is
    // FOR, measured (0.96 vs ~0.56 on this fixture)
    val recallAt = rows.map(r => r._1 -> r._7).toMap
    assert(recallAt(32) >= 850000L,
      s"k'=32 recall ${recallAt(32)} ppm collapsed on the fixture")
    assert(recallAt(16) < recallAt(32),
      "the 16->32 cliff vanished — the fixture or the curve changed")

    // stored twin: write the index at FULL width under the same qKey so
    // the memoized fit pins the identical basis — any divergence is in
    // the curve arithmetic. The SQL view serves the same rows.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pca-recall").toString
    graft.sources.SimilarityIndexes.writePcaIndex(
      Tables.embeddings(spark, sf), s"$dir/idx", qKey = sf, k = 64)
    val (basis, reduced, vectors) = graft.sources.SimilarityIndexes
      .readPcaIndex(spark, s"$dir/idx")
    val queries = Tables.embeddings(spark, sf).filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("eq"))
    val stored = Similarity.pcaRecallCurveFromIndex(basis, reduced, vectors,
      queries, kprimes = Seq(8, 16, 32, 64))
    assert(stored.collect().map(_.toString).sorted.toSeq ===
      rows.map(r => Row9(r).toString).toSeq.sorted,
      "recall curve over the stored index must equal the inline measurement")
    queries.createOrReplaceTempView("pca_recall_queries")
    graft.sources.IndexSql.registerPcaRecallCurve(spark, "pca_recall_sql",
      s"$dir/idx", "pca_recall_queries", kprimes = Seq(8, 16, 32, 64))
    assert(spark.sql("SELECT * FROM pca_recall_sql")
      .collect().map(_.toString).sorted.toSeq ===
      stored.collect().map(_.toString).sorted.toSeq,
      "SQL view must serve the same curve as the Scala stored probe")
  }

  // row-tuple -> Row rendering shared by the curve stored-twin asserts
  private def Row9(r: (Int, Long, Long, Long, Long, Long, Long, Long, Long)) =
    org.apache.spark.sql.Row(r._1, r._2, r._3, r._4, r._5, r._6, r._7, r._8, r._9)

  test("lshRecallCurve: recall and measured scanned monotone in nTables " +
      "(nested plane prefixes), stored-index and SQL twins identical") {
    val rows = Similarity.lshRecallCurve(spark, sf,
        nTabless = Seq(1, 2, 4, 8, 16))
      .orderBy($"ntables")
      .select($"ntables", $"hits", $"scanned", $"n_truth", $"n_queries",
        $"n_corpus", $"recall_ppm", $"scan_ppm")
      .as[(Int, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq === Seq(1, 2, 4, 8, 16))
    // t tables' planes are a PREFIX of t'>t tables' (sequential seeded
    // generation), so candidate sets are nested supersets: recall and
    // the DEDUPED candidate count are non-decreasing by construction
    assert(rows.map(_._7).toSeq === rows.map(_._7).toSeq.sorted,
      s"recall_ppm must be monotone in nTables: ${rows.map(_._7).toSeq}")
    assert(rows.map(_._3).toSeq === rows.map(_._3).toSeq.sorted,
      s"scanned must be monotone in nTables: ${rows.map(_._3).toSeq}")
    // deduped pairs can never exceed the all-pairs pool — and unlike
    // IVF there is no exact endpoint law: LSH never guarantees recall
    rows.foreach(r => assert(r._3 <= r._5 * (r._6 - 1) && r._8 <= 1000000L))
    // at the full default table count the curve must reproduce the
    // probe family's spec-asserted recall floor
    assert(rows.last._7 >= 900000L,
      s"16-table recall ${rows.last._7} ppm under the family's 0.9 floor")

    val dir = java.nio.file.Files
      .createTempDirectory("graft-lsh-recall").toString
    graft.sources.SimilarityIndexes.writeLshIndex(
      Tables.embeddings(spark, sf), s"$dir/idx")
    val (sketches, vectors, (nT, bits, dim)) = graft.sources.SimilarityIndexes
      .readLshIndex(spark, s"$dir/idx")
    val queries = Tables.embeddings(spark, sf).filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("eq"))
    val stored = Similarity.lshRecallCurveFromIndex(sketches, vectors, queries,
      k = 5, nTabless = Seq(1, 4, 16), bitsPerTable = bits,
      maxBucket = 10000, dim = dim)
    val inline = Similarity.lshRecallCurve(spark, sf, nTabless = Seq(1, 4, 16))
    assert(stored.collect().map(_.toString).sorted.toSeq ===
      inline.collect().map(_.toString).sorted.toSeq,
      "recall curve over the stored sketches must equal the inline measurement")
    queries.createOrReplaceTempView("lsh_recall_queries")
    graft.sources.IndexSql.registerLshRecallCurve(spark, "lsh_recall_sql",
      s"$dir/idx", "lsh_recall_queries", nTabless = Seq(1, 4, 16))
    assert(spark.sql("SELECT * FROM lsh_recall_sql")
      .collect().map(_.toString).sorted.toSeq ===
      stored.collect().map(_.toString).sorted.toSeq,
      "SQL view must serve the same curve as the Scala stored probe")
    assert(nT === 16, "fixture index must pin the default table count")
  }

  test("stepped curves: every ladder point's hits equal the SERVED probe's") {
    // The r18 curve cores score candidates once at the max knob value
    // and ladder by prefix cuts (pr / mintable / arank / slice) inside
    // ONE window pipeline — this pins the property that makes that
    // legal: at EVERY ladder point the curve's hit count equals the
    // real serving probe's, for every family. A drift here means the
    // curve tunes a knob the probes don't actually have.
    val truth = Similarity.annTopKBrute(spark, sf)
      .select($"query_id", $"neighbor_id")
    def hitsOf(probe: org.apache.spark.sql.DataFrame): Long =
      probe.join(truth, Seq("query_id", "neighbor_id"), "left_semi").count()
    def curveHits(df: org.apache.spark.sql.DataFrame, stepCol: String): Map[Int, Long] =
      df.select(org.apache.spark.sql.functions.col(stepCol).cast("int"), $"hits")
        .as[(Int, Long)].collect().toMap
    val ivf = curveHits(
      Similarity.ivfRecallCurve(spark, sf, nprobes = Seq(1, 4, 16)), "nprobe")
    Seq(1, 4, 16).foreach { np =>
      assert(ivf(np) === hitsOf(Similarity.annTopKIvf(spark, sf, nprobe = np)),
        s"IVF curve at nprobe=$np diverged from the served probe")
    }
    val sq = curveHits(
      Similarity.ivfSqRecallCurve(spark, sf, nprobes = Seq(1, 8, 16)), "nprobe")
    Seq(1, 8, 16).foreach { np =>
      assert(sq(np) === hitsOf(Similarity.annTopKIvfSq(spark, sf, nprobe = np)),
        s"IVF-SQ8 curve at nprobe=$np diverged from the served probe")
    }
    val pq = curveHits(
      Similarity.ivfPqRecallCurve(spark, sf, nprobes = Seq(1, 8, 16)), "nprobe")
    Seq(1, 8, 16).foreach { np =>
      assert(pq(np) === hitsOf(Similarity.annTopKIvfPq(spark, sf, nprobe = np)),
        s"IVF-PQ curve at nprobe=$np diverged from the served probe")
    }
    val lsh = curveHits(
      Similarity.lshRecallCurve(spark, sf, nTabless = Seq(1, 4, 16)), "ntables")
    Seq(1, 4, 16).foreach { t =>
      assert(lsh(t) === hitsOf(Similarity.annTopKLsh(spark, sf, nTables = t)),
        s"LSH curve at nTables=$t diverged from the served probe")
    }
    val pca = curveHits(
      Similarity.pcaRecallCurve(spark, sf, kprimes = Seq(16, 32, 64)), "kprime")
    Seq(16, 32, 64).foreach { kp =>
      assert(pca(kp) === hitsOf(Similarity.annTopKPca(spark, sf, pcaDim = kp)),
        s"PCA curve at k'=$kp diverged from the served probe")
    }
    val pqr = curveHits(
      Similarity.pqRerankCurve(spark, sf, reranks = Seq(8, 64)), "rerank")
    Seq(8, 64).foreach { r =>
      assert(pqr(r) === hitsOf(Similarity.annTopKPq(spark, sf, rerank = r)),
        s"PQ rerank curve at depth=$r diverged from the served probe")
    }
  }

  test("rerank-depth curves (PQ + SQ8): monotone in depth, degrade to exact " +
      "brute at depth >= corpus, stored-index and SQL twins identical") {
    val nCorpus = vecs.size
    val rows = Similarity.pqRerankCurve(spark, sf,
        reranks = Seq(5, 20, nCorpus))
      .orderBy($"rerank")
      .select($"rerank", $"hits", $"scanned", $"n_truth", $"n_queries",
        $"n_corpus", $"recall_ppm", $"scan_ppm")
      .as[(Int, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq === Seq(5, 20, nCorpus))
    // depth-r shortlists are nested prefixes of one coarse ranking:
    // recall and the re-read float-vector count are monotone
    assert(rows.map(_._7).toSeq === rows.map(_._7).toSeq.sorted)
    assert(rows.map(_._3).toSeq === rows.map(_._3).toSeq.sorted)
    // at depth >= corpus the exact stage sees every candidate: the
    // probe IS brute force (the full-rerank == brute precedent as a
    // measured curve point), and the shortlist is the full pair pool
    assert(rows.last._7 === 1000000L,
      s"depth>=corpus must recall in full (got ${rows.last._7} ppm)")
    assert(rows.last._3 === rows.last._5 * (rows.last._6 - 1))
    assert(rows.last._8 === 1000000L)
    // the shallowest depth re-reads exactly k floats per query
    assert(rows.head._3 === rows.head._5 * 5)

    // SQ8's reconstruction is far finer than PQ's: its curve must
    // saturate at least as fast at every shared depth
    val sq = Similarity.sqRerankCurve(spark, sf, reranks = Seq(5, 20, nCorpus))
      .orderBy($"rerank").select($"rerank", $"recall_ppm")
      .as[(Int, Long)].collect()
    assert(sq.last._2 === 1000000L)
    assert(sq.map(_._2).toSeq === sq.map(_._2).toSeq.sorted)

    val dir = java.nio.file.Files
      .createTempDirectory("graft-pq-rerank").toString
    graft.sources.SimilarityIndexes.writePqIndex(
      Tables.embeddings(spark, sf), s"$dir/idx", qKey = sf)
    val (books, codes, vectors) = graft.sources.SimilarityIndexes
      .readPqIndex(spark, s"$dir/idx")
    val queries = Tables.embeddings(spark, sf).filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("eq"))
    val stored = Similarity.pqRerankCurveFromIndex(books, codes, vectors,
      queries, reranks = Seq(5, 20, nCorpus))
    val inline = Similarity.pqRerankCurve(spark, sf,
      reranks = Seq(5, 20, nCorpus))
    assert(stored.collect().map(_.toString).sorted.toSeq ===
      inline.collect().map(_.toString).sorted.toSeq,
      "rerank curve over the stored index must equal the inline measurement")
    queries.createOrReplaceTempView("pq_rerank_queries")
    graft.sources.IndexSql.registerPqRerankCurve(spark, "pq_rerank_sql",
      s"$dir/idx", "pq_rerank_queries", reranks = Seq(5, 20, nCorpus))
    assert(spark.sql("SELECT * FROM pq_rerank_sql")
      .collect().map(_.toString).sorted.toSeq ===
      stored.collect().map(_.toString).sorted.toSeq,
      "SQL view must serve the same curve as the Scala stored probe")
  }

  test("composed nprobe curves (IVF-SQ8 + IVF-PQ): scanned monotone, full " +
      "fan-out degrades to the pure family exactly, stored and SQL twins") {
    // ground truth the pure-family comparison scores against
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("eq"))
    val truth = Similarity.annTopKBrute(spark, sf)
      .select($"query_id", $"neighbor_id")

    val sqRows = Similarity.ivfSqRecallCurve(spark, sf,
        nprobes = Seq(1, 4, 8, 16))
      .orderBy($"nprobe")
      .select($"nprobe", $"hits", $"scanned", $"n_truth", $"n_queries",
        $"n_corpus", $"recall_ppm", $"scan_ppm")
      .as[(Int, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(sqRows.map(_._1).toSeq === Seq(1, 4, 8, 16))
    // cell-population supersets: the CODE-ROW scan cost is monotone by
    // construction (recall deliberately is NOT pinned monotone — the
    // int8 coarse pass can displace a true neighbor from the fixed
    // shortlist at wider fan-out; the curve exists to surface that)
    assert(sqRows.map(_._3).toSeq === sqRows.map(_._3).toSeq.sorted)
    assert(sqRows.last._3 === sqRows.last._5 * (sqRows.last._6 - 1),
      "full fan-out must scan every candidate code row once")
    assert(sqRows.last._8 === 1000000L)
    // nprobe = nlist turns cell pruning off: the curve's hit count
    // must equal the PURE SQ8 two-stage probe's, exactly
    val pureSqHits = Similarity.annTopKSqOn(emb, queries, k = 5, rerank = 20)
      .join(truth, Seq("query_id", "neighbor_id"), "left_semi").count()
    assert(sqRows.last._2 === pureSqHits,
      s"IVF-SQ at nprobe=nlist hit ${sqRows.last._2} != pure SQ8 $pureSqHits")

    val pqRows = Similarity.ivfPqRecallCurve(spark, sf,
        nprobes = Seq(1, 4, 8, 16))
      .orderBy($"nprobe")
      .select($"nprobe", $"hits", $"scanned", $"n_truth", $"n_queries",
        $"n_corpus", $"recall_ppm", $"scan_ppm")
      .as[(Int, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(pqRows.map(_._3).toSeq === pqRows.map(_._3).toSeq.sorted)
    assert(pqRows.last._3 === pqRows.last._5 * (pqRows.last._6 - 1))
    assert(pqRows.last._8 === 1000000L)
    val purePqHits = Similarity.annTopKPq(spark, sf)
      .join(truth, Seq("query_id", "neighbor_id"), "left_semi").count()
    assert(pqRows.last._2 === purePqHits,
      s"IVF-PQ at nprobe=nlist hit ${pqRows.last._2} != pure PQ $purePqHits")

    // stored twins: same qKey => memoized fits pin identical centroids
    // and codebooks, so stored == inline bit-for-bit; SQL views serve
    // the same rows
    val dir = java.nio.file.Files
      .createTempDirectory("graft-composed-recall").toString
    graft.sources.SimilarityIndexes.writeIvfSqIndex(emb, s"$dir/sq", qKey = sf)
    val (cs, sqCodes, sqVecs) = graft.sources.SimilarityIndexes
      .readIvfSqIndex(spark, s"$dir/sq")
    val sqStored = Similarity.ivfSqRecallCurveFromIndex(cs, sqCodes, sqVecs,
      queries, nprobes = Seq(1, 4, 8, 16))
    val sqInline = Similarity.ivfSqRecallCurve(spark, sf,
      nprobes = Seq(1, 4, 8, 16))
    assert(sqStored.collect().map(_.toString).sorted.toSeq ===
      sqInline.collect().map(_.toString).sorted.toSeq)
    queries.createOrReplaceTempView("composed_recall_queries")
    graft.sources.IndexSql.registerIvfSqRecallCurve(spark, "ivfsq_recall_sql",
      s"$dir/sq", "composed_recall_queries", nprobes = Seq(1, 4, 8, 16))
    assert(spark.sql("SELECT * FROM ivfsq_recall_sql")
      .collect().map(_.toString).sorted.toSeq ===
      sqStored.collect().map(_.toString).sorted.toSeq)

    graft.sources.SimilarityIndexes.writeIvfPqIndex(emb, s"$dir/pq", qKey = sf)
    val (cp, books, pqCodes, pqVecs) = graft.sources.SimilarityIndexes
      .readIvfPqIndex(spark, s"$dir/pq")
    val pqStored = Similarity.ivfPqRecallCurveFromIndex(cp, books, pqCodes,
      pqVecs, queries, nprobes = Seq(1, 4, 8, 16))
    val pqInline = Similarity.ivfPqRecallCurve(spark, sf,
      nprobes = Seq(1, 4, 8, 16))
    assert(pqStored.collect().map(_.toString).sorted.toSeq ===
      pqInline.collect().map(_.toString).sorted.toSeq)
    graft.sources.IndexSql.registerIvfPqRecallCurve(spark, "ivfpq_recall_sql",
      s"$dir/pq", "composed_recall_queries", nprobes = Seq(1, 4, 8, 16))
    assert(spark.sql("SELECT * FROM ivfpq_recall_sql")
      .collect().map(_.toString).sorted.toSeq ===
      pqStored.collect().map(_.toString).sorted.toSeq)
  }

  test("salted two-phase shortlist == plain window: fixture SQ8 + IVF-PQ coarse " +
    "passes, and skewed tied data") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.functions.CosineSimilarity.cosineSim
    val ord = Seq(col("qsim").desc, col("neighbor_id").asc)
    def plain(scored: org.apache.spark.sql.DataFrame, n: Int) = {
      val w = Window.partitionBy(col("query_id")).orderBy(ord: _*)
      scored.withColumn("arank", row_number().over(w)).filter(col("arank") <= n)
        .select("query_id", "neighbor_id", "arank")
        .as[(Long, Long, Int)].collect().toSet
    }
    def salted(scored: org.apache.spark.sql.DataFrame, n: Int) =
      Similarity.saltedTopPerQuery(scored, ord, n, "arank")
        .select("query_id", "neighbor_id", "arank")
        .as[(Long, Long, Int)].collect().toSet
    val emb = Tables.embeddings(spark, sf)
    val queries = broadcast(emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq")))
    // the REAL SQ8 coarse-scored frame (sqProbe's input, re-spelled from
    // public pieces: cosine is scale-invariant so raw codes score as-is)
    val sqScored = Similarity.quantizeSq8On(emb)
      .join(queries, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        nanvl(cosineSim(col("eq"), transform(col("codes"), c => c.cast("float"))),
          lit(-2.0)).as("qsim"))
    assert(salted(sqScored, 20) === plain(sqScored, 20),
      "SQ8 coarse pass: salted two-phase must equal the plain window")
    // the REAL PQ/IVF-PQ ADC coarse-scored frame (pqLuts/pqSim shared
    // with the probes — package-private on purpose for this pin)
    val books = Similarity.fitPqCodebooks(emb, sf, m = 16, ksub = 32)
    val lutQ = queries
      .select(col("query_id"), Similarity.unitVec(col("eq")).as("uq"))
      .select(col("query_id"), Similarity.pqLuts(col("uq"), books).as("luts"))
    val pqScored = Similarity.quantizePqOn(emb, books)
      .join(broadcast(lutQ), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Similarity.pqSim(col("luts"), col("codes")).as("qsim"))
    assert(salted(pqScored, 64) === plain(pqScored, 64),
      "IVF-PQ ADC coarse pass: salted two-phase must equal the plain window")
    // adversarial shape: one hot query where MOST scores tie (the case a
    // wrong salt spelling breaks — ties must resolve identically through
    // the deterministic neighbor_id tie-break in BOTH phases)
    val tied = (1L to 500L).map(i => (0L, i, if (i % 7 == 0) 2.0 else 1.0))
      .toDF("query_id", "neighbor_id", "qsim")
    assert(salted(tied, 10) === plain(tied, 10),
      "tied scores: salted two-phase must equal the plain window")
  }

  test("SQ8: codes bounded, reconstruction within half a step, ANN recall vs exact") {
    val emb = Tables.embeddings(spark, sf)
    val q = Similarity.quantizeSq8On(emb)
      .as[(Long, Double, Seq[Byte])].collect()
    assert(q.nonEmpty)
    val origs = emb.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toMap
    q.foreach { case (id, maxabs, codes) =>
      assert(codes.forall(c => c >= -127 && c <= 127), s"code out of range for $id")
      // reconstruction error <= maxabs/254 per component (half a step)
      origs(id).zip(codes).foreach { case (o, c) =>
        val rec = c.toDouble * maxabs / 127.0
        assert(math.abs(o - rec) <= maxabs / 254.0 + 1e-9,
          s"reconstruction error beyond half a quantization step for $id")
      }
    }
    // two-stage retrieval recall vs the exact top-k (driver ground truth)
    val got = Similarity.annTopKSq(spark, sf)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val queries = vecs.keys.filter(_ < 10)
    val recalls = queries.map { qid =>
      val want = vecs.keys.filter(_ != qid).toSeq
        .sortBy(n => (-cos(qid, n), n)).take(5).toSet
      (got(qid) & want).size.toDouble / want.size
    }
    val recall = recalls.sum / recalls.size
    info(f"SQ8 two-stage recall = $recall%.2f")
    assert(recall >= 0.9, f"SQ8 recall $recall%.2f below bound")
  }

  test("PQ: codes bounded, full-rerank exactness, ANN recall at defaults") {
    val emb = Tables.embeddings(spark, sf)
    val books = Similarity.fitPqCodebooks(emb, sf, m = 16, ksub = 32)
    assert(books.length === 16 && books.forall(_.length === 32) &&
      books.forall(_.forall(_.length === 4)),
      "codebooks must be m=16 books of ksub=32 centroids of dim/m=4")
    val codes = Similarity.quantizePqOn(emb, books)
      .as[(Long, Seq[Byte])].collect()
    assert(codes.nonEmpty && codes.forall(_._2.length === 16),
      "every vector must encode to exactly m=16 codes")
    assert(codes.forall(_._2.forall(c => c >= 0 && c < 32)),
      "every code must index into its ksub=32 codebook")

    // rerank >= corpus: the exact re-rank sees every candidate, so the
    // result is EXACTLY brute force regardless of quantization quality
    val full = Similarity.annTopKPq(spark, sf, rerank = 1000)
      .as[(Long, Long, Long)].collect().toSet
    val brute = Similarity.annTopKBrute(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(full === brute && full.nonEmpty,
      "PQ with full rerank must equal the exact brute-force top-k")

    // two-stage recall at the defaults (rerank=64 of 500) vs exact
    val got = Similarity.annTopKPq(spark, sf)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val queries = vecs.keys.filter(_ < 10)
    val recalls = queries.map { qid =>
      val want = vecs.keys.filter(_ != qid).toSeq
        .sortBy(n => (-cos(qid, n), n)).take(5).toSet
      (got(qid) & want).size.toDouble / want.size
    }
    val recall = recalls.sum / recalls.size
    info(f"PQ two-stage recall = $recall%.2f")
    assert(recall >= 0.9, f"PQ recall $recall%.2f below bound")
  }

  test("stored PQ index: probe == inline, append == fresh full build") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("pq-idx").toString
    graft.sources.SimilarityIndexes.writePqIndex(emb, s"$dir/full", sf)
    val (books, codes, vectors) =
      graft.sources.SimilarityIndexes.readPqIndex(spark, s"$dir/full")
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("eq"))
    val stored = Similarity.annTopKPqFromIndex(books, codes, vectors, queries)
      .as[(Long, Long, Long)].collect().toSet
    val inline = Similarity.annTopKPq(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(stored === inline && stored.nonEmpty,
      "stored PQ probe diverged from the inline encode-and-probe path")
    // the registered driver spellings (in-flight encode under stored
    // fixture quantizers, r19) answer identically to the fit-path
    // inline queries they replaced
    assert(graft.sources.SimilarityIndexes.annPqInlineDocs(spark, sf)
      .as[(Long, Long, Long)].collect().toSet === inline,
      "fixture-codebook inline PQ spelling diverged from the fit path")
    assert(graft.sources.SimilarityIndexes.annIvfPqInlineDocs(spark, sf)
      .as[(Long, Long, Long)].collect().toSet ===
      Similarity.annTopKIvfPq(spark, sf).as[(Long, Long, Long)].collect().toSet,
      "fixture-quantizer inline IVF-PQ spelling diverged from the fit path")
    // append parity: the appended batch encodes under the STORED
    // codebooks, so the grown index answers identically to a full build
    val lo = emb.filter($"vec_id" % 10 < 8)
    val hi = emb.filter($"vec_id" % 10 >= 8)
    graft.sources.SimilarityIndexes.writePqIndex(lo, s"$dir/grown", s"$sf-lo")
    graft.sources.SimilarityIndexes.appendPq(hi, s"$dir/grown", "b1")
    // replay the append: own-label overwrite adds nothing
    graft.sources.SimilarityIndexes.appendPq(hi, s"$dir/grown", "b1")
    val (gb, gc, gv) = graft.sources.SimilarityIndexes.readPqIndex(spark, s"$dir/grown")
    assert(gc.count() === codes.count() && gv.count() === vectors.count(),
      "append (replayed) must reach exactly the full build's row count")
    // codebooks fitted on the 80% slice differ from the full fit, so
    // compare the grown probe against a probe under ITS OWN books over
    // the same corpus — the fit-once append contract, not book equality
    val grownProbe = Similarity.annTopKPqFromIndex(gb, gc, gv, queries)
      .as[(Long, Long, Long)].collect().toSet
    val rebuiltInline = Similarity.annTopKPqFromIndex(gb,
        Similarity.quantizePqOn(emb, gb),
        emb.select($"vec_id", $"embedding"), queries)
      .as[(Long, Long, Long)].collect().toSet
    assert(grownProbe === rebuiltInline,
      "append-grown index answers differently from re-encoding the " +
        "same corpus under the stored codebooks")
    // compaction: single base ingest everywhere, codebooks verbatim,
    // probe-identical to the appended index
    graft.sources.SimilarityIndexes.compactPqTo(spark, s"$dir/grown", s"$dir/compact")
    for (comp <- Seq("codes", "vectors", "manifest")) {
      val ingests = new java.io.File(s"$dir/compact/$comp").listFiles()
        .filter(_.isDirectory).map(_.getName).toSeq
      assert(ingests === Seq(s"ingest=${graft.sources.SimilarityIndexes.BaseLabel}"),
        s"$comp must collapse to the single base ingest, got $ingests")
    }
    val (cb, cc, cv) =
      graft.sources.SimilarityIndexes.readPqIndex(spark, s"$dir/compact")
    assert(cb === gb, "compaction must carry the codebooks verbatim")
    val compactProbe = Similarity.annTopKPqFromIndex(cb, cc, cv, queries)
      .as[(Long, Long, Long)].collect().toSet
    assert(compactProbe === grownProbe,
      "probing the compacted index must equal probing the appended one")
  }

  test("stored SQ8 index: probe == inline, append == fresh full build") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("sq-idx").toString
    graft.sources.SimilarityIndexes.writeSqIndex(emb, s"$dir/full")
    val (codes, vectors) = graft.sources.SimilarityIndexes.readSqIndex(spark, s"$dir/full")
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("eq"))
    val stored = Similarity.annTopKSqFromIndex(codes, vectors, queries)
      .as[(Long, Long, Long)].collect().toSet
    val inline = Similarity.annTopKSq(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(stored === inline && stored.nonEmpty,
      "stored SQ8 probe diverged from the inline quantize-and-probe path")
    // append parity: build from an 80% slice, append the rest under a
    // label — the combined index answers identically to the full build
    val lo = emb.filter($"vec_id" % 10 < 8)
    val hi = emb.filter($"vec_id" % 10 >= 8)
    graft.sources.SimilarityIndexes.writeSqIndex(lo, s"$dir/grown")
    graft.sources.SimilarityIndexes.appendSq(hi, s"$dir/grown", "b1")
    // replay the append: own-label overwrite adds nothing
    graft.sources.SimilarityIndexes.appendSq(hi, s"$dir/grown", "b1")
    val (gc, gv) = graft.sources.SimilarityIndexes.readSqIndex(spark, s"$dir/grown")
    assert(gc.count() === codes.count() && gv.count() === vectors.count(),
      "append (replayed) must reach exactly the full build's row count")
    val grown = Similarity.annTopKSqFromIndex(gc, gv, queries)
      .as[(Long, Long, Long)].collect().toSet
    assert(grown === stored, "append-grown index answers differently from the full build")
    // compaction: single base ingest, probe-identical
    graft.sources.SimilarityIndexes.compactSqTo(spark, s"$dir/grown", s"$dir/compact")
    for (comp <- Seq("codes", "vectors", "manifest")) {
      val ingests = new java.io.File(s"$dir/compact/$comp").listFiles()
        .filter(_.isDirectory).map(_.getName).toSeq
      assert(ingests === Seq(s"ingest=${graft.sources.SimilarityIndexes.BaseLabel}"),
        s"$comp must collapse to the single base ingest, got $ingests")
    }
    val (cc, cv) = graft.sources.SimilarityIndexes.readSqIndex(spark, s"$dir/compact")
    val compactProbe = Similarity.annTopKSqFromIndex(cc, cv, queries)
      .as[(Long, Long, Long)].collect().toSet
    assert(compactProbe === grown,
      "probing the compacted index must equal probing the appended one")
  }

  test("IVF-SQ8: full probe degrades to pure SQ8; default nprobe holds the IVF recall bound") {
    // nprobe = nlist turns cell pruning off: every code row reaches the
    // coarse pass, so the composed index must reproduce the pure SQ8
    // two-stage EXACTLY (same scoring expression, same tie-breaks)
    val full = Similarity.annTopKIvfSq(spark, sf, nprobe = 16)
      .as[(Long, Long, Long)].collect().toSet
    val sq = Similarity.annTopKSq(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(full === sq && full.nonEmpty,
      "IVF-SQ8 at nprobe=nlist must equal the pure SQ8 two-stage retrieval")
    // cell pruning on: recall vs the exact driver ground truth holds the
    // IVF bound (the coarse-pass SQ error is absorbed by the re-rank,
    // so the only recall loss is cell pruning — IVF's own)
    val got = Similarity.annTopKIvfSq(spark, sf)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val queries = vecs.keys.filter(_ < 10)
    val recalls = queries.map { qid =>
      val want = vecs.keys.filter(_ != qid).toSeq
        .sortBy(n => (-cos(qid, n), n)).take(5).toSet
      (got(qid) & want).size.toDouble / want.size
    }
    val recall = recalls.sum / recalls.size
    info(f"IVF-SQ8 recall = $recall%.2f")
    assert(recall >= 0.85, f"IVF-SQ8 recall $recall%.2f below the IVF bound")
  }

  test("stored IVF-SQ8 index: probe == inline, append assigns with STORED centroids") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("ivfsq-idx").toString
    // same quantizer key as the inline path -> same memoized centroids,
    // so stored-vs-inline equality is exact, not just recall-equivalent
    graft.sources.SimilarityIndexes.writeIvfSqIndex(emb, s"$dir/full", sf)
    val (cen, codes, vectors) =
      graft.sources.SimilarityIndexes.readIvfSqIndex(spark, s"$dir/full")
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("eq"))
    val stored = Similarity.annTopKIvfSqFromIndex(cen, codes, vectors, queries)
      .as[(Long, Long, Long)].collect().toSet
    val inline = Similarity.annTopKIvfSq(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(stored === inline && stored.nonEmpty,
      "stored IVF-SQ8 probe diverged from the inline fit-assign-probe path")
    // append: build from an 80% slice (its own fit), append the rest —
    // the grown index must answer exactly like a ONE-SHOT assignment of
    // the full corpus under the stored (80%-fitted) centroids: appends
    // never move centroids, only add inverted-list rows
    val lo = emb.filter($"vec_id" % 10 < 8)
    val hi = emb.filter($"vec_id" % 10 >= 8)
    graft.sources.SimilarityIndexes.writeIvfSqIndex(lo, s"$dir/grown", s"$sf:ivfsq80")
    graft.sources.SimilarityIndexes.appendIvfSq(hi, s"$dir/grown", "b1")
    // replay the append: own-label overwrite adds nothing
    graft.sources.SimilarityIndexes.appendIvfSq(hi, s"$dir/grown", "b1")
    val (gcen, gcodes, gvec) =
      graft.sources.SimilarityIndexes.readIvfSqIndex(spark, s"$dir/grown")
    assert(gcodes.count() === emb.count() && gvec.count() === emb.count(),
      "append (replayed) must reach exactly one row per corpus vector")
    val grown = Similarity.annTopKIvfSqFromIndex(gcen, gcodes, gvec, queries)
      .as[(Long, Long, Long)].collect().toSet
    val oneShot = Similarity.annTopKIvfSqFromIndex(gcen,
      Similarity.quantizeSq8On(Similarity.assignCells(emb, gcen, nassign = 1)),
      emb.select($"vec_id", $"embedding"), queries)
      .as[(Long, Long, Long)].collect().toSet
    assert(grown === oneShot,
      "append-grown index answers differently from one-shot assignment under the stored centroids")
  }

  test("IVF-PQ: full probe degrades to pure PQ; default nprobe holds the IVF recall bound") {
    // nprobe = nlist turns cell pruning off: every code row reaches the
    // ADC pass (each vector sits in exactly one cell at nassign=1), so
    // the composed index must reproduce pure PQ EXACTLY — same LUTs,
    // same scoring expression, same tie-breaks (the IVF-SQ8→SQ8
    // precedent, applied to the codebook artifact)
    val full = Similarity.annTopKIvfPq(spark, sf, nprobe = 16)
      .as[(Long, Long, Long)].collect().toSet
    val pq = Similarity.annTopKPq(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(full === pq && full.nonEmpty,
      "IVF-PQ at nprobe=nlist must equal the pure PQ two-stage retrieval")
    // cell pruning on: the PQ reconstruction error is absorbed by the
    // deep rerank (64), so the only recall loss is cell pruning — IVF's
    // own bound applies
    val got = Similarity.annTopKIvfPq(spark, sf)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val queries = vecs.keys.filter(_ < 10)
    val recalls = queries.map { qid =>
      val want = vecs.keys.filter(_ != qid).toSeq
        .sortBy(n => (-cos(qid, n), n)).take(5).toSet
      (got(qid) & want).size.toDouble / want.size
    }
    val recall = recalls.sum / recalls.size
    info(f"IVF-PQ recall = $recall%.2f")
    assert(recall >= 0.85, f"IVF-PQ recall $recall%.2f below the IVF bound")
  }

  test("stored PCA index: probe == inline, append projects with the STORED basis, " +
    "compaction merges moments and carries the drift verdict") {
    import graft.sources.SimilarityIndexes
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("pca-idx").toString
    // same fit key as the inline path -> same memoized moments/basis,
    // so stored-vs-inline equality is exact
    SimilarityIndexes.writePcaIndex(emb, s"$dir/full", sf)
    val (basis, reduced, vectors) = SimilarityIndexes.readPcaIndex(spark, s"$dir/full")
    assert(SimilarityIndexes.readPcaMeta(spark, s"$dir/full") === ((64, 32)))
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("eq"))
    val stored = Similarity.annTopKPcaFromIndex(basis, reduced, vectors, queries)
      .as[(Long, Long, Long)].collect().toSet
    val inline = Similarity.annTopKPca(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(stored === inline && stored.nonEmpty,
      "stored PCA probe diverged from the inline fit-project path")
    // append: build from an 80% slice (its own fit), append the rest,
    // replay the append — the grown index must answer exactly like
    // projecting the FULL corpus under the stored 80% basis: appends
    // project, never re-fit
    val lo = emb.filter($"vec_id" % 10 < 8)
    val hi = emb.filter($"vec_id" % 10 >= 8)
    SimilarityIndexes.writePcaIndex(lo, s"$dir/grown", s"$sf:pca80")
    SimilarityIndexes.appendPcaIndex(hi, s"$dir/grown", "b1")
    SimilarityIndexes.appendPcaIndex(hi, s"$dir/grown", "b1")
    val (gb, gr, gv) = SimilarityIndexes.readPcaIndex(spark, s"$dir/grown")
    assert(gr.count() === emb.count() && gv.count() === emb.count(),
      "append (replayed) must reach exactly one reduced row per corpus vector")
    val grown = Similarity.annTopKPcaFromIndex(gb, gr, gv, queries)
      .as[(Long, Long, Long)].collect().toSet
    val oneShot = Similarity.annTopKPcaFromIndex(gb,
      Similarity.projectWithBasis(emb, gb).select($"vec_id", $"pc"),
      emb.select($"vec_id", $"embedding"), queries)
      .as[(Long, Long, Long)].collect().toSet
    assert(grown === oneShot,
      "append-grown PCA index answers differently from one-shot projection under the stored basis")
    // a mismatched-width append is a rebuild, not an append
    intercept[Exception] {
      SimilarityIndexes.appendPcaIndex(
        hi.select($"vec_id",
          org.apache.spark.sql.functions.slice($"embedding", 1, 32).as("embedding")),
        s"$dir/grown", "b2")
    }
    // compaction: basis verbatim, per-ingest moments collapse to their
    // sum (== the union's moments), single base ingest, probe-identical,
    // and the result is the compaction-time drift verdict
    val verdict = SimilarityIndexes.compactPcaTo(spark, s"$dir/grown", s"$dir/compact")
    assert(verdict === SimilarityIndexes.pcaRefitDue(spark, s"$dir/grown"),
      "compaction must return exactly the drift verdict it measured")
    assert(!verdict,
      "a same-distribution append must not trip the compaction-time re-fit flag")
    val (cb, cr, cv) = SimilarityIndexes.readPcaIndex(spark, s"$dir/compact")
    assert(cb === gb, "compaction must carry the basis verbatim")
    val mergedM = spark.read.parquet(s"$dir/compact/moments")
      .select($"m").as[Seq[Double]].collect()
    assert(mergedM.length === 1, "moments must collapse to one merged row")
    val freshM = graft.operators.Pca.momentsOn(emb, 64)
    mergedM.head.zip(freshM).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6 * math.max(1.0, math.abs(b)),
        "merged moments must equal the union's moments") }
    val compactProbe = Similarity.annTopKPcaFromIndex(cb, cr, cv, queries)
      .as[(Long, Long, Long)].collect().toSet
    assert(compactProbe === grown,
      "probing the compacted index must equal probing the appended one")
  }

  test("pcaDriftStats: discarded-subspace appends trip the re-fit flag, " +
    "same-distribution appends don't") {
    import graft.sources.SimilarityIndexes
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("pca-drift").toString
    SimilarityIndexes.writePcaIndex(emb.filter($"vec_id" % 2 === 0),
      s"$dir/idx", s"$sf:pcadrift")
    // same-distribution append: the held-out half of the same corpus
    SimilarityIndexes.appendPcaIndex(emb.filter($"vec_id" % 2 =!= 0),
      s"$dir/idx", "same")
    assert(!SimilarityIndexes.pcaRefitDue(spark, s"$dir/idx"),
      "a same-distribution append must not flag")
    // drifted append: residuals of corpus vectors under the stored
    // basis — mass entirely in the subspace the basis DISCARDS, the
    // delivery a rank-k basis is blind to (err -> 1 vs base ~ 1 - k/d
    // on this near-isotropic fixture)
    val (basis, _, _) = SimilarityIndexes.readPcaIndex(spark, s"$dir/idx")
    val residuals = emb.filter($"vec_id" < 100)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, v) =>
        val x = v.map(_.toDouble).toArray
        val proj = Array.ofDim[Double](64)
        basis.foreach { b =>
          val c = (0 until 64).map(i => b(i) * x(i)).sum
          (0 until 64).foreach(i => proj(i) += c * b(i))
        }
        (id + 1000000L, (0 until 64).map(i => (x(i) - proj(i)).toFloat))
      }.toSeq.toDF("vec_id", "embedding")
    SimilarityIndexes.appendPcaIndex(residuals, s"$dir/idx", "drifted")
    val stats = SimilarityIndexes.pcaDriftStats(spark, s"$dir/idx")
      .select($"ingest", $"refit_due").as[(String, Boolean)].collect().toMap
    assert(stats("drifted"), "a discarded-subspace delivery must flag")
    assert(!stats("same") && !stats(graft.sources.SimilarityIndexes.BaseLabel),
      "neither the base nor the same-distribution ingest may flag")
    assert(SimilarityIndexes.pcaRefitDue(spark, s"$dir/idx"),
      "the one-boolean spelling must reflect the flagged ingest")
  }

  test("stored IVF-PQ index: probe == inline, append uses STORED fits, compaction carries the drift verdict") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-idx").toString
    // same quantizer/codebook keys as the inline path -> same memoized
    // fits, so stored-vs-inline equality is exact
    graft.sources.SimilarityIndexes.writeIvfPqIndex(emb, s"$dir/full", sf)
    val (cen, books, codes, vectors) =
      graft.sources.SimilarityIndexes.readIvfPqIndex(spark, s"$dir/full")
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("eq"))
    val stored = Similarity.annTopKIvfPqFromIndex(cen, books, codes, vectors, queries)
      .as[(Long, Long, Long)].collect().toSet
    val inline = Similarity.annTopKIvfPq(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(stored === inline && stored.nonEmpty,
      "stored IVF-PQ probe diverged from the inline fit-assign-encode path")
    // append: build from an 80% slice (its own fits), append the rest —
    // the grown index must answer exactly like a one-shot
    // assign-and-encode of the full corpus under the STORED artifacts:
    // appends move neither centroids nor codebooks
    val lo = emb.filter($"vec_id" % 10 < 8)
    val hi = emb.filter($"vec_id" % 10 >= 8)
    graft.sources.SimilarityIndexes.writeIvfPqIndex(lo, s"$dir/grown", s"$sf:ivfpq80")
    graft.sources.SimilarityIndexes.appendIvfPq(hi, s"$dir/grown", "b1")
    // replay the append: own-label overwrite adds nothing
    graft.sources.SimilarityIndexes.appendIvfPq(hi, s"$dir/grown", "b1")
    val (gcen, gbooks, gcodes, gvec) =
      graft.sources.SimilarityIndexes.readIvfPqIndex(spark, s"$dir/grown")
    assert(gcodes.count() === emb.count() && gvec.count() === emb.count(),
      "append (replayed) must reach exactly one row per corpus vector")
    val grown = Similarity.annTopKIvfPqFromIndex(gcen, gbooks, gcodes, gvec, queries)
      .as[(Long, Long, Long)].collect().toSet
    val oneShot = Similarity.annTopKIvfPqFromIndex(gcen, gbooks,
      Similarity.quantizePqOn(
        Similarity.assignCells(emb, gcen, nassign = 1), gbooks),
      emb.select($"vec_id", $"embedding"), queries)
      .as[(Long, Long, Long)].collect().toSet
    assert(grown === oneShot,
      "append-grown index answers differently from one-shot encoding under the stored fits")
    // compaction: single base ingest, fitted artifacts verbatim,
    // probe-identical — and the RESULT is the compaction-time drift
    // verdict (warn-and-proceed): a same-distribution append must not
    // flag, and the Boolean must equal pqRefitDue on the source
    val verdict = graft.sources.SimilarityIndexes.compactIvfPqTo(
      spark, s"$dir/grown", s"$dir/compact")
    assert(verdict === graft.sources.SimilarityIndexes.pqRefitDue(spark, s"$dir/grown"),
      "compaction must return exactly the drift verdict it measured")
    assert(!verdict,
      "a same-distribution append must not trip the compaction-time re-fit flag")
    val (ccen, cbooks, ccodes, cvec) =
      graft.sources.SimilarityIndexes.readIvfPqIndex(spark, s"$dir/compact")
    assert(ccen === gcen && cbooks === gbooks,
      "compaction must carry centroids and codebooks verbatim")
    for (comp <- Seq("vectors", "manifest")) {
      val ingests = new java.io.File(s"$dir/compact/$comp").listFiles()
        .filter(_.isDirectory).map(_.getName).toSeq
      assert(ingests === Seq(s"ingest=${graft.sources.SimilarityIndexes.BaseLabel}"),
        s"$comp must collapse to the single base ingest, got $ingests")
    }
    val compactProbe = Similarity.annTopKIvfPqFromIndex(ccen, cbooks, ccodes, cvec, queries)
      .as[(Long, Long, Long)].collect().toSet
    assert(compactProbe === grown,
      "probing the compacted index must equal probing the appended one")
  }

  test("a planted all-zero vector sinks instead of NaN-topping every shortlist") {
    // an all-zero embedding has no direction: its cosine is NaN (0/0),
    // and Spark orders NaN LARGEST — before the rankSim guard it would
    // rank FIRST in every coarse shortlist and ride NaN into the exact
    // re-rank (r13 ADVICE). With the guard it scores -2.0 and can never
    // displace a real neighbor.
    val emb = Tables.embeddings(spark, sf)
    val zeroId = 999999L
    val withZero = emb.select($"vec_id", $"embedding").unionByName(
      spark.range(1).select(org.apache.spark.sql.functions.lit(zeroId).as("vec_id"),
        org.apache.spark.sql.functions.typedlit(Seq.fill(64)(0.0f)).as("embedding")))
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("eq"))
    val withZeroTop = Similarity.annTopKSqOn(withZero, queries, k = 5, rerank = 20)
      .as[(Long, Long, Long)].collect().toSet
    val cleanTop = Similarity.annTopKSqOn(emb, queries, k = 5, rerank = 20)
      .as[(Long, Long, Long)].collect().toSet
    assert(!withZeroTop.exists(_._2 == zeroId),
      "the zero vector must never appear as a neighbor")
    assert(withZeroTop === cleanTop,
      "a zero vector in the corpus must not perturb anyone's top-k")
  }

  test("quantizer memo refits when a reused key carries different data") {
    // half the table under a label, then the FULL table under the SAME
    // label: before the fingerprinted memo key (round-8) the second call
    // silently reused centroids fit on the half — now it must behave
    // exactly like a fresh label on the full table
    val emb = Tables.embeddings(spark, sf)
    val half = emb.filter($"vec_id" % 2 === 0)
    Similarity.semanticDedupOn(spark, half, "memo-reuse-spec")
      .collect() // populate the memo under the label with HALF's data
    val reused = Similarity.semanticDedupOn(spark, emb, "memo-reuse-spec")
      .as[(Long, Long, Long)].collect().toSet
    val fresh = Similarity.semanticDedupOn(spark, emb, "memo-reuse-spec-fresh")
      .as[(Long, Long, Long)].collect().toSet
    assert(reused === fresh,
      "a reused label with different data must refit, not serve stale cells")
  }

  test("stored IVF index probe equals the inline quantizer path; recall bound holds") {
    val brute = Similarity.annTopKBrute(spark, sf)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    val inline = Similarity.annTopKIvf(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    val stored = graft.sources.SimilarityIndexes.annIvfProbeDocs(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(stored === inline,
      "probing the parquet-materialized IVF index must equal the inline path " +
        "(same seeded quantizer, shared probe arithmetic)")
    val recall = (stored.map(r => (r._1, r._2)) & brute).size.toDouble / brute.size
    info(f"stored IVF ANN recall = $recall%.2f")
    assert(recall >= 0.85, f"stored-probe recall $recall%.2f below bound")
  }

  test("stored multi-assign cells drive semantic dedup identically to inline") {
    val emb = Tables.embeddings(spark, sf)
    val path = "target/similarity_index_spec/dedup_cells"
    graft.sources.SimilarityIndexes.writeIvfIndex(emb, path, sf, nassign = 4)
    val (_, cells) = graft.sources.SimilarityIndexes.readIvfIndex(spark, path)
    val stored = Similarity.semanticDedupFromIndex(cells)
      .as[(Long, Long, Long)].collect().toSet
    val inline = Similarity.semanticDedupOn(spark, emb, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(stored === inline,
      "dedup over stored cells must equal the inline assignment path")
    assert(graft.sources.SimilarityIndexes.semanticDedupProbeDocs(spark, sf)
      .as[(Long, Long, Long)].collect().toSet === inline,
      "the q_semantic_dedup_idx harness must agree with both")
  }

  test("stored LSH sketch index: probe == inline, append == fresh build, compaction probe-identical") {
    val emb = Tables.embeddings(spark, sf)
    val path = "target/similarity_index_spec/lsh"
    graft.sources.SimilarityIndexes.writeLshIndex(emb, path)
    val (sk, vecs, (nT, bits, dimStored)) = graft.sources.SimilarityIndexes.readLshIndex(spark, path)
    assert(dimStored === 64, "meta must pin the measured embedding dimension")
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("eq"))
    val stored = Similarity.annTopKLshFromIndex(sk, vecs, queries,
        nTables = nT, bitsPerTable = bits)
      .as[(Long, Long, Long)].collect().toSet
    val inline = Similarity.annTopKLsh(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(stored === inline,
      "probing the parquet-materialized sketch index must equal the inline " +
        "spelling (seed-deterministic planes, shared probe arithmetic)")
    assert(graft.sources.SimilarityIndexes.annLshProbeDocs(spark, sf)
      .as[(Long, Long, Long)].collect().toSet === inline,
      "the driver-query harness must agree with both")
    // sketch rows carry NO payload — the 100 TB layout claim
    assert(sk.columns.toSeq.sorted === Seq("key", "vec_id"),
      "sketch component must hold only (vec_id, key)")
    // append == fresh full build over the union
    val corpus = emb.filter($"vec_id" % 10 < 8)
    val batch = emb.filter($"vec_id" % 10 >= 8)
    val appended = "target/similarity_index_spec/lsh_append"
    val fresh = "target/similarity_index_spec/lsh_fresh"
    graft.sources.SimilarityIndexes.writeLshIndex(corpus, appended)
    graft.sources.SimilarityIndexes.appendLsh(batch, appended, "b1")
    graft.sources.SimilarityIndexes.writeLshIndex(emb, fresh)
    val (skA, vA, _) = graft.sources.SimilarityIndexes.readLshIndex(spark, appended)
    val (skF, vF, _) = graft.sources.SimilarityIndexes.readLshIndex(spark, fresh)
    assert(skA.as[(Long, Long)].collect().toSet ===
      skF.as[(Long, Long)].collect().toSet,
      "appended sketch rows must equal the full rebuild's")
    assert(vA.as[(Long, Seq[Float])].collect().toSet ===
      vF.as[(Long, Seq[Float])].collect().toSet,
      "appended vectors must equal the full rebuild's")
    // replayed append rewrites its own ingest rather than duplicating
    graft.sources.SimilarityIndexes.appendLsh(batch, appended, "b1")
    assert(spark.read.parquet(s"$appended/sketches").count() === skF.count(),
      "replayed append must not duplicate sketch rows")
    // compaction: single base ingest, probe-identical
    val dst = "target/similarity_index_spec/lsh_compact"
    graft.sources.SimilarityIndexes.compactLshTo(spark, appended, dst)
    for (comp <- Seq("sketches", "vectors", "manifest")) {
      val ingests = new java.io.File(s"$dst/$comp").listFiles()
        .filter(_.isDirectory).map(_.getName).toSeq
      assert(ingests === Seq(s"ingest=${graft.sources.SimilarityIndexes.BaseLabel}"),
        s"$comp must collapse to the single base ingest, got $ingests")
    }
    val (skC, vC, (nTc, bitsC, _)) = graft.sources.SimilarityIndexes.readLshIndex(spark, dst)
    // re-read: the replayed append rewrote ingest=b1's files, so the
    // pre-replay frames' captured file listing is stale
    val (skA2, vA2, _) = graft.sources.SimilarityIndexes.readLshIndex(spark, appended)
    val probeA = Similarity.annTopKLshFromIndex(skA2, vA2, queries,
        nTables = nT, bitsPerTable = bits)
      .as[(Long, Long, Long)].collect().toSet
    val probeC = Similarity.annTopKLshFromIndex(skC, vC, queries,
        nTables = nTc, bitsPerTable = bitsC)
      .as[(Long, Long, Long)].collect().toSet
    assert(probeC === probeA,
      "probing the compacted index must equal probing the appended one")
  }

  test("pqDriftStats: shifted-distribution appends trip the re-fit flag, same-distribution don't") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val stride = emb.agg(max($"vec_id")).head.getLong(0) + 1
    // the ivfDriftStats constructions: circular shift = same isotropic
    // geometry; abs+offset = collapse toward the positive orthant.
    // NOTE which signal catches it: the concentrated batch reconstructs
    // BETTER than base (low variance is easy to quantize), so the
    // error ratio stays quiet — its CODES pile into a few patterns and
    // the code-skew ratio is what trips
    val same = emb.select(($"vec_id" + stride).as("vec_id"),
      concat(slice($"embedding", 2, 63), slice($"embedding", 1, 1)).as("embedding"))
    val drifted = emb.select(($"vec_id" + 2 * stride).as("vec_id"),
      transform($"embedding", x => abs(x) + lit(1.0f)).as("embedding"))
    val path = "target/similarity_index_spec/pq_drift"
    graft.sources.SimilarityIndexes.writePqIndex(emb, path, "pq-drift-spec")
    graft.sources.SimilarityIndexes.appendPq(same, path, "same")
    graft.sources.SimilarityIndexes.appendPq(drifted, path, "drifted")
    val byIngest = graft.sources.SimilarityIndexes.pqDriftStats(spark, path)
      .collect().map(r => r.getAs[String]("ingest") -> r).toMap
    assert(byIngest.keySet === Set("base", "same", "drifted"))
    assert(!byIngest("base").getAs[Boolean]("refit_due"),
      "the base ingest is its own reference — never flagged")
    assert(!byIngest("same").getAs[Boolean]("refit_due"),
      s"a same-distribution append must not flag: ${byIngest("same")}")
    assert(byIngest("drifted").getAs[Boolean]("refit_due"),
      s"a shifted-distribution append must flag re-fit due: ${byIngest("drifted")}")
    assert(byIngest("drifted").getAs[Double]("skew_ratio") >
      byIngest("same").getAs[Double]("skew_ratio"),
      "concentration drift must measurably raise the code-skew ratio")
    assert(graft.sources.SimilarityIndexes.pqRefitDue(spark, path),
      "the one-boolean signal must reflect the flagged ingest")
  }

  test("ivfDriftStats: shifted-distribution appends trip the re-fit flag, same-distribution don't") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val stride = emb.agg(max($"vec_id")).head.getLong(0) + 1
    // same distribution: circular shift — identical isotropic geometry,
    // fresh ids; shifted distribution: per-coordinate abs + offset —
    // every vector collapses toward the all-positive orthant, far from
    // every fitted centroid and concentrated in the cells nearest the
    // new mode
    val same = emb.select(($"vec_id" + stride).as("vec_id"),
      concat(slice($"embedding", 2, 63), slice($"embedding", 1, 1)).as("embedding"))
    val drifted = emb.select(($"vec_id" + 2 * stride).as("vec_id"),
      transform($"embedding", x => abs(x) + lit(1.0f)).as("embedding"))
    val path = "target/similarity_index_spec/drift"
    graft.sources.SimilarityIndexes.writeIvfIndex(emb, path, "drift-spec")
    graft.sources.SimilarityIndexes.appendIvf(same, path, "same")
    graft.sources.SimilarityIndexes.appendIvf(drifted, path, "drifted")
    val byIngest = graft.sources.SimilarityIndexes.ivfDriftStats(spark, path)
      .collect().map(r => r.getAs[String]("ingest") -> r).toMap
    assert(byIngest.keySet === Set("base", "same", "drifted"))
    assert(!byIngest("base").getAs[Boolean]("refit_due"),
      "the base ingest is its own reference — never flagged")
    assert(!byIngest("same").getAs[Boolean]("refit_due"),
      s"a same-distribution append must not flag: ${byIngest("same")}")
    assert(byIngest("drifted").getAs[Boolean]("refit_due"),
      s"a shifted-distribution append must flag re-fit due: ${byIngest("drifted")}")
    assert(byIngest("drifted").getAs[Double]("dist_ratio") >
      byIngest("same").getAs[Double]("dist_ratio"),
      "drift must measurably raise the distance-to-centroid ratio")
    assert(graft.sources.SimilarityIndexes.ivfRefitDue(spark, path),
      "the one-boolean signal must reflect the flagged ingest")
    // without the drifted ingest the signal stays quiet
    val quiet = "target/similarity_index_spec/drift_quiet"
    graft.sources.SimilarityIndexes.writeIvfIndex(emb, quiet, "drift-spec-quiet")
    graft.sources.SimilarityIndexes.appendIvf(same, quiet, "same")
    assert(!graft.sources.SimilarityIndexes.ivfRefitDue(spark, quiet),
      "an undrifted index must not demand a re-fit")
  }

  test("LSH meta pins the embedding dimension; probes derive it, appends validate it") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    // a NON-64-dim corpus: the first 32 coordinates — the case the
    // hardcoded plane width silently mis-keyed before the meta pinned it
    val emb32 = emb.select($"vec_id", slice($"embedding", 1, 32).as("embedding"))
    val path = "target/similarity_index_spec/lsh32"
    graft.sources.SimilarityIndexes.writeLshIndex(emb32, path)
    val (sk, vecs32, (nT, bits, dim)) =
      graft.sources.SimilarityIndexes.readLshIndex(spark, path)
    assert(dim === 32, "meta must pin the measured dimension")
    val queries = emb32.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("eq"))
    val stored = Similarity.annTopKLshFromIndex(sk, vecs32, queries,
        nTables = nT, bitsPerTable = bits, dim = dim)
      .as[(Long, Long, Long)].collect().toSet
    val inline = Similarity.annTopKLshOn(emb32, dim = 32)
      .as[(Long, Long, Long)].collect().toSet
    assert(stored === inline,
      "stored-index probe at the meta-pinned dim must equal the inline spelling")
    // appending a different-width batch forks the key space — refused
    val batch64 = emb.filter($"vec_id" >= 490)
    intercept[IllegalArgumentException](
      graft.sources.SimilarityIndexes.appendLsh(batch64, path, "b1"))
    // the IVF twin: a wrong-width batch against stored centroids is
    // refused up front (not deep in assignCells' cosine tasks)
    val ivfPath = "target/similarity_index_spec/ivf32"
    graft.sources.SimilarityIndexes.writeIvfIndex(emb32, ivfPath, "dim-spec")
    intercept[IllegalArgumentException](
      graft.sources.SimilarityIndexes.appendIvf(batch64, ivfPath, "b1"))
  }

  test("SQL front door: ANN and drift views equal the Scala spellings") {
    val emb = Tables.embeddings(spark, sf)
    val ivfPath = "target/similarity_index_spec/sqlfront_ivf"
    graft.sources.SimilarityIndexes.writeIvfIndex(emb, ivfPath, "sqlfront")
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("eq"))
    queries.createOrReplaceTempView("sqlfront_queries")
    graft.sources.IndexSql.registerIvfAnn(spark, "sqlfront_ann_ivf",
      ivfPath, "sqlfront_queries")
    val (cent, cells) = graft.sources.SimilarityIndexes.readIvfIndex(spark, ivfPath)
    val scalaIvf = Similarity.annTopKIvfFromIndex(cent, cells, queries)
      .as[(Long, Long, Long)].collect().toSet
    assert(spark.sql("SELECT * FROM sqlfront_ann_ivf")
      .as[(Long, Long, Long)].collect().toSet === scalaIvf,
      "the SQL IVF view must equal the Scala stored probe")
    val lshPath = "target/similarity_index_spec/sqlfront_lsh"
    graft.sources.SimilarityIndexes.writeLshIndex(emb, lshPath)
    graft.sources.IndexSql.registerLshAnn(spark, "sqlfront_ann_lsh",
      lshPath, "sqlfront_queries")
    val (skL, vL, (nT, bits, dim)) =
      graft.sources.SimilarityIndexes.readLshIndex(spark, lshPath)
    val scalaLsh = Similarity.annTopKLshFromIndex(skL, vL, queries,
        nTables = nT, bitsPerTable = bits, dim = dim)
      .as[(Long, Long, Long)].collect().toSet
    assert(spark.sql("SELECT * FROM sqlfront_ann_lsh")
      .as[(Long, Long, Long)].collect().toSet === scalaLsh,
      "the SQL LSH view must equal the Scala stored probe")
    // drift stats as a SQL-queryable maintenance table
    graft.sources.IndexSql.registerIvfDriftStats(spark, "sqlfront_drift", ivfPath)
    assert(spark.sql("SELECT count(*) FROM sqlfront_drift WHERE refit_due")
      .as[Long].head() === 0L,
      "a base-only index polls clean through the SQL drift view")
    // the PCA serving family speaks the same SQL front door
    val pcaPath = "target/similarity_index_spec/sqlfront_pca"
    graft.sources.SimilarityIndexes.writePcaIndex(emb, pcaPath, "sqlfront-pca")
    graft.sources.IndexSql.registerPcaAnn(spark, "sqlfront_ann_pca",
      pcaPath, "sqlfront_queries")
    val (pb, pr, pv) = graft.sources.SimilarityIndexes.readPcaIndex(spark, pcaPath)
    val scalaPca = Similarity.annTopKPcaFromIndex(pb, pr, pv, queries)
      .as[(Long, Long, Long)].collect().toSet
    assert(spark.sql("SELECT * FROM sqlfront_ann_pca")
      .as[(Long, Long, Long)].collect().toSet === scalaPca,
      "the SQL PCA view must equal the Scala stored probe")
    graft.sources.IndexSql.registerPcaDriftStats(spark, "sqlfront_pca_drift", pcaPath)
    assert(spark.sql("SELECT count(*) FROM sqlfront_pca_drift WHERE refit_due")
      .as[Long].head() === 0L,
      "a base-only PCA index polls clean through the SQL drift view")
  }

  test("generation pointer works for the embedding indexes: probes at the root follow the flip") {
    val emb = Tables.embeddings(spark, sf)
    val root = "target/similarity_index_spec/pointered"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(root))
    graft.sources.SimilarityIndexes.writeIvfIndex(
      emb.filter($"vec_id" % 10 < 8), s"$root/gen-0", "ptr-spec")
    graft.sources.DedupIndexes.flipPointer(spark, root, "gen-0")
    // append addressed at the ROOT lands in the live generation
    graft.sources.SimilarityIndexes.appendIvf(
      emb.filter($"vec_id" % 10 >= 8), root, "b1")
    assert(new java.io.File(s"$root/gen-0/cells/ingest=b1").exists(),
      "root-addressed append must land in the pointed generation")
    val (cent0, cells0) = graft.sources.SimilarityIndexes.readIvfIndex(spark, root)
    val before = cells0.select($"vec_id", $"cell").as[(Long, Int)].collect().toSet
    // compact to gen-1; the root serves gen-0 until the flip
    graft.sources.SimilarityIndexes.compactIvfTo(spark, root, s"$root/gen-1")
    assert(graft.sources.DedupIndexes.resolveIndex(spark, root) === s"$root/gen-0")
    graft.sources.DedupIndexes.flipPointer(spark, root, "gen-1")
    val (cent1, cells1) = graft.sources.SimilarityIndexes.readIvfIndex(spark, root)
    assert(cent1 === cent0, "compaction carries centroids verbatim through the flip")
    assert(cells1.select($"vec_id", $"cell").as[(Long, Int)].collect().toSet === before,
      "the flipped-to generation serves the same assignments")
    // drift stats resolve through the root too (one ingest post-compaction)
    val ingests = graft.sources.SimilarityIndexes.ivfDriftStats(spark, root)
      .select($"ingest").as[String].collect().toSeq
    assert(ingests === Seq(graft.sources.SimilarityIndexes.BaseLabel),
      "drift stats through the pointered root see the compacted single ingest")
  }

  test("IVF append assigns with the STORED centroids and is replay-idempotent") {
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.filter($"vec_id" % 10 < 8)
    val batch = emb.filter($"vec_id" % 10 >= 8)
    val path = "target/similarity_index_spec/ivf_append"
    graft.sources.SimilarityIndexes.writeIvfIndex(corpus, path, "ivf-append-spec")
    val (cent0, cells0) = graft.sources.SimilarityIndexes.readIvfIndex(spark, path)
    val nCorpus = cells0.count()
    graft.sources.SimilarityIndexes.appendIvf(batch, path, "b1")
    val (cent1, cells1) = graft.sources.SimilarityIndexes.readIvfIndex(spark, path)
    // fit once, assign forever: the append must not move centroids, and
    // the appended rows must equal assigning the batch with the STORED
    // centroids (cell membership of indexed vectors is immutable
    // between re-fits)
    assert(cent1 === cent0, "append must not touch the centroids")
    assert(cells1.count() === nCorpus + batch.count(),
      "nassign = 1: exactly one cell row per appended vector")
    val expect = Similarity.assignCells(batch, cent0, nassign = 1)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toSet
    val got = cells1.join(batch.select($"vec_id"), "vec_id")
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toSet
    assert(got === expect,
      "appended assignments must come from the stored centroids")
    // probing the appended index == one-shot assignment of the full
    // table under the same centroids, and the appended vectors are
    // actually retrievable as neighbors
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("eq"))
    val probed = Similarity.annTopKIvfFromIndex(cent1, cells1, queries)
      .as[(Long, Long, Long)].collect().toSet
    val oneShot = Similarity.annTopKIvfFromIndex(cent0,
        Similarity.assignCells(emb, cent0, nassign = 1), queries)
      .as[(Long, Long, Long)].collect().toSet
    assert(probed === oneShot,
      "probe over the appended index must equal the one-shot assignment")
    val batchIds = batch.select($"vec_id").as[Long].collect().toSet
    assert(probed.exists(r => batchIds(r._2)),
      "appended vectors must surface as neighbors")
    // replayed append (same label) overwrites its own ingest
    graft.sources.SimilarityIndexes.appendIvf(batch, path, "b1")
    assert(spark.read.parquet(s"$path/cells").count() === nCorpus + batch.count(),
      "replayed append must not duplicate cell rows")
    // manifest claims every ingested vector; excluding the append label
    // hides exactly that ingest
    assert(graft.sources.SimilarityIndexes.indexedVecIds(spark, path)
      .as[Long].collect().toSet ===
      emb.select($"vec_id").as[Long].collect().toSet)
    assert(graft.sources.SimilarityIndexes.indexedVecIds(spark, path, Some("b1"))
      .as[Long].collect().toSet ===
      corpus.select($"vec_id").as[Long].collect().toSet)
  }

  test("IVF compaction merges ingests from the index alone, probe-identically") {
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.filter($"vec_id" % 10 < 8)
    val batch = emb.filter($"vec_id" % 10 >= 8)
    val src = "target/similarity_index_spec/ivf_compact_src"
    val dst = "target/similarity_index_spec/ivf_compact_dst"
    graft.sources.SimilarityIndexes.writeIvfIndex(corpus, src, "ivf-compact-spec")
    graft.sources.SimilarityIndexes.appendIvf(batch, src, "b1")
    graft.sources.SimilarityIndexes.compactIvfTo(spark, src, dst)
    val ingests = new java.io.File(s"$dst/cells").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(ingests === Seq(s"ingest=${graft.sources.SimilarityIndexes.BaseLabel}"),
      s"cells must collapse to the single base ingest, got $ingests")
    val (centS, cellsS) = graft.sources.SimilarityIndexes.readIvfIndex(spark, src)
    val (centD, cellsD) = graft.sources.SimilarityIndexes.readIvfIndex(spark, dst)
    assert(centD === centS, "compaction must carry centroids over verbatim")
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("eq"))
    val probeS = Similarity.annTopKIvfFromIndex(centS, cellsS, queries)
      .as[(Long, Long, Long)].collect().toSet
    val probeD = Similarity.annTopKIvfFromIndex(centD, cellsD, queries)
      .as[(Long, Long, Long)].collect().toSet
    assert(probeD === probeS,
      "probing the compacted index must equal probing the appended one")
    assert(graft.sources.SimilarityIndexes.indexedVecIds(spark, dst)
      .as[Long].collect().toSet ===
      graft.sources.SimilarityIndexes.indexedVecIds(spark, src)
      .as[Long].collect().toSet,
      "compaction must carry every manifest claim over")
    intercept[IllegalArgumentException](
      graft.sources.SimilarityIndexes.compactIvfTo(spark, src, src))
  }

  test("trustKey skips the fingerprint scan; first use under a key still fits") {
    import org.apache.spark.sql.functions.{col, lit, raise_error}
    val emb = Tables.embeddings(spark, sf)
    // a frame that EXPLODES if any job ever touches it: trust must
    // resolve entirely through the memo
    val poison = spark.range(5).select(col("id").as("vec_id"),
      raise_error(lit("trustKey must not scan the data"))
        .cast("array<float>").as("embedding"))
    // first use under a fresh key: trust has nothing to resolve through,
    // so the call must FIT (and hence scan) — here the scan detonates,
    // proving trust never serves a fit that doesn't exist
    intercept[Exception] {
      Similarity.fitQuantizer(poison, "trust-spec", 16, trustKey = true)
    }
    val fit = Similarity.fitQuantizer(emb, "trust-spec", 16)
    val trusted = Similarity.fitQuantizer(poison, "trust-spec", 16, trustKey = true)
    assert(trusted === fit,
      "trusted repeat must serve the recorded fit without touching the frame")
    // untrusted calls keep the fingerprint guard: the poisoned frame is
    // scanned and detonates
    intercept[Exception] {
      Similarity.fitQuantizer(poison, "trust-spec", 16)
    }
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

  test("IVF ANN recall >= 0.85 vs brute force; probes bound candidate cells") {
    val brute = Similarity.annTopKBrute(spark, sf)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    val ivf = Similarity.annTopKIvf(spark, sf)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    info(f"IVF ANN recall = $recall%.2f (${ivf.size} returned)")
    assert(recall >= 0.85, f"recall $recall%.2f below bound")
    // and with full probing (nprobe == nlist) IVF must equal brute force:
    // the index only PARTITIONS the space, it never loses vectors
    val full = Similarity.annTopKIvf(spark, sf, nprobe = 16)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    assert(full === brute)
  }

  test("PCA two-stage ANN: recall vs brute at defaults; rerank >= corpus == brute") {
    val brute = Similarity.annTopKBrute(spark, sf)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    val pca = Similarity.annTopKPca(spark, sf)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    val recall = (pca & brute).size.toDouble / brute.size
    // this fixture is the adversarial case for a spectral coarse pass —
    // near-isotropic embeddings (flat spectrum), so the default keeps
    // HALF the dims (32-of-64, measured 0.96 here vs 0.56 at 16) where
    // a real decaying-spectrum corpus runs k' << d
    info(f"PCA(32-of-64) two-stage recall = $recall%.2f (${pca.size} returned)")
    assert(recall >= 0.9, f"recall $recall%.2f below bound")
    // with the shortlist covering the corpus the exact re-rank IS brute
    // force — the coarse representation cannot lose anything (the PQ
    // rerank >= corpus precedent)
    val full = Similarity.annTopKPca(spark, sf, rerank = 1000)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    assert(full === brute,
      "rerank >= corpus must reduce the PCA probe to exact brute force")
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

  /** Oracle-stability guard for q_embed_neardup / q_embed_ann: both
    * surface only ids, but the SELECTION depends on float comparisons
    * (cosine >= 0.45; rank-by-sim). Spark and DuckDB sum the dot product
    * in different orders (~1e-15 ulp noise), so the exact-set oracles are
    * only honest while the DATA keeps a margin around every decision
    * boundary. This asserts that margin at the oracle SFs — if a future
    * fixture ever fails here, downgrade those queries to rows-only.
    */
  test("oracle float margins: |cos−0.45| and ANN rank-5/6 gap >= 1e-6 at sf0.01 and sf0.1") {
    for (sfDir <- Seq(TestSpark.sf001, TestSpark.sf01)) {
      val vs = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
        .as[(Long, Seq[Float])].collect()
        .map { case (id, v) =>
          val d = v.map(_.toDouble).toArray
          val n = math.sqrt(d.map(x => x * x).sum)
          (id, d.map(_ / n))
        }
      def c(a: Array[Double], b: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i) * b(i); i += 1 }
        s
      }
      var minMargin = Double.MaxValue
      for (i <- vs.indices; j <- i + 1 until vs.length)
        minMargin = math.min(minMargin, math.abs(c(vs(i)._2, vs(j)._2) - 0.45))
      val minGap = vs.filter(_._1 < 10).map { case (q, qv) =>
        val sims = vs.filter(_._1 != q).map(v => c(qv, v._2)).sortBy(x => -x)
        sims(4) - sims(5) // gap between last kept (rank 5) and first dropped
      }.min
      info(f"$sfDir: threshold margin $minMargin%.2e, rank-boundary gap $minGap%.2e")
      assert(minMargin > 1e-6, f"$sfDir: pair within $minMargin%.2e of 0.45 — oracle flaky")
      assert(minGap > 1e-6, f"$sfDir: ANN rank boundary gap $minGap%.2e — oracle flaky")
    }
  }

  test("LSH ANN hot-bucket cap: default cap is a no-op on the fixture (recall unchanged)") {
    // sf0.001 buckets run ~n/4 ≈ 125 rows — far under the 10000 default,
    // so the capped plan must return EXACTLY the uncapped result
    val capped = Similarity.annTopKLsh(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    val uncapped = Similarity.annTopKLsh(spark, sf, maxBucket = Int.MaxValue)
      .as[(Long, Long, Long)].collect().toSet
    assert(capped === uncapped)
  }

  test("LSH ANN hot-bucket cap bounds a planted all-identical cluster") {
    // plant 500 exact copies of query 0's vector: identical vectors have
    // identical sketches, so ONE (table, pattern) key per table carries
    // the whole cluster — the viral-near-dup shape that makes a bucket
    // join quadratic at scale. Fixture buckets are ~125 rows; the hot
    // buckets are ~125 + 500. A cap of 300 keeps every normal bucket and
    // drops exactly the hot ones.
    val base = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    val v0 = base.find(_._1 == 0L).get._2
    val clones = (0 until 500).map(i => (100000L + i, v0))
    val emb = spark.createDataset(base.toSeq ++ clones)
      .toDF("vec_id", "embedding")

    val uncapped = Similarity.annTopKLshOn(emb, maxBucket = Int.MaxValue)
      .as[(Long, Long, Long)].collect()
    // sanity: without the cap, query 0's neighbors ARE the clones (cos 1.0)
    assert(uncapped.filter(_._1 == 0L).map(_._2).forall(_ >= 100000L))

    val capped = Similarity.annTopKLshOn(emb, maxBucket = 300)
      .as[(Long, Long, Long)].collect()
    // every hot-bucket member is gone from candidate generation: no clone
    // ever surfaces as a neighbor, for any query
    assert(!capped.exists(_._2 >= 100000L),
      "clone ids must be dropped from the capped candidate set")
    // queries whose own probe keys aren't all-hot still return full top-5
    val byQuery = capped.groupBy(_._1)
    assert((1L to 9L).forall(q => byQuery.get(q).exists(_.length == 5)),
      s"non-hot queries must keep full results, got ${byQuery.view.mapValues(_.length).toMap}")
  }

  test("LSH ANN ranks are contiguous from 1 per query") {
    val byQuery = Similarity.annTopKLsh(spark, sf)
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    byQuery.values.foreach { rs =>
      assert(rs.map(_._3).sorted.toSeq === (1 to rs.length))
    }
  }
}
