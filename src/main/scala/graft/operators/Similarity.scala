package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.CosineSimilarity.cosineSim

/** Similarity search over the `embeddings` table (64-dim float vectors —
  * /root/repo/FIXTURES.md §2).
  *
  * Two paths, per the north star:
  *   - brute-force cosine (the exactness baseline; O(n·q) dot products);
  *   - random-hyperplane LSH (the 100 TB path: bucket join on sketch keys
  *     prunes the candidate set, then exact re-scoring — approximate by
  *     construction, recall measured in SimilaritySpec).
  *
  * Scoring uses the native codegen expression
  * [[graft.functions.CosineSimilarity]] directly on the raw float arrays —
  * one fused loop per pair, no intermediate normalized vectors. The
  * composed-builtins spelling ([[Similarity.dot]] over [[unitVec]]) is
  * kept as the reference implementation; SimilaritySpec asserts both agree.
  */
object Similarity {

  /** embedding (float array) → unit-normalized double array.
    * Composed-builtins path (higher-order functions, no UDF).
    */
  def unitVec(emb: Column): Column = {
    val d = transform(emb, x => x.cast("double"))
    val nrm = sqrt(aggregate(d, lit(0.0), (acc, x) => acc + x * x))
    transform(d, x => x / nrm)
  }

  /** Dot product via zip_with/aggregate — composed-builtins path. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine for RANKING: an all-zero vector has no direction, its
    * cosine is NaN (0/0 norms), and Spark orders NaN as LARGEST — so a
    * degenerate zero vector would top every shortlist and carry NaN
    * into the exact re-rank, displacing real neighbors. nanvl pins the
    * NaN to -2.0 (strictly below any real cosine), so zero vectors sink
    * to the bottom of every ranking instead (r13 ADVICE). Threshold
    * FILTERS (cosine >= t) need no guard — NaN compares false there.
    */
  private def rankSim(a: Column, b: Column): Column =
    nanvl(cosineSim(a, b), lit(-2.0))

  /** Embedding near-dup: all pairs with cosine >= `threshold`, computed
    * EXACTLY via blocked pair enumeration.
    *
    * Why not LSH here: this fixture's qualifying pairs sit barely above
    * the random background (sims 0.450–0.60 vs ~0.45 for the closest
    * non-pair — measured), and hyperplane collision probability at cosine
    * 0.45 is 0.648 vs 0.500 for orthogonal vectors; no (tables, bits)
    * amplification separates those at full recall without the candidate
    * set degenerating to all pairs. Exact all-pairs at such a threshold is
    * intrinsically quadratic — the scalable question is HOW the quadratic
    * work is laid out, and a driver-planned cartesian
    * (BroadcastNestedLoopJoin) is the wrong answer: one unsplittable task
    * per partition pair with the whole right side broadcast.
    *
    * Blocked layout instead: vectors hash into `blocks` buckets; the
    * B(B+1)/2 unordered bucket pairs become join keys, so the pair space
    * shards into balanced, partition-local nested loops behind a plain
    * equi-join (shuffle on pid, no cartesian operator, spill-safe, AQE
    * can split skewed groups). Each vector is replicated ~B times; pick
    * blocks ≈ sqrt(2 × parallelism) at scale. The per-pair score is the
    * fused codegen [[graft.functions.CosineSimilarity]].
    *
    * Output is ids only (ints): float scores never surface, and the data
    * margin around the threshold (≥1e-3 at every SF, vs ~1e-15 float
    * noise) keeps the exact-set oracle stable across engines.
    */
  def cosineNearDupPairs(spark: SparkSession, sfDir: String,
                         threshold: Double = 0.45, blocks: Int = 8): DataFrame =
    blockedPairs(spark,
      Tables.embeddings(spark, sfDir).select(col("vec_id").as("id"), col("embedding").as("v")),
      blocks)
      .filter(cosineSim(col("va"), col("vb")) >= threshold)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))

  /** Blocked all-pairs enumeration over a (id, v) DataFrame: every
    * unordered row pair appears EXACTLY once in the output
    * (id_a, va, id_b, vb), behind a plain equi-join on block-pair ids —
    * never a cartesian/BroadcastNestedLoopJoin. Rows hash into `blocks`
    * buckets; the B(B+1)/2 bucket pairs become join keys, giving
    * balanced partition-local nested loops that spill and AQE-split.
    * Replication factor ≈ B per side; pick blocks ≈ sqrt(2·parallelism).
    */
  def blockedPairs(spark: SparkSession, df: DataFrame, blocks: Int): DataFrame = {
    import spark.implicits._
    val v = df.withColumn("blk", pmod(hash(col("id")), lit(blocks)))
    val bp = (for { i <- 0 until blocks; j <- i until blocks } yield (i, j))
      .toDF("bi", "bj")
      .select(col("bi"), col("bj"), (col("bi") * blocks + col("bj")).as("pid"),
        (col("bi") === col("bj")).as("diag"))
    val a = v.join(broadcast(bp), col("blk") === col("bi"))
      .select(col("pid"), col("diag"), col("id").as("id_a"), col("v").as("va"))
    val b = v.join(broadcast(bp.drop("diag")), col("blk") === col("bj"))
      .select(col("pid"), col("id").as("id_b"), col("v").as("vb"))
    a.join(b, "pid")
      // diagonal blocks see each unordered pair twice — keep one;
      // off-diagonal blocks see it once (block of a = bi, block of b = bj)
      .filter(!col("diag") || col("id_a") < col("id_b"))
      .select(col("id_a"), col("va"), col("id_b"), col("vb"))
  }

  /** Salted two-phase per-query top-n — the topOrdersPerCustomerSkewSafe
    * spelling applied to every ANN ranking stage (r14 verdict #4). A
    * plain `Window.partitionBy(query_id)` over a coarse-scored corpus
    * puts one query's ENTIRE candidate set (corpus-sized for the
    * flat-scan probes) into a single task's sort — the one
    * non-distributed stage in otherwise scan-shaped plans. Phase 1
    * ranks within (query_id, salt) — a hash of the row's own
    * neighbor_id, deterministic, no RNG — and keeps each salt's top n,
    * so the candidate sort spreads across `salts` tasks; phase 2
    * re-ranks the ≤ n·salts survivors per query, a BOUNDED partition.
    * Identical output to the plain window: every true global top-n row
    * is in its salt's top n, and every row globally above it also
    * survives phase 1, so phase 2 reproduces exact global ranks
    * (equivalence proven in SimilaritySpec on skewed + tied data and
    * by every stored==inline / degrades-to-brute pin rerunning over
    * this spelling). `ord` must totally order rows (sim desc,
    * neighbor_id asc everywhere here) or neither spelling is
    * deterministic.
    */
  /** `extraPart` prepends partition columns to BOTH windows — the
    * step-exploded curve pipelines rank every ladder step in ONE pair
    * of windows by partitioning on (step, query_id); per-partition
    * semantics (and thus results) are identical to running the plain
    * spelling once per step.
    */
  private[graft] def saltedTopPerQuery(scored: DataFrame, ord: Seq[Column],
                                       n: Int, rankCol: String,
                                       salts: Int = 8,
                                       extraPart: Seq[Column] = Nil): DataFrame = {
    val parts = extraPart :+ col("query_id")
    val w1 = Window.partitionBy(parts :+ col("__graft_salt"): _*).orderBy(ord: _*)
    val w2 = Window.partitionBy(parts: _*).orderBy(ord: _*)
    scored
      .withColumn("__graft_salt", pmod(hash(col("neighbor_id")), lit(salts)))
      .withColumn("__graft_r1", row_number().over(w1))
      .filter(col("__graft_r1") <= n)
      .withColumn(rankCol, row_number().over(w2))
      .filter(col(rankCol) <= n)
      .drop("__graft_salt", "__graft_r1")
  }

  /** The coarse-pass shortlist shared by the SQ8/PCA/PQ/IVF-* probes:
    * keep `rerank` candidates per query by approximate score, salted
    * ([[saltedTopPerQuery]]) so no task ever sorts a corpus-sized
    * candidate set. Input must carry (query_id, eq, neighbor_id, qsim).
    */
  private def coarseShortlist(scored: DataFrame, rerank: Int): DataFrame =
    saltedTopPerQuery(scored,
      Seq(col("qsim").desc, col("neighbor_id").asc), rerank, "arank")
      .select(col("query_id"), col("eq"), col("neighbor_id"))

  /** Brute-force cosine top-k: for each query vector (vec_id < nQueries),
    * the k nearest other vectors. Deterministic tie-break by neighbor id.
    * Plan: broadcast the (tiny) query side, score all candidates in one
    * codegen'd pass, per-query top-k via the salted two-phase window
    * ([[saltedTopPerQuery]] — no corpus-sized single-task sort).
    */
  def annTopKBrute(spark: SparkSession, sfDir: String,
                   nQueries: Int = 10, k: Int = 5): DataFrame = {
    val v = Tables.embeddings(spark, sfDir)
    bruteTopKOn(v, broadcast(v.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"))), k)
  }

  /** [[annTopKBrute]] over any (vec_id, embedding) / (query_id, eq)
    * frames — the exact ground truth the recall-curve measurements
    * score against (caller broadcasts the query side).
    */
  private[graft] def bruteTopKOn(vectors: DataFrame, queries: DataFrame,
                                 k: Int): DataFrame = {
    val scored = vectors.join(queries, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        rankSim(col("eq"), col("embedding")).as("sim"))
    saltedTopPerQuery(scored,
      Seq(col("sim").desc, col("neighbor_id").asc), k, "rank")
      // BIGINT rank to match DuckDB's ROW_NUMBER() output type
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }

  /** INT8 SCALAR QUANTIZATION (SQ8) of an embedding frame — the
    * FAISS-style storage trade for vector search at corpus scale: each
    * float component maps to one signed byte under a per-vector
    * max-abs scale, so the search artifact shrinks ~4× (64 bytes vs
    * 256 per 64-dim vector) and the coarse-scoring scan reads a
    * quarter of the bytes. Output: (vec_id, maxabs, codes) with
    * `codes[i] = round(v[i] / maxabs · 127)` ∈ [-127, 127]; an
    * all-zero vector quantizes to all-zero codes. Pure per-row
    * projection, two codegen'd HOF passes (max-abs fold, transform).
    * A `cell` column (the IVF-SQ composition feeds an assigned frame)
    * rides through; anything else is dropped — the quantized artifact
    * stays payload-free.
    */
  // native SQ8 kernels (r21, guide §4): the composed spelling — an
  // `aggregate` max-abs fold (seed 0.0, greatest(acc, abs(x))) plus a
  // `when(maxabs = 0, transform(_ => 0)).otherwise(transform(x =>
  // round(x / maxabs * 127) cast int cast tinyint))` code pass — ran
  // two interpreted HOFs per corpus row; graft.functions.Sq8 fuses each
  // into one whole-stage-codegen loop with bit-identical arithmetic
  // (SimilaritySpec pins maxabs + codes equality against the composed
  // spelling, which also certifies the stored fixture code tables)
  def quantizeSq8On(emb: DataFrame): DataFrame = {
    val keep = Seq(col("vec_id")) ++
      (if (emb.columns.contains("cell")) Seq(col("cell")) else Nil)
    emb
      .withColumn("maxabs", graft.functions.Sq8.sq8MaxAbs(col("embedding")))
      .withColumn("codes", graft.functions.Sq8.sq8Codes(col("embedding")))
      .select(keep ++ Seq(col("maxabs"), col("codes")): _*)
  }

  /** Approximate cosine of a float query against SQ8 codes: the codes
    * reconstruct to `codes · maxabs/127` component-wise and score
    * through the same fused cosine kernel — reconstruction error is
    * ≤ maxabs/254 per component (half a quantization step), which
    * perturbs cosines by O(1/127); the exact re-rank below absorbs it.
    * Cosine is SCALE-INVARIANT, so the per-vector maxabs/127 factor
    * cancels entirely — the codes score raw, no reconstruction
    * multiply in the hot loop.
    */
  // codes score through the byte-array overload of the fused cosine
  // kernel directly (r20): the cast-to-float `transform` was an
  // interpreted HOF per candidate row, and byte → float → double equals
  // byte → double exactly, so scores are bit-identical
  private def sq8Sim(eq: Column, codes: Column): Column =
    rankSim(eq, codes)

  /** ANN top-k over the SQ8-quantized corpus with EXACT re-rank — the
    * two-stage retrieval every production vector store runs: (1) the
    * coarse pass scores ALL candidates on int8 codes (the 4×-smaller
    * scan — at 100 TB this is the I/O win; compose with the IVF cell
    * join to also prune candidates) and keeps `rerank` per query;
    * (2) the exact pass re-scores ONLY those candidates on the float
    * vectors — candidate-sized point-lookup I/O — and emits the final
    * top `k` by exact cosine (deterministic neighbor-id tie-break, the
    * [[annTopKBrute]] contract). Engine-specific float path →
    * rows-only driver check; SimilaritySpec asserts recall ≥ 0.9
    * against the exact oracle (measured 1.0 on the fixture: 8-bit
    * error is far below the fixture's neighbor margins at rerank=4k).
    */
  def annTopKSq(spark: SparkSession, sfDir: String,
                nQueries: Int = 10, k: Int = 5,
                rerank: Int = 20): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    annTopKSqOn(emb, broadcast(emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"))),
      k, rerank)
  }

  /** [[annTopKSq]] over any (vec_id, embedding) frame and (query_id,
    * eq) query frame.
    */
  def annTopKSqOn(emb: DataFrame, queries: DataFrame,
                  k: Int, rerank: Int): DataFrame =
    sqProbe(quantizeSq8On(emb),
      emb.select(col("vec_id"), col("embedding")), queries, k, rerank)

  /** [[annTopKSq]] probing a PREBUILT (codes, vectors) pair — the
    * production path where the corpus was quantized ONCE at ingest
    * ([[graft.sources.SimilarityIndexes]] is the parquet spelling) and
    * every query session reads the 4×-smaller code table for the
    * coarse pass; the probe arithmetic is the shared [[sqProbe]], so
    * stored and inline results cannot fork.
    */
  def annTopKSqFromIndex(codes: DataFrame, vectors: DataFrame,
                         queries: DataFrame, k: Int = 5,
                         rerank: Int = 20): DataFrame =
    sqProbe(codes, vectors, queries, k, rerank)

  /** The SQ8 probe shared by [[annTopKSqOn]] and [[annTopKSqFromIndex]]:
    * coarse int8 pass over `codes` keeps `rerank` per query, exact
    * float re-rank joins only the shortlist back to `vectors`.
    */
  private def sqProbe(codes: DataFrame, vectors: DataFrame,
                      queries: DataFrame, k: Int, rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    val shortlist = coarseShortlist(codes.join(broadcast(queries),
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("eq"), col("vec_id").as("neighbor_id"),
        sq8Sim(col("eq"), col("codes")).as("qsim")), rerank)
    exactRerank(shortlist, vectors, k)
  }

  /** The exact full-float re-rank every two-stage probe ends with: join
    * only the (query_id, eq, neighbor_id) shortlist back to the stored
    * vectors, rank by true cosine. Shared by the SQ8 and PCA probes so
    * the final stage cannot fork between coarse representations.
    * PLAIN window, not [[saltedTopPerQuery]]: the input is bounded to
    * ≤ rerank rows per query by [[coarseShortlist]] CONSTRUCTION, so
    * no task ever sorts more than the shortlist — salting here would
    * add a hash + extra window + exchange for zero scale benefit
    * (measured ~1.6× on the stored IVF/LSH probes when it was salted).
    */
  private def exactRerank(shortlist: DataFrame, vectors: DataFrame,
                          k: Int, extraPart: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(extraPart :+ col("query_id"): _*)
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    shortlist
      .join(vectors.select(col("vec_id").as("neighbor_id"), col("embedding")),
        Seq("neighbor_id"))
      .select(extraPart ++ Seq(col("query_id"), col("neighbor_id"),
        rankSim(col("eq"), col("embedding")).as("sim")): _*)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(extraPart ++ Seq(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank")): _*)
  }

  /** PCA two-stage ANN (the FAISS `PCAR<k'>,...` pre-transform shape):
    * the coarse pass ranks by cosine in a k'-dimensional PCA space —
    * a d/k'-fold cut in bytes-scanned-per-vector, TUNABLE where SQ8's
    * 4× is fixed — and the exact full-dimension re-rank absorbs the
    * projection error. The basis is the top-k' eigenvectors of the raw
    * SECOND-MOMENT matrix ([[Pca.fitPcaOn]] `center = false`): the
    * best rank-k' approximation of the corpus Gram matrix, i.e. the
    * projection that preserves dot products — centering would preserve
    * distances-from-mean instead, the wrong invariant for cosine
    * retrieval. With rerank >= corpus the result EQUALS brute force
    * (the PQ precedent, spec-pinned); recall at the default shortlist
    * is spec-asserted. Default k' = 32 (a 2× cut): this FIXTURE's
    * embeddings are near-isotropic (flat spectrum — measured: 16 of 64
    * components rank at 0.56 recall where 32 reach 0.96), the
    * adversarial case for any spectral method; real embedding corpora
    * have fast-decaying spectra where k' ≪ d holds the recall, which
    * is why the pre-transform exists. Scale: the reduced table is the
    * only corpus-sized artifact the coarse pass reads.
    */
  def annTopKPca(spark: SparkSession, sfDir: String,
                 nQueries: Int = 10, k: Int = 5, rerank: Int = 40,
                 pcaDim: Int = 32): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val (_, basis) = fitGramMomentsBasis(emb, sfDir, dim = 64, k = pcaDim)
    pcaProbe(projectWithBasis(emb, basis).select(col("vec_id"), col("pc")),
      emb.select(col("vec_id"), col("embedding")),
      broadcast(emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("eq"))),
      basis, k, rerank)
  }

  /** [[annTopKPca]] over any (vec_id, embedding) / (query_id, eq)
    * frames — unmemoized fresh fit (spec/smoke frames carry no stable
    * cache key). */
  def annTopKPcaOn(emb: DataFrame, queries: DataFrame, dim: Int,
                   pcaDim: Int, k: Int, rerank: Int): DataFrame = {
    val basis = Pca.fitPcaOn(emb, dim, pcaDim, center = false)
      .components.map(_.toSeq).toSeq
    pcaProbe(projectWithBasis(emb, basis).select(col("vec_id"), col("pc")),
      emb.select(col("vec_id"), col("embedding")), queries, basis, k, rerank)
  }

  /** [[annTopKPca]] probing a PREBUILT (basis, reduced, vectors) index
    * ([[graft.sources.SimilarityIndexes.writePcaIndex]] is the parquet
    * spelling — the FAISS `PCAR` pre-transform as a stored family): the
    * coarse pass scans the materialized REDUCED table (dim/k' of the
    * float bytes), queries project under the STORED basis, and the
    * exact re-rank joins back to the stored full-dimension vectors.
    * Shared probe arithmetic — stored and inline results cannot fork.
    */
  def annTopKPcaFromIndex(basis: Seq[Seq[Double]], reduced: DataFrame,
                          vectors: DataFrame, queries: DataFrame,
                          k: Int = 5, rerank: Int = 40): DataFrame =
    pcaProbe(reduced, vectors, queries, basis, k, rerank)

  /** The PCA probe shared by the inline and stored entries: queries
    * reduce under the SAME basis as the corpus, the coarse pass ranks
    * by reduced-space cosine, the exact full-dimension re-rank absorbs
    * the projection error.
    */
  private def pcaProbe(reduced: DataFrame, vectors: DataFrame,
                       queries: DataFrame, basis: Seq[Seq[Double]],
                       k: Int, rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    val qReduced = projectWithBasis(queries, basis, vecCol = "eq", outCol = "qpc")
    val shortlist = coarseShortlist(reduced.join(broadcast(qReduced),
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("eq"), col("vec_id").as("neighbor_id"),
        rankSim(col("qpc"), col("pc")).as("qsim")), rerank)
    exactRerank(shortlist, vectors, k)
  }

  /** Project a frame onto a bare (mean-free) basis — the serving-side
    * spelling shared by the probes and the stored index writer: the
    * Gram basis is fit `center = false`, so projection is plain dot
    * products ([[Pca.projectOn]] under a zero mean). */
  private[graft] def projectWithBasis(df: DataFrame, basis: Seq[Seq[Double]],
                                      vecCol: String = "embedding",
                                      outCol: String = "pc"): DataFrame = {
    val dim = basis.head.length
    Pca.projectOn(df, Pca.PcaModel(0L, Array.fill(dim)(0.0),
      basis.map(_.toArray).toArray, Array.fill(basis.length)(0.0)),
      vecCol, outCol)
  }

  /** Memoized PCA Gram fits — the [[quantizers]]/[[pqBooks]] contract
    * for the PCA pre-transform: ONE moments pass per (key, dim, k, data
    * fingerprint), returning BOTH the raw moment vector (the mergeable
    * sufficient statistics the stored artifact commits —
    * [[graft.sources.SimilarityIndexes.writePcaIndex]]) and the top-k
    * basis of the raw second-moment matrix E[xxᵀ] (dot-product-
    * preserving — the cosine-retrieval invariant; see [[annTopKPca]]'s
    * scaladoc for why NOT the covariance). Deterministic given the
    * moments, so the memo never changes a result; within one process
    * the index write and the inline probe share the IDENTICAL basis.
    */
  private val pcaFits = scala.collection.concurrent.TrieMap
    .empty[(String, Int, Int, Long, Long, Long),
      (Long, (Seq[Double], Seq[Seq[Double]]))]
  private val pcaFitSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Memo bound: the memo only exists for in-process stored==inline
    * exactness (a handful of fixture frames per JVM), so cap it — a
    * long-lived service fitting many corpora must not grow it without
    * bound. Eviction drops the single OLDEST entry (insertion seq in
    * the value), never the whole map: a full clear could evict a fit
    * between an index write and its inline probe, resting the
    * "stored == inline identical basis" guarantee on re-fit float
    * bit-determinism instead of on the memo (r16 ADVICE).
    */
  private val pcaFitsCap = 64

  /** Order-insensitive content fingerprint shared by every fit memo
    * ([[pcaFits]], [[quantizers]], [[pqBooks]]): (count, xor, sum mod
    * 2^64) of per-row hashes. bit_xor alone cancels on rows repeated an
    * even number of times; the exact 2^64-modular SUM (decimal
    * accumulator — a plain long sum of 64-bit hashes would throw under
    * ANSI mode) breaks that — a collision now needs equal count AND
    * equal xor AND equal modular sum. One aggregate scan per fit
    * request, orders of magnitude cheaper than the fit it guards.
    */
  private def contentFingerprint(emb: DataFrame): (Long, Long, Long) = {
    val fpRow = emb.agg(
      count(lit(1)).as("n"),
      coalesce(expr("bit_xor(xxhash64(vec_id, embedding))"), lit(0L)).as("hx"),
      coalesce(sum(expr("xxhash64(vec_id, embedding)").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("hs")).head()
    (fpRow.getLong(0), fpRow.getLong(1),
      fpRow.getDecimal(2).toBigInteger.longValue())
  }

  private[graft] def fitGramMomentsBasis(emb: DataFrame, key: String, dim: Int,
                                         k: Int): (Seq[Double], Seq[Seq[Double]]) = {
    val (nFp, xorFp, sumFp) = contentFingerprint(emb)
    if (pcaFits.size >= pcaFitsCap)
      pcaFits.minByOption(_._2._1).foreach { case (oldest, _) => pcaFits.remove(oldest) }
    pcaFits.getOrElseUpdate((key, dim, k, nFp, xorFp, sumFp), {
      val m = Pca.momentsOn(emb, dim)
      val (_, gram) = Pca.gramFromMoments(m, dim)
      val (_, vecs) = Pca.jacobiEigen(gram)
      (pcaFitSeq.incrementAndGet(), (m.toSeq, vecs.take(k).map(_.toSeq).toSeq))
    })._2
  }

  /** MEASURED k′ → recall curve for the PCA two-stage probe — the
    * [[ivfRecallCurve]] contract applied to the PCA family's serving
    * knob (r16 verdict #3): on THIS near-isotropic fixture recall
    * cliffs from ~0.96 at k′ = 32 to ~0.56 at 16, exactly where an
    * operator needs the measured answer, not the guess. For each
    * requested k′, one row (kprime, hits, scanned, n_truth, n_queries,
    * n_corpus, recall_ppm, scan_ppm, byte_ppm): `hits` counts probe
    * results that are true exact top-k neighbors (ground truth =
    * [[bruteTopKOn]] over the SAME query sample — one corpus scan,
    * paid once), `scanned` the candidate rows the coarse pass scores
    * (measured ONCE — PCA prunes BYTES, not candidates, so the count
    * is step-independent and scan_ppm reads 10^6 at every k′: the
    * honest contrast with IVF/LSH), and `byte_ppm` = k′·10^6 DIV dim
    * is the coarse pass's float-byte share — the axis this knob
    * actually trades against recall.
    *
    * ONE fit at k′ = dim serves the whole ladder: eigenbases are
    * NESTED (the k′-basis is the first k′ rows of the full one), so
    * the corpus projects ONCE at full width and each step slices the
    * prefix — slicing a full projection IS projecting under the
    * prefix basis (component dot products are independent), so each
    * step measures exactly [[annTopKPcaFromIndex]] at that k′.
    * Recall is NOT monotone by construction here (unlike the
    * fan-out/rerank ladders, shrinking k′ changes the geometry rather
    * than subsetting candidates) — but the k′ = dim endpoint is
    * exact: a full orthonormal rotation preserves cosine ranking, so
    * the shortlist contains the true top-k and recall_ppm = 10^6
    * (spec-pinned). Rows-only driver check (float path); the
    * invariants are the spec's.
    */
  def pcaRecallCurve(spark: SparkSession, sfDir: String,
                     nQueries: Int = 10, k: Int = 5, rerank: Int = 40,
                     kprimes: Seq[Int] = Seq(8, 16, 32, 64),
                     dim: Int = 64): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val (_, basis) = fitGramMomentsBasis(emb, sfDir, dim, dim)
    pcaCurveCore(basis,
      projectWithBasis(emb, basis).select(col("vec_id"), col("pc")),
      emb.select(col("vec_id"), col("embedding")),
      emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("eq")),
      k, rerank, kprimes)
  }

  /** [[pcaRecallCurve]] over a PREBUILT (basis, reduced, vectors)
    * index ([[graft.sources.SimilarityIndexes.readPcaIndex]]) — tune
    * the width you actually SERVE: the ladder slices prefixes of the
    * STORED basis and the STORED reduced table, so k′ steps are
    * bounded by the index's own width (a 32-wide index can answer
    * k′ ≤ 32; re-fit to widen). The k′ = dim exactness endpoint only
    * exists when the stored basis IS full-rank — a truncated index's
    * top ladder step reports its real (lossy) recall instead.
    */
  def pcaRecallCurveFromIndex(basis: Seq[Seq[Double]], reduced: DataFrame,
                              vectors: DataFrame, queries: DataFrame,
                              k: Int = 5, rerank: Int = 40,
                              kprimes: Seq[Int] = Seq(8, 16, 32)): DataFrame =
    pcaCurveCore(basis, reduced, vectors, queries, k, rerank, kprimes)

  /** The measurement shared by [[pcaRecallCurve]] and
    * [[pcaRecallCurveFromIndex]]. Memory contract as
    * [[ivfRecallCurve]]'s core: the full-width reduced corpus persists
    * for the ladder; sample the corpus side too at extreme scale.
    */
  private def pcaCurveCore(basis: Seq[Seq[Double]], reduced0: DataFrame,
                           vectors0: DataFrame, queries0: DataFrame,
                           k: Int, rerank: Int, kprimes: Seq[Int]): DataFrame = {
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    require(kprimes.nonEmpty, "recall curve needs at least one kprime")
    kprimes.foreach(kp => require(kp >= 1 && kp <= basis.length,
      s"kprime=$kp must be in [1, basis width=${basis.length}]"))
    val queries = broadcast(requireQuerySample(queries0))
    val spark = queries0.sparkSession
    import spark.implicits._
    val steps = kprimes.distinct.sorted
    val stepsDf = steps.toDF("step")
    val dim = basis.head.length
    val vectors = graft.CacheScope.track(vectors0.persist())
    val reduced = graft.CacheScope.track(reduced0.persist())
    val truth = graft.CacheScope.track(
      bruteTopKOn(vectors, queries, k)
        .select(col("query_id"), col("neighbor_id")).persist())
    // ONE corpus join serves the whole ladder: queries project ONCE at
    // the widest requested k′ and each step's coarse similarity is the
    // PREFIX slice of both sides — slicing a projection IS projecting
    // under the prefix basis (component dot products are independent,
    // the nested-eigenbasis property this curve's scaladoc pins), so
    // each step scores exactly [[pcaProbe]] at that k′ while the
    // reduced corpus is read once, not once per step. The per-step
    // shortlists and exact re-ranks run as ONE window pipeline
    // partitioned by (step, query) — identical per-partition semantics.
    val qReduced = projectWithBasis(queries, basis.take(steps.max),
      vecCol = "eq", outCol = "qpc")
    val stepped = reduced
      .join(broadcast(qReduced), col("vec_id") =!= col("query_id"))
      .withColumn("step", explode(typedlit(steps)))
      .select(col("step"), col("query_id"), col("eq"),
        col("vec_id").as("neighbor_id"),
        rankSim(slice(col("qpc"), lit(1), col("step")),
          slice(col("pc"), lit(1), col("step"))).as("qsim"))
    val shortlist = saltedTopPerQuery(stepped,
        Seq(col("qsim").desc, col("neighbor_id").asc), rerank, "arank",
        extraPart = Seq(col("step")))
      .select(col("step"), col("query_id"), col("eq"), col("neighbor_id"))
    val hits = exactRerank(shortlist, vectors, k, extraPart = Seq(col("step")))
      .join(truth, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("step")).agg(count(lit(1)).as("hits"))
    // step-independent candidate count, measured once: the coarse pass
    // scores every (query, other-vector) pair regardless of k′
    val scannedF = broadcast(reduced.select(col("vec_id"))
      .join(broadcast(queries.select(col("query_id"))),
        col("vec_id") =!= col("query_id"))
      .agg(count(lit(1)).as("scanned")))
    val perStep = stepsDf.join(hits, Seq("step"), "left")
      .crossJoin(scannedF)
      .select(col("step").as("kprime"),
        coalesce(col("hits"), lit(0L)).as("hits"), col("scanned"))
    ladderPpm(perStep, "kprime", truth, vectors)
      .withColumn("byte_ppm", expr(s"kprime * 1000000 DIV $dim"))
  }

  /** IVF-SQ8 — the two prunings COMPOSED, FAISS's `IVF<nlist>,SQ8`
    * factory index re-expressed as Spark joins: IVF cell probing cuts
    * WHICH vectors the coarse pass scans (nprobe/nlist of the corpus)
    * while SQ8 cuts HOW MANY BYTES each scanned vector costs (int8
    * codes, ~4× smaller), and the exact float re-rank touches only the
    * `rerank`-per-query shortlist. At 100 TB this is the production
    * serving shape: the quantized inverted lists are the only
    * corpus-sized artifact a query reads.
    *
    * kmeans-seeded cells make outputs engine-specific → rows-only
    * driver check; SimilaritySpec pins the semantics: with
    * nprobe = nlist the result is EXACTLY [[annTopKSqOn]] (cell pruning
    * off ⇒ pure SQ8 two-stage), and at the default nprobe recall vs the
    * exact oracle is asserted ≥ the IVF bound.
    */
  def annTopKIvfSq(spark: SparkSession, sfDir: String,
                   nQueries: Int = 10, k: Int = 5,
                   nlist: Int = 16, nprobe: Int = 12, rerank: Int = 20,
                   trustKey: Boolean = false): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = fitQuantizer(emb, sfDir, nlist, trustKey)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
    ivfSqProbe(centroids, quantizeSq8On(assignCells(emb, centroids, nassign = 1)),
      emb.select(col("vec_id"), col("embedding")), queries, k, nprobe, rerank)
  }

  /** [[annTopKIvfSq]] probing a PREBUILT index — `codes` carries
    * (vec_id, cell, maxabs, codes) quantized inverted lists
    * ([[graft.sources.SimilarityIndexes.writeIvfSqIndex]] is the parquet
    * spelling, PARTITIONED BY cell so the coarse pass reads only the
    * probed cells' files), `vectors` the exact re-rank side. The probe
    * arithmetic is the shared [[ivfSqProbe]], so stored and inline
    * results cannot fork.
    */
  def annTopKIvfSqFromIndex(centroids: Seq[Seq[Double]], codes: DataFrame,
                            vectors: DataFrame, queries: DataFrame,
                            k: Int = 5, nprobe: Int = 12,
                            rerank: Int = 20): DataFrame =
    ivfSqProbe(centroids, codes, vectors, queries, k, nprobe, rerank)

  /** The IVF-SQ8 probe shared by [[annTopKIvfSq]] and
    * [[annTopKIvfSqFromIndex]]: queries rank the centroid literals and
    * keep their `nprobe` nearest cells ([[ivfProbe]]'s fan-out), the
    * coarse int8 pass scans ONLY those cells' codes behind a BROADCAST
    * equi-join on cell id — the corpus side never shuffles, and against
    * the cell-partitioned stored layout the join prunes to
    * nprobe/nlist of the files — and the exact float re-rank joins the
    * per-query shortlist back to `vectors` ([[sqProbe]]'s second
    * stage). Cells are nassign = 1 (the ANN layout), so no candidate
    * dedup agg is needed: a vector appears in at most one probed cell.
    */
  private def ivfSqProbe(centroids: Seq[Seq[Double]], codes: DataFrame,
                         vectors: DataFrame, queries: DataFrame,
                         k: Int, nprobe: Int, rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    val probes = queries.select(col("query_id"), col("eq"),
      posexplode(graft.functions.CellSims.cellSims(col("eq"), centroids))
        .as(Seq("cell", "csim")))
    val wP = Window.partitionBy(col("query_id")).orderBy(col("csim").desc, col("cell").asc)
    val probeCells = probes.withColumn("pr", row_number().over(wP))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("eq"), col("cell"))
    val shortlist = coarseShortlist(codes.join(broadcast(probeCells), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("eq"), col("vec_id").as("neighbor_id"),
        sq8Sim(col("eq"), col("codes")).as("qsim")), rerank)
    exactRerank(shortlist, vectors, k)
  }

  /** Deterministic random hyperplanes: L tables × r planes, 64-dim each,
    * generated from a fixed seed on the driver and embedded as literals.
    */
  private def planes(nTables: Int, bitsPerTable: Int, dim: Int): Seq[Seq[Seq[Double]]] = {
    val rng = new scala.util.Random(42)
    Seq.fill(nTables)(Seq.fill(bitsPerTable)(Seq.fill(dim)(rng.nextGaussian())))
  }

  /** LSH sketch keys for one vector: one key per table, key = the r sign
    * bits of the vector against that table's hyperplanes. sign(dot) ==
    * sign(cosine), so the norm-free native [[graft.functions.DotProduct]]
    * scores raw float arrays against double-literal planes directly —
    * cosine's two norm accumulations per plane test would be pure waste
    * on a sign test (~3× the flops over 32 planes; sign equivalence
    * asserted in SimilaritySpec).
    */
  private def sketchKeys(emb: Column, pl: Seq[Seq[Seq[Double]]]): Column =
    array(pl.zipWithIndex.map { case (table, t) =>
      val bits = table.zipWithIndex.map { case (plane, p) =>
        when(graft.functions.DotProduct.dotProduct(emb, typedlit(plane)) > 0,
          lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)
      // disambiguate tables: key = (table index, bit pattern)
      (bits + lit(t * 65536)).cast("long")
    }: _*)

  /** ANN top-k via IVF (inverted-file index): a k-means coarse quantizer
    * partitions the vector space into `nlist` cells; each vector is
    * assigned to its nearest centroid, and a query re-scores only the
    * vectors in its `nprobe` nearest cells — the classic
    * coarse-quantization ANN layout (public FAISS/IVF literature).
    *
    * Plumbing is Spark-first end to end: centroids come from
    * `ml.clustering.KMeans` (seeded — deterministic model) fit on a
    * SAMPLE (at 100 TB you fit the quantizer on a few million rows, a
    * constant-size model), then live as literals inside a codegen'd
    * argmin assignment — the data side is one scan + one equi-join on
    * cell id, never all-pairs. Probe fan-out replicates each query
    * `nprobe` times (queries are the tiny side).
    *
    * Like [[annTopKLsh]], this fixture is the ADVERSARIAL case for
    * pruning: isotropic vectors put true neighbors barely above
    * background, so cells carry little signal and nprobe must cover
    * three quarters of the cells for recall ≈ 0.96 (measured at both
    * sf0.001 and sf0.01; SimilaritySpec asserts ≥ 0.85). On clustered
    * real-world embeddings the same index prunes hard at nprobe/nlist
    * « 1. Engine-specific (kmeans-seeded) → rows-only driver check.
    */
  /** Memoized coarse quantizers: the k-means fit is INDEX BUILD, not
    * query work — in production the quantizer is trained once (on a
    * sample) and shipped to every query, exactly like a table isn't
    * re-bucketed per join. Keyed by (caller key, nlist, DATA
    * FINGERPRINT): the fingerprint — [[contentFingerprint]]'s (count,
    * bit_xor, 2^64-modular sum) over xxhash64(vec_id, embedding), one
    * aggregate per fit request — means a caller reusing a key for a
    * DIFFERENT frame (different rows OR the same ids re-embedded with a
    * new model) gets a fresh fit instead of silently degraded cells
    * (round-7 advisor item; the even-multiplicity xor-cancellation
    * residue closed via the modular-sum component in r17, the pcaFits
    * precedent). A stale-fit collision now needs equal count AND xor
    * AND modular sum — and the failure mode is a stale fit, not a
    * wrong result (candidates are exact-verified downstream).
    * Deterministic (seeded),
    * so the cache never changes a result. Memo lifetime is the process:
    * a long-lived service re-fits at most once per (key, nlist,
    * fingerprint) and entries are never evicted — bounded in practice
    * by the handful of distinct corpora a process serves; restart (or a
    * changed fingerprint) is the invalidation story.
    */
  private val quantizers =
    scala.collection.concurrent.TrieMap
      .empty[(String, Int, Long, Long, Long), Seq[Seq[Double]]]

  def annTopKIvf(spark: SparkSession, sfDir: String,
                 nQueries: Int = 10, k: Int = 5,
                 nlist: Int = 16, nprobe: Int = 12,
                 trustKey: Boolean = false): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = fitQuantizer(emb, sfDir, nlist, trustKey)
    val data = assignCells(emb, centroids, nassign = 1)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
    ivfProbe(centroids, data, queries, k, nprobe)
  }

  /** [[annTopKIvf]] probing a PREBUILT cell table — the production path
    * where the quantizer was fit and the corpus assigned ONCE at ingest
    * ([[graft.sources.SimilarityIndexes]] is the parquet spelling) and
    * every query session reads (centroids, cells) from storage instead
    * of re-fitting per process. `queries` = (query_id, eq); the probe
    * arithmetic is the shared [[ivfProbe]], so stored and inline
    * results cannot fork.
    */
  def annTopKIvfFromIndex(centroids: Seq[Seq[Double]], cells: DataFrame,
                          queries: DataFrame, k: Int = 5,
                          nprobe: Int = 12): DataFrame =
    ivfProbe(centroids, cells, queries, k, nprobe)

  /** MEASURED nprobe → recall curve for the IVF probe — the serving
    * knob's cost/quality trade as a measured fact, completing the
    * "measured, not guessed" family (drift says WHEN to re-fit;
    * this says WHERE to set nprobe): for each requested nprobe, one
    * row (nprobe, hits, scanned, n_truth, n_queries, n_corpus,
    * recall_ppm, scan_ppm) where `hits` counts probe results that are
    * true exact top-k neighbors (ground truth = [[annTopKBrute]] over
    * the SAME query set — one corpus-sized scan, paid once), `scanned`
    * counts the candidate rows the probe's coarse join actually reads
    * at that fan-out (the SAME [[probedCells]] fan-out the probe
    * scores — the measured cost, not the nprobe/nlist proxy, so
    * skewed cell populations show up honestly), and the ppm columns
    * are their integer-exact shares. Candidate sets grow with nprobe
    * (a wider fan-out is a superset), so recall is non-decreasing by
    * construction and reaches exactly 10^6 at nprobe = nlist (all
    * cells probed ⇒ the probe IS brute force) — both spec-pinned.
    *
    * Scale: the ground truth and per-nprobe probes are all bounded by
    * the sampled query set (the tuning run samples queries, never the
    * corpus); the curve frame itself is |nprobes| rows of longs.
    * kmeans-seeded cells make the numbers engine-specific → rows-only
    * driver check (q_embed_ivf_recall); the invariants are the spec's.
    */
  def ivfRecallCurve(spark: SparkSession, sfDir: String,
                     nQueries: Int = 10, k: Int = 5, nlist: Int = 16,
                     nprobes: Seq[Int] = Seq(1, 2, 4, 8, 12, 16),
                     trustKey: Boolean = false): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = fitQuantizer(emb, sfDir, nlist, trustKey)
    recallCurveCore(centroids,
      assignCells(emb, centroids, nassign = 1),
      emb.select(col("vec_id"), col("embedding")),
      emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("eq")),
      k, nprobes, ivfCurveScore, rerank = None)
  }

  /** The coarse scorer the IVF curves hand [[recallCurveCore]]: exact
    * cosine over the probed cells' float rows — [[ivfProbe]]'s scoring
    * column over the shared candidate join.
    */
  private val ivfCurveScore: DataFrame => DataFrame = df => df.select(
    col("query_id"), col("eq"), col("vec_id").as("neighbor_id"), col("pr"),
    rankSim(col("eq"), col("embedding")).as("qsim"))

  /** [[ivfRecallCurve]] over a PREBUILT (centroids, cells) index
    * ([[graft.sources.SimilarityIndexes.readIvfIndex]]) — tune the
    * index you actually SERVE: the curve measures the stored layout
    * as-is, so a drifted or skew-grown index answers with its real
    * recall/scan trade, not the fresh-fit ideal. `scanned` counts
    * stored candidate ROWS (a multi-assign layout counts a vector once
    * per probed assignment — the bytes the coarse join actually
    * reads); the exact full-scan endpoint laws hold at nassign = 1 AND
    * with every query_id a member of the indexed corpus: a non-member
    * query has no own-cell row to exclude (own = 0), so at
    * nprobe = nlist `scanned` exceeds n_queries·(n_corpus−1) and
    * scan_ppm exceeds 10^6 (recall = 10^6 still holds — all cells
    * probed is still brute force over the corpus).
    */
  def ivfRecallCurveFromIndex(centroids: Seq[Seq[Double]], cells: DataFrame,
                              queries: DataFrame, k: Int = 5,
                              nprobes: Seq[Int] = Seq(1, 2, 4, 8, 12, 16)): DataFrame =
    recallCurveCore(centroids, cells,
      cells.select(col("vec_id"), col("embedding")).dropDuplicates("vec_id"),
      queries, k, nprobes, ivfCurveScore, rerank = None)

  /** MEASURED nprobe → recall/scan curve for the COMPOSED IVF-SQ8
    * probe — [[ivfRecallCurve]]'s contract over the family actually
    * served at scale: `scanned` counts the int8 CODE rows the probed
    * cells hold (the rows the coarse join reads — a quarter of the
    * float bytes each, which is the point of the composition), and
    * `hits` comes from the REAL two-stage probe at the given `rerank`
    * — so unlike plain IVF's exact endpoint, recall here is monotone
    * in practice but NOT by construction: a wider fan-out can displace
    * a true neighbor from the fixed-size shortlist when the int8
    * coarse scores misrank it (the honest price of approximate coarse
    * scoring, and exactly what this curve exists to surface). The
    * pinned laws are instead: scanned monotone (cell-population
    * supersets), the full-fan-out scan endpoint, and nprobe = nlist
    * == the PURE SQ8 probe's recall exactly (cell pruning off — the
    * degrade precedent). Rows-only driver check (kmeans cells).
    */
  def ivfSqRecallCurve(spark: SparkSession, sfDir: String,
                       nQueries: Int = 10, k: Int = 5, nlist: Int = 16,
                       nprobes: Seq[Int] = Seq(1, 2, 4, 8, 12, 16),
                       rerank: Int = 20, trustKey: Boolean = false): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = fitQuantizer(emb, sfDir, nlist, trustKey)
    val vectors = emb.select(col("vec_id"), col("embedding"))
    recallCurveCore(centroids,
      quantizeSq8On(assignCells(emb, centroids, nassign = 1)),
      vectors,
      emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("eq")),
      k, nprobes, sqCurveScore, rerank = Some(rerank))
  }

  /** [[ivfSqProbe]]'s int8 coarse scorer over the shared candidate
    * join — the IVF-SQ8 curves' scorer for [[recallCurveCore]].
    */
  private val sqCurveScore: DataFrame => DataFrame = df => df.select(
    col("query_id"), col("eq"), col("vec_id").as("neighbor_id"), col("pr"),
    sq8Sim(col("eq"), col("codes")).as("qsim"))

  /** [[ivfSqRecallCurve]] over a PREBUILT index
    * ([[graft.sources.SimilarityIndexes.readIvfSqIndex]]) — tune the
    * quantized inverted lists you actually serve.
    */
  def ivfSqRecallCurveFromIndex(centroids: Seq[Seq[Double]], codes: DataFrame,
                                vectors: DataFrame, queries: DataFrame,
                                k: Int = 5,
                                nprobes: Seq[Int] = Seq(1, 2, 4, 8, 12, 16),
                                rerank: Int = 20): DataFrame =
    recallCurveCore(centroids, codes, vectors, queries, k, nprobes,
      sqCurveScore, rerank = Some(rerank))

  /** [[ivfSqRecallCurve]] for IVF-PQ — the production big-corpus
    * index's fan-out knob measured over the real ADC probe: `scanned`
    * counts the 16-byte PQ code rows the probed cells hold, `hits`
    * the two-stage probe's true top-k recoveries at the given
    * `rerank`. Same laws as IVF-SQ8 (scanned monotone, full-fan-out
    * scan endpoint, nprobe = nlist == pure PQ exactly); same honest
    * non-guarantee on recall monotonicity at fixed rerank.
    */
  def ivfPqRecallCurve(spark: SparkSession, sfDir: String,
                       nQueries: Int = 10, k: Int = 5, nlist: Int = 16,
                       nprobes: Seq[Int] = Seq(1, 2, 4, 8, 12, 16),
                       rerank: Int = 64, m: Int = 16, ksub: Int = 32,
                       trustKey: Boolean = false): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = fitQuantizer(emb, sfDir, nlist, trustKey)
    val books = fitPqCodebooks(emb, sfDir, m, ksub)
    val vectors = emb.select(col("vec_id"), col("embedding"))
    recallCurveCore(centroids,
      quantizePqOn(assignCells(emb, centroids, nassign = 1), books),
      vectors,
      lutQueriesOf(emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("eq")), books),
      k, nprobes, pqCurveScore, rerank = Some(rerank))
  }

  /** [[annTopKIvfPqFromIndex]]'s ADC coarse scorer over the shared
    * candidate join — the IVF-PQ curves' scorer for
    * [[recallCurveCore]]. The per-query lookup tables ride the QUERY
    * side ([[lutQueriesOf]]) through the ranked fan-out broadcast.
    */
  private val pqCurveScore: DataFrame => DataFrame = df => df.select(
    col("query_id"), col("eq"), col("vec_id").as("neighbor_id"), col("pr"),
    pqSim(col("luts"), col("codes")).as("qsim"))

  /** (query_id, eq) → (query_id, eq, luts): the ADC lookup-table
    * attachment shared by [[pqScoredOn]]'s spelling and the IVF-PQ
    * curves' query side.
    */
  private def lutQueriesOf(queries: DataFrame,
                           books: Seq[Seq[Seq[Double]]]): DataFrame =
    queries
      .select(col("query_id"), col("eq"), unitVec(col("eq")).as("__graft_uq"))
      .select(col("query_id"), col("eq"),
        pqLuts(col("__graft_uq"), books).as("luts"))

  /** [[ivfPqRecallCurve]] over a PREBUILT index
    * ([[graft.sources.SimilarityIndexes.readIvfPqIndex]]).
    */
  def ivfPqRecallCurveFromIndex(centroids: Seq[Seq[Double]],
                                books: Seq[Seq[Seq[Double]]], codes: DataFrame,
                                vectors: DataFrame, queries: DataFrame,
                                k: Int = 5,
                                nprobes: Seq[Int] = Seq(1, 2, 4, 8, 12, 16),
                                rerank: Int = 64): DataFrame =
    recallCurveCore(centroids, codes, vectors,
      lutQueriesOf(queries, books), k, nprobes,
      pqCurveScore, rerank = Some(rerank))

  /** The measurement shared by every NPROBE curve ([[ivfRecallCurve]],
    * [[ivfSqRecallCurve]], [[ivfPqRecallCurve]] and their stored
    * twins): `data` is the cell-assigned frame the probes scan (float
    * vectors for plain IVF, SQ8/PQ code rows for the composed
    * families — `scanned` counts ITS rows, so the composed curves
    * honestly charge code rows, not float rows), `vectors` the
    * deduplicated corpus the brute ground truth scores, and `probe`
    * the family's real serving probe at one fan-out — the curve
    * measures whatever the family actually serves, re-rank stage and
    * all.
    *
    * Memory contract of a tuning run: the CELL-ASSIGNED CORPUS is
    * persisted for the ladder (its ground truth is inherently one
    * corpus scan, and every ladder step re-reads the assignment) — at
    * extreme scale sample the corpus side too before calling, exactly
    * as the query side is already sampled.
    */
  private def recallCurveCore(centroids: Seq[Seq[Double]], data0: DataFrame,
                              vectors0: DataFrame, queries0: DataFrame,
                              k: Int, nprobes: Seq[Int],
                              score: DataFrame => DataFrame,
                              rerank: Option[Int]): DataFrame = {
    val nlist = centroids.size
    require(nprobes.nonEmpty, "recall curve needs at least one nprobe")
    nprobes.foreach(p => require(p >= 1 && p <= nlist,
      s"nprobe=$p must be in [1, nlist=$nlist]"))
    // an empty query sample would make n_truth = n_queries = 0 and the
    // ppm integer DIVs divide by zero (an error under ANSI mode, not a
    // refusal) — mirror the nprobe range checks with a clear message.
    // Checked BEFORE the broadcast wrap: an isEmpty probe on a
    // hint-carrying frame logs a spurious HintErrorLogger WARN per call
    // (the hint never reaches a join in that throwaway plan)
    val queries = broadcast(requireQuerySample(queries0))
    val spark = queries0.sparkSession
    import spark.implicits._
    val steps = nprobes.distinct.sorted
    val stepsDf = steps.toDF("step")
    val data = graft.CacheScope.track(data0.persist())
    val vectors = graft.CacheScope.track(vectors0.persist())
    val truth = graft.CacheScope.track(
      bruteTopKOn(vectors, queries, k)
        .select(col("query_id"), col("neighbor_id")).persist())
    // ONE coarse scoring pass at the MAX fan-out, each candidate
    // carrying its query's cell rank `pr` — `pr <= np` of this frame
    // IS the probe's candidate set at fan-out np (the row_number
    // prefix property, [[probedCellsRanked]]), so every ladder step
    // measures exactly the served probe at that np while the corpus
    // side is scored once, not once per step (the r17 curves re-ran
    // the full probe per step: 3 steps cost ~2× this spelling at
    // sf0.1, and at scale re-scanning the probed cells per step is
    // strictly wasted I/O). Per-step equality vs the real probes is
    // spec-pinned (SimilaritySpec "prefix-cut == served probe").
    val pcMax = probedCellsRanked(centroids, queries, steps.max)
    val cand = score(data.join(broadcast(pcMax), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id")))
    // step explosion: a candidate is visible at every ladder step
    // >= its cell rank; ONE window pipeline then ranks all steps at
    // once (partition keys (step, query_id) — per-partition semantics
    // identical to one probe per step)
    val stepped = cand
      .withColumn("step", explode(typedlit(steps)))
      .filter(col("pr") <= col("step"))
    val perStepTopK = rerank match {
      // exact coarse scores (plain IVF): dedup multi-assign candidates
      // by max like [[ivfProbe]], then the direct top-k
      case None =>
        saltedTopPerQuery(
          stepped.groupBy(col("step"), col("query_id"), col("neighbor_id"))
            .agg(max(col("qsim")).as("qsim")),
          Seq(col("qsim").desc, col("neighbor_id").asc), k, "rank",
          extraPart = Seq(col("step")))
          .select(col("step"), col("query_id"), col("neighbor_id"))
      // approximate coarse scores (SQ8/PQ codes): per-(step, query)
      // shortlist at the family's rerank depth, then the exact float
      // re-rank — [[ivfSqProbe]]/[[annTopKIvfPqFromIndex]]'s two-stage
      // arithmetic with the step in the partition keys
      case Some(r) =>
        require(r >= k, s"rerank=$r must be >= k=$k")
        val shortlist = saltedTopPerQuery(stepped,
            Seq(col("qsim").desc, col("neighbor_id").asc), r, "arank",
            extraPart = Seq(col("step")))
          .select(col("step"), col("query_id"), col("eq"), col("neighbor_id"))
        exactRerank(shortlist, vectors, k, extraPart = Seq(col("step")))
    }
    val hits = perStepTopK
      .join(truth, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("step")).agg(count(lit(1)).as("hits"))
    // scanned-candidate counts derive from ONE shared population pass
    // (cell → row count) + the tiny ranked fan-out, for ALL steps in
    // one aggregation: Σ pop over cells with pr <= step, minus the
    // probed own-cells (the probe's vec_id ≠ query_id exclusion).
    // Exactly the candidate rows the probe's coarse join reads at
    // each fan-out — measured from the stored assignment.
    val pop = data.groupBy(col("cell")).agg(count(lit(1)).as("pop"))
    val qCells = data
      .join(queries.select(col("query_id")), col("vec_id") === col("query_id"))
      .select(col("query_id").as("qid"), col("cell").as("qcell"))
    val scanned = pcMax.select(col("query_id"), col("cell"), col("pr"))
      .join(pop, Seq("cell"))
      .join(qCells,
        col("query_id") === col("qid") && col("cell") === col("qcell"), "left")
      .withColumn("step", explode(typedlit(steps)))
      .filter(col("pr") <= col("step"))
      .groupBy(col("step"))
      .agg((sum(col("pop")) - count(col("qid"))).as("scanned"))
    // left joins from the step axis: a step whose probe returns no row
    // (or probes only empty cells) must still emit its curve row as 0,
    // not vanish from the ladder
    val perStep = stepsDf
      .join(hits, Seq("step"), "left")
      .join(scanned, Seq("step"), "left")
      .select(col("step").as("nprobe"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        coalesce(col("scanned"), lit(0L)).as("scanned"))
    ladderPpm(perStep, "nprobe", truth, vectors)
  }

  /** The non-empty-query-sample refusal every serving curve starts
    * with: an empty sample would make n_truth = n_queries = 0 and the
    * ppm integer DIVs divide by zero — an ANSI-mode error deep in the
    * plan instead of a clear message (r16 ADVICE). Returns the frame
    * for chaining; callers check BEFORE broadcast-wrapping so the
    * throwaway isEmpty plan never carries a join hint (which logs a
    * spurious HintErrorLogger WARN per call).
    */
  private def requireQuerySample(queries: DataFrame): DataFrame = {
    require(!queries.isEmpty,
      "recall curve needs a non-empty query sample (n_truth/n_queries " +
        "would be 0 and the ppm shares would divide by zero)")
    queries
  }

  /** The ppm-share assembly every serving curve ends with
    * ([[ivfRecallCurve]], [[pcaRecallCurve]], [[lshRecallCurve]],
    * [[pqRerankCurve]]): per-step (stepCol, hits, scanned) rows join
    * the ONE measured totals row (truth size, query count, corpus
    * size) and emit the integer-exact recall/scan shares. 1-row ×
    * 1-row crossJoin — the q_tfidf_terms constant-build BNLJ shape.
    */
  private def ladderPpm(perStep: DataFrame, stepCol: String,
                        truth: DataFrame, vectors: DataFrame): DataFrame = {
    val totals = broadcast(truth.agg(
        count(lit(1)).as("n_truth"),
        countDistinct(col("query_id")).as("n_queries"))
      .crossJoin(vectors.agg(count(lit(1)).as("n_corpus"))))
    perStep.crossJoin(totals)
      .select(col(stepCol), col("hits"), col("scanned"),
        col("n_truth"), col("n_queries"), col("n_corpus"),
        expr("hits * 1000000 DIV n_truth").as("recall_ppm"),
        expr("scanned * 1000000 DIV (n_queries * (n_corpus - 1))").as("scan_ppm"))
  }

  /** The IVF probe shared by [[annTopKIvf]] and [[annTopKIvfFromIndex]]:
    * each query ranks the centroids, fans out to its `nprobe` nearest
    * cells (tiny side: queries × nprobe rows), and re-scores exactly the
    * vectors in those cells via one equi-join on cell id. Candidate
    * dedup keys on (query_id, neighbor_id) AFTER scoring — a cell table
    * written with nassign > 1 (shared with [[semanticDedupOn]]'s
    * blocker) surfaces a candidate once per shared cell, and the
    * max-agg collapses it without ever grouping on the ~0.5 KB vector
    * payloads (same rationale as [[annTopKLshOn]]).
    */
  /** Each query's `nprobe` nearest cells — (query_id, eq, cell), the
    * IVF fan-out side shared by [[ivfProbe]] and the recall-curve
    * measurement ([[ivfRecallCurve]] counts candidates over the same
    * fan-out the probe scores, so the curve measures the real probe).
    */
  private def probedCells(centroids: Seq[Seq[Double]], queries: DataFrame,
                          nprobe: Int): DataFrame =
    probedCellsRanked(centroids, queries, nprobe).drop("pr")

  /** [[probedCells]] KEEPING the per-query cell rank `pr` and every
    * query column: the row_number prefix property makes
    * `filter(pr <= np)` of this frame EXACTLY [[probedCells]] at
    * fan-out np for any np <= the requested one — the step-exploded
    * curve pipelines ladder on that, the [[pqRerankCurve]] `arank`
    * precedent applied to the fan-out knob.
    */
  private def probedCellsRanked(centroids: Seq[Seq[Double]], queries: DataFrame,
                                nprobe: Int): DataFrame = {
    val qCols = queries.columns.map(col(_))
    val probes = queries.select(qCols :+
      posexplode(graft.functions.CellSims.cellSims(col("eq"), centroids))
        .as(Seq("cell", "csim")): _*)
    val wP = Window.partitionBy(col("query_id")).orderBy(col("csim").desc, col("cell").asc)
    probes.withColumn("pr", row_number().over(wP))
      .filter(col("pr") <= nprobe)
      .drop("csim")
  }

  private def ivfProbe(centroids: Seq[Seq[Double]], cells: DataFrame,
                       queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val probeCells = probedCells(centroids, queries, nprobe)
    saltedTopPerQuery(cells.join(probeCells, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        rankSim(col("eq"), col("embedding")).as("sim"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(max(col("sim")).as("sim")),
      Seq(col("sim").desc, col("neighbor_id").asc), k, "rank")
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }

  /** Cell assignment shared by the IVF family: each vector exploded to
    * its `nassign` nearest cells — (vec_id, embedding, cell), one row
    * per assignment. nassign = 1 is the plain codegen argmax
    * ([[annTopKIvf]]'s data side); higher values are
    * [[semanticDedupOn]]'s multi-probe blocker. Codegen argmax as ARRAY
    * ops: a when-chain over `greatest(sims)` would re-inline all nlist
    * sims per branch (~270 copies — blows the JVM's 64KB method limit
    * and falls back to interpreted); array_position(sims,
    * array_max(sims)) references the aliased sims column twice total,
    * and each exclusion stage reads the PREVIOUS aliased column.
    */
  private[graft] def assignCells(emb: DataFrame, centroids: Seq[Seq[Double]],
                                 nassign: Int): DataFrame = {
    val nlist = centroids.size
    require(nassign >= 1 && nassign <= nlist,
      s"nassign=$nassign must be in [1, nlist=$nlist]")
    // native all-centroid scorer (r21, guide §4): the composed
    // `array(cosineSim(e, lit(c1)), ..., cosineSim(e, lit(cN)))`
    // re-accumulated |e|² once per centroid and carried one dim-sized
    // literal per centroid through every ANN plan's analysis
    // (NativeHofParitySpec pins native == composed parity; the probe-
    // side posexplode sites share the same expression)
    val assigned0 = emb.select(col("vec_id"), col("embedding"),
      graft.functions.CellSims.cellSims(col("embedding"), centroids).as("sims0"))
    // exclusion stages are the native MaskArgmax (r21, guide §4): the
    // composed `zip_with(sims, sequence(1, nlist), (x, i) => when(i ===
    // array_position(sims, array_max(sims)), -2.0).otherwise(x))` was a
    // CodegenFallback HOF re-evaluating array_position PER ELEMENT —
    // O(nlist²) interpreted comparisons per vector per stage
    // (SimilaritySpec pins native == composed parity)
    val assigned = (0 until nassign).foldLeft(assigned0) { (df, k) =>
      val withCell = df.withColumn(s"c$k",
        (array_position(col(s"sims$k"), array_max(col(s"sims$k"))) - 1).cast("int"))
      if (k == nassign - 1) withCell
      else withCell.withColumn(s"sims${k + 1}",
        graft.functions.MaskArgmax.maskArgmax(col(s"sims$k")))
    }
    assigned.select(col("vec_id"), col("embedding"),
      explode(array((0 until nassign).map(k => col(s"c$k")): _*)).as("cell"))
  }

  /** Semantic (embedding-cluster) dedup: group vectors whose cosine
    * similarity reaches `threshold` into connected components and emit a
    * one-representative-per-cluster keep list — the embedding-space
    * analogue of [[graft.operators.Dedup.nearDupClusters]], composed
    * from the pieces already proven here: IVF cells as the candidate
    * blocker ([[annTopKIvf]]'s coarse quantizer), exact cosine
    * verification of every candidate (native codegen
    * [[graft.functions.CosineSimilarity]]), and
    * [[graft.operators.Dedup.clusterPairs]] for the components. Output:
    * (vec_id, rep_id = component-min vec_id or self, is_rep bit) — one
    * row per input vector; "keep is_rep = 1" is the dedup decision.
    *
    * Candidate generation assigns each vector to its `nassign` nearest
    * cells and pairs vectors sharing ANY cell — multi-probe in index
    * terms: a qualifying pair is missed only if the two vectors share
    * none of their nassign nearest cells, increasingly unlikely as
    * cosine → 1 (at threshold 0.45 on this near-isotropic fixture the
    * spec measures recall and asserts ≥ 0.8; precision is exactly 1.0
    * by construction since every surfaced pair is exact-verified).
    *
    * Scale design (100 TB): the cell assignment is pure codegen array
    * arithmetic per row (argmax + masked re-argmax over centroid
    * literals — the sims array is aliased to a column so the optimizer
    * does not re-inline 16 cosine evaluations per reference, and no
    * data-side explode+window shuffle is needed); candidate pairs come
    * from a cell-id equi-join, quadratic only within a cell — at scale,
    * pick nlist so cells hold ~sqrt-of-shard-sized populations, and AQE
    * splits residual skew because it is a plain shuffled join. The
    * fixture's kmeans-seeded cells make outputs engine-specific →
    * rows-only driver check; all semantics spec-verified.
    */
  def semanticDedup(spark: SparkSession, sfDir: String,
                    threshold: Double = 0.45, nlist: Int = 16,
                    nassign: Int = 4): DataFrame =
    semanticDedupOn(spark, Tables.embeddings(spark, sfDir), sfDir,
      threshold, nlist, nassign)

  /** [[semanticDedup]] over any (vec_id, embedding) DataFrame. `qKey`
    * labels the process-wide memoized quantizer; since round 8 the memo
    * key also folds in a data fingerprint (count + vec_id hash XOR), so
    * reusing a label for a different frame re-fits instead of silently
    * degrading recall on stale centroids (SimilaritySpec asserts it).
    * The memo exists because the fit is index BUILD, not query work.
    */
  def semanticDedupOn(spark: SparkSession, emb: DataFrame, qKey: String,
                      threshold: Double = 0.45, nlist: Int = 16,
                      nassign: Int = 4, trustKey: Boolean = false): DataFrame = {
    val centroids = fitQuantizer(emb, qKey, nlist, trustKey)
    dedupFromCells(assignCells(emb, centroids, nassign),
      emb.select(col("vec_id")), threshold)
  }

  /** [[semanticDedupOn]] over a PREBUILT cell table — the production
    * path where the multi-assign cells were materialized at ingest
    * ([[graft.sources.SimilarityIndexes]], written with nassign > 1).
    * The vector universe is the distinct ids of the cell table (every
    * vector holds >= 1 assignment by construction); pair generation and
    * component labeling are the shared [[dedupFromCells]], so stored
    * and inline results cannot fork.
    */
  def semanticDedupFromIndex(cells: DataFrame,
                             threshold: Double = 0.45): DataFrame =
    dedupFromCells(cells, cells.select(col("vec_id")).distinct(), threshold)

  /** Candidate pairing + component labeling shared by [[semanticDedupOn]]
    * and [[semanticDedupFromIndex]]: vectors sharing ANY cell are paired
    * via a cell-id equi-join (quadratic only within a cell), every
    * candidate is exact-verified with the fused codegen cosine, ids-only
    * from there (pair dedup AFTER dropping the two ~256-byte vector
    * payloads), then [[graft.operators.Dedup.clusterPairs]] labels
    * components and `universeIds` pins one output row per input vector.
    */
  private def dedupFromCells(cells: DataFrame, universeIds: DataFrame,
                             threshold: Double): DataFrame = {
    val pairs = cells.as("x").join(cells.as("y"),
        col("x.cell") === col("y.cell") && col("x.vec_id") < col("y.vec_id"))
      .filter(cosineSim(col("x.embedding"), col("y.embedding")) >= threshold)
      .select(col("x.vec_id").as("doc_a"), col("y.vec_id").as("doc_b"))
      .distinct()
    val labels = graft.operators.Dedup.clusterPairs(pairs)
      .withColumnRenamed("doc_id", "vec_id")
    universeIds
      .join(labels, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster_id"), col("vec_id")).as("rep_id"))
      .withColumn("is_rep", (col("vec_id") === col("rep_id")).cast("long"))
  }

  /** The fingerprint of the last fit per (key, nlist) — what the
    * `trustKey` fast path resolves through without touching the data.
    */
  private val lastFit =
    scala.collection.concurrent.TrieMap.empty[(String, Int), (Long, Long, Long)]

  /** Memoized coarse-quantizer fit (see [[quantizers]]): L2 k-means over
    * unit-normalized vectors ranks cells identically to cosine
    * (||q-c||² = 2 - 2·cos on unit vectors); deterministic via fixed
    * seed. The fingerprint aggregate runs per request — a scan of the
    * id + embedding columns, orders of magnitude cheaper than the
    * k-means fit it guards against reusing on the wrong data — UNLESS
    * the caller passes `trustKey = true`: a hot serving path that KNOWS
    * its key↔data binding is stable (e.g. an immutable snapshot dir)
    * can skip even that scan and reuse the last fit recorded under
    * (key, nlist); the first call under a key always fits (and pays the
    * fingerprint), so trust only ever short-circuits a repeat. The
    * storage-backed answer to the same problem is
    * [[graft.sources.SimilarityIndexes]] — stored centroids never
    * re-fit at all.
    */
  private[graft] def fitQuantizer(emb: DataFrame, key: String, nlist: Int,
                                  trustKey: Boolean = false): Seq[Seq[Double]] = {
    val trusted =
      if (trustKey) lastFit.get((key, nlist))
        .flatMap(fp => quantizers.get((key, nlist, fp._1, fp._2, fp._3)))
      else None
    trusted.getOrElse {
      val fp = contentFingerprint(emb)
      val centroids = quantizers.getOrElseUpdate((key, nlist, fp._1, fp._2, fp._3), {
        import org.apache.spark.ml.clustering.KMeans
        import org.apache.spark.ml.functions.array_to_vector
        val train = emb.select(array_to_vector(unitVec(col("embedding"))).as("features"))
        val model = new KMeans().setK(nlist).setSeed(42).setMaxIter(10).fit(train)
        model.clusterCenters.map(_.toArray.toSeq).toSeq
      })
      lastFit.put((key, nlist), fp)
      centroids
    }
  }

  /** ANN top-k via random-hyperplane LSH: candidates = vectors sharing at
    * least one sketch key with the query (bucket join, no cross join),
    * re-scored exactly, per-query top-k.
    *
    * Parameter choice ((nTables, bitsPerTable) = (16, 2)): this fixture's
    * true top-5 neighbors sit at cosine ≈ 0.27–0.39 (hyperplane collision
    * prob 0.585–0.628 — measured), so the worst-pair miss probability is
    * (1 − 0.585²)¹⁶ ≈ 1e-3 → expected recall ≈ 0.999; SimilaritySpec
    * asserts ≥ 0.9. On isotropic vectors like these the candidate sets
    * are near-full (no free lunch at cosine 0.3); on real clustered
    * embedding corpora the same bucketing prunes hard.
    *
    * Hot-bucket cap (mirrors [[Dedup.minHashNearDupsOn]]'s `maxBucket`):
    * a viral near-duplicate embedding cluster puts its whole population
    * on ONE (table, pattern) key, making that join group quadratic at
    * scale. Data-side keys whose bucket exceeds `maxBucket` are dropped
    * from candidate generation via a count window over the SAME key
    * partitioning the join shuffles on (one reused exchange). A true
    * neighbor is lost only if EVERY key it shares with the query is
    * over-capped — i.e. it sits in a > maxBucket near-identical cluster
    * on all tables, which exact dedup collapses upstream in a real
    * pipeline. Queries keep their UNCAPPED probe keys (the query side is
    * nQueries rows — never the hot side). Recall on this fixture is
    * unchanged (asserted); cap behavior itself is unit-tested with a
    * planted all-identical cluster and a tiny cap.
    *
    * Candidate dedup happens on bare (query_id, vec_id) ids — never
    * `.distinct()` over rows carrying the two float arrays, which would
    * shuffle ~0.5 KB of grouping key per row; the payload joins in only
    * after the pair set is deduped (see [[annTopKLshFromIndex]]).
    */
  def annTopKLsh(spark: SparkSession, sfDir: String,
                 nQueries: Int = 10, k: Int = 5,
                 nTables: Int = 16, bitsPerTable: Int = 2,
                 maxBucket: Int = 10000): DataFrame =
    annTopKLshOn(Tables.embeddings(spark, sfDir),
      nQueries, k, nTables, bitsPerTable, maxBucket)

  /** [[annTopKLsh]] over any (vec_id, embedding) DataFrame — the entry
    * the hot-bucket spec drives so cap evidence covers the SHIPPED path.
    * Delegates to the shared [[annTopKLshFromIndex]] probe over an
    * inline-derived sketch frame, so the inline and stored spellings
    * cannot fork — and the inline plan inherits the stored layout's
    * shuffle economy (see the probe's scaladoc).
    */
  def annTopKLshOn(emb: DataFrame,
                   nQueries: Int = 10, k: Int = 5,
                   nTables: Int = 16, bitsPerTable: Int = 2,
                   maxBucket: Int = 10000, dim: Int = 64): DataFrame =
    annTopKLshFromIndex(
      lshSketchFrames(emb, nTables, bitsPerTable, dim),
      emb.select(col("vec_id"), col("embedding")),
      emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("eq")),
      k, nTables, bitsPerTable, maxBucket, dim)

  /** The LSH index artifact: (vec_id, key), one row per (vector, table)
    * — two longs, NO embedding payload. 16 tables × ~0.5 KB vector
    * would 8× the corpus if the payload rode on every sketch row
    * (contrast the IVF cell table, where each vector appears nassign ≈
    * 1 times and carrying it is free); instead candidates re-score
    * through ONE vec_id equi-join to the vectors table.
    * [[graft.sources.SimilarityIndexes.writeLshIndex]] is the parquet
    * spelling.
    */
  private[graft] def lshSketchFrames(emb: DataFrame, nTables: Int,
                                     bitsPerTable: Int,
                                     dim: Int = 64): DataFrame =
    emb.select(col("vec_id"),
      explode(sketchKeys(col("embedding"), planes(nTables, bitsPerTable, dim)))
        .as("key"))

  /** [[annTopKLsh]] probing a PREBUILT sketch frame — the production
    * path where `sketches` (vec_id, key) and `vectors` (vec_id,
    * embedding) were materialized at ingest. The planes are
    * seed-deterministic, so query keys re-derived here match the keys
    * any build derived (same nTables/bitsPerTable — stored in the index
    * meta so configs cannot fork).
    *
    * Shuffle economy: the bucket join moves two-long rows; candidate
    * (query_id, vec_id) pairs are deduped BEFORE any payload appears
    * (the stored-layout analogue of the inline spelling's
    * score-then-max-agg collapse — same pair set, fewer cosine
    * evaluations), then re-score through one vec_id join against the
    * vectors table with the tiny query side broadcast. The hot-bucket
    * cap stays probe-side (a probe parameter, not an index property —
    * one index serves every cap), counted over the same key
    * partitioning the join shuffles on.
    */
  def annTopKLshFromIndex(sketches: DataFrame, vectors: DataFrame,
                          queries: DataFrame, k: Int = 5,
                          nTables: Int = 16, bitsPerTable: Int = 2,
                          maxBucket: Int = 10000, dim: Int = 64): DataFrame = {
    // dim comes from the index meta on the stored path (the planes are
    // functions of (seed, dim) — probing a non-64-dim index with 64-dim
    // planes would derive silently mismatched query keys)
    val pl = planes(nTables, bitsPerTable, dim)
    // query probes stay uncapped — the query side is tiny by contract,
    // so a query sitting in a hot bucket still probes it; only the DATA
    // side of that bucket is bounded
    val qKeys = queries.select(col("query_id"),
      explode(sketchKeys(col("eq"), pl)).as("key"))
    lshRankCandidates(lshCandidateIds(sketches, qKeys, maxBucket),
      vectors, queries, k)
  }

  /** The LSH probe's candidate generation, shared with the recall
    * curve so the curve measures the REAL probe: hot-bucket cap over
    * the data side (counted on the SAME key partitioning the join
    * shuffles on), bucket equi-join, self-pair exclusion, ids-only
    * pair dedup (never `.distinct()` over rows carrying float
    * payloads).
    */
  private def lshCandidateIds(sketches: DataFrame, qKeys: DataFrame,
                              maxBucket: Int): DataFrame = {
    val capped = sketches
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy(col("key"))))
      .filter(col("bsz") <= maxBucket)
      .drop("bsz")
    capped.join(qKeys, Seq("key"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
  }

  /** The LSH probe's exact stage, shared with the recall curve: score
    * the deduped candidate ids through one vec_id join against the
    * vectors table (tiny query side broadcast), per-query top-k via
    * the salted two-phase window.
    */
  private def lshRankCandidates(candIds: DataFrame, vectors: DataFrame,
                                queries: DataFrame, k: Int): DataFrame =
    saltedTopPerQuery(candIds.join(vectors, "vec_id")
      .join(broadcast(queries), "query_id")
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        rankSim(col("eq"), col("embedding")).as("sim")),
      Seq(col("sim").desc, col("neighbor_id").asc), k, "rank")
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))

  /** MEASURED nTables → recall/scan curve for the LSH probe — the
    * [[ivfRecallCurve]] contract applied to the LSH family's serving
    * knob (r16 verdict #3): more tables buy recall with a strictly
    * larger candidate join, and this measures both sides of that
    * trade from the index's real buckets. For each requested table
    * count t, one row (ntables, hits, scanned, n_truth, n_queries,
    * n_corpus, recall_ppm, scan_ppm): `hits` counts probe results
    * that are true exact top-k neighbors ([[bruteTopKOn]] ground
    * truth over the SAME query sample, one corpus scan paid once),
    * `scanned` the DEDUPED candidate pairs the exact stage re-scores
    * at that t — the measured join cost, so hot buckets and
    * cross-table overlap show up honestly (a pair sharing three
    * tables costs one re-score, not three).
    *
    * ONE sketch pass serves the whole ladder: the seeded plane
    * generation is SEQUENTIAL, so t tables' planes are a PREFIX of
    * the max ladder step's and `key < t·65536` filters the max-step
    * sketch frame down to exactly the t-table index. Candidate sets
    * are therefore nested supersets in t — recall and scanned are
    * non-decreasing BY CONSTRUCTION (a true top-k neighbor surfaced
    * at t tables cannot be displaced at t′ > t: at most k−1 corpus
    * vectors precede it in the exact order), both spec-pinned. No
    * exact endpoint exists (LSH never guarantees full recall — the
    * honest contrast with IVF's nprobe = nlist law). Rows-only
    * driver check (float path); invariants are the spec's.
    */
  def lshRecallCurve(spark: SparkSession, sfDir: String,
                     nQueries: Int = 10, k: Int = 5,
                     nTabless: Seq[Int] = Seq(1, 2, 4, 8, 16),
                     bitsPerTable: Int = 2, maxBucket: Int = 10000,
                     dim: Int = 64): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    lshRecallCurveFromIndex(
      lshSketchFrames(emb, nTabless.max, bitsPerTable, dim),
      emb.select(col("vec_id"), col("embedding")),
      emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("eq")),
      k, nTabless, bitsPerTable, maxBucket, dim)
  }

  /** [[lshRecallCurve]] over a PREBUILT sketch index
    * ([[graft.sources.SimilarityIndexes.readLshIndex]]) — tune the
    * index you actually SERVE: ladder steps are bounded by the
    * index's own stored table count (its meta nTables), and each step
    * probes exactly the stored buckets' first t tables.
    */
  def lshRecallCurveFromIndex(sketches: DataFrame, vectors0: DataFrame,
                              queries0: DataFrame, k: Int,
                              nTabless: Seq[Int], bitsPerTable: Int,
                              maxBucket: Int, dim: Int): DataFrame = {
    require(nTabless.nonEmpty, "recall curve needs at least one nTables")
    nTabless.foreach(t => require(t >= 1,
      s"nTables=$t must be >= 1 (and <= the sketch frame's table count)"))
    val queries = broadcast(requireQuerySample(queries0))
    val spark = queries0.sparkSession
    import spark.implicits._
    val steps = nTabless.distinct.sorted
    val stepsDf = steps.toDF("step")
    val vectors = graft.CacheScope.track(vectors0.persist())
    val truth = graft.CacheScope.track(
      bruteTopKOn(vectors, queries, k)
        .select(col("query_id"), col("neighbor_id")).persist())
    val pl = planes(steps.max, bitsPerTable, dim)
    val qKeysAll = queries.select(col("query_id"),
      explode(sketchKeys(col("eq"), pl)).as("key"))
    // ONE capped bucket join at the max table count, keeping each
    // candidate pair's MINIMUM colliding table: key = bits + table·65536
    // (plane prefix property), so the t-table probe's candidate set is
    // EXACTLY `mintable < t` of this frame — a bucket's population
    // lives entirely inside one table, so the hot-bucket cap verdict is
    // table-count-independent and counting it once over the max-table
    // frame equals re-counting per step ([[lshCandidateIds]]'s cap over
    // each filtered frame). Candidates are then exact-scored ONCE and
    // every ladder step ranks in one window pipeline partitioned by
    // (step, query) — the r17 spelling re-joined the buckets and
    // re-scored the candidates once per step.
    val capped = sketches
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy(col("key"))))
      .filter(col("bsz") <= maxBucket)
      .drop("bsz")
    val cand = capped.join(qKeysAll, Seq("key"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(expr("min(key DIV 65536)").cast("int").as("mintable"))
    val scored = graft.CacheScope.track(cand
      .join(vectors, "vec_id")
      .join(broadcast(queries), "query_id")
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("mintable"), rankSim(col("eq"), col("embedding")).as("qsim"))
      .persist())
    val stepped = scored
      .withColumn("step", explode(typedlit(steps)))
      .filter(col("mintable") < col("step"))
    val hits = saltedTopPerQuery(stepped,
        Seq(col("qsim").desc, col("neighbor_id").asc), k, "rank",
        extraPart = Seq(col("step")))
      .join(truth, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("step")).agg(count(lit(1)).as("hits"))
    val scanned = scored
      .withColumn("step", explode(typedlit(steps)))
      .filter(col("mintable") < col("step"))
      .groupBy(col("step")).agg(count(lit(1)).as("scanned"))
    val perStep = stepsDf
      .join(hits, Seq("step"), "left")
      .join(scanned, Seq("step"), "left")
      .select(col("step").as("ntables"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        coalesce(col("scanned"), lit(0L)).as("scanned"))
    ladderPpm(perStep, "ntables", truth, vectors)
  }

  // -------------------------------------------------------------------
  // PRODUCT QUANTIZATION (PQ) — Jégou/Douze/Schmid, "Product
  // Quantization for Nearest Neighbor Search" (TPAMI 2011), FAISS's
  // `PQ<m>` index re-expressed as Spark projections and joins. The
  // embedding splits into `m` subspaces of dim/m components; each
  // subspace gets its own `ksub`-centroid k-means codebook, and a
  // vector stores as m SINGLE-BYTE codes — 16 bytes at the defaults
  // against 256 for a 64-dim float vector, a 16× smaller coarse-pass
  // artifact (SQ8's 4× taken further, at higher reconstruction error
  // that the exact re-rank absorbs). Defaults (m=16, ksub=32,
  // rerank=64) hold recall 1.0 on the ISOTROPIC fixture (the
  // hardest case — neighbors at cosine ≈ 0.3 sit barely above
  // background; real clustered embeddings are easier). Scoring is ADC
  // (asymmetric distance computation):
  // the query PRECOMPUTES an m × ksub lookup table of subspace dot
  // products — m·ksub dot products per QUERY, not per candidate — and
  // each candidate costs m table lookups + adds, no float vector read.
  // -------------------------------------------------------------------

  /** Memoized PQ codebooks, keyed (caller key, m, ksub, data
    * fingerprint — [[contentFingerprint]]'s three components) — the
    * [[quantizers]] contract verbatim: the fit is index build,
    * deterministic (seeded), re-fit on a changed fingerprint, never
    * evicted. The m sub-fits each run on the
    * subvector slice; in production each would train on a sample — the
    * codebook is m·ksub·(dim/m) doubles regardless of corpus size.
    */
  private val pqBooks = scala.collection.concurrent.TrieMap
    .empty[(String, Int, Int, Long, Long, Long), Seq[Seq[Seq[Double]]]]

  private[graft] def fitPqCodebooks(emb: DataFrame, key: String,
                                    m: Int, ksub: Int): Seq[Seq[Seq[Double]]] = {
    val fp = contentFingerprint(emb)
    pqBooks.getOrElseUpdate((key, m, ksub, fp._1, fp._2, fp._3), {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val dim = emb.select(size(col("embedding")).as("d")).head().getInt(0)
      require(dim % m == 0, s"dim=$dim must split evenly into m=$m subspaces")
      val dsub = dim / m
      val unit = graft.CacheScope.track(
        emb.select(unitVec(col("embedding")).as("u")).persist())
      val books = (0 until m).map { j =>
        val train = unit.select(
          array_to_vector(slice(col("u"), j * dsub + 1, dsub)).as("features"))
        new KMeans().setK(ksub).setSeed(42 + j).setMaxIter(10).fit(train)
          .clusterCenters.map(_.toArray.toSeq).toSeq
      }
      unit.unpersist()
      books
    })
  }

  /** Per-subspace distance array: ONE `transform` over the codebook
    * literal (an array-of-arrays) with a nested squared-L2 lambda —
    * NOT ksub separate aggregate expressions, which would put
    * m × ksub = 512 HOF aggregates in one projection and blow the
    * generated code past what codegen compiles in reasonable time
    * (measured: the flat spelling cost ~8 s/query at the defaults,
    * this one ~1 s).
    */
  private def l2sqAll(sub: Column, book: Seq[Seq[Double]]): Column =
    transform(typedlit(book), c =>
      aggregate(zip_with(sub, c, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x))

  /** PQ-encode an embedding frame under fitted codebooks: (vec_id,
    * codes) with `codes[j]` the index of subspace j's nearest centroid
    * to the UNIT-normalized subvector (cosine serving: the reconstructed
    * vector approximates the unit vector, so ADC dot ≈ cosine).
    * Per-subspace distance arrays stage as their own projection before
    * the argmin reads them twice (array_min + array_position — the
    * [[Clustering.assignWithSim]] no-double-evaluation rule); ties
    * break to the FIRST minimal centroid, deterministically. Pure
    * per-row projection — no shuffle, no UDF.
    */
  def quantizePqOn(emb: DataFrame, books: Seq[Seq[Seq[Double]]]): DataFrame = {
    // a `cell` column (the IVF-PQ composition feeds an assigned frame)
    // rides through — the quantizeSq8On contract; anything else drops
    val keep = Seq(col("vec_id")) ++
      (if (emb.columns.contains("cell")) Seq(col("cell")) else Nil)
    // NATIVE codegen encode (r20 optimization, guide §4): the composed
    // spelling — per-subspace l2sqAll distance arrays + array_position/
    // array_min argmins over `unitVec` — ran m·ksub interpreted HOF
    // closures (+ one zipped-array alloc per centroid) per row; HOFs are
    // CodegenFallback, and the in-flight corpus encode was ~75% of the
    // inline PQ queries. PqEncode fuses normalize + argmin into one
    // whole-stage-codegen loop with BIT-IDENTICAL arithmetic
    // (SimilaritySpec pins codes equality against the composed spelling,
    // which also keeps stored fixture code tables valid byte-for-byte).
    emb.select(keep :+
      graft.functions.PqEncode.pqEncode(col("embedding"), books).as("codes"): _*)
  }

  /** The per-query ADC lookup table: luts[j][c+1] = dot(unit query's
    * subspace j, codebook j's centroid c). Computed ONCE on the (tiny)
    * query frame, broadcast with it. */
  /** `uq` must already be unit-normalized and staged as a plain column
    * — inlining unitVec here would copy its aggregate into all m
    * transform lambdas (the l2sqAll codegen-size rule again). */
  private[graft] def pqLuts(uq: Column, books: Seq[Seq[Seq[Double]]]): Column = {
    val dsub = books.head.head.length
    array(books.indices.map { j =>
      // one transform per subspace over the codebook literal (the
      // l2sqAll codegen-size rule), dot via the nested lambda
      transform(typedlit(books(j)),
        c => dot(slice(uq, j * dsub + 1, dsub), c))
    }: _*)
  }

  /** Per-row PQ reconstruction error of an already-unit `u` column:
    * Σ_j min over codebook j of ‖u_j − c‖² — exactly what encoding the
    * row under these codebooks loses, without materializing the codes.
    * Staged one column per subspace (the [[l2sqAll]] codegen-size
    * rule); adds `err`, removes the staging columns. */
  private[graft] def pqReconErrCol(df: DataFrame,
                                   books: Seq[Seq[Seq[Double]]]): DataFrame = {
    val dsub = books.head.head.length
    val withE = books.indices.foldLeft(df) { (d, j) =>
      d.withColumn(s"__graft_e$j",
        array_min(l2sqAll(slice(col("u"), j * dsub + 1, dsub), books(j))))
    }
    withE.withColumn("err",
        books.indices.map(j => col(s"__graft_e$j")).reduce(_ + _))
      .drop(books.indices.map(j => s"__graft_e$j"): _*)
  }

  /** ADC score of a code row against a query's lookup tables: m
    * element_at reads + adds — the candidate's float vector is never
    * touched. */
  // NATIVE since r20 ([[graft.functions.PqAdc]], guide §4): the
  // aggregate/zip_with spelling allocated a zipped array and ran
  // interpreted closures per CANDIDATE row — the coarse pass's per-row
  // work over (corpus × queries). Same sequential sum, bit-identical.
  private[graft] def pqSim(luts: Column, codes: Column): Column =
    graft.functions.PqAdc.pqAdc(luts, codes)

  /** ANN top-k over the PQ-coded corpus with EXACT re-rank
    * (q_embed_ann_pq): coarse ADC pass over the 16×-smaller code table
    * keeps `rerank` per query, exact cosine re-ranks only that
    * shortlist — [[annTopKSq]]'s two-stage contract at a deeper
    * storage trade. `rerank` defaults higher than SQ8's (PQ's
    * 16-bytes-per-vector reconstruction is far coarser than SQ8's
    * 64-bytes); with `rerank >= corpus size` the result is EXACTLY
    * [[annTopKBrute]] — the exact re-rank sees everything — which
    * SimilaritySpec asserts, alongside recall ≥ 0.9 at the defaults.
    * Engine-specific (kmeans-seeded, float path) → rows-only driver
    * check.
    */
  def annTopKPq(spark: SparkSession, sfDir: String,
                nQueries: Int = 10, k: Int = 5, rerank: Int = 64,
                m: Int = 16, ksub: Int = 32,
                trustKey: Boolean = false): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val books = fitPqCodebooks(emb, sfDir, m, ksub)
    annTopKPqFromIndex(books, quantizePqOn(emb, books),
      emb.select(col("vec_id"), col("embedding")),
      emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("eq")),
      k, rerank)
  }

  /** [[annTopKPq]] probing a PREBUILT (codebooks, codes, vectors)
    * index ([[graft.sources.SimilarityIndexes.writePqIndex]] is the
    * parquet spelling). Shared probe arithmetic — stored and inline
    * results cannot fork.
    */
  /** IVF-PQ — the two prunings COMPOSED, FAISS's production big-corpus
    * factory index `IVF<nlist>,PQ<m>` re-expressed as Spark joins (the
    * [[annTopKIvfSq]] composition applied to PQ codes): IVF cell
    * probing cuts WHICH vectors pay the ADC lookups (nprobe/nlist of
    * the corpus — the piece plain [[annTopKPq]] lacks: its coarse pass
    * scans EVERY vector's codes, the scan bottleneck at 10⁹ vectors)
    * while PQ cuts WHAT each scanned vector costs (m byte-codes, m
    * table lookups, no float read), and the exact float re-rank
    * touches only the `rerank`-per-query shortlist. At 100 TB the
    * cell-partitioned 16-byte code lists are the only corpus-sized
    * artifact a query reads — nprobe/nlist of the files at 1/16 the
    * bytes each.
    *
    * kmeans-seeded (both fits) → rows-only driver check;
    * SimilaritySpec pins the semantics: nprobe = nlist degrades
    * EXACTLY to pure [[annTopKPq]] (cell pruning off — the IVF-SQ8→SQ8
    * precedent), and at the default nprobe recall holds the IVF bound.
    */
  def annTopKIvfPq(spark: SparkSession, sfDir: String,
                   nQueries: Int = 10, k: Int = 5,
                   nlist: Int = 16, nprobe: Int = 12, rerank: Int = 64,
                   m: Int = 16, ksub: Int = 32,
                   trustKey: Boolean = false): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = fitQuantizer(emb, sfDir, nlist, trustKey)
    val books = fitPqCodebooks(emb, sfDir, m, ksub)
    annTopKIvfPqFromIndex(centroids, books,
      quantizePqOn(assignCells(emb, centroids, nassign = 1), books),
      emb.select(col("vec_id"), col("embedding")),
      emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("eq")),
      k, nprobe, rerank)
  }

  /** [[annTopKIvfPq]] probing a PREBUILT index — `codes` carries
    * (vec_id, cell, codes) PQ-coded inverted lists
    * ([[graft.sources.SimilarityIndexes.writeIvfPqIndex]] is the
    * parquet spelling, PARTITIONED BY cell so the ADC pass reads only
    * the probed cells' files), `vectors` the exact re-rank side.
    * Queries rank the centroid literals and keep their `nprobe`
    * nearest cells ([[annTopKIvfSqFromIndex]]'s fan-out), each query's
    * ADC lookup tables broadcast WITH its probe rows, the coarse pass
    * scans only the probed cells' codes behind a broadcast equi-join
    * on cell id (the corpus side never shuffles), and the exact float
    * re-rank joins the shortlist back to `vectors`. Cells are
    * nassign = 1, so no candidate dedup agg is needed. Shared with the
    * inline entry — stored and inline results cannot fork.
    */
  def annTopKIvfPqFromIndex(centroids: Seq[Seq[Double]],
                            books: Seq[Seq[Seq[Double]]], codes: DataFrame,
                            vectors: DataFrame, queries: DataFrame,
                            k: Int = 5, nprobe: Int = 12,
                            rerank: Int = 64): DataFrame = {
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    val lutQueries = queries
      .select(col("query_id"), col("eq"), unitVec(col("eq")).as("__graft_uq"))
      .select(col("query_id"), col("eq"),
        pqLuts(col("__graft_uq"), books).as("luts"))
    val probes = lutQueries.select(col("query_id"), col("eq"), col("luts"),
      posexplode(graft.functions.CellSims.cellSims(col("eq"), centroids))
        .as(Seq("cell", "csim")))
    val wP = Window.partitionBy(col("query_id")).orderBy(col("csim").desc, col("cell").asc)
    val probeCells = probes.withColumn("pr", row_number().over(wP))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("eq"), col("luts"), col("cell"))
    val shortlist = coarseShortlist(codes.join(broadcast(probeCells), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("eq"), col("vec_id").as("neighbor_id"),
        pqSim(col("luts"), col("codes")).as("qsim")), rerank)
    exactRerank(shortlist, vectors, k)
  }

  def annTopKPqFromIndex(books: Seq[Seq[Seq[Double]]], codes: DataFrame,
                         vectors: DataFrame, queries: DataFrame,
                         k: Int = 5, rerank: Int = 64): DataFrame = {
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    exactRerank(coarseShortlist(pqScoredOn(books, codes, queries), rerank),
      vectors, k)
  }

  /** The PQ coarse-scored frame (query_id, eq, neighbor_id, qsim)
    * shared by [[annTopKPqFromIndex]] and [[pqRerankCurve]]: per-query
    * ADC lookup tables broadcast with the queries, every code row
    * scored by m table lookups.
    */
  private def pqScoredOn(books: Seq[Seq[Seq[Double]]], codes: DataFrame,
                         queries: DataFrame): DataFrame = {
    val lutQueries = queries
      .select(col("query_id"), col("eq"), unitVec(col("eq")).as("__graft_uq"))
      .select(col("query_id"), col("eq"),
        pqLuts(col("__graft_uq"), books).as("luts"))
    codes.join(broadcast(lutQueries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("eq"), col("vec_id").as("neighbor_id"),
        pqSim(col("luts"), col("codes")).as("qsim"))
  }

  /** MEASURED rerank depth → recall/scan curve for the two-stage
    * code probes — the [[ivfRecallCurve]] contract applied to the
    * rerank knob (r16 verdict #3), here for PQ, the family whose
    * 16-byte reconstruction is coarsest and whose rerank depth
    * therefore matters most. For each requested depth r, one row
    * (rerank, hits, scanned, n_truth, n_queries, n_corpus,
    * recall_ppm, scan_ppm): `hits` counts probe results that are true
    * exact top-k neighbors ([[bruteTopKOn]] ground truth, one corpus
    * scan paid once), `scanned` the shortlist rows the exact stage
    * actually re-reads as float vectors at that depth — the
    * candidate-sized point-lookup I/O this knob buys recall with.
    *
    * ONE coarse ADC pass serves the whole ladder: the shortlist is
    * ranked ONCE at the deepest requested depth with its coarse rank
    * kept, and `arank <= r` IS [[coarseShortlist]] at depth r
    * (row_number prefix property) — so each step measures exactly
    * [[annTopKPqFromIndex]] at that rerank. Depth-r shortlists are
    * nested supersets ⇒ recall and scanned non-decreasing BY
    * CONSTRUCTION, and at r >= corpus the exact stage sees every
    * candidate — the probe IS brute force and recall_ppm = 10^6
    * (both spec-pinned, the full-rerank == brute precedent).
    * Rows-only driver check (kmeans codebooks); invariants are the
    * spec's.
    */
  def pqRerankCurve(spark: SparkSession, sfDir: String,
                    nQueries: Int = 10, k: Int = 5,
                    reranks: Seq[Int] = Seq(8, 64, 512),
                    m: Int = 16, ksub: Int = 32): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val books = fitPqCodebooks(emb, sfDir, m, ksub)
    pqRerankCurveFromIndex(books, quantizePqOn(emb, books),
      emb.select(col("vec_id"), col("embedding")),
      emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("eq")),
      k, reranks)
  }

  /** [[pqRerankCurve]] over a PREBUILT (codebooks, codes, vectors)
    * index ([[graft.sources.SimilarityIndexes.readPqIndex]]) — tune
    * the depth you actually SERVE against the stored codes as-is.
    */
  def pqRerankCurveFromIndex(books: Seq[Seq[Seq[Double]]], codes: DataFrame,
                             vectors: DataFrame, queries: DataFrame,
                             k: Int = 5,
                             reranks: Seq[Int] = Seq(8, 64, 512)): DataFrame =
    rerankCurveCore(pqScoredOn(books, codes, broadcast(queries)),
      vectors, queries, k, reranks)

  /** [[pqRerankCurve]] for the SQ8 family — the same knob at the
    * shallower storage trade (SQ8's int8 reconstruction error is far
    * below PQ's, so its curve saturates at much smaller depths; the
    * two curves together bound where each family's rerank budget
    * should sit). Same laws, same core, spec-pinned alongside.
    */
  def sqRerankCurve(spark: SparkSession, sfDir: String,
                    nQueries: Int = 10, k: Int = 5,
                    reranks: Seq[Int] = Seq(8, 64, 512)): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
    rerankCurveCore(
      quantizeSq8On(emb).join(broadcast(queries), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("eq"), col("vec_id").as("neighbor_id"),
          sq8Sim(col("eq"), col("codes")).as("qsim")),
      emb.select(col("vec_id"), col("embedding")), queries, k, reranks)
  }

  /** The measurement shared by the rerank-depth curves: `scored` is
    * the family's coarse-scored frame (query_id, eq, neighbor_id,
    * qsim). Memory contract as [[ivfRecallCurve]]'s core: the
    * max-depth ranked shortlist persists for the ladder (bounded by
    * max(reranks) rows per query); sample the query side at scale —
    * the corpus side is never materialized beyond the shortlist.
    */
  private def rerankCurveCore(scored: DataFrame, vectors0: DataFrame,
                              queries0: DataFrame, k: Int,
                              reranks: Seq[Int]): DataFrame = {
    require(reranks.nonEmpty, "rerank curve needs at least one depth")
    reranks.foreach(r => require(r >= k,
      s"rerank=$r must be >= k=$k (the exact stage emits k rows)"))
    val queries = broadcast(requireQuerySample(queries0))
    val vectors = graft.CacheScope.track(vectors0.persist())
    val truth = graft.CacheScope.track(
      bruteTopKOn(vectors, queries, k)
        .select(col("query_id"), col("neighbor_id")).persist())
    val spark = queries0.sparkSession
    import spark.implicits._
    val steps = reranks.distinct.sorted
    val stepsDf = steps.toDF("step")
    val rmax = steps.max
    // the max-depth shortlist is ranked once ([[coarseShortlist]]'s
    // arank prefix property); since r18 the per-depth exact re-ranks
    // also run as ONE join + window pipeline over a step-exploded
    // shortlist instead of |depths| independent subtrees — the
    // per-(step, query) partitions reproduce [[exactRerank]] at each
    // depth exactly
    val shortMax = graft.CacheScope.track(
      saltedTopPerQuery(scored,
          Seq(col("qsim").desc, col("neighbor_id").asc), rmax, "arank")
        .select(col("query_id"), col("eq"), col("neighbor_id"), col("arank"))
        .persist())
    val stepped = shortMax
      .withColumn("step", explode(typedlit(steps)))
      .filter(col("arank") <= col("step"))
    val hits = exactRerank(
        stepped.select(col("step"), col("query_id"), col("eq"), col("neighbor_id")),
        vectors, k, extraPart = Seq(col("step")))
      .join(truth, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("step")).agg(count(lit(1)).as("hits"))
    val scanned = stepped
      .groupBy(col("step")).agg(count(lit(1)).as("scanned"))
    val perStep = stepsDf
      .join(hits, Seq("step"), "left")
      .join(scanned, Seq("step"), "left")
      .select(col("step").as("rerank"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        coalesce(col("scanned"), lit(0L)).as("scanned"))
    ladderPpm(perStep, "rerank", truth, vectors)
  }
}
