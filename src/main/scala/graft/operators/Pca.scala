package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.CovStatsAgg

/** Distributed PCA over an embedding column — the dimensionality
  * reduction a 100 TB embedding corpus runs BEFORE indexing (PCA to
  * 32–128 dims then IVF/PQ is the standard FAISS pre-transform, and
  * the whitening step of SemDeDup-style pipelines).
  *
  * Execution shape — the logreg-gradient pattern, taken further:
  *   1. ONE corpus pass accumulates the second-moment sufficient
  *      statistics ([[graft.functions.CovStatsAgg]]: n, Σx, Σxxᵀ upper
  *      triangle — a 1 + d + d(d+1)/2 buffer, map-side combined; d = 64
  *      → 2145 doubles, control plane);
  *   2. the d×d covariance assembles and eigendecomposes ON THE DRIVER
  *      (cyclic Jacobi — symmetric, deterministic, no library), cost
  *      O(d³) independent of corpus size;
  *   3. projection broadcasts the components back as ONE literal
  *      array-of-arrays and evaluates as a scan-fused transform (the
  *      l2sqAll codegen-size rule: one transform with a nested lambda,
  *      never k separate HOF aggregates; the centered vector is staged
  *      as a column once, never repeated into k lambdas).
  * Nothing corpus-sized touches the driver; nothing driver-sized
  * shuffles.
  *
  * Float caveat: moments accumulate in Double but partial-sum order is
  * partition-dependent, so components are engine-specific in the last
  * ulps — the driver query is rows-only by design (the logreg rule);
  * PcaSpec asserts the algebraic contracts (orthonormality, descending
  * eigenvalues, planted-direction recovery, agg == driver reference).
  */
object Pca {

  /** A fitted model: the mean vector, the top-k principal components
    * (rows, unit norm, eigenvalue-descending), and their eigenvalues
    * (the per-component variances).
    */
  case class PcaModel(n: Long, mean: Array[Double],
                      components: Array[Array[Double]],
                      eigenvalues: Array[Double]) {
    def dim: Int = mean.length
    def k: Int = components.length
  }

  /** The one corpus pass: raw moment vector [n, sums.., products..]. */
  def momentsOn(emb: DataFrame, dim: Int,
                vecCol: String = "embedding"): Array[Double] =
    emb.agg(CovStatsAgg.covStats(col(vecCol), dim).as("s"))
      .head.getSeq[Double](0).toArray

  /** Mean + covariance from a raw moment vector (the stored-artifact
    * read path shares this — [[graft.sources.PcaModels]]).
    */
  def momentsToCov(m: Array[Double], dim: Int): (Long, Array[Double], Array[Array[Double]]) = {
    require(m.length == CovStatsAgg.statsLen(dim),
      s"moment vector of length ${m.length} != statsLen($dim)")
    val n = m(0)
    require(n >= 2.0, s"PCA needs >= 2 vectors, got $n")
    val mean = Array.tabulate(dim)(i => m(1 + i) / n)
    val cov = Array.ofDim[Double](dim, dim)
    var p = 1 + dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = m(p) / n - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        p += 1
        j += 1
      }
      i += 1
    }
    (n.toLong, mean, cov)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvectors-as-rows), sorted eigenvalue-descending
    * with a deterministic sign convention (largest-|component| entry
    * positive). O(d³) per sweep, converges quadratically; d is the
    * embedding dimension — driver-side control plane by construction.
    */
  def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-300) {
            // the classic stable rotation (Golub & Van Loan §8.4)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val col = Array.tabulate(d)(r => v(r)(i))
      // deterministic sign: the largest-|entry| component is positive
      val m = col.indices.maxBy(r => (math.abs(col(r)), -r))
      if (col(m) < 0) col.map(-_) else col
    }.toArray
    (vals, vecs)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** Fit: one corpus pass + a driver-side eigendecomposition.
    *
    * `center = false` eigendecomposes the raw SECOND-MOMENT matrix
    * E[xxᵀ] instead of the covariance (mean pinned to 0, so
    * [[projectOn]] projects UNCENTERED): the top-k basis of E[xxᵀ] is
    * the best rank-k approximation of the corpus Gram matrix, i.e. the
    * basis that preserves DOT PRODUCTS — what retrieval needs
    * ([[Similarity]]'s PCA coarse pass). Variance analysis wants the
    * default centered fit; the two share the one moments pass.
    */
  /** Raw SECOND-MOMENT matrix E[xxᵀ] from a raw moment vector — the
    * `center = false` read path, shared with the stored serving index
    * ([[graft.sources.SimilarityIndexes.writePcaIndex]] derives its
    * basis from the stored moments through exactly this).
    */
  def gramFromMoments(m: Array[Double], dim: Int): (Long, Array[Array[Double]]) = {
    val (n0, _, _) = momentsToCov(m, dim)
    val sm = Array.ofDim[Double](dim, dim)
    var p = 1 + dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = m(p) / n0.toDouble
        sm(i)(j) = v; sm(j)(i) = v
        p += 1; j += 1
      }
      i += 1
    }
    (n0, sm)
  }

  def fitPcaOn(emb: DataFrame, dim: Int, k: Int,
               vecCol: String = "embedding",
               center: Boolean = true): PcaModel = {
    require(k >= 1 && k <= dim, s"need 1 <= k <= dim, got k=$k dim=$dim")
    val m = momentsOn(emb, dim, vecCol)
    val (n, mean, cov) =
      if (center) momentsToCov(m, dim)
      else {
        val (n0, sm) = gramFromMoments(m, dim)
        (n0, Array.fill(dim)(0.0), sm)
      }
    val (vals, vecs) = jacobiEigen(cov)
    PcaModel(n, mean, vecs.take(k), vals.take(k))
  }

  /** Project every row onto the model's components: adds `outCol` =
    * ARRAY<DOUBLE>(k) of centered dot products. Scan-fused: the
    * centered vector stages as one column, the k components evaluate
    * as ONE transform over a literal array-of-arrays (codegen-size
    * rule), zip_with for the dot product — no join, no shuffle.
    */
  def projectOn(emb: DataFrame, model: PcaModel,
                vecCol: String = "embedding",
                outCol: String = "pc"): DataFrame =
    // native projection (r21, guide §4): the composed spelling — a
    // staged `zip_with` centering column plus `transform(compsLit,
    // aggregate(zip_with(c, centered, a*b), 0, +))` — ran k·dim
    // interpreted HOF closures with a zipped allocation per component
    // per row (NativeHofParitySpec pins native == composed parity,
    // including the null-component / length-mismatch → k-nulls edges)
    emb.withColumn(outCol, graft.functions.PcaProject.pcaProject(
      col(vecCol), model.mean.toSeq, model.components.map(_.toSeq).toSeq))

  /** The q_embed_pca driver query: fit k=4 on the embeddings table,
    * project every vector, surface integer-scaled coordinates (the
    * no-floats-surfaced rule; ×1e6 keeps 6 decimal digits). Rows-only
    * by design — float partial-sum order makes the low ulps
    * engine-specific; PcaSpec owns the algebraic contracts.
    */
  def embedPca(spark: SparkSession, sfDir: String, k: Int = 4): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label"))
    val model = fitPcaOn(emb, dim = 64, k = k)
    pcSurface(projectOn(emb, model), k)
  }

  /** The q_embed_pca_idx driver query — [[embedPca]]'s STORED-MOMENTS
    * twin (r14 verdict #8, the q_lm_score_idx precedent): the moments
    * artifact ([[graft.sources.PcaModels]]) is written once as fixture
    * work, the model derives from the COMMITTED merged moments at read
    * ([[graft.sources.PcaModels.readPcaModel]]), and the projection is
    * the same [[projectOn]] — certifying the artifact round-trip at
    * driver cadence. Rows-only like [[embedPca]] (float partial-sum
    * order); PcaSpec asserts stored == inline within the PCA float
    * slack.
    */
  def embedPcaStored(spark: SparkSession, sfDir: String, k: Int = 4): DataFrame = {
    import graft.sources.{DedupIndexes, PcaModels}
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label"))
    val path = DedupIndexes.scratch("target/similarity_index", "pcamoments", sfDir)
    DedupIndexes.writeOnce(path)(PcaModels.writePcaStats(emb, path, dim = 64))
    pcSurface(projectOn(emb, PcaModels.readPcaModel(spark, path, k)), k)
  }

  /** The shared integer-scaled surface of the q_embed_pca twins (the
    * no-floats-surfaced rule; ×1e6 keeps 6 decimal digits). */
  private def pcSurface(projected: DataFrame, k: Int): DataFrame =
    projected.select(Seq(col("vec_id"), col("label")) ++
      (0 until k).map(i =>
        floor(element_at(col("pc"), i + 1) * 1e6).cast("long")
          .as(s"pc${i + 1}_x1e6")): _*)
}
