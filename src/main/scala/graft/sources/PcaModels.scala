package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Pca

/** STORED PCA models — the fourth trained artifact family, and the
  * second-moment case of the mergeable-statistics rule: the PCA fit's
  * sufficient statistics ([n, Σx, Σxxᵀ], [[graft.functions
  * .CovStatsAgg]]) are ADDITIVE, so the artifact stores the raw moment
  * vector per ingest and the model (mean, covariance, eigenvectors)
  * derives at read over the elementwise-summed committed moments —
  * init-then-append covers exactly the union a fresh fit would see
  * (double partial-sum order is the only slack, unlike the NB/LM
  * integer counts). A 100 TB embedding corpus updates its projection
  * basis per delivery by paying one batch-sized pass, never re-reading
  * committed vectors; the eigendecomposition is d×d driver work at
  * read.
  *
  * Layout under `path` (pointer-resolved like every stored family):
  *   - `meta`                    = 1 row (dim) — written FIRST; appends
  *     REQUIRE the same dim (a different dimension is a different
  *     space, not a continuation);
  *   - `moments/ingest=<label>`  = 1 row (m: ARRAY<DOUBLE> of
  *     1 + d + d(d+1)/2) — the ingest's raw moments, its own commit
  *     marker (one atomic artifact per ingest; own-label overwrite
  *     heals any replay).
  */
object PcaModels {

  val BaseLabel: String = DedupIndexes.BaseLabel

  private def writeIngest(emb: DataFrame, path: String, label: String,
                          dim: Int, vecCol: String): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    Seq(Pca.momentsOn(emb, dim, vecCol).toSeq).toDF("m")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/moments/ingest=$label")
  }

  /** Init: meta first, the base ingest's moments. */
  def writePcaStats(emb: DataFrame, path: String, dim: Int,
                    vecCol: String = "embedding"): Unit = {
    val spark = emb.sparkSession
    DedupIndexes.assertTargetNotOverInputs(emb, path)
    DedupIndexes.delete(spark, path)
    import spark.implicits._
    Seq(dim).toDF("dim").write.mode("overwrite").parquet(s"$path/meta")
    writeIngest(emb, path, BaseLabel, dim, vecCol)
  }

  /** Append a delivery's moments under its own label — one batch-sized
    * pass, replay-idempotent, dimension pinned by meta. */
  def appendPca(emb: DataFrame, path0: String, label: String,
                vecCol: String = "embedding"): Unit = {
    require(label.nonEmpty && label != BaseLabel,
      s"append label must not collide with the full-build label '$BaseLabel'")
    val spark = emb.sparkSession
    val path = DedupIndexes.resolveIndex(spark, path0)
    writeIngest(emb, path, label, readPcaDim(spark, path), vecCol)
  }

  /** The pinned dimension. */
  def readPcaDim(spark: SparkSession, path0: String): Int =
    spark.read.parquet(s"${DedupIndexes.resolveIndex(spark, path0)}/meta")
      .head.getAs[Int]("dim")

  /** Derive the model: merge every ingest's moments elementwise
    * (ingest-count × O(d²) doubles — control plane), then the shared
    * [[Pca.momentsToCov]] + [[Pca.jacobiEigen]] read path. */
  def readPcaModel(spark: SparkSession, path0: String,
                   k: Int): Pca.PcaModel = {
    val path = DedupIndexes.resolveIndex(spark, path0)
    val dim = readPcaDim(spark, path)
    val rows = spark.read.parquet(s"$path/moments")
      .select(col("m")).collect().map(_.getSeq[Double](0).toArray)
    require(rows.nonEmpty, s"no committed moments under $path")
    val merged = rows.reduce { (a, b) =>
      Array.tabulate(a.length)(i => a(i) + b(i))
    }
    val (n, mean, cov) = Pca.momentsToCov(merged, dim)
    val (vals, vecs) = Pca.jacobiEigen(cov)
    Pca.PcaModel(n, mean, vecs.take(k), vals.take(k))
  }
}
