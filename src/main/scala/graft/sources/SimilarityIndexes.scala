package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Materialized IVF index for the similarity family — the embedding-side
  * counterpart of [[DedupIndexes]]: the coarse quantizer's centroids and
  * the corpus's cell assignments written to parquet at ingest, so query
  * sessions probe storage instead of re-fitting a process-lifetime
  * quantizer memo ([[Similarity.fitQuantizer]]'s documented limitation).
  *
  * Layout:
  *   - `path/centroids` = (cell, centroid) — nlist rows, control-plane
  *     sized, collected to the driver at read exactly like the in-memory
  *     quantizer ships its centroid literals into codegen;
  *   - `path/cells` = (vec_id, embedding, cell) PARTITIONED BY cell —
  *     the FAISS-style inverted lists: each cell's vectors are
  *     co-located files, so a probe restricted to nprobe cells touches
  *     nprobe/nlist of the data (and at scale dynamic partition pruning
  *     can elide files for the cell-id equi-join). The embedding rides
  *     IN the index — probes re-score candidates without ever joining
  *     back to the source table.
  *
  * The index is written for a fixed (nlist, nassign): nassign = 1 is
  * the ANN layout ([[Similarity.annTopKIvfFromIndex]]); nassign > 1 is
  * the multi-probe dedup blocker ([[Similarity.semanticDedupFromIndex]]).
  * Rebuild to change either — the quantizer fit is deterministic
  * (seeded), so a rebuild over unchanged data reproduces the index
  * byte-for-byte modulo file layout.
  */
object SimilarityIndexes {

  /** Fit the quantizer on `emb` (memoized — index build IS the one
    * place the fit belongs) and write centroids + cell assignments.
    */
  def writeIvfIndex(emb: DataFrame, path: String, qKey: String,
                    nlist: Int = 16, nassign: Int = 1): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val centroids = Similarity.fitQuantizer(emb, qKey, nlist)
    centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cell", "centroid")
      .write.mode("overwrite").parquet(s"$path/centroids")
    Similarity.assignCells(emb, centroids, nassign)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
  }

  /** Read back (centroids, cells). Centroids collect to the driver —
    * nlist rows of control plane, the same shape every probe embeds as
    * codegen literals; `cell` returns as its partition-column string
    * spelling and is cast back to the probe's integer key.
    */
  def readIvfIndex(spark: SparkSession, path: String): (Seq[Seq[Double]], DataFrame) = {
    val centroids = spark.read.parquet(s"$path/centroids")
      .orderBy(col("cell"))
      .select(col("centroid"))
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    val cells = spark.read.parquet(s"$path/cells")
      .withColumn("cell", col("cell").cast("int"))
    (centroids, cells)
  }

  // -- driver-query harness: the q_embed_ann_ivf stored-probe twin.
  // Index build is fixture work (write once at "ingest"), memoized per
  // JVM like DedupIndexes' scratch builds so the bench charges the
  // query only for the probe. Rows-only driver check for the same
  // reason as q_embed_ann_ivf (kmeans-seeded cells are engine-
  // specific); SimilaritySpec asserts stored == inline and the recall
  // bound. --

  private val written = scala.collection.concurrent.TrieMap.empty[String, Unit]

  private def scratch(sfDir: String): String = {
    val tag = sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
    s"target/similarity_index/ivf/$tag"
  }

  /** [[Similarity.annTopKIvf]] probing the materialized IVF index. */
  def annIvfProbeDocs(spark: SparkSession, sfDir: String,
                      nQueries: Int = 10, k: Int = 5,
                      nprobe: Int = 12): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val path = scratch(sfDir)
    written.getOrElseUpdate(path, writeIvfIndex(emb, path, sfDir))
    val (centroids, cells) = readIvfIndex(spark, path)
    Similarity.annTopKIvfFromIndex(centroids, cells,
      emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("eq")),
      k, nprobe)
  }
}
