package graft.operators

import graft.Tables
import graft.functions.CosineSimilarity.cosineSim
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-cluster CORPUS PRUNING — the cluster-then-select family of
  * data-selection recipes from the public literature: SemDeDup (Abbas et
  * al. 2023) and MiniPile (Kaddour 2023) cluster the corpus embedding
  * space with k-means and then curate per cluster; "Beyond neural
  * scaling laws" (Sorscher et al. 2022) shows WHICH side of each cluster
  * to keep — prototypical (central) examples when data is scarce, hard
  * (outlying) examples when data is abundant. This module ships that
  * selection as engine operators over the `embeddings` table:
  *
  *   - [[clusterAssign]]: each vector → its nearest k-means cell plus
  *     the cosine similarity to that centroid (the "prototypicality"
  *     score all three papers rank by);
  *   - [[clusterProfile]]: the per-cluster map (population, mean /
  *     min / max centroid similarity) a curator eyeballs before choosing
  *     clusters to drop — the MiniPile inspection step;
  *   - [[clusterPrune]]: per-cluster quota keep/drop with the policy
  *     knob: `central` keeps the top keepPct% most prototypical of each
  *     cell, `outlier` keeps the farthest — Sorscher's two regimes.
  *
  * Reuses the IVF coarse quantizer wholesale ([[Similarity.fitQuantizer]]
  * — Spark ML k-means, seed 42, cached per (key, nlist, corpus
  * fingerprint)), so the pruning view of the corpus and the ANN index
  * view of the corpus agree on what "a cluster" is.
  *
  * 100 TB design: the centroids are nlist literals compiled into the
  * row-level similarity expression (the [[Similarity.assignCells]]
  * precedent — the sims array is aliased ONCE so codegen does not
  * re-inline nlist cosine evaluations per reference), so assignment is a
  * pure scan-fused projection: no shuffle, no join, no driver-side data
  * path beyond the centroid read. The profile is one map-side-combined
  * aggregate to nlist rows. The prune ranks within cells through ONE
  * exchange on the cell key reused by both window functions (row_number
  * needs the per-cell sort; the population count shares the partition);
  * cells are corpus/nlist-sized by construction — pick nlist so cells
  * fit a partition, and for pathological skew swap the rank for the
  * engine's skew-safe per-key top-k spelling ([[AsOf.topPerKeySkewSafe]]
  * precedent). Kmeans-seeded cells make outputs engine-specific →
  * rows-only driver checks (the q_embed_ann_ivf precedent);
  * ClusteringSpec pins the semantics on planted separable clusters.
  */
object Clustering {

  /** (vec_id, cell, sim) — nearest-centroid assignment with the cosine
    * similarity to that centroid. `sims` is aliased to a column before
    * argmax/max so each centroid similarity is evaluated exactly once
    * per row.
    */
  private[graft] def assignWithSim(emb: DataFrame,
                                   centroids: Seq[Seq[Double]]): DataFrame = {
    // native all-centroid scorer (r21, guide §4): the composed
    // `array(cosineSim(e, lit(c1)), ..., cosineSim(e, lit(cN)))`
    // re-accumulated |e|² once per centroid and carried one dim-sized
    // literal per centroid through every plan (NativeHofParitySpec
    // pins native == composed parity)
    val sims = graft.functions.CellSims.cellSims(col("embedding"), centroids)
    emb.select(col("vec_id"), sims.as("sims"))
      .select(col("vec_id"),
        (array_position(col("sims"), array_max(col("sims"))) - 1)
          .cast("int").as("cell"),
        array_max(col("sims")).as("sim"))
  }

  /** Fit (or reuse) the corpus quantizer and assign every vector. `key`
    * scopes the quantizer cache exactly like the IVF entry points (pass
    * the sf dir / index key).
    */
  def clusterAssignOn(emb: DataFrame, key: String, nlist: Int): DataFrame =
    assignWithSim(emb, Similarity.fitQuantizer(emb, key, nlist))

  /** Decomposable per-cell partial stats over an assignment frame:
    * (cell, n_vecs, sum_sim_ppm, min_sim_ppm, max_sim_ppm). Similarity
    * goes to ppm PER ROW (floor — deterministic integer from there on),
    * so every measure is a sum/min/max of longs: partials from disjoint
    * deliveries merge on read EXACTLY (sums add, min/max fold — the
    * [[Profile.langStatsOn]] card discipline), which is what lets the
    * streaming ingest maintain the profile without ever re-reading
    * earlier vectors.
    */
  private[graft] def cellStats(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell"), floor(col("sim") * 1000000).cast("long").as("ppm"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("ppm")).as("sum_sim_ppm"),
        min(col("ppm")).as("min_sim_ppm"),
        max(col("ppm")).as("max_sim_ppm"))

  /** Rollup of (possibly pre-merged) cell partials to the surfaced
    * profile row: integer mean via DIV. */
  private def profileFromCells(stats: DataFrame): DataFrame =
    stats.select(col("cell"), col("n_vecs"),
      expr("sum_sim_ppm DIV n_vecs").as("mean_sim_ppm"),
      col("min_sim_ppm"), col("max_sim_ppm"))

  /** Per-cluster map: population and centroid-similarity spread, one row
    * per cell. Similarities surface as ppm longs (integer house rule).
    */
  def clusterProfileOn(emb: DataFrame, key: String, nlist: Int): DataFrame =
    profileFromCells(cellStats(clusterAssignOn(emb, key, nlist)))

  /** The profile against EXPLICIT centroids — the stored-quantizer
    * spelling (pass [[graft.sources.SimilarityIndexes.readIvfIndex]]'s
    * centroids to profile by exactly the cells the ANN index serves).
    */
  def clusterProfileWith(emb: DataFrame, centroids: Seq[Seq[Double]]): DataFrame =
    profileFromCells(cellStats(assignWithSim(emb, centroids)))

  /** The profile read from a STORED stats directory maintained by the
    * streaming cluster-stats ingest
    * ([[graft.streaming.StreamingOps]].ingestClusterStats): per-ingest
    * (cell, …) partials merge on read — sums add, min/max fold — then
    * the same rollup as the batch profile. Given the same centroids,
    * equal to [[clusterProfileOn]] over the union of the deliveries
    * (integer-exact; ClusteringSpec asserts it).
    */
  def clusterProfileFromStats(spark: SparkSession, statsDir: String): DataFrame =
    profileFromCells(
      spark.read.parquet(statsDir)
        .groupBy(col("cell"))
        .agg(sum(col("n_vecs")).as("n_vecs"),
          sum(col("sum_sim_ppm")).as("sum_sim_ppm"),
          min(col("min_sim_ppm")).as("min_sim_ppm"),
          max(col("max_sim_ppm")).as("max_sim_ppm")))

  /** Per-cluster quota selection: every vector gets (cell, rank, kept).
    * `central` ranks prototypical-first (sim desc), `outlier` ranks
    * hard-first (sim asc); ties break on vec_id so the kept set is
    * deterministic given the centroids. Quota = max(1, n·keepPct DIV
    * 100) per cell — every cluster keeps at least one representative
    * (dropping whole clusters is [[clusterProfile]] + a filter, a
    * separate decision).
    */
  def clusterPruneOn(emb: DataFrame, key: String, nlist: Int,
                     keepPct: Int, policy: String): DataFrame = {
    require(keepPct >= 1 && keepPct <= 100, s"keepPct=$keepPct not in [1,100]")
    val ord: Seq[Column] = policy match {
      case "central" => Seq(col("sim").desc, col("vec_id").asc)
      case "outlier" => Seq(col("sim").asc, col("vec_id").asc)
      case other => throw new IllegalArgumentException(
        s"unknown prune policy '$other' (central | outlier)")
    }
    val byCell = Window.partitionBy(col("cell"))
    clusterAssignOn(emb, key, nlist)
      .withColumn("rk", row_number().over(byCell.orderBy(ord: _*)).cast("long"))
      .withColumn("n", count(lit(1)).over(byCell))
      .withColumn("kept",
        (col("rk") <= greatest(lit(1L), expr(s"n * $keepPct DIV 100")))
          .cast("long"))
      .select(col("vec_id"), col("cell"), col("rk"),
        floor(col("sim") * 1000000).cast("long").as("sim_ppm"), col("kept"))
  }

  /** Driver spellings over the embeddings table (rows-only checks —
    * kmeans-seeded cells, the IVF precedent). */
  def clusterProfile(spark: SparkSession, sfDir: String,
                     nlist: Int = 16): DataFrame =
    clusterProfileOn(Tables.embeddings(spark, sfDir), sfDir, nlist)

  def clusterPrune(spark: SparkSession, sfDir: String, nlist: Int = 16,
                   keepPct: Int = 50, policy: String = "central"): DataFrame =
    clusterPruneOn(Tables.embeddings(spark, sfDir), sfDir, nlist,
      keepPct, policy)
}
