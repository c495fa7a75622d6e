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

  /** Embedding near-dup: all pairs with cosine >= `threshold`. Brute
    * force O(n²) pair scan — correct baseline; [[annTopKLsh]]'s bucketing
    * is the at-scale variant. Output is ids only (ints): float scores
    * never surface, so the oracle compare can't hit float-boundary
    * flakiness.
    */
  def cosineNearDupPairs(spark: SparkSession, sfDir: String,
                         threshold: Double = 0.45): DataFrame = {
    val v = Tables.embeddings(spark, sfDir)
    val a = v.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = v.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    a.join(b, col("id_a") < col("id_b"))
      .filter(cosineSim(col("ea"), col("eb")) >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** Brute-force cosine top-k: for each query vector (vec_id < nQueries),
    * the k nearest other vectors. Deterministic tie-break by neighbor id.
    * Plan: broadcast the (tiny) query side, score all candidates in one
    * codegen'd pass, per-query top-k via window — the shuffle is on
    * query_id (nQueries keys).
    */
  def annTopKBrute(spark: SparkSession, sfDir: String,
                   nQueries: Int = 10, k: Int = 5): DataFrame = {
    val v = Tables.embeddings(spark, sfDir)
    val q = broadcast(v.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq")))
    val scored = v.join(q, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosineSim(col("eq"), col("embedding")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      // BIGINT rank to match DuckDB's ROW_NUMBER() output type
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
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
    * sign(cosine), so the native expression scores raw float arrays
    * against double-literal planes directly.
    */
  private def sketchKeys(emb: Column, pl: Seq[Seq[Seq[Double]]]): Column =
    array(pl.zipWithIndex.map { case (table, t) =>
      val bits = table.zipWithIndex.map { case (plane, p) =>
        when(cosineSim(emb, typedlit(plane)) > 0, lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)
      // disambiguate tables: key = (table index, bit pattern)
      (bits + lit(t * 65536)).cast("long")
    }: _*)

  /** ANN top-k via random-hyperplane LSH: candidates = vectors sharing at
    * least one sketch key with the query (bucket join, no cross join),
    * re-scored exactly, per-query top-k. Approximate: recall depends on
    * (nTables, bitsPerTable); measured vs brute force in SimilaritySpec at
    * the defaults. THE scale path: cost is bucket-local, and hot buckets
    * can be salted or capped.
    */
  def annTopKLsh(spark: SparkSession, sfDir: String,
                 nQueries: Int = 10, k: Int = 5,
                 nTables: Int = 8, bitsPerTable: Int = 4): DataFrame = {
    val pl = planes(nTables, bitsPerTable, 64)
    val v = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        explode(sketchKeys(col("embedding"), pl)).as("key"))
    val q = v.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"), col("key"))
    val cands = v.join(q, Seq("key"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("eq"), col("vec_id").as("neighbor_id"), col("embedding"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    cands.withColumn("sim", cosineSim(col("eq"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }
}
