package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-sensitivity smoke: replicates the documents table Nx in memory
  * (fresh doc_ids per copy, perturbed first token so copies aren't exact
  * dups) and times the heavy dedup pipelines at growing input sizes.
  * Near-linear growth validates the bucketed designs; quadratic growth
  * would expose an all-pairs plan hiding behind small test data.
  *
  * Usage: `sbt 'runMain graft.ScaleSmoke [sfDir]'` — prints one JSON
  * line per (pipeline, factor) with rows and seconds.
  */
object ScaleSmoke {

  private def replicated(spark: SparkSession, sfDir: String, factor: Int): DataFrame = {
    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val n = base.count()
    (0 until factor).map { i =>
      base.select(
        (col("doc_id") + lit(i * n)).as("doc_id"),
        // suffix EVERY token per copy: replicas share no shingles with
        // each other or the original, so the pair structure stays that
        // of the base data scaled Nx — replicating verbatim would build
        // factor-sized near-dup cliques and measure that pathology
        // instead of pipeline scaling
        regexp_replace(col("text"), "(\\S+)", s"$$1x$i").as("text"))
    }.reduce(_ union _)
  }

  private def timeIt(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val rows = f
    ((System.nanoTime() - t0) / 1e9, rows)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val factors = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(1, 4, 16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.TextOps

    for (factor <- factors) {
      val docs = replicated(spark, sfDir, factor)
        .select(col("doc_id"), TextOps.shingles(col("text"), 3).as("sh"))
        .withColumn("sz", size(col("sh"))).filter(col("sz") > 0)
        .persist()
      docs.count()

      // minhash-LSH shape: band keys -> bucket self-join -> distinct pairs
      val banded = docs.select(col("doc_id"),
        posexplode(functions.MinHash.minhashBandKeys(col("sh"), 64, 16))
          .as(Seq("band", "key")))
      val (tMh, nMh) = timeIt {
        banded.as("x").join(banded.as("y"),
            col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id"), col("y.doc_id")).distinct().count()
      }
      // inverted-index shape: explode -> df filter -> pair-count agg
      val inv = docs.select(col("doc_id"), explode(col("sh")).as("ng"))
      val (tNg, nNg) = timeIt {
        inv.as("x").join(inv.as("y"),
            col("x.ng") === col("y.ng") && col("x.doc_id") < col("y.doc_id"))
          .groupBy(col("x.doc_id"), col("y.doc_id")).count().count()
      }
      println(s"""{"factor":$factor,"minhash_sec":$tMh,"minhash_cands":$nMh,""" +
        s""""ngram_sec":$tNg,"ngram_pairs":$nNg}""")
      docs.unpersist()
    }
    spark.stop()
  }
}
