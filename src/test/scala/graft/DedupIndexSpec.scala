package graft

import java.io.File

import graft.operators.Dedup
import graft.sources.DedupIndexes

class DedupIndexSpec extends SparkSpec {
  import spark.implicits._
  val sf = TestSpark.sf0001

  private def docs = Tables.documents(spark, sf).select($"doc_id", $"text")
  private def corpus = docs.filter($"doc_id" % 10 < 8)
  private def batch = docs.filter($"doc_id" % 10 >= 8)

  test("stored near-dup index probe equals the inline derivation") {
    val path = "target/dedup_index_spec/neardup"
    DedupIndexes.writeNearDupIndex(corpus, path)
    val (sh, idx) = DedupIndexes.readNearDupIndex(spark, path)
    val stored = Dedup.incrementalNearDupFromIndex(sh, idx, batch)
      .as[(Long, Option[Long], Long, Long)].collect().toSet
    val inline = Dedup.incrementalNearDup(corpus, batch)
      .as[(Long, Option[Long], Long, Long)].collect().toSet
    spark.catalog.clearCache()
    assert(stored.nonEmpty, "fixture batch must produce verdicts")
    assert(stored === inline,
      "probing the parquet-materialized index must equal deriving it inline")
  }

  test("near-dup band index lands partitioned by band on disk") {
    val path = "target/dedup_index_spec/neardup"
    DedupIndexes.writeNearDupIndex(corpus, path)
    val dirs = new File(s"$path/bands").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("band=")).sorted
    assert(dirs.length === Dedup.MinHashBands,
      s"expected ${Dedup.MinHashBands} band= partition dirs, got ${dirs.mkString(",")}")
  }

  test("stored verbatim index probe equals the inline derivation") {
    val path = "target/dedup_index_spec/verbatim"
    DedupIndexes.writeVerbatimIndex(corpus, path)
    val (pos, occ) = DedupIndexes.readVerbatimIndex(spark, path)
    // minRunTokens = n: report EVERY shared span, so the equality is
    // exercised on a non-trivial result set at sf0.001
    val stored = Dedup.incrementalVerbatimRunsFromIndex(pos, occ, batch,
        minRunTokens = 3).as[(Long, Long, Long)].collect().toSet
    val inline = Dedup.incrementalVerbatimRuns(corpus, batch,
        minRunTokens = 3).as[(Long, Long, Long)].collect().toSet
    spark.catalog.clearCache()
    assert(stored.nonEmpty, "fixture batch must share spans with the corpus")
    assert(stored === inline,
      "probing the parquet-materialized index must equal deriving it inline")
  }

  test("stored occurrence table equals a fresh aggregation of the stored positions") {
    val path = "target/dedup_index_spec/verbatim"
    DedupIndexes.writeVerbatimIndex(corpus, path)
    val (pos, occ) = DedupIndexes.readVerbatimIndex(spark, path)
    val fresh = pos.groupBy($"ng").agg(
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("occ"))
    assert(occ.as[(String, Long)].collect().toMap ===
      fresh.as[(String, Long)].collect().toMap,
      "materialized occ table must stay consistent with its index")
  }
}
