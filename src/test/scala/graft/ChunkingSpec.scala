package graft

import graft.operators.Chunking
import org.apache.spark.sql.functions._

/** Passage chunking (q_chunk_passages): the full chunk coordinates and
  * text are hash-checked against DuckDB by the driver; this suite
  * asserts the window invariants — gap-free coverage, exact overlap,
  * short-tail semantics — and the hand-computed small case.
  */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private val sf = TestSpark.sf0001
  private lazy val chunks = Chunking.chunkPassages(spark, sf).cache()

  test("hand-built example: 10 tokens, chunk 4, stride 3") {
    val doc = Seq((1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")).toDF("doc_id", "text")
    val got = Chunking.chunkPassagesOn(doc, 4, 3)
      .select("chunk_id", "start_tok", "n_tok", "chunk_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (0L, 1L, 4L, "t1 t2 t3 t4"),
      (1L, 4L, 4L, "t4 t5 t6 t7"),
      (2L, 7L, 4L, "t7 t8 t9 t10")))
  }

  test("a doc that fits one chunk is emitted whole, once") {
    val doc = Seq((1L, "a b c")).toDF("doc_id", "text")
    val got = Chunking.chunkPassagesOn(doc, 32, 24)
      .select("chunk_id", "start_tok", "n_tok", "chunk_text")
      .as[(Long, Long, Long, String)].collect()
    assert(got.toSeq === Seq((0L, 1L, 3L, "a b c")))
  }

  test("coverage is gap-free: consecutive starts differ by stride and the last chunk ends at n") {
    val n = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    val agg = chunks.groupBy("doc_id")
      .agg(min(col("start_tok")).as("first"),
        max(col("start_tok") + col("n_tok") - 1).as("covered"),
        count(lit(1)).as("k"), max(col("chunk_id")).as("maxid"))
    val j = agg.join(n, "doc_id")
    assert(j.filter(col("first") =!= 1).isEmpty, "a doc's first chunk is not at token 1")
    assert(j.filter(col("covered") =!= col("n")).isEmpty,
      "a doc's chunks do not cover exactly up to its last token")
    assert(j.filter(col("maxid") =!= col("k") - 1).isEmpty, "chunk ids not dense from 0")
    // starts form the arithmetic progression 1, 1+stride, ... (dense ids
    // + the fixed start formula make any gap a start_tok mismatch)
    assert(chunks.filter(col("start_tok") =!= col("chunk_id") * 24 + 1).isEmpty)
  }

  test("every chunk's text has exactly n_tok tokens; interior chunks are full") {
    assert(chunks
      .filter(size(split(col("chunk_text"), " ")).cast("long") =!= col("n_tok"))
      .isEmpty, "chunk_text token count diverges from n_tok")
    val maxId = chunks.groupBy("doc_id").agg(max(col("chunk_id")).as("last"))
    val interiorShort = chunks.join(maxId, "doc_id")
      .filter(col("chunk_id") < col("last") && col("n_tok") =!= 32)
    assert(interiorShort.isEmpty, "an interior (non-final) chunk runs short")
  }

  test("toksCol fed with the whitespace split reproduces the default chunking exactly") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val withToks = docs.withColumn("ws", split(col("text"), " "))
    val viaCol = Chunking.chunkPassagesOn(withToks, 32, 24, Some("ws"))
    assert(viaCol.except(chunks).isEmpty && chunks.except(viaCol).isEmpty,
      "the pre-tokenized path diverged from the default whitespace path")
  }

  test("tokenizer-faithful chunking: BPE-segmented passages budget real tokens") {
    import graft.operators.{Bpe, TextOps}
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val merges = Bpe.learnMergesOn(docs, 4)
      .orderBy(col("step")).as[(Int, String, String, Long)].collect()
      .map(m => (m._2, m._3)).toSeq
    val seg = docs.withColumn("bpe",
      flatten(transform(TextOps.tokens(col("text")),
        w => Bpe.segmentWith(w, merges))))
      .cache()
    // stride == chunk -> disjoint partition of the token stream; the
    // "" joiner concatenates passages back to the full segmented
    // stream exactly (subword units carry no separator of their own)
    val got = Chunking.chunkPassagesOn(seg, 16, 16, Some("bpe"), joiner = "")
      .cache()
    val rebuilt = got.groupBy("doc_id")
      .agg(concat_ws("", array_sort(collect_list(
        struct(col("chunk_id"), col("chunk_text")))).getField("chunk_text"))
        .as("joined"))
    val expected = seg.select(col("doc_id"),
      concat_ws("", col("bpe")).as("marked"))
    val bad = rebuilt.join(expected, "doc_id")
      .filter(col("joined") =!= col("marked"))
    assert(bad.isEmpty,
      "disjoint BPE passages do not concatenate back to the segmented stream")
    // budgets are tokenizer units: every interior passage is 16 BPE
    // tokens even though 16 WORDS would be a different cut
    val lastId = got.groupBy("doc_id").agg(max(col("chunk_id")).as("last"))
    assert(got.join(lastId, "doc_id")
      .filter(col("chunk_id") < col("last") && col("n_tok") =!= 16).isEmpty,
      "an interior BPE passage is not exactly 16 tokenizer tokens")
    seg.unpersist(); got.unpersist()
    spark.catalog.clearCache()
  }

  test("degenerate parameters are rejected") {
    val doc = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Chunking.chunkPassagesOn(doc, 0, 1))
    intercept[IllegalArgumentException](Chunking.chunkPassagesOn(doc, 4, 0))
    intercept[IllegalArgumentException](Chunking.chunkPassagesOn(doc, 4, 5))
  }
}
