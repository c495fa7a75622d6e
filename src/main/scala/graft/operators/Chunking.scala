package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PASSAGE CHUNKING — sliding-window document splitting, the
  * preparation step shared by RAG retrieval corpora and
  * fixed-context-window finetuning sets: each document becomes
  * overlapping `chunkTokens`-token passages whose starts are `stride`
  * tokens apart (stride < chunk ⇒ consecutive passages overlap by
  * `chunkTokens - stride` tokens, the standard boundary-recall hedge).
  *
  * Emitted per passage: (doc_id, chunk_id, start_tok, n_tok,
  * chunk_text) with `start_tok` 1-based, `n_tok = min(chunkTokens,
  * n - start_tok + 1)` (the final passage is allowed to run short
  * rather than read past the document), and `chunk_text` the
  * space-rejoin of exactly that token slice. Every token of every doc
  * is covered by at least one passage; a doc shorter than one chunk
  * yields exactly one passage — itself.
  *
  * 100 TB shape: a pure per-row projection + explode — no shuffle, no
  * window, no join; the fan-out is ⌈(n - chunk) / stride⌉ + 1 rows per
  * doc, all computed inside whole-stage codegen (`sequence` /
  * `slice` / `concat_ws` builtins). The chunk count formula is integer
  * arithmetic with one spelling in Spark and DuckDB.
  */
object Chunking {

  /** Driver spelling over the documents table: 32-token passages at
    * stride 24 (8-token overlap) — sized so the fixture's 10-99-token
    * docs exercise the one-chunk, exact-fit, and short-tail cases.
    */
  def chunkPassages(spark: SparkSession, sfDir: String,
                    chunkTokens: Int = 32, stride: Int = 24): DataFrame =
    chunkPassagesOn(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      chunkTokens, stride)

  /** [[chunkPassages]] over any (doc_id, text) frame.
    *
    * `toksCol = Some(c)`: chunk over the caller's PRE-SEGMENTED token
    * array column `c` instead of the whitespace split — the
    * tokenizer-faithful spelling: feed it the flattened
    * [[Bpe.segmentWith]] output (or any tokenizer's unit array) and a
    * 32-token passage is 32 tokenizer tokens, not 32 words.
    * `joiner` rebuilds `chunk_text` from the token slice (default a
    * space, the whitespace tokenization's inverse); a subword
    * tokenizer whose units carry their own boundary convention (the
    * end-of-word-marker idiom [[Bpe]] documents) passes "" so
    * passages concatenate back to text under that convention.
    */
  def chunkPassagesOn(docs: DataFrame,
                      chunkTokens: Int = 32, stride: Int = 24,
                      toksCol: Option[String] = None,
                      joiner: String = " "): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(stride > 0 && stride <= chunkTokens,
      s"stride must be in 1..chunkTokens for gap-free coverage, got $stride")
    toksCol.foreach(tc => require(docs.columns.contains(tc),
      s"chunkPassagesOn: toksCol '$tc' is not a column of the input frame"))
    val c = lit(chunkTokens.toLong)
    val s = lit(stride.toLong)
    docs
      .select(col("doc_id"),
        toksCol.fold(TextOps.tokens(col("text")))(tc => col(tc)).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      // ⌈(n - chunk) / stride⌉ + 1 starts cover 1..n; one chunk when the
      // doc fits (n >= 1 always: the split of "" is [""])
      .withColumn("chunk_id", explode(sequence(lit(0L),
        when(col("n") <= c, lit(0L))
          .otherwise(expr(
            s"(n - $chunkTokens + $stride - 1) DIV ${stride}L")))))
      .withColumn("start_tok", col("chunk_id") * s + 1)
      .withColumn("n_tok", least(c, col("n") - col("start_tok") + 1))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"), col("n_tok"),
        array_join(slice(col("toks"), col("start_tok"), col("n_tok")), joiner)
          .as("chunk_text"))
  }
}
