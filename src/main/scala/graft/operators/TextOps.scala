package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared tokenization / shingling primitives for the text pipeline.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * higher-order functions — no UDFs — so the expressions stay inside
  * whole-stage codegen and scale linearly with input size.
  */
object TextOps {

  /** Whitespace tokenization. The documents fixture is single-space
    * separated; kept as a plain split so the DuckDB oracle
    * (`string_split(text, ' ')`) is bit-identical.
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles of `text`, as space-joined strings.
    * Empty array when the doc has fewer than n tokens. Backed by the
    * native codegen expression [[graft.functions.WordShingles]] — the
    * interpreted HOF spelling below ([[shinglesHof]]) was the hottest
    * projection in the bench.
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.WordShingles.wordShingles(text, n)

  /** Composed-builtins reference spelling of [[shingles]] — kept for the
    * equivalence test (MinHashSpec asserts the two agree column-for-
    * column). The `when` guards Spark's `sequence`, which would
    * otherwise generate a DESCENDING range below n tokens.
    */
  def shinglesHof(text: Column, n: Int): Column = {
    val ws = tokens(text)
    when(size(ws) >= n,
      array_distinct(
        transform(sequence(lit(1), size(ws) - (n - 1)),
          i => concat_ws(" ", slice(ws, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature (k values) of a shingle-set column: for each seed
    * s, min over shingles of xxhash64(shingle, s). One pass over the
    * array per row; no shuffle, no UDF (SURVEY.md §7.3 route (a)).
    * Readable reference spelling — the production dedup path uses the
    * native codegen [[graft.functions.MinHash]] instead (HOF lambdas
    * stay interpreted and dominated the round-1 bench).
    */
  def minHashSignature(shingleSet: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      s => array_min(transform(shingleSet, g => xxhash64(g, s))))

  /** LSH band keys from a minhash signature: `bands` hashes, each over
    * `rowsPerBand` consecutive signature entries. Two sets collide on a
    * band iff that band's sub-signature is identical.
    */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, slice(signature, b * rowsPerBand + 1, lit(rowsPerBand))))
}
