package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CCNet-style LANGUAGE-MODEL quality scoring — the perplexity-filtering
  * stage of a production corpus build (Wenzek et al., "CCNet: Extracting
  * High Quality Monolingual Datasets from Web Crawl Data", public
  * literature: train a small LM on a trusted reference corpus, score
  * every candidate document by its cross-entropy under that LM, and
  * split the corpus into head / middle / tail perplexity tertiles).
  *
  * The arithmetic here is INTEGER-EXACT so every surfaced column
  * oracle-checks bit-for-bit (the [[Mixture]] house rule): instead of
  * float `-log p`, token surprise is measured in whole bits via binary
  * bit-length — `bitlen(x) = length(bin(x))` is exact integer arithmetic
  * with one spelling in Spark and DuckDB, unlike `log`/`ln`, which carry
  * a 1-ulp license that could flip a rounding boundary between engines.
  * For a token with reference count c out of N reference tokens,
  *
  *   surprise_bits = bitlen(N) - bitlen(c + 1)
  *
  * which is `floor(log2 N) - floor(log2 (c+1))` — a staircase of the true
  * `log2 (N / (c+1))` cross-entropy with Laplace smoothing (+1 keeps the
  * out-of-vocabulary case finite, exactly CCNet's unknown-token
  * handling). Monotone in the probability, so tertile membership — the
  * thing CCNet actually consumes — matches the float spelling except at
  * staircase ties, which the deterministic doc_id tie-break resolves
  * identically in both engines.
  *
  * 100 TB shape: the vocabulary is ONE aggregate over the reference
  * slice capped to `vocabSize` rows (a control-plane-sized frame, the
  * [[Mixture.importanceWeightsOn]] 4096-row precedent) and arrives at
  * the scorer as a BroadcastExchange; scoring is explode → broadcast
  * left-join → doc-keyed partial agg — no corpus-sized shuffle except
  * the doc-keyed count-sum, which map-side combines to one row per doc
  * per partition. Bucketing reuses the score-HISTOGRAM spelling of
  * [[Mixture.importanceResampleOn]]: tertile boundaries come from a
  * histogram-sized frame, whole-value buckets join back by value, and
  * only the (at most two) boundary-straddling score values pay a
  * per-doc tie-break window.
  */
object Lm {

  /** Whole bits of `x >= 1`: length of its binary representation,
    * i.e. `floor(log2 x) + 1` — exact in both engines (`bin` has one
    * spelling; no float licenses).
    */
  private def bitlen(x: Column): Column = length(bin(x)).cast("long")

  /** Unigram vocabulary of the reference slice: top `vocabSize` tokens
    * by (count desc, token asc) — the deterministic tie-break makes the
    * cap reproducible across engines. `orderBy.limit` compiles to
    * TakeOrdered (distributed partial top-k, then one driver merge of
    * `vocabSize` rows — control-plane-sized by construction).
    */
  def vocabOn(refTexts: DataFrame, vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabOn needs a positive vocabSize, got $vocabSize")
    refTexts
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(vocabSize)
  }

  /** Per-document cross-entropy under the reference unigram LM, in
    * whole bits: (doc_id, n_tokens, bits, bits_per_100) with
    * `bits_per_100 = bits * 100 DIV n_tokens` — the integer-exact
    * per-token normalization (docs always have >= 1 token: the split
    * of "" is [""]).
    */
  def lmScore(spark: SparkSession, sfDir: String,
              refLang: String = "en", vocabSize: Int = 4096): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    lmScoreOn(docs.select(col("doc_id"), col("text")),
      docs.filter(col("lang") === refLang).select(col("text")), vocabSize)
  }

  /** [[lmScore]] over any (doc_id, text) frame against any (text)
    * reference slice.
    */
  def lmScoreOn(docs: DataFrame, refTexts: DataFrame,
                vocabSize: Int = 4096): DataFrame =
    // one row: total reference token count N (includes tokens beyond the
    // vocab cap — the denominator CCNet normalizes by)
    lmScoreFromModel(docs, vocabOn(refTexts, vocabSize),
      refTexts.select(
        sum(size(TextOps.tokens(col("text"))).cast("long")).as("ntot")))

  /** The scoring body against an EXPLICIT model — a (tok, cnt) capped
    * vocabulary frame and a 1-row (ntot) totals frame — factored so the
    * stored-model path ([[graft.sources.LmModels.lmScoreStoredOn]])
    * scores through the IDENTICAL plan: broadcast vocab join, 1-row
    * ntot crossJoin (house precedent), one doc-keyed map-side-combined
    * aggregate.
    */
  def lmScoreFromModel(docs: DataFrame, vocab: DataFrame,
                       ntot: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .join(broadcast(vocab), Seq("tok"), "left")
      .crossJoin(broadcast(ntot))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(bitlen(col("ntot")) - bitlen(coalesce(col("cnt"), lit(0L)) + 1))
          .as("bits"))
      .withColumn("bits_per_100", expr("bits * 100 DIV n_tokens"))

  /** CCNet head / middle / tail split: global rank by
    * (bits_per_100 asc, doc_id asc); head = ranks 1..⌊n/3⌋ (lowest
    * perplexity — the trusted-looking slice), tail = ranks past ⌊2n/3⌋,
    * middle between. Emits (doc_id, bits_per_100, bucket).
    *
    * The global rank is NOT a corpus-wide window: buckets are decided
    * per score VALUE from the histogram (whole-value case), and only
    * docs whose score value straddles a tertile boundary — at most two
    * values — pay a per-doc `row_number` tie-break, the
    * [[Mixture.importanceResampleOn]] boundary spelling.
    */
  def lmBuckets(spark: SparkSession, sfDir: String,
                refLang: String = "en", vocabSize: Int = 4096): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    lmBucketsOn(docs.select(col("doc_id"), col("text")),
      docs.filter(col("lang") === refLang).select(col("text")), vocabSize)
  }

  /** [[lmBuckets]] over any (doc_id, text) frame. */
  def lmBucketsOn(docs: DataFrame, refTexts: DataFrame,
                  vocabSize: Int = 4096): DataFrame =
    bucketsFromScores(lmScoreOn(docs, refTexts, vocabSize)
      .select(col("doc_id"), col("bits_per_100")))

  /** Head/middle/tail tertiles over ANY (doc_id, bits_per_100) score
    * frame — factored out so every scorer with the [[lmScoreOn]] shape
    * (unigram, bigram stupid-backoff, a future trigram) buckets through
    * ONE spelling. Same histogram + boundary-straddle mechanics as
    * documented on [[lmBuckets]].
    */
  def bucketsFromScores(scores: DataFrame): DataFrame = {
    val sc = graft.CacheScope.track(
      scores.select(col("doc_id"), col("bits_per_100")).persist())
    // histogram of score values: tiny next to the corpus; the window
    // below runs over THIS frame, never the per-doc one
    val h = sc.groupBy(col("bits_per_100")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum_before", coalesce(
        sum(col("cnt")).over(Window.orderBy(col("bits_per_100"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val bounds = h.agg((sum(col("cnt")) / 3).cast("long").as("q1"),
      (sum(col("cnt")) * 2 / 3).cast("long").as("q2"))
    // whole-value bucket where the value sits entirely inside one
    // tertile; null marks the (<= 2) boundary-straddling values
    val valueBuckets = h.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        when(col("cum_before") + col("cnt") <= col("q1"), lit("head"))
          .when(col("cum_before") >= col("q1") &&
            col("cum_before") + col("cnt") <= col("q2"), lit("middle"))
          .when(col("cum_before") >= col("q2"), lit("tail")))
      .select(col("bits_per_100"), col("cum_before"),
        col("q1"), col("q2"), col("bucket"))
    val joined = sc.join(broadcast(valueBuckets), Seq("bits_per_100"))
    val whole = joined.filter(col("bucket").isNotNull)
      .select(col("doc_id"), col("bits_per_100"), col("bucket"))
    // boundary values: per-doc global rank = cum_before + in-value rank
    val wIn = Window.partitionBy(col("bits_per_100")).orderBy(col("doc_id"))
    val straddle = joined.filter(col("bucket").isNull)
      .withColumn("rk", col("cum_before") + row_number().over(wIn))
      .select(col("doc_id"), col("bits_per_100"),
        when(col("rk") <= col("q1"), lit("head"))
          .when(col("rk") <= col("q2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
    whole.unionByName(straddle)
  }

  /** Top `bigramSize` reference BIGRAMS by (count desc, prev asc, tok
    * asc) — the conditional table of the bigram LM, capped like
    * [[vocabOn]] so it broadcasts at any corpus size.
    */
  def bigramVocabOn(refTexts: DataFrame, bigramSize: Int): DataFrame = {
    require(bigramSize > 0, s"bigramVocabOn needs a positive bigramSize, got $bigramSize")
    // native adjacent-pair structs (r21, guide §4): the composed
    // `transform(sequence(1, size - 1), i => struct(element_at(i) prev,
    // element_at(i + 1) tok))` was an interpreted HOF per reference row
    // (LmSpec pins native == composed parity)
    refTexts
      .select(TextOps.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(graft.functions.AdjacentStructs
        .adjacentStructs(col("ws"), "prev", "tok")).as("p"))
      .select(col("p.prev"), col("p.tok"))
      .groupBy(col("prev"), col("tok")).agg(count(lit(1)).as("bcnt"))
      .orderBy(col("bcnt").desc, col("prev"), col("tok"))
      .limit(bigramSize)
  }

  /** BIGRAM cross-entropy with STUPID BACKOFF (Brants et al., "Large
    * Language Models in Machine Translation" — the backoff rule
    * production-scale n-gram LMs actually use, because it needs no
    * discount mass bookkeeping): per token position,
    *
    *   pos 1                    : unigram surprise (the [[lmScoreOn]] bits)
    *   bigram (prev,tok) known  : max(0, bitlen(c_uni(prev)+1) − bitlen(c_bi+1))
    *   bigram unknown (backoff) : penaltyBits + unigram surprise
    *
    * — all in whole bits via the same bitlen staircase, so the score is
    * integer-exact across engines. `penaltyBits = 2` is the staircase
    * spelling of stupid backoff's α = 0.4 (−log2 0.4 ≈ 1.3, rounded up
    * to the next whole bit). The max(0, ·) guards the one case the caps
    * admit: a surviving bigram whose `prev` fell below the unigram cap.
    *
    * Emits (doc_id, n_tokens, bits, bits_per_100) — the [[lmScoreOn]]
    * shape, so tertile bucketing and curriculum ordering compose
    * unchanged.
    *
    * 100 TB shape: both model tables are capped → BroadcastExchange;
    * scoring is one explode of positional (pos, tok, prev) structs
    * (built pre-explode, so the token array never rides along the
    * exploded rows) through three broadcast left joins + the 1-row
    * total crossJoin, then ONE doc-keyed partial aggregate — the same
    * single corpus-shuffle contract as the unigram scorer.
    */
  def bigramScoreOn(docs: DataFrame, refTexts: DataFrame,
                    vocabSize: Int = 4096, bigramSize: Int = 65536,
                    penaltyBits: Int = 2): DataFrame = {
    val uni = vocabOn(refTexts, vocabSize)
    val bi = bigramVocabOn(refTexts, bigramSize)
    val ntot = refTexts.select(
      sum(size(TextOps.tokens(col("text"))).cast("long")).as("ntot"))
    // native positional (tok, prev) structs (r21, guide §4): the
    // composed `transform(sequence(1, size), i => struct(element_at(i),
    // when(i > 1, element_at(i - 1))))` was an interpreted HOF per
    // corpus row (LmSpec pins native == composed parity)
    val positions = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
      .select(col("doc_id"), explode(graft.functions.PositionalBigrams
        .positionalBigrams(col("ws"))).as("p"))
      .select(col("doc_id"), col("p.tok"), col("p.prev"))
    val uniSurprise =
      bitlen(col("ntot")) - bitlen(coalesce(col("cnt"), lit(0L)) + 1)
    positions
      .join(broadcast(uni), Seq("tok"), "left")
      .join(broadcast(uni.select(col("tok").as("prev"),
        col("cnt").as("pcnt"))), Seq("prev"), "left")
      .join(broadcast(bi), Seq("prev", "tok"), "left")
      .crossJoin(broadcast(ntot)) // 1-row broadcast (house precedent)
      .withColumn("surprise",
        when(col("prev").isNull, uniSurprise)
          .when(col("bcnt").isNotNull,
            greatest(lit(0L), bitlen(coalesce(col("pcnt"), lit(0L)) + 1)
              - bitlen(col("bcnt") + 1)))
          .otherwise(lit(penaltyBits.toLong) + uniSurprise))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("surprise")).as("bits"))
      .withColumn("bits_per_100", expr("bits * 100 DIV n_tokens"))
  }

  /** Driver spelling of [[bigramScoreOn]]: en-reference, vocab 16 /
    * bigrams 64 — small enough on the fixture vocabulary that the OOV
    * unigram, OOV bigram (backoff), and known-bigram paths are all
    * non-vacuous.
    */
  def bigramScore(spark: SparkSession, sfDir: String,
                  refLang: String = "en", vocabSize: Int = 16,
                  bigramSize: Int = 64): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    bigramScoreOn(docs.select(col("doc_id"), col("text")),
      docs.filter(col("lang") === refLang).select(col("text")),
      vocabSize, bigramSize)
  }

  /** CCNet tertiles under the BIGRAM model — [[bigramScore]] composed
    * through the shared [[bucketsFromScores]] spelling.
    */
  def bigramBuckets(spark: SparkSession, sfDir: String,
                    refLang: String = "en", vocabSize: Int = 16,
                    bigramSize: Int = 64): DataFrame =
    bucketsFromScores(bigramScore(spark, sfDir, refLang, vocabSize, bigramSize))
}
