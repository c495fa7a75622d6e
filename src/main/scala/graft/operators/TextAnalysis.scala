package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Text-analysis operators over the `documents` table: token/n-gram
  * frequency, language identification, quality scoring, and document
  * fingerprinting — the first-pass profiling stages of a training-data
  * pipeline (the reference's line-frequency query generalized from lines
  * to tokens, SURVEY.md §7.2 M2).
  *
  * Everything is built from codegen'd scalar functions and a single
  * hash-aggregation per query — the same one-shuffle shape as grep — so
  * each op is one scan + one exchange at any scale. Ratio/score outputs
  * use pure INTEGER arithmetic (percent = 100*x DIV y): exact,
  * engine-portable, no float-boundary flakiness in the oracle compare.
  */
object TextAnalysis {

  /** Top-k tokens by total occurrence count. The reference's
    * line-frequency aggregate applied to tokens: explode → count —
    * partial aggregation happens map-side, the exchange carries one row
    * per distinct token, top-k is a TakeOrderedAndProject.
    */
  def tokenFreq(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc("tok"))
      .limit(k)

  /** Top-k word n-grams by DOCUMENT frequency (distinct-per-doc, so a
    * gram repeated within one doc counts once) — the boilerplate-detection
    * statistic that feeds stop-shingle caps like
    * [[Dedup.ngramJaccardPairs]]'s.
    */
  def ngramDocFreq(spark: SparkSession, sfDir: String,
                   n: Int = 3, k: Int = 20): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(TextOps.shingles(col("text"), n)).as("ng"))
      .groupBy(col("ng"))
      .agg(count(lit(1)).as("df"))
      .orderBy(desc("df"), asc("ng"))
      .limit(k)

  /** Per-document n-gram NOVELTY: the share (ppm) of a doc's distinct
    * n-grams that appear in NO other document — the dedup-aware quality
    * signal behind novelty-weighted sampling (a doc whose content is
    * mostly corpus-unique carries more information than one assembled
    * from boilerplate). Docs too short to carry an n-gram surface with
    * zero grams and a NULL ppm.
    *
    * 100 TB shape: distinct (doc_id, ng) at the scan, ONE gram-keyed
    * aggregate for df, then a gram-keyed equi-join back and a doc-keyed
    * rollup. The join is deliberately an equi-join rather than a
    * `count over (partition by ng)` window: a boilerplate gram's
    * billion-row partition would serialize a window task, while AQE
    * splits a skewed JOIN partition for free.
    */
  def novelty(spark: SparkSession, sfDir: String, n: Int = 3): DataFrame =
    noveltyOn(Tables.documents(spark, sfDir), n)

  def noveltyOn(docs: DataFrame, n: Int = 3): DataFrame = {
    val grams = docs.select(col("doc_id"),
      explode(TextOps.shingles(col("text"), n)).as("ng"))
    val df = grams.groupBy(col("ng")).agg(count(lit(1)).as("df"))
    val per = grams.join(df, "ng")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("g"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("u"))
    docs.select(col("doc_id")).join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("g"), lit(0L)).as("n_grams"),
        coalesce(col("u"), lit(0L)).as("n_unique"),
        when(col("g") > 0, expr("u * 1000000 DIV g")).as("novelty_ppm"))
  }

  /** Stopword profiles for the n-gram/stopword language-ID heuristic.
    * Deliberately tiny so the same logic stays expressible in ANSI-ish
    * oracle SQL; extend per deployment. Order = tie-break precedence.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "fr" -> Seq("le", "la", "les", "de", "et"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "las", "y", "es"),
  )

  /** Number of tokens of `toks` that appear in `profile` (occurrences,
    * not distinct — `filter` keeps duplicates, unlike array_intersect).
    */
  // NATIVE since r20 ([[graft.functions.ProfileHits]], guide §4): the
  // HOF spelling `size(filter(toks, t => w1 === t || ...))` evaluated a
  // |profile|-branch OR per token interpreted (ArrayFilter is
  // CodegenFallback) — once per language profile inside every curation
  // gate's scan projection; the native probe is one hash-set lookup per
  // token in codegen. Exact-count parity pinned in TextAnalysisSpec.
  private def profileHits(toks: Column, profile: Seq[String]): Column =
    graft.functions.ProfileHits.profileHits(toks, profile)

  /** Language-ID: CJK scripts by codepoint range, alphabetic languages by
    * stopword-profile argmax (ties broken by profile order, 'und' =
    * undetermined when no profile hits). A deterministic scalar
    * expression — classification quality is asserted on real
    * multilingual snippets in TextAnalysisSpec; the fixture run proves
    * the at-scale shape with an exact oracle.
    */
  def langGuess(text: Column): Column = {
    val toks = TextOps.tokens(text)
    val hits = langProfiles.map { case (lang, prof) => lang -> profileHits(toks, prof) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = hits.foldRight(lit("und")) { case ((lang, h), rest) =>
      when(h === best && best > 0, lit(lang)).otherwise(rest)
    }
    // kana/hangul checked BEFORE the han range: Japanese text routinely
    // mixes kanji with kana, Korean can embed hanja
    when(text.rlike("[\\x{3040}-\\x{30ff}]"), lit("ja"))
      .when(text.rlike("[\\x{ac00}-\\x{d7af}]"), lit("ko"))
      .when(text.rlike("[\\x{4e00}-\\x{9fff}]"), lit("zh"))
      .otherwise(pick)
  }

  /** Corpus language histogram via [[langGuess]]. */
  def langHistogram(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(langGuess(col("text")).as("lang_guess"))
      .agg(count(lit(1)).as("n"))

  /** Per-document quality metrics in pure integer arithmetic:
    *   n_tokens        total whitespace tokens
    *   ttr_pct         type/token ratio ×100 (lexical diversity)
    *   stop_pct        stopword occurrence share ×100 (en profile)
    *   mean_tok_len_x100  mean token length ×100
    * Downstream filters (e.g. drop docs with stop_pct < 5 or ttr_pct <
    * 20) compose as plain predicates that push into the scan.
    */
  /** Shared raw metric projection for [[qualityMetrics]] /
    * [[qualityFilter]] — ONE spelling of the counts so the two queries
    * (and their oracles, which mirror it verbatim) cannot drift.
    */
  private[operators] def rawQualityCounts: Seq[org.apache.spark.sql.Column] = {
    val toks = TextOps.tokens(col("text"))
    Seq(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_types"),
      profileHits(toks, langProfiles.head._2).cast("long").as("n_stop"),
      length(concat_ws("", toks)).cast("long").as("char_len"))
  }

  /** Shared pct projections over [[rawQualityCounts]]: integer DIV on
    * positive longs truncates identically in Spark and DuckDB — ratios
    * stay exact and hash-stable.
    */
  private[operators] val qualityPcts = Seq(
    expr("n_types * 100 DIV n_tokens").as("ttr_pct"),
    expr("n_stop * 100 DIV n_tokens").as("stop_pct"),
    expr("char_len * 100 DIV n_tokens").as("mean_tok_len_x100"))

  /** 3-gram slot/distinct counts feeding rep_pct — factored so
    * [[qualityFilter]] and [[Pipeline.curate]] share ONE spelling. */
  private[operators] def qualityGramCounts: Seq[org.apache.spark.sql.Column] = {
    val toks = TextOps.tokens(col("text"))
    Seq(
      greatest(size(toks) - 2, lit(0)).cast("long").as("n_grams"),
      size(TextOps.shingles(col("text"), 3)).cast("long").as("n_distinct_grams"))
  }

  /** Duplicated-3-gram share ×100 over the gram-count columns. */
  private[operators] val qualityRepPct: Column =
    when(col("n_grams") > 0,
      expr("(n_grams - n_distinct_grams) * 100 DIV n_grams"))
      .otherwise(lit(0L)).as("rep_pct")

  /** The keep/drop RULE over the metric columns — one spelling so the
    * filter query and the pipeline cannot drift on thresholds. */
  private[operators] val qualityKeepRule: Column =
    col("n_tokens") >= 20 &&
      col("mean_tok_len_x100").between(300, 1000) &&
      col("stop_pct") >= 3 &&
      col("ttr_pct") >= 40 &&
      col("rep_pct") <= 2

  def qualityMetrics(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(rawQualityCounts: _*)
      .select(col("doc_id") +: col("n_tokens") +: qualityPcts: _*)

  /** Composite QUALITY FILTER — the keep/drop decision stage of a
    * training pipeline, composing Gopher-style heuristic rules (Rae et
    * al. 2021, public literature) in exact integer arithmetic:
    *
    *   n_tokens >= 20                 not a fragment
    *   300 <= mean_tok_len_x100 <= 1000   plausible word lengths
    *   stop_pct >= 3                  natural-language stopword presence
    *   ttr_pct >= 40                  not keyword-stuffed / degenerate
    *   rep_pct <= 2                   bounded duplicated-3-gram share
    *
    * rep_pct = duplicated word-3-gram occurrence share ×100: total
    * 3-gram slots are n_tokens − 2, the distinct count is the shingle
    * set's size — both already computed by this suite, so repetition is
    * a pure projection, no shuffle. `keep` surfaces as 0/1 BIGINT (hash-
    * stable across engines), and every rule bit is in the output so a
    * pipeline can audit WHY a doc dropped — the filter composes as a
    * plain predicate that pushes into the scan.
    */
  def qualityFilter(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(rawQualityCounts ++ qualityGramCounts: _*)
      .select(col("doc_id") +: col("n_tokens") +: qualityPcts :+ qualityRepPct: _*)
      .withColumn("keep", qualityKeepRule.cast("long"))

  /** Token-count statistics per source: docs, total tokens, and total
    * distinct-per-doc types — the per-slice profiling a pipeline uses to
    * spot degenerate sources before training.
    */
  def tokenStatsBySource(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    Tables.documents(spark, sfDir)
      .select(col("source"), size(toks).cast("long").as("nt"),
        size(array_distinct(toks)).cast("long").as("ty"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nt")).as("n_tokens"),
        sum(col("ty")).as("n_types"))
  }

  /** Deterministic train/eval split on a CONTENT hash: md5 hex strings
    * are uniform, so a lexicographic prefix threshold selects a stable
    * fraction ('cc' ≈ 204/256 ≈ 79.7% train) — reproducible across
    * engines, runs, and partitionings, and near-duplicate-safe when keyed
    * on canonicalized text (identical docs land in the same split, so no
    * train/eval leakage from exact dups). The split is a pure per-row
    * projection: no shuffle, composes with any downstream filter.
    */
  def trainEvalSplit(spark: SparkSession, sfDir: String,
                     threshold: String = "cc"): DataFrame =
    trainEvalAssign(spark, sfDir, threshold)
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))

  /** Per-document split assignment — the artifact a pipeline actually
    * consumes (join it against any downstream table to route docs).
    * Same content-hash rule as [[trainEvalSplit]]; that aggregate is just
    * this projection grouped.
    */
  def trainEvalAssign(spark: SparkSession, sfDir: String,
                      threshold: String = "cc"): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"),
        when(md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ")) < threshold,
          lit("train")).otherwise(lit("eval")).as("split"))

  /** Top-k characteristic terms per document by a TF-IDF-style weight —
    * the term-importance feature extractor (doc keywords, topic hints,
    * index terms). Weight = tf · (N·1000 DIV df): document frequency's
    * reciprocal scaled to an INTEGER, so scores and ranks are exact and
    * engine-portable — a float idf (log N/df) ranks near-identically but
    * puts an IEEE-rounding boundary under the oracle hash (same
    * integer-only rule as the money columns; ties broken by term ASC).
    *
    * Scale design: tf is one (doc, term) aggregation; df reuses those
    * rows (one more aggregation on term); N arrives as a broadcast 1-row
    * cross join, never a driver-side scalar pull; the per-doc top-k
    * window partitions on doc_id — bounded by document length, not
    * corpus size. Three shuffles total, each on a natural key.
    */
  def tfidfTopTerms(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf") * expr("(n_docs * 1000) DIV df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score"), col("rank").cast("long").as("rank"))
  }

  /** Benchmark DECONTAMINATION: train docs that share at least one word
    * n-gram with any eval-split doc, with the count of distinct shared
    * n-grams — the standard leakage check a training pipeline runs before
    * shipping a corpus (eval/benchmark text appearing verbatim inside
    * training docs inflates downstream scores).
    *
    * Scale design (100 TB): the eval side collapses to a DISTINCT n-gram
    * SET before the join, so each (train doc, n-gram) row matches at most
    * ONE row — output is bounded by the train inverted index, never
    * (train × eval) quadratic, no cap needed. In production the eval side
    * is a fixed benchmark suite: wrap it in `broadcast()` and the join is
    * shuffle-free. Here eval is the md5-threshold split (data-scale), so
    * the hint is left off and AQE picks broadcast at runtime when the set
    * is small. Same shingle primitive and canonical-hash split rule as
    * [[graft.operators.Dedup]] / [[trainEvalAssign]], so the DuckDB
    * oracle shares their SQL spellings.
    */
  def contamination(spark: SparkSession, sfDir: String,
                    n: Int = Dedup.ShingleN,
                    threshold: String = "cc"): DataFrame =
    contaminationOn(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      n, threshold)

  /** [[contamination]] over any (doc_id, text) DataFrame (ScaleSmoke
    * entry) — same contract as the other `*On` variants.
    *
    * The shingled subtree is consumed by BOTH join sides under different
    * filters (no exchange reuse), so the corpus is deliberately scanned
    * and shingled twice: persisting this projection was tried and
    * MEASURED 4× slower (0.73 s → 3.04 s at sf0.1) — the exploded
    * per-shingle rows are several times larger than the pruned
    * (doc_id, text) scan they derive from, so writing them to cache
    * costs more than recomputing a cheap codegen'd scan+explode. The
    * persist heuristic only pays when the cached subtree is SMALL
    * relative to its compute (cf. [[tokenShards]]'s 3-long rows).
    */
  def contaminationOn(docTexts: DataFrame, n: Int = Dedup.ShingleN,
                      threshold: String = "cc"): DataFrame = {
    def shingled = docTexts
      .select(col("doc_id"),
        (md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ")) < threshold)
          .as("is_train"),
        explode(TextOps.shingles(col("text"), n)).as("ng"))
    val evalNgrams = shingled.filter(!col("is_train")).select(col("ng")).distinct()
    shingled.filter(col("is_train"))
      .join(evalNgrams, "ng")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_ngrams"))
  }

  /** [[contamination]] completed into a THRESHOLDABLE contract: each
    * contaminated train doc with the FRACTION of its distinct n-grams
    * that appear in the eval split (integer percent — engine-portable)
    * and the decision bit at `minPct`. Practical decontamination drops
    * train docs above a coverage threshold, not above a raw count — a
    * 10-token quote in a 100k-token doc is fine; the same quote being
    * 80% of a short doc is leakage.
    *
    * Same bounded join shape as [[contaminationOn]] (eval side collapses
    * to a distinct n-gram set; output bounded by the train inverted
    * index); the only addition is the per-doc distinct-n-gram size
    * carried through the aggregation as a max() payload — shingles are
    * already distinct per doc ([[TextOps.shingles]]), so `size(ngs)` IS
    * the denominator, no second aggregation.
    */
  def contaminationCoverage(spark: SparkSession, sfDir: String,
                            n: Int = Dedup.ShingleN,
                            threshold: String = "cc",
                            minPct: Long = 50L): DataFrame =
    contaminationCoverageOn(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      n, threshold, minPct)

  /** The EVAL-side mirror of [[contaminationCoverage]]: for each eval
    * doc, the integer percent of ITS distinct n-grams that appear
    * anywhere in the train split — the number a benchmark-leakage report
    * quotes ("x% of this eval task is in the training set") and the
    * threshold that decides whether an eval RESULT is trustworthy, where
    * the train-side ratio decides which train DOCS to drop.
    *
    * Same bounded shape mirrored: the TRAIN side collapses to a distinct
    * n-gram set before the join, so output is bounded by the eval
    * inverted index — at 100 TB the train n-gram set is the big side,
    * and this stays one shuffle join keyed on the n-gram, never
    * train × eval.
    */
  def evalContaminationCoverage(spark: SparkSession, sfDir: String,
                                n: Int = Dedup.ShingleN,
                                threshold: String = "cc",
                                minPct: Long = 50L): DataFrame =
    evalContaminationCoverageOn(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      n, threshold, minPct)

  /** [[evalContaminationCoverage]] over any (doc_id, text) DataFrame. */
  def evalContaminationCoverageOn(docTexts: DataFrame, n: Int = Dedup.ShingleN,
                                  threshold: String = "cc",
                                  minPct: Long = 50L): DataFrame = {
    def shingled = docTexts
      .select(col("doc_id"),
        (md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ")) < threshold)
          .as("is_train"),
        TextOps.shingles(col("text"), n).as("ngs"))
      .select(col("doc_id"), col("is_train"),
        size(col("ngs")).cast("long").as("n_ngrams"),
        explode(col("ngs")).as("ng"))
    val trainNgrams = shingled.filter(col("is_train")).select(col("ng")).distinct()
    shingled.filter(!col("is_train"))
      .join(trainNgrams, "ng")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_ngrams"),
        max(col("n_ngrams")).as("n_ngrams"))
      .select(col("doc_id"), col("n_shared_ngrams"), col("n_ngrams"),
        expr("n_shared_ngrams * 100 DIV n_ngrams").as("cov_pct"),
        when(expr("n_shared_ngrams * 100 DIV n_ngrams") >= minPct, lit(1L))
          .otherwise(lit(0L)).as("contaminated"))
  }

  /** [[contaminationCoverage]] over any (doc_id, text) DataFrame. */
  def contaminationCoverageOn(docTexts: DataFrame, n: Int = Dedup.ShingleN,
                              threshold: String = "cc",
                              minPct: Long = 50L): DataFrame = {
    // materialize the shingle array in its own projection: size() and
    // explode() in ONE select would inline the (expensive) shingle
    // expression twice per row — Catalyst does no common-subexpression
    // elimination across a Project/Generate boundary
    def shingled = docTexts
      .select(col("doc_id"),
        (md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ")) < threshold)
          .as("is_train"),
        TextOps.shingles(col("text"), n).as("ngs"))
      .select(col("doc_id"), col("is_train"),
        size(col("ngs")).cast("long").as("n_ngrams"),
        explode(col("ngs")).as("ng"))
    val evalNgrams = shingled.filter(!col("is_train")).select(col("ng")).distinct()
    shingled.filter(col("is_train"))
      .join(evalNgrams, "ng")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_ngrams"),
        max(col("n_ngrams")).as("n_ngrams"))
      .select(col("doc_id"), col("n_shared_ngrams"), col("n_ngrams"),
        expr("n_shared_ngrams * 100 DIV n_ngrams").as("cov_pct"),
        when(expr("n_shared_ngrams * 100 DIV n_ngrams") >= minPct, lit(1L))
          .otherwise(lit(0L)).as("contaminated"))
  }

  /** BPE-ish pre-tokenizer pattern (public GPT-2-style shape, kept to
    * portable RE2/Java syntax — no lookarounds): letter runs stay
    * whole words, digits split one per token, every other non-space
    * symbol (incl. CJK codepoints) is its own token. Shared verbatim
    * with the DuckDB oracle.
    */
  val BpeishPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  /** Token counting both ways per source: whitespace tokens (how the
    * rest of the suite tokenizes) next to a BPE-ish regex count — the
    * cheap budget estimator pipelines use to predict real tokenizer
    * cost before running one. Pure per-row regex projection + one agg.
    */
  def subwordStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("ws"),
        size(regexp_extract_all(col("text"), lit(BpeishPattern), lit(0)))
          .cast("long").as("bpe"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).as("n_ws_tokens"),
        sum(col("bpe")).as("n_bpe_tokens"))

  /** Exact discrete token-count quantiles (p50/p90) per source — the
    * length-distribution profile a pipeline reads before setting
    * truncation/packing parameters. Spelled as rank selection
    * (row_number == ceil(p·n), pure integer math) so the result is an
    * ACTUAL member value, identical on any engine — no float
    * interpolation, no sketch. One window + one aggregation per source.
    * At extreme scale swap in `approx_percentile` (fixed-size mergeable
    * sketch, engine-specific values → rows-only verification) — the
    * exact spelling is preferable wherever a per-source sort fits,
    * since it is reproducible bit-for-bit.
    */
  def tokenQuantilesBySource(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("nt").asc, col("doc_id").asc)
    Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"), size(toks).cast("long").as("nt"))
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("source"))))
      .groupBy(col("source"))
      .agg(
        max(when(col("rn") === expr("(cnt + 1) DIV 2"), col("nt"))).as("p50_tokens"),
        max(when(col("rn") === expr("(9 * cnt + 9) DIV 10"), col("nt"))).as("p90_tokens"),
        count(lit(1)).as("n_docs"))
  }

  /** Approximate token-length quantiles per source via Spark's
    * percentile_approx (a Greenwald-Khanna-style mergeable sketch) —
    * the 100 TB companion to [[tokenQuantilesBySource]]: the exact
    * rank-selection spelling needs a per-source sort, the sketch is one
    * aggregation pass with fixed-size mergeable state (same scale
    * argument as the HLL distinct count). `accuracy` trades state size
    * for error; rows-only at the driver (sketch internals are
    * engine-specific) with the error bound vs the exact quantiles
    * asserted in TextAnalysisSpec.
    */
  def tokenQuantilesApprox(spark: SparkSession, sfDir: String,
                           accuracy: Int = 10000): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("source"), size(TextOps.tokens(col("text"))).cast("long").as("nt"))
      .groupBy(col("source"))
      .agg(
        percentile_approx(col("nt"), lit(0.5), lit(accuracy)).as("p50_approx"),
        percentile_approx(col("nt"), lit(0.9), lit(accuracy)).as("p90_approx"),
        count(lit(1)).as("n_docs"))

  /** Token-budget SHARDING: assign docs (in doc_id order) to consecutive
    * shards of ≈`budgetTokens` tokens each — the split a pipeline makes
    * before fanning a corpus out to tokenizer/packing workers, where
    * shard boundaries must depend on cumulative TOKENS, not row counts.
    * shard = floor(exclusive-prefix-sum(n_tokens) / budget).
    *
    * The prefix sum is computed BLOCKWISE (the textbook distributed
    * spelling), because the naive single `Window.orderBy(doc_id)` with no
    * partition key serializes the entire corpus through ONE task:
    *   1. fixed logical blocks (doc_id DIV blockSize — deterministic,
    *      data-independent, unlike repartitionByRange's sampled bounds);
    *   2. per-block token sums (one aggregation);
    *   3. running offsets over the BLOCK sums — a window over
    *      corpus/blockSize rows (pick blockSize so that side stays
    *      small: 1e6-doc blocks ⇒ 1e4 rows per 1e10-doc corpus);
    *   4. offsets broadcast back; the within-block running sum windows
    *      on (block), bounded by blockSize.
    * Equality with the direct single-window spelling is asserted in
    * TextAnalysisSpec; the DuckDB oracle uses the plain window.
    */
  def tokenShards(spark: SparkSession, sfDir: String,
                  budgetTokens: Long = 5000, blockSize: Long = 1000000): DataFrame = {
    // a zero divisor reaches the plan as `DIV 0` — ANSI raises deep in a
    // task, non-ANSI silently nulls the join key and drops every row
    require(budgetTokens > 0 && blockSize > 0,
      s"tokenShards needs positive budgetTokens/blockSize, got $budgetTokens/$blockSize")
    // persisted: the (doc_id, n_tokens, blk) projection — tiny next to
    // the text it derives from — feeds BOTH the offsets aggregation and
    // the final join; self-join-side exchange reuse is not guaranteed,
    // and a second full scan+tokenize of the corpus is the alternative.
    // Caller owns cleanup (clearCache between queries).
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"),
        expr(s"doc_id DIV $blockSize").as("blk"))
      .persist()
    val offsets = base.groupBy(col("blk"))
      .agg(sum(col("n_tokens")).as("bsum"))
      .withColumn("boff", coalesce(
        sum(col("bsum")).over(Window.orderBy(col("blk"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("blk"), col("boff"))
    val wIn = Window.partitionBy(col("blk")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(offsets), "blk")
      .withColumn("pre",
        col("boff") + coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"pre DIV $budgetTokens").as("shard"))
  }

  /** Deterministic stratified downsampling: keep a doc iff its content
    * hash's first two hex digits fall under its source's threshold (out
    * of 256) — the source-balancing op that tames over-represented
    * slices of a training mix. Content-keyed like [[trainEvalAssign]]:
    * reproducible across engines/partitionings/runs, and exact dups
    * sample identically (no cross-run survivorship drift). Unlisted
    * sources keep everything ("g" sorts above every hex digit). A pure
    * per-row projection+filter — composes into the scan at any scale.
    */
  def stratifiedSample(spark: SparkSession, sfDir: String,
                       rates: Map[String, Int] = Map(
                         "src0" -> 64, "src1" -> 128, "src2" -> 192)): DataFrame = {
    val thresh = rates.foldLeft(lit("g")) { case (acc, (s, r)) =>
      when(col("source") === s, lit(f"$r%02x")).otherwise(acc)
    }
    Tables.documents(spark, sfDir)
      .filter(md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ")) < thresh)
      .select(col("doc_id"), col("source"))
  }

  /** Deterministic weighted sampling WITHOUT replacement — Efraimidis &
    * Spirakis 2006 (A-ES, public literature): every row draws u ∈ (0,1)
    * and the k largest u^(1/w) win, which selects each row with
    * probability proportional to its weight among the survivors. Two
    * deliberate re-spellings of the classic algorithm:
    *   - u comes from a SALTED md5 of the row id, not an RNG — 13 hex
    *     digits = 52 uniform bits, (v + 0.5) / 2^52 ∈ (0,1), all
    *     exactly representable in a double. No RNG state means the
    *     sample is a pure function of (id, salt): reproducible across
    *     runs, partitionings, and engines (`rand(seed)` is none of
    *     those — its draw depends on partition layout), and re-salting
    *     IS re-sampling;
    *   - the score is ln(u)/w, the monotone log spelling of u^(1/w)
    *     (maximizing either picks the same rows) — numerically tame
    *     where pow underflows on tiny u / huge w.
    * The global top-k plans as TakeOrderedAndProject: each partition
    * keeps k rows, no global sort, no shuffle beyond the k-row
    * collect — the 100 TB shape for "sample 10M docs by quality
    * weight". Zero/negative weights are excluded (a zero-weight row
    * must never be drawn). Score surfaces as ppb long (house integer
    * rule); ties break on the id.
    */
  def weightedSampleOn(df: DataFrame, idCol: String, weightCol: String,
                       k: Int, salt: String): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val u = (conv(substring(md5(concat(col(idCol).cast("string"),
        lit(":" + salt))), 1, 13), 16, 10).cast("double") + lit(0.5)) /
      lit(4503599627370496.0) // 2^52: 13 hex digits, exactly a double
    df.filter(col(weightCol) > 0)
      .withColumn("skey", log(u) / col(weightCol).cast("double"))
      .orderBy(col("skey").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col(weightCol),
        floor(col("skey") * 1000000000L).cast("long").as("skey_ppb"))
  }

  /** Driver spelling: k docs weighted by length over the documents
    * table (rows-only — the salted-hash draw has no cross-engine SQL
    * spelling; exactness vs a first-principles reference and the
    * weight-monotonicity property are spec-asserted).
    */
  def weightedSample(spark: SparkSession, sfDir: String,
                     k: Int = 100, salt: String = "w0"): DataFrame =
    weightedSampleOn(Tables.documents(spark, sfDir), "doc_id", "n_chars",
      k, salt)

  /** Canonicalizing document fingerprint: md5 of lowercased,
    * whitespace-collapsed, trimmed text, emitted per document. md5 is
    * bit-identical across engines, so every fingerprint value is
    * oracle-checked — unlike seeded xxhash sketches. Grouping on the
    * fingerprint column downstream yields normalized dedup (same shape
    * as [[Dedup.exact]]).
    */
  def fingerprints(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        md5(regexp_replace(trim(lower(col("text"))), "\\s+", " "))
          .as("fingerprint"))

  /** NEAR-DUP-SAFE train/eval assignment: the split key is the canonical
    * fingerprint of each doc's near-dup CLUSTER REPRESENTATIVE (min
    * doc_id in its >= 0.8-Jaccard component), so near-duplicates land in
    * the same split by construction. [[trainEvalAssign]] is exact-dup
    * leak-safe only — two non-identical near-dups of one document can
    * straddle the train/eval boundary there, which is precisely the
    * leakage a decontamination pass would later have to catch; keying the
    * hash threshold on the cluster representative closes that hole at
    * assignment time.
    *
    * Composition of shipped pieces: [[Dedup.minHashNearDupsOn]] (banded
    * LSH + exact verify) → [[Dedup.clusterPairs]] (min-label components)
    * → representative fingerprint join → prefix threshold. Singleton
    * docs are their own representative, so their assignment is IDENTICAL
    * to [[trainEvalAssign]] (asserted in the spec). Cache contract is
    * minHashNearDupsOn's (caller clears).
    */
  def trainEvalAssignClusterSafe(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val pairs = Dedup.minHashNearDupsOn(docs).select(col("doc_a"), col("doc_b"))
    val rep = docs
      .join(Dedup.clusterPairs(pairs), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("rep_id"))
    val repFp = docs.select(col("doc_id").as("rep_id"),
      md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ")).as("fp"))
    rep.join(repFp, "rep_id")
      .select(col("doc_id"),
        when(col("fp") < lit("cc"), lit("train")).otherwise(lit("eval")).as("split"))
  }

  /** PII category patterns, applied IN ORDER — each category counts and
    * redacts on the text as left by the previous one, and replacement
    * tokens contain no digits or '@' so they can never feed a later
    * pattern. The patterns are deliberately the portable greedy-class
    * subset (no lookarounds, no backrefs), identical under Java regex
    * (Spark) and RE2 (DuckDB oracle): order matters — IPs before the
    * bare digit-run rule so "10.0.0.1" becomes one <IP>, not four <ID>
    * fragments.
    */
  private val PiiCategories: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"),
    ("phone", "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}", "<PHONE>"),
    ("id", "[0-9]{9,}", "<ID>"))

  /** PII redaction — the scrub pass a training-data pipeline runs before
    * anything else sees raw text: emails, IPv4 addresses, separator-form
    * phone numbers, and 9+-digit ID-like runs are replaced with typed
    * placeholder tokens, with an exact per-category count per doc (the
    * audit artifact: "how much PII did this source carry"). Output:
    * (doc_id, redacted, n_email, n_ip, n_phone, n_id, n_pii).
    *
    * Scale design (100 TB): a pure per-row projection — four codegen'd
    * regex count/replace pairs, no shuffle at all; composes into the
    * scan like [[qualityMetrics]]. Determinism across engines comes from
    * the portable pattern subset and the fixed category order (see
    * [[PiiCategories]]).
    */
  def redactPii(spark: SparkSession, sfDir: String): DataFrame =
    redactPiiOn(Tables.documents(spark, sfDir).select(col("doc_id"), col("text")))

  /** [[redactPii]] over any (doc_id, text) DataFrame — the spec drives
    * planted PII docs, and the q_pii_redact_planted driver query appends
    * deterministic synthetic PII to every fixture doc so the DuckDB
    * oracle certifies Java-vs-RE2 parity on actual matches and
    * replacements (q_pii_redact alone, over the digit-free fixture,
    * certifies the identity path).
    */
  def redactPiiOn(docTexts: DataFrame): DataFrame = {
    val start = docTexts.select(col("doc_id"), col("text").as("t0"))
    val stepped = PiiCategories.zipWithIndex.foldLeft(start) {
      case (df, ((name, pat, repl), i)) =>
        df.withColumn(s"n_$name", regexp_count(col(s"t$i"), lit(pat)).cast("long"))
          .withColumn(s"t${i + 1}", regexp_replace(col(s"t$i"), pat, repl))
    }
    stepped.select(col("doc_id"),
        col(s"t${PiiCategories.size}").as("redacted"),
        col("n_email"), col("n_ip"), col("n_phone"), col("n_id"))
      .withColumn("n_pii",
        col("n_email") + col("n_ip") + col("n_phone") + col("n_id"))
  }

  /** Top n-gram CHARACTER share per doc — the remaining Gopher-style
    * repetition signals (Rae et al. 2021, public literature): the share
    * of a doc's n-gram characters taken by its single most frequent
    * n-gram, for unigrams and bigrams. (The fixture is single-line text,
    * so the duplicate-line/paragraph variants of the family are
    * structurally inapplicable; the duplicated-3-gram share already
    * ships in [[qualityFilter]]'s rep_pct.) `keep` composes the Gopher
    * bigram threshold (top-2-gram chars <= 20%) with a unigram cap.
    *
    * Shape per n: occurrence-preserving n-grams from the native codegen
    * expression ([[graft.functions.WordShingles.wordNgrams]] — duplicates
    * KEPT; a char share over a distinct set is meaningless), explode →
    * per-(doc, gram) counts → per-doc max/total char mass. Two hash
    * aggregations with map-side partials, integer percent output. MAX of
    * c·len(gram) is value-based, so count ties cannot perturb it on any
    * engine.
    */
  def topGramShare(spark: SparkSession, sfDir: String): DataFrame =
    topGramShareOn(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")))

  /** [[topGramShare]] over any (doc_id, text) DataFrame — lets the spec
    * drive planted repetitive docs (the uniform fixture never trips the
    * thresholds; a real boilerplate doc must).
    */
  def topGramShareOn(docTexts: DataFrame): DataFrame = {
    // tot_chars = 0 is reachable: an empty/whitespace-only doc tokenizes
    // to one zero-length unigram, and under ANSI mode the unguarded DIV
    // would kill the whole job on one blank doc (routine in raw web
    // text). Convention: no characters → share 0 (nothing repeats).
    def share(n: Int, outCol: String): DataFrame =
      docTexts
        .select(col("doc_id"),
          explode(graft.functions.WordShingles.wordNgrams(col("text"), n)).as("g"))
        .groupBy(col("doc_id"), col("g"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("c") * length(col("g"))).as("top_chars"),
          sum(col("c") * length(col("g"))).as("tot_chars"))
        .select(col("doc_id"),
          when(col("tot_chars") > 0, expr("top_chars * 100 DIV tot_chars"))
            .otherwise(lit(0L)).as(outCol))
    // sub-2-token docs have no bigrams: left join, share treated as 0
    share(1, "top1_pct")
      .join(share(2, "top2_pct"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("top1_pct"),
        coalesce(col("top2_pct"), lit(0L)).as("top2_pct"))
      .withColumn("keep",
        (col("top1_pct") <= 30 && col("top2_pct") <= 20).cast("long"))
  }

  /** PER-GROUP WEIGHTED SAMPLE — [[weightedSampleOn]]'s A-ES draw
    * (Efraimidis–Spirakis: u from the salted md5 of the id, score
    * ln(u)/w, re-salting IS re-sampling) taken independently PER
    * GROUP: k docs per source, weight-proportional, reproducible on
    * any engine/partitioning — the per-domain inspection-set sampler.
    *
    * Skew-safe two-phase top-k (the topOrdersPerCustomerSkewSafe
    * machinery): salt-local top-k per (group, salt) first, then the
    * exact per-group top-k over the ≤ salts·k survivors — a hot group
    * never serializes its full population into one window task. The
    * two-phase pick is EXACT: every global top-k row is top-k within
    * its own salt slice.
    */
  def weightedSamplePerGroupOn(df: DataFrame, groupCol: String,
                               idCol: String, weightCol: String,
                               k: Int, salt: String,
                               salts: Int = 8): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val u = (conv(substring(md5(concat(col(idCol).cast("string"),
        lit(":" + salt))), 1, 13), 16, 10).cast("double") + lit(0.5)) /
      lit(4503599627370496.0)
    // collision-resistant internal names: the caller's frame may carry
    // skey/_salt/rn1 columns of its own (r12 ADVICE; the bloomSemiJoinOn
    // __graft_ convention)
    val w1 = Window.partitionBy(col(groupCol), col("__graft_salt"))
      .orderBy(col("__graft_skey").desc, col(idCol).asc)
    val w2 = Window.partitionBy(col(groupCol))
      .orderBy(col("__graft_skey").desc, col(idCol).asc)
    df.filter(col(weightCol) > 0)
      .withColumn("__graft_skey", log(u) / col(weightCol).cast("double"))
      .withColumn("__graft_salt", pmod(hash(col(idCol)), lit(salts)))
      .withColumn("__graft_rn1", row_number().over(w1))
      .filter(col("__graft_rn1") <= k)
      .withColumn("__graft_rn", row_number().over(w2))
      .filter(col("__graft_rn") <= k)
      .select(col(groupCol), col(idCol), col(weightCol),
        col("__graft_rn").cast("long").as("rn"))
  }

  /** Driver spelling: k=20 docs per source, char-length-weighted —
    * rows-only (the float A-ES score has no cross-engine SQL
    * spelling; the spec pins equality with a first-principles
    * per-group reference instead, the q_sample_weighted precedent).
    */
  def weightedSampleBySource(spark: SparkSession, sfDir: String,
                             k: Int = 20): DataFrame =
    weightedSamplePerGroupOn(
      Tables.documents(spark, sfDir)
        .select(col("source"), col("doc_id"), col("n_chars")),
      "source", "doc_id", "n_chars", k, "w0")

  /** GROUPED HEAVY HITTERS — [[heavyHittersOn]] per source: each
    * source's frequent tokens (frequency > that source's N/(k+1)) via
    * one O(k)-buffer-per-group Misra–Gries aggregate + a recount of
    * the ≤ sources·k candidate (source, token) pairs. State is
    * k counters per GROUP — the per-group form every "top terms per
    * domain" dashboard needs without a vocabulary×sources hash table.
    */
  def heavyHittersBySource(spark: SparkSession, sfDir: String,
                           k: Int = 100): DataFrame =
    heavyHittersBySourceOn(
      Tables.documents(spark, sfDir).select(col("source"), col("text")), k)

  def heavyHittersBySourceOn(docs: DataFrame, k: Int): DataFrame = {
    val toks = docs.select(col("source"),
      explode(TextOps.tokens(col("text"))).as("tok"))
    val summaries = toks.groupBy(col("source"))
      .agg(graft.functions.MisraGriesAgg.misraGries(col("tok"), k).as("cands"),
        count(lit(1)).as("ntot"))
    val cands = summaries.select(col("source"), col("ntot"),
      explode(col("cands")).as("tok"))
    toks.join(broadcast(cands), Seq("source", "tok"))
      .groupBy(col("source"), col("tok"), col("ntot"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") * lit(k + 1L) > col("ntot"))
      .select(col("source"), col("tok"), col("n"))
  }

  /** PER-SOURCE CAP — keep at most `cap` documents per source, chosen
    * by deterministic hash rank (md5 of the doc id, doc_id tiebreak):
    * the RefinedWeb-style per-domain ceiling that stops one crawl
    * domain from dominating a mixture, with a draw any engine (and any
    * re-run) reproduces bit-for-bit.
    *
    * Skew-safe exact rank (the ntileRevenueSkewSafe machinery): rows
    * band by their md5's first hex character (16 bands,
    * lexicographically aligned with the full-hash sort), per-(source,
    * band) local ranks are windows over ≤ n_source/16-row
    * partitions — widen to 2 chars (256) at scale — and band offsets
    * come from a window over the (source × band) count frame — a hot
    * source never serializes into one window task, which a plain
    * per-source row_number would do at 100 TB.
    */
  def capPerSource(spark: SparkSession, sfDir: String,
                   cap: Long = 100L): DataFrame =
    capPerSourceOn(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("source")), cap)

  def capPerSourceOn(docs: DataFrame, cap: Long): DataFrame = {
    require(cap >= 1L, s"capPerSource needs cap >= 1, got $cap")
    val keyed = docs
      .withColumn("hk", md5(col("doc_id").cast("string")))
      .withColumn("band", substring(col("hk"), 1, 1))
    val wLocal = Window.partitionBy(col("source"), col("band"))
      .orderBy(col("hk"), col("doc_id"))
    val local = keyed
      .withColumn("rn_local", row_number().over(wLocal).cast("long"))
    val bandCounts = keyed.groupBy(col("source"), col("band"))
      .agg(count(lit(1)).as("bc"))
    val wOff = Window.partitionBy(col("source")).orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bandCounts
      .withColumn("off", coalesce(sum(col("bc")).over(wOff), lit(0L)))
      .select(col("source"), col("band"), col("off"))
    local.join(broadcast(offsets), Seq("source", "band"))
      .filter(col("off") + col("rn_local") <= cap)
      .select(col("doc_id"), col("source"))
  }

  /** CONJUNCTIVE RANKED SEARCH — the query side of a corpus engine:
    * documents containing ALL query terms, ranked by summed
    * tf·idf_scaled (the [[tfidfTopTerms]] integer spelling —
    * idf_scaled = n_docs·1000 DIV df — so scores and ranks are
    * bit-exact on any engine), top-k with doc_id as the tiebreak.
    *
    * Plan: the token explode is filtered to the query terms AT THE SCAN
    * (an `isin` over a literal list — predicate on the generator
    * output), so every downstream frame is query-term-sized, not
    * corpus-sized; df and the conjunctive arity check fold into the
    * same per-(doc, term) aggregate; n_docs rides a broadcast 1-row
    * frame; the cut is a TakeOrdered. For interactive workloads the
    * same question probes the stored trigram index
    * ([[graft.sources.TextIndexes]]) — this is the ad-hoc scan
    * spelling.
    */
  def searchRanked(spark: SparkSession, sfDir: String,
                   terms: Seq[String] = Seq("spark", "join"),
                   k: Int = 10): DataFrame =
    searchRankedOn(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      terms, k)

  def searchRankedOn(docTexts: DataFrame, terms: Seq[String],
                     k: Int): DataFrame = {
    require(terms.nonEmpty, "searchRankedOn needs at least one term")
    val nDocs = docTexts.agg(count(lit(1)).as("n_docs"))
    val tf = docTexts
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf") * expr("(n_docs * 1000) DIV df")).as("score"),
        count(lit(1)).as("n_terms"))
      .filter(col("n_terms") === terms.distinct.size.toLong)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** BM25 CONJUNCTIVE RANKED SEARCH — [[searchRanked]]'s production
    * sibling: same AND semantics and idf spelling, plus BM25's two
    * ranking refinements, in milli fixed-point so the DuckDB oracle is
    * bit-identical (Okapi's float ln-idf would hash-differ; the scaled
    * integer family does not):
    *
    *   - tf SATURATION (k1 = 1.2): the 50th occurrence of a term adds
    *     almost nothing — sat = tf·(k1+1) / (tf + k1·norm), spelled
    *     (tf·2200·1000) DIV (tf·1000 + (1200·norm_milli) DIV 1000);
    *   - LENGTH NORMALIZATION (b = 0.75): long documents must beat
    *     short ones on term MASS, not length — norm_milli =
    *     250 + (750·(dl·10⁶ DIV avgdl_milli)) DIV 1000.
    *
    * score = Σ_terms idf_scaled · sat_milli, idf_scaled = n_docs·1000
    * DIV df (the [[tfidfTopTerms]] spelling). Every division is
    * truncating integer DIV at the same point in both engines.
    *
    * Plan: token explode filtered to the query terms AT THE SCAN, so
    * tf/df frames are query-term-sized; doc lengths ride a second
    * corpus scan whose join to tf is pruned to (doc_id, dl); the
    * 1-row (n_docs, avgdl) totals frame crossJoins in broadcast (the
    * tf-idf constant-build shape); the cut is a TakeOrdered.
    */
  def searchBm25(spark: SparkSession, sfDir: String,
                 terms: Seq[String] = Seq("spark", "join"),
                 k: Int = 10): DataFrame =
    searchBm25On(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      terms, k)

  def searchBm25On(docTexts: DataFrame, terms: Seq[String],
                   k: Int): DataFrame = {
    require(terms.nonEmpty, "searchBm25On needs at least one term")
    val docLens = docTexts.select(col("doc_id"),
      size(TextOps.tokens(col("text"))).cast("long").as("dl"))
    val tf = docTexts
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    bm25Rank(tf, docLens, terms, k)
  }

  /** The BM25 ranking core shared by the scan spelling above and the
    * stored-postings probe ([[graft.sources.SearchIndexes]]): `tf` is
    * (doc_id, term, tf) ALREADY restricted to the query terms, `docLens`
    * is (doc_id, dl) for the WHOLE corpus — df and the corpus totals
    * derive here, identically in both spellings, so SQL users and index
    * probes cannot fork the score.
    */
  private[graft] def bm25Rank(tf: DataFrame, docLens: DataFrame,
                              terms: Seq[String], k: Int,
                              matchAll: Boolean = true): DataFrame = {
    require(terms.nonEmpty, "bm25Rank needs at least one term")
    val totals = docLens
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("toks"))
      .select(col("n_docs"), expr("(toks * 1000) DIV n_docs").as("avgdl_milli"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "term")
      .join(docLens, "doc_id")
      .crossJoin(broadcast(totals))
      .withColumn("norm_milli",
        expr("250 + (750 * ((dl * 1000000) DIV avgdl_milli)) DIV 1000"))
      .withColumn("sat_milli",
        expr("(tf * 2200 * 1000) DIV (tf * 1000 + (1200 * norm_milli) DIV 1000)"))
      .groupBy(col("doc_id"))
      .agg(sum(expr("((n_docs * 1000) DIV df) * sat_milli")).as("score"),
        count(lit(1)).as("n_terms"))
    val gated =
      if (matchAll) scored.filter(col("n_terms") === terms.distinct.size.toLong)
      else scored
    gated
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** DISJUNCTIVE (match-ANY) BM25 — standard ranked retrieval: every
    * doc containing at least one query term is scored over the terms
    * it has; the idf weighting demotes the common-term-only matches.
    * Same fixed-point core as [[searchBm25On]] minus the arity gate.
    */
  def searchBm25Any(spark: SparkSession, sfDir: String,
                    terms: Seq[String] = Seq("spark", "join"),
                    k: Int = 10): DataFrame = {
    val docTexts = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val docLens = docTexts.select(col("doc_id"),
      size(TextOps.tokens(col("text"))).cast("long").as("dl"))
    val tf = docTexts
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    bm25Rank(tf, docLens, terms, k, matchAll = false)
  }

  /** PHRASE SEARCH — exact ADJACENT-token match, the retrieval member
    * between conjunctive AND (any positions) and grep substring (no
    * token boundaries): documents where the query tokens appear
    * consecutively, ranked by occurrence count with doc_id as the
    * deterministic tiebreak. Occurrences may overlap (each start
    * position counts — "a a a" holds two "a a" occurrences), the
    * spelling both engines share.
    *
    * Plan: the whole match is ONE codegen HOF fold over each doc's
    * token array (Σ over start positions of an all-positions-equal
    * conjunction) — no explode, no shuffle before the final top-k cut
    * (a TakeOrdered); at 100 TB this is a pure scan. The guard keeps
    * docs shorter than the phrase out of the fold: Spark's
    * `sequence(1, 0)` DESCENDS rather than yielding empty, so the
    * un-guarded fold would probe positions 1 and 0 on a 1-token doc.
    * For interactive serving the stored-postings spelling would add a
    * positional postings index; this is the ad-hoc scan spelling.
    */
  def searchPhrase(spark: SparkSession, sfDir: String,
                   phrase: Seq[String] = Seq("spark", "join"),
                   k: Int = 10): DataFrame =
    searchPhraseOn(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      phrase, k)

  def searchPhraseOn(docTexts: DataFrame, phrase: Seq[String],
                     k: Int): DataFrame = {
    require(phrase.size >= 2,
      s"searchPhrase needs a phrase of >= 2 tokens (got ${phrase.size}; " +
        "single-term retrieval is searchRanked/searchBm25)")
    require(k >= 1, s"searchPhrase needs k >= 1, got $k")
    // tokens STAGED as a column first: the fold references the array
    // phrase.size times per position, and an inlined split(text) would
    // re-tokenize per reference (the assignCells/l2sqAll
    // no-double-evaluation rule — measured 2.9 s -> 1.6 s at sf0.1
    // when staged)
    val toks = col("__graft_toks")
    // native phrase counter (r21, guide §4): the composed fold —
    // `aggregate(sequence(1, n - |p| + 1), 0L, acc + when(AND_j
    // element_at(toks, i + j) = p_j, 1))` under a size >= |p| guard —
    // evaluated |p| interpreted element_at probes per position per doc
    // (NativeHofParitySpec pins native == composed parity; the
    // coalesce keeps the guard's null-array → 0 behavior)
    val nOcc = coalesce(
      graft.functions.PhraseCount.phraseCount(toks, phrase), lit(0L))
    docTexts
      .select(col("doc_id"), TextOps.tokens(col("text")).as("__graft_toks"))
      .select(col("doc_id"), nOcc.as("n_occ"))
      .filter(col("n_occ") > 0)
      .orderBy(col("n_occ").desc, col("doc_id").asc)
      .limit(k)
  }

  /** EXACT corpus-wide frequent tokens (frequency > N/(k+1)) in two
    * bounded-state passes — the sketch-then-recount spelling of heavy
    * hitters that survives a vocabulary too large for any groupBy:
    * pass 1 folds the token stream into ONE O(k) Misra–Gries candidate
    * buffer ([[graft.functions.MisraGriesAgg]] — candidates are a
    * guaranteed superset of the true frequent items, stream length N
    * rides the same aggregate), pass 2 re-counts ONLY the candidates
    * (≤ k keys, broadcast semi-filtered before the shuffle) and keeps
    * those strictly above the threshold. Because MG admits no false
    * negatives, the recount output EQUALS the full `GROUP BY tok
    * HAVING count·(k+1) > N` — which is exactly the DuckDB oracle —
    * while the engine never builds the vocabulary-sized hash table.
    */
  def heavyHitters(spark: SparkSession, sfDir: String, k: Int = 100): DataFrame =
    heavyHittersOn(Tables.documents(spark, sfDir).select(col("text")), k)

  /** [[heavyHitters]] over any (text) frame — spec entry point (planted
    * skew, tiny k, the decrement/merge paths under pressure). */
  def heavyHittersOn(docTexts: DataFrame, k: Int): DataFrame = {
    val toks = docTexts.select(explode(TextOps.tokens(col("text"))).as("tok"))
    // one pass: O(k) candidate set + exact stream length
    val summary = toks.agg(
      graft.functions.MisraGriesAgg.misraGries(col("tok"), k).as("cands"),
      count(lit(1)).as("ntot"))
    val cands = summary.select(explode(col("cands")).as("tok"), col("ntot"))
    // second pass touches only candidate keys; ntot is constant per
    // group so grouping on it adds no cardinality
    toks.join(broadcast(cands), Seq("tok"))
      .groupBy(col("tok"), col("ntot"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") * lit(k + 1L) > col("ntot"))
      .select(col("tok"), col("n"))
  }
}
