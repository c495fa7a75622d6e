package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DoubleType, StringType}

/** Corpus / table PROFILING — the "data card" stage every production
  * corpus build ships alongside the data (datasheets-for-datasets,
  * Gebru et al.; the per-source composition tables in the LLaMA / Pile
  * / RefinedWeb papers are exactly this shape), plus a generic
  * ANALYZE-style per-column profiler and the C4-style blocklist filter
  * (Raffel et al. drop any document containing a term from a bad-words
  * list before all other curation).
  *
  * House rules as everywhere in this repo: integer arithmetic only in
  * surfaced columns (ratios as ppm via `DIV`, doubles rendered through
  * DECIMAL(18,2) so both engines print one spelling), deterministic
  * tie-breaks, and no corpus-sized window — the only window here runs
  * over the (source × lang) frame, which is bounded by catalog size,
  * not corpus size.
  */
object Profile {

  /** Per-source corpus data card: document/token/char volumes plus the
    * language mix headline (distinct languages and the dominant
    * language's share in ppm). Top language tie-breaks deterministically
    * by (docs desc, lang asc).
    *
    * 100 TB shape: ONE corpus pass — a scan-fused projection to
    * (source, lang, n_chars, n_toks) feeding a (source, lang) partial
    * aggregate that map-side combines to |sources|×|langs| rows; the
    * per-source rollup and the top-language window both run over that
    * catalog-sized frame, never the corpus.
    */
  def corpusCard(spark: SparkSession, sfDir: String): DataFrame =
    corpusCardOn(Tables.documents(spark, sfDir))

  def corpusCardOn(docs: DataFrame): DataFrame =
    cardFromLangStats(langStatsOn(docs))

  /** The (source, lang) partial-stats frame the card rolls up from —
    * factored out so the STREAMING ingest
    * ([[graft.streaming.StreamingOps]] corpus-stats sink) writes the
    * same shape per micro-batch and the batch card / stored-stats card
    * cannot drift. All five measures are decomposable aggregates
    * (sum/sum/sum/min/max), which is what makes the per-ingest
    * partials mergeable on read.
    */
  private[graft] def langStatsOn(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), col("lang"), col("n_chars"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_toks"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("docs"),
        sum(col("n_toks")).as("toks"),
        sum(col("n_chars")).as("chars"),
        min(col("n_chars")).as("mn"),
        max(col("n_chars")).as("mx"))

  /** Card rollup over a (source, lang, docs, toks, chars, mn, mx)
    * frame (catalog-sized — the window below never sees the corpus).
    */
  private[graft] def cardFromLangStats(byLang: DataFrame): DataFrame = {
    val perSource = byLang.groupBy(col("source"))
      .agg(sum(col("docs")).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        min(col("mn")).as("min_chars"),
        max(col("mx")).as("max_chars"),
        sum(col("chars")).as("sum_chars"),
        count(lit(1)).cast("long").as("n_langs"))
    val topLang = byLang
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("docs").desc, col("lang"))))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"),
        col("docs").as("tl_docs"))
    perSource.join(topLang, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("min_chars"), col("max_chars"),
        expr("sum_chars DIV n_docs").as("avg_chars"),
        col("n_langs"),
        col("top_lang"),
        expr("tl_docs * 1000000 DIV n_docs").as("top_lang_ppm"))
  }

  /** The data card read from a STORED stats directory maintained by the
    * streaming corpus-stats ingest: per-ingest (source, lang) partials
    * merge on read — sums add, min/max fold — then the same rollup as
    * the batch card. Merge-on-read is the trigram-index freq-delta
    * pattern: the card stays current without any ingest ever rewriting
    * another ingest's rows.
    */
  def corpusCardFromStats(spark: SparkSession, statsDir: String): DataFrame =
    cardFromLangStats(
      spark.read.parquet(statsDir)
        .groupBy(col("source"), col("lang"))
        .agg(sum(col("docs")).as("docs"),
          sum(col("toks")).as("toks"),
          sum(col("chars")).as("chars"),
          min(col("mn")).as("mn"),
          max(col("mx")).as("mx")))

  /** ANALYZE-style per-column profile of an arbitrary table: null
    * count, exact distinct count, and min/max rendered as strings (one
    * row per column). Doubles go through DECIMAL(18,2) before the
    * string cast — DECIMAL has one printed spelling in Spark and
    * DuckDB, where raw double formatting carries engine licenses.
    *
    * 100 TB shape: TWO scan-fused hash-aggregate passes, deliberately
    * not one. A single agg mixing the multi-column exact
    * `count(DISTINCT)`s with the string min/max forces Spark's
    * distinct rewrite to carry every string cast through the Expand as
    * part of a |cols|+1-way grouping key, and string-typed partial
    * min/max demote the whole thing to SortAggregate: measured at
    * sf0.1, ~7x the table sorted TWICE around the exchange, 3.9 s.
    * Split, each side stays a hash aggregate — the nulls/min/max pass
    * scan-fuses to one row, the distinct pass Expands only the bare
    * column values (0.13 s + 0.21 s measured, ~11x less) — and the two
    * 1-row frames recombine via a constant-build-side broadcast join.
    * The per-column reshape then explodes a literal-sized 1-row frame,
    * so everything after the aggs is control-plane. For very wide
    * tables swap `countDistinct` for `approx_count_distinct` — one
    * sketch-sized pass, no Expand at all.
    */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    def asStr(c: String): Column = df.schema(c).dataType match {
      case DoubleType => col(c).cast("decimal(18,2)").cast("string")
      case _          => col(c).cast("string")
    }
    val basicAggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        min(asStr(c)).as(s"${c}__min"),
        max(asStr(c)).as(s"${c}__max"))
    }
    val distinctAggs = cols.map(c => countDistinct(col(c)).as(s"${c}__distinct"))
    val one = df.agg(basicAggs.head, basicAggs.tail: _*)
      .crossJoin(broadcast(df.agg(distinctAggs.head, distinctAggs.tail: _*)))
    val rows = array(cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"))
    }: _*)
    one.select(explode(rows).as("p")).select(col("p.*"))
  }

  /** Driver spelling: profile the orders table's key/measure/date/text
    * columns (long, double, date, string — one of each storage class,
    * so every formatter branch is exercised).
    */
  def ordersProfile(spark: SparkSession, sfDir: String): DataFrame =
    profileColumns(Tables.orders(spark, sfDir),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))

  /** C4-style blocklist verdict: per document, how many token
    * occurrences hit the blocklist (case-insensitive whole-token match,
    * exactly C4's word-boundary rule under this corpus' single-space
    * tokenization) and whether the document is kept.
    *
    * 100 TB shape: the real blocklists are large (C4's is ~400 terms;
    * enterprise opt-out lists run to millions of URLs/terms), so the
    * scale spelling is explode → BROADCAST semi-equi-join on the term —
    * never a per-row `isin` over a giant literal, never a regex union.
    * The hit counts aggregate doc-keyed with map-side combine; docs
    * without hits re-enter via a left join from the (already
    * projection-pruned) corpus frame.
    */
  def blocklistVerdictOn(docs: DataFrame, terms: DataFrame): DataFrame = {
    val hits = docs
      .select(col("doc_id"),
        explode(TextOps.tokens(lower(col("text")))).as("tok"))
      .join(broadcast(terms.select(lower(col("term")).as("tok")).distinct()),
        "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("hits"))
    docs.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("hits"), lit(0L)).as("n_hits"),
        col("hits").isNull.as("kept"))
  }

  /** Small-list spelling of the same verdict — a per-row
    * `arrays_overlap` against a literal array, no join at all. Correct
    * only while the blocklist fits in a codegen'd literal; kept as the
    * equivalence baseline (ProfileSpec asserts it matches the join
    * spelling hit-for-hit on the `kept` bit).
    */
  def blocklistVerdictSmallOn(docs: DataFrame, terms: Seq[String]): DataFrame =
    docs.select(col("doc_id"),
      arrays_overlap(TextOps.tokens(lower(col("text"))),
        array(terms.map(t => lit(t.toLowerCase)): _*)).unary_!.as("kept"))

  /** Driver blocklist: "dup" hits a real slice of the fixture corpus;
    * "spamword" hits nothing — the miss path stays non-vacuous. */
  val driverBlocklist: Seq[String] = Seq("dup", "spamword")

  def blocklistVerdict(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    blocklistVerdictOn(Tables.documents(spark, sfDir),
      driverBlocklist.toDF("term"))
  }

  /** KEY-SKEW DIAGNOSTIC — the pre-shuffle health check of any planned
    * join/aggregation key: the k heaviest key values with their row
    * counts and corpus share (integer ppm), ordered (count desc, key
    * asc — deterministic under ties). Reading it: a top key near
    * 10^6/k_partitions ppm means one reducer owns the key — salt it or
    * turn on AQE skew handling BEFORE the job, not after it straggles.
    *
    * Plan: one count-per-key hash aggregate (map-side combined), the
    * total riding a broadcast 1-row frame, TakeOrdered for the top-k —
    * output is k rows regardless of table size.
    */
  def keySkewOn(df: DataFrame, keyCol: String, k: Int = 5): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("string").as("key_value"))
      .agg(count(lit(1)).as("n_rows"))
    val total = df.agg(count(lit(1)).as("n_total"))
    counts.crossJoin(broadcast(total))
      .select(col("key_value"), col("n_rows"),
        expr("n_rows * 1000000 DIV n_total").as("share_ppm"))
      .orderBy(col("n_rows").desc, col("key_value").asc)
      .limit(k)
  }

  /** Driver spelling: the events stream's user_id — the key every
    * sessionization/funnel op shuffles on, so its heavy hitters are
    * the exact rows that decide task skew.
    */
  def eventsUserSkew(spark: SparkSession, sfDir: String): DataFrame =
    keySkewOn(graft.Tables.events(spark, sfDir), "user_id")
}
