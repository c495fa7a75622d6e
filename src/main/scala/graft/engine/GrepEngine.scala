package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed-grep core: the full query capability of the reference
  * (massimostanzione/distgrep — see /root/reference/server/server.go:138,
  * /root/reference/worker/worker.go:24-62) re-expressed as one declarative
  * Spark plan.
  *
  * Reference semantics reproduced exactly (SURVEY.md §2.1, §2.4):
  *   - filter: literal, case-sensitive substring containment
  *     (reference worker/worker.go:33-34, `strings.Count(line, substr) > 0`);
  *   - count: per-LINE frequency, not per-occurrence — a line containing the
  *     pattern twice still contributes 1 (worker/worker.go:37);
  *   - output: unordered bag of (line, freq) — reference output order is
  *     nondeterministic (reference README.md:34). Callers that need
  *     determinism apply `.orderBy(desc("freq"), asc("line"))`.
  *
  * The plan Catalyst produces — FileScan text → Filter → partial
  * HashAggregate → Exchange(hashpartitioning(line)) → final HashAggregate —
  * is the exact analogue of the reference's map / shuffle / reduce phases
  * (SURVEY.md §3.4), with map-side combining and hash-disjoint reducers for
  * free. No custom machinery: at 100 TB the scan parallelizes per file
  * split, the only shuffle is the aggregation exchange on the group key,
  * and whole-stage codegen covers filter+partial-agg in a single pass.
  */
object GrepEngine {

  /** Grep match modes. `Substring` is reference-parity
    * (worker/worker.go:33); `Regex` is what the reference README *claims*
    * (README.md:6) but never implemented — SURVEY.md §2.4(a);
    * `SubstringIgnoreCase` is the common extension.
    */
  sealed trait Mode
  case object Substring extends Mode
  case object Regex extends Mode
  case object SubstringIgnoreCase extends Mode

  /** Predicate for one pattern in the given mode, applied to `line`. */
  def matchPredicate(line: Column, pattern: String, mode: Mode): Column =
    mode match {
      case Substring           => line.contains(lit(pattern))
      case Regex               => line.rlike(pattern)
      case SubstringIgnoreCase => lower(line).contains(lit(pattern.toLowerCase))
    }

  /** Frequency of each distinct matching line among `lines`.
    * Output schema: (line: string, freq: long).
    */
  def grepFreq(lines: DataFrame, lineCol: String, pattern: String,
               mode: Mode = Substring): DataFrame =
    lines
      .filter(matchPredicate(col(lineCol), pattern, mode))
      .groupBy(col(lineCol).as("line"))
      .agg(count(lit(1)).as("freq"))

  /** Reference-parity entry point: grep a text file.
    * ≡ client→server→workers end-to-end (SURVEY.md §3).
    */
  def distGrep(spark: SparkSession, path: String, pattern: String,
               mode: Mode = Substring): DataFrame =
    grepFreq(spark.read.text(path), "value", pattern, mode)

  /** Multi-pattern grep: lines matching ANY of the patterns.
    * Composed as a single disjunctive predicate so it stays one scan +
    * one aggregate (no union of N scans).
    */
  def multiGrep(lines: DataFrame, lineCol: String, patterns: Seq[String],
                mode: Mode = Substring): DataFrame = {
    val pred = patterns.map(matchPredicate(col(lineCol), _, mode)).reduce(_ || _)
    lines.filter(pred)
      .groupBy(col(lineCol).as("line"))
      .agg(count(lit(1)).as("freq"))
  }

  // -- stored-index probe cores ([[graft.sources.TextIndexes]]): grep
  // without the corpus scan. The index layout is the classic character
  // TRIGRAM inverted index of the substring-search literature (public:
  // PostgreSQL pg_trgm; Cox, "Regular Expression Matching with a
  // Trigram Index", 2012): a line contains `pattern` only if it
  // contains every trigram of `pattern`, so postings over a few RAREST
  // pattern trigrams prune candidates and an exact contains() verify on
  // the surviving distinct lines makes the result IDENTICAL to the scan
  // spelling — candidate pruning is recall-free, verification restores
  // precision. Trigrams are stored lowercased, which makes one index
  // serve BOTH case modes: lowercase pattern trigrams over-generate
  // candidates for the case-sensitive mode and the verify restores
  // exactness, while the case-insensitive mode verifies on lower(line).
  // Regex mode has no trigram algebra here — it probes the DISTINCT
  // lines table (scan of unique lines + stored counts), which still
  // beats the corpus scan by the duplication factor. --

  /** Lowercased character trigrams of `s` as a Column — the write-side
    * twin of the driver-side `pattern.toLowerCase.sliding(3)`; under-3
    * -char strings shingle to an empty array.
    */
  private[graft] def lowerTrigrams(s: Column): Column = {
    val l = lower(s)
    when(length(l) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(l) - 2),
        i => substring(l, i, lit(3))))
  }

  /** The candidate line_hash set for one pattern: lines whose trigram
    * postings contain every one of the `probeGrams` RAREST pattern
    * trigrams (rarity AND partition bucket from the stored `gramdf`
    * table — ONE driver-side read of ≤|pattern| rows, control-plane
    * like an IVF centroid read; the bucket rides gramdf precisely so
    * the probe never recomputes the layout's hash, which could fork,
    * and never spends a second job deriving it). None = the pattern has
    * no trigram (under 3 chars) and prunes nothing: the caller scans
    * the distinct-lines table. A pattern trigram ABSENT from gramdf
    * proves no indexed line contains it — the probe short-circuits to
    * empty without touching postings.
    */
  private def trigramCandidates(postings: DataFrame, gramdf: DataFrame,
                                pattern: String,
                                probeGrams: Int): Option[DataFrame] = {
    val grams = pattern.toLowerCase.sliding(3).filter(_.length == 3)
      .toSeq.distinct
    if (grams.isEmpty) None
    else {
      val stats = gramdf.filter(col("gram").isin(grams: _*))
        .select(col("gram"), col("df"), col("bucket")).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap
      if (grams.exists(g => !stats.contains(g)))
        // an absent trigram means zero indexed lines contain it
        Some(postings.filter(lit(false)).select(col("line_hash")))
      else {
        val chosen = grams.sortBy(g => stats(g)._1).take(math.max(1, probeGrams))
        val buckets = chosen.map(g => stats(g)._2).distinct
        // bucket predicate prunes partitions; gram predicate prunes
        // rows inside the surviving files; a line qualifies only when
        // it holds ALL chosen trigrams (AND of containments)
        Some(postings
          .filter(col("bucket").isin(buckets: _*) && col("gram").isin(chosen: _*))
          .groupBy(col("line_hash"))
          .agg(countDistinct(col("gram")).as("ng"))
          .filter(col("ng") === chosen.size)
          .select(col("line_hash")))
      }
    }
  }

  /** The distinct-lines view of the raw stored `lines` frame: one row
    * per distinct line with its TOTAL occurrence count across ingests
    * (the stored freq rows are per-ingest deltas — merge-on-read, like
    * the verbatim index's occ table). Aggregated AFTER any candidate
    * semi-join so the shuffle carries candidate-sized data on the
    * probed path.
    */
  private def mergeLines(linesRaw: DataFrame): DataFrame =
    linesRaw.groupBy(col("line_hash"))
      .agg(max(col("line")).as("line"), sum(col("freq")).as("freq"))

  /** [[grepFreq]] probing a stored trigram index instead of scanning
    * the corpus — identical output by construction (candidates are a
    * superset of matches, the contains()/rlike verify restores
    * exactness). `Substring`/`SubstringIgnoreCase` prune through the
    * postings; `Regex` and under-3-char patterns scan the distinct
    * lines table (no trigram algebra / nothing to prune) — still
    * corpus-scan-free. Frames come from
    * [[graft.sources.TextIndexes.readGrepIndex]].
    */
  def grepFreqFromIndex(linesRaw: DataFrame, postings: DataFrame,
                        gramdf: DataFrame, pattern: String,
                        mode: Mode = Substring,
                        probeGrams: Int = 3): DataFrame = {
    val verified = mode match {
      case Regex => mergeLines(linesRaw)
      case _ =>
        trigramCandidates(postings, gramdf, pattern, probeGrams) match {
          case Some(cands) => mergeLines(linesRaw.join(cands, "line_hash"))
          case None        => mergeLines(linesRaw)
        }
    }
    verified.filter(matchPredicate(col("line"), pattern, mode))
      .select(col("line"), col("freq"))
  }

  /** [[multiGrep]] (match ANY pattern) over the stored index: per-
    * pattern candidate sets union BEFORE the single payload join, then
    * one disjunctive verify — one aggregation, one join, exactly like
    * the inline spelling stays one scan. Any pattern without trigram
    * pruning (under 3 chars, or `Regex` mode) degrades the whole probe
    * to the distinct-lines scan, since its matches can hide anywhere.
    */
  def multiGrepFromIndex(linesRaw: DataFrame, postings: DataFrame,
                         gramdf: DataFrame,
                         patterns: Seq[String], mode: Mode = Substring,
                         probeGrams: Int = 3): DataFrame = {
    require(patterns.nonEmpty, "multiGrepFromIndex needs at least one pattern")
    val pred = patterns.map(matchPredicate(col("line"), _, mode)).reduce(_ || _)
    val candSets =
      if (mode == Regex) Seq(None)
      else patterns.map(trigramCandidates(postings, gramdf, _, probeGrams))
    val verified =
      if (candSets.exists(_.isEmpty)) mergeLines(linesRaw)
      else mergeLines(linesRaw.join(
        candSets.flatten.reduce(_ union _).distinct(), "line_hash"))
    verified.filter(pred).select(col("line"), col("freq"))
  }

  /** Top-k most-duplicated matching lines, deterministically tie-broken by
    * line text so results are reproducible (unlike the reference's
    * nondeterministic bag — README.md:34). A global top-k is a
    * TakeOrderedAndProject in the physical plan: each partition keeps only
    * k rows, so it scales without a full sort at 100 TB.
    */
  def grepTopK(lines: DataFrame, lineCol: String, pattern: String, k: Int,
               mode: Mode = Substring): DataFrame =
    grepFreq(lines, lineCol, pattern, mode)
      .orderBy(desc("freq"), asc("line"))
      .limit(k)

  /** [[grepTopK]] over the stored index — the same TakeOrderedAndProject
    * on top of the probe, so the top-k never materializes more than k
    * rows per partition either.
    */
  def grepTopKFromIndex(linesRaw: DataFrame, postings: DataFrame,
                        gramdf: DataFrame, pattern: String, k: Int,
                        mode: Mode = Substring): DataFrame =
    grepFreqFromIndex(linesRaw, postings, gramdf, pattern, mode)
      .orderBy(desc("freq"), asc("line"))
      .limit(k)

  /** Highlight modes of the reference client (client/client.go:17-21):
    * classic = ANSI bold red, asterisks, none. Presentation-layer only —
    * applied after collect(), exactly like the reference applies it
    * client-side (client/client.go:69-79).
    */
  def highlight(line: String, pattern: String, mode: String): String =
    mode match {
      // bold + red FOREGROUND, matching the reference client's escape
      // sequence (client/client.go:17-18: bold + colorRed), not a red
      // background
      case "classic"   => line.replace(pattern,
        Console.BOLD + Console.RED + pattern + Console.RESET)
      case "asterisks" => line.replace(pattern, "*" + pattern + "*")
      case _           => line
    }

  /** Render the result exactly like the reference: header + 41-dash
    * ruler (client/client.go:80), then "<freq>\t<line>" per row
    * (server/server.go:231-234) with the highlight applied client-side.
    */
  def formatOutput(rows: Seq[(String, Long)], pattern: String, hl: String): String = {
    val header = "Freq.\tLine\n-----------------------------------------"
    (header +: rows.map { case (line, freq) =>
      s"$freq\t${highlight(line, pattern, hl)}"
    }).mkString("\n")
  }

  /** CLI with the reference's flag surface (client/client.go:25-28):
    * usage: GrepCli <file> <pattern> [hl-mode: classic|asterisks|none] [regex]
    */
  def main(args: Array[String]): Unit = {
    val path = if (args.length > 0) args(0) else "/root/reference/ILIAD_1STBOOK_IT_ALTERED"
    val pattern = if (args.length > 1) args(1) else "Achille"
    val hl = if (args.length > 2) args(2) else "classic"
    val mode: Mode = if (args.length > 3 && args(3) == "regex") Regex else Substring
    require(Seq("classic", "asterisks", "none").contains(hl),
      s"invalid highlight mode '$hl' (client/client.go:32-36 parity)")
    val spark = graft.Sessions.builder(
        sys.env.getOrElse("SPARK_MASTER", "local[*]"),
        Runtime.getRuntime.availableProcessors())
      .appName("distgrep")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = distGrep(spark, path, pattern, mode).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    println(formatOutput(rows, pattern, hl))
    spark.stop()
  }
}
