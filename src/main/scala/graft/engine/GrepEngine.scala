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

  /** `grep -w`: the pattern matches only at word boundaries (gnu grep's
    * --word-regexp). Spelled as a `\b`-anchored regex over the QUOTED
    * pattern (`\Q…\E`), so the pattern itself stays a literal — this is
    * word-anchored SUBSTRING search, not a regex mode. A word match
    * implies substring containment, so the trigram index's candidate
    * pruning stays recall-free for this mode and the stored probes
    * accept it unchanged (the exact verify restores word semantics).
    */
  case object WholeWord extends Mode

  /** Predicate for one pattern in the given mode, applied to `line`. */
  def matchPredicate(line: Column, pattern: String, mode: Mode): Column =
    mode match {
      case Substring           => line.contains(lit(pattern))
      case Regex               => line.rlike(pattern)
      case SubstringIgnoreCase => lower(line).contains(lit(pattern.toLowerCase))
      case WholeWord =>
        line.rlike("\\b" + java.util.regex.Pattern.quote(pattern) + "\\b")
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

  /** Distinct lowercased trigrams of a pattern, driver-side — the probe
    * key set; empty for under-3-char patterns. */
  private def patternGrams(pattern: String): Seq[String] =
    pattern.toLowerCase.sliding(3).filter(_.length == 3).toSeq.distinct

  /** ONE driver-side read of the tiny `gramdf` stats rows for `grams` —
    * ≤ Σ|pattern| rows filtered BEFORE collect, control-plane like an
    * IVF centroid read. The bucket rides gramdf precisely so the probe
    * never recomputes the layout's hash, which could fork, and never
    * spends a second job deriving it. Shared by the single- and
    * multi-pattern probes so the multi probe reads gramdf ONCE for all
    * patterns instead of once per pattern.
    */
  private def gramStats(gramdf: DataFrame,
                        grams: Seq[String]): Map[String, (Long, Int)] =
    if (grams.isEmpty) Map.empty
    else gramdf.filter(col("gram").isin(grams: _*))
      .select(col("gram"), col("df"), col("bucket")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap

  /** Driver-side probe decision for one pattern given the collected
    * gram stats: `NoTrigrams` (under 3 chars — nothing to prune, the
    * caller scans the distinct-lines table), `Impossible` (a pattern
    * trigram absent from gramdf proves NO indexed line contains the
    * pattern — in either case mode, since grams are stored lowercased),
    * or the rarest `probeGrams` trigrams with their buckets.
    */
  private sealed trait ProbePlan
  private case object NoTrigrams extends ProbePlan
  private case object Impossible extends ProbePlan
  private case class Probe(chosen: Seq[(String, Int)]) extends ProbePlan

  private def planProbe(stats: Map[String, (Long, Int)], pattern: String,
                        probeGrams: Int): ProbePlan = {
    val grams = patternGrams(pattern)
    if (grams.isEmpty) NoTrigrams
    else if (grams.exists(g => !stats.contains(g))) Impossible
    else Probe(grams.sortBy(g => stats(g)._1).take(math.max(1, probeGrams))
      .map(g => (g, stats(g)._2)))
  }

  /** The candidate line_hash set for one pattern: lines whose trigram
    * postings contain every one of the `probeGrams` RAREST pattern
    * trigrams. None = the pattern has no trigram (under 3 chars) and
    * prunes nothing: the caller scans the distinct-lines table. An
    * `Impossible` pattern short-circuits to empty without touching
    * postings.
    */
  private def trigramCandidates(postings: DataFrame, gramdf: DataFrame,
                                pattern: String,
                                probeGrams: Int): Option[DataFrame] =
    planProbe(gramStats(gramdf, patternGrams(pattern)), pattern, probeGrams) match {
      case NoTrigrams => None
      case Impossible =>
        // an absent trigram means zero indexed lines contain it
        Some(postings.filter(lit(false)).select(col("line_hash")))
      case Probe(chosen) =>
        val buckets = chosen.map(_._2).distinct
        val grams = chosen.map(_._1)
        // bucket predicate prunes partitions; gram predicate prunes
        // rows inside the surviving files; a line qualifies only when
        // it holds ALL chosen trigrams (AND of containments)
        Some(postings
          .filter(col("bucket").isin(buckets: _*) && col("gram").isin(grams: _*))
          .groupBy(col("line_hash"))
          .agg(countDistinct(col("gram")).as("ng"))
          .filter(col("ng") === chosen.size)
          .select(col("line_hash")))
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

  /** [[multiGrep]] (match ANY pattern) over the stored index. The probe
    * is ONE postings aggregation REGARDLESS of pattern count: each
    * pattern's chosen (gram, need-count) probe rows ship as a broadcast
    * local relation, postings join it on the gram, and a single groupBy
    * on (line_hash, pattern-id) keeps the lines holding ALL of a
    * pattern's chosen trigrams — collapsing the k+1 jobs of the
    * per-pattern union spelling into one job plus the payload join.
    *
    * Patterns degrade INDIVIDUALLY, never the whole probe:
    *   - an `Impossible` pattern (an index-absent trigram) matches no
    *     indexed line and drops out of both probe and verify;
    *   - an under-3-char pattern has no trigram algebra: its matches
    *     come from the distinct-lines table with its verify pushed
    *     BELOW the merge aggregation, so that exchange carries only its
    *     matching lines — while prunable patterns keep their trigram
    *     pruning. The two sides are made disjoint by predicate (the
    *     pruned side excludes short-pattern matches), so their union
    *     never double-counts a line. Pushing the verify below
    *     [[mergeLines]] is sound because `line` is functionally
    *     determined by the group key `line_hash` (the index's
    *     injectivity assumption — a collision would already corrupt
    *     freq sums).
    * `Regex` mode has no trigram algebra at all and verifies over the
    * distinct-lines table, corpus-scan-free like the single-pattern
    * probe.
    */
  def multiGrepFromIndex(linesRaw: DataFrame, postings: DataFrame,
                         gramdf: DataFrame,
                         patterns: Seq[String], mode: Mode = Substring,
                         probeGrams: Int = 3): DataFrame = {
    require(patterns.nonEmpty, "multiGrepFromIndex needs at least one pattern")
    if (mode == Regex) {
      val pred = patterns.map(matchPredicate(col("line"), _, mode)).reduce(_ || _)
      mergeLines(linesRaw).filter(pred).select(col("line"), col("freq"))
    } else {
      val stats = gramStats(gramdf, patterns.flatMap(patternGrams).distinct)
      val planned = patterns.map(p => p -> planProbe(stats, p, probeGrams))
      val probed = planned.collect { case (p, Probe(chosen)) => (p, chosen) }
      val scanned = planned.collect { case (p, NoTrigrams) => p }
      val scannedPred = scanned.map(matchPredicate(col("line"), _, mode))
        .reduceOption(_ || _)
      val scannedSide = scannedPred.map(sp => mergeLines(linesRaw.filter(sp)))
      val prunedSide = probed.map { case (p, _) =>
        matchPredicate(col("line"), p, mode)
      }.reduceOption(_ || _).map { pp =>
        val spark = postings.sparkSession
        import spark.implicits._
        val probeRows = probed.zipWithIndex.flatMap { case ((_, chosen), pid) =>
          chosen.map { case (g, b) => (pid, g, b, chosen.size) }
        }
        val probeDf = probeRows.toDF("pid", "gram", "bucket", "need")
        val cands = postings
          .filter(col("bucket").isin(probeRows.map(_._3).distinct: _*) &&
            col("gram").isin(probeRows.map(_._2).distinct: _*))
          .join(broadcast(probeDf.select(col("gram"), col("pid"), col("need"))),
            Seq("gram"))
          .groupBy(col("line_hash"), col("pid"), col("need"))
          .agg(countDistinct(col("gram")).as("ng"))
          .filter(col("ng") === col("need"))
          .select(col("line_hash")).distinct()
        val keep = scannedPred.fold(pp)(sp => pp && !sp)
        mergeLines(linesRaw.join(cands, "line_hash").filter(keep))
      }
      (scannedSide, prunedSide) match {
        case (Some(s), Some(p)) => s.unionByName(p)
        case (Some(s), None)    => s
        case (None, Some(p))    => p
        // every pattern Impossible: provably empty without a probe
        case (None, None)       => mergeLines(linesRaw.filter(lit(false)))
      }
    }.select(col("line"), col("freq"))
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

  // -- the classic grep FLAG family over a (file, line_no, line) corpus
  // view. The reference exposes exactly one question (-substr: matching
  // lines with frequencies, client/client.go:26); real grep users live
  // on -v/-w/-c/-l/-o/-C, so the engine completes the surface. Corpus
  // model: the `documents` table IS the multi-file corpus — each doc a
  // line, `source` the file, `doc_id` the line number (TESTDATA.md:
  // single-line synthetic texts). Every spelling below is one scan plus
  // at most one key-bounded exchange — nothing corpus-quadratic. --

  /** `grep -v`: frequency of each distinct NON-matching line — the
    * complement bag of [[grepFreq]] (together they partition the
    * distinct lines; GrepEngineSpec asserts it). Complements have no
    * trigram algebra (an index probe can prove presence, not absence),
    * so the stored spelling scans the distinct-lines table.
    */
  def grepInvert(lines: DataFrame, lineCol: String, pattern: String,
                 mode: Mode = Substring): DataFrame =
    lines
      .filter(!matchPredicate(col(lineCol), pattern, mode))
      .groupBy(col(lineCol).as("line"))
      .agg(count(lit(1)).as("freq"))

  /** `grep -o | uniq -c`: per-OCCURRENCE counting — the deliberate
    * counterpoint to the reference's per-line rule (worker/worker.go:37,
    * SURVEY.md §2.4(b)): a line holding the pattern twice counts 2 here.
    * Occurrences per line come from length arithmetic
    * ((len − len(line without pattern)) DIV |pattern|) — pure codegen'd
    * string ops in the same pass as the filter, no regex engine, no
    * second scan; `total_occ` = occurrences × line frequency.
    * Non-overlapping occurrences, like `grep -o` (replace() consumes
    * left-to-right).
    */
  def grepOccurrences(lines: DataFrame, lineCol: String,
                      pattern: String): DataFrame =
    lines
      .filter(col(lineCol).contains(lit(pattern)))
      .groupBy(col(lineCol).as("line"))
      .agg(count(lit(1)).as("freq"))
      .withColumn("diff",
        length(col("line")) - length(replace(col("line"), lit(pattern), lit(""))))
      .withColumn("occ", expr(s"diff DIV ${pattern.length}"))
      .select(col("line"), col("freq"), col("occ"),
        (col("occ") * col("freq")).as("total_occ"))

  /** `grep -c` across a corpus of files: matching-line count PER FILE,
    * zero-match files included (gnu grep prints `file:0`). One
    * conditional aggregate keyed on the file — map-side combines to
    * |files| rows, so the exchange is catalog-sized at any corpus size.
    */
  def grepFileCounts(lines: DataFrame, fileCol: String, lineCol: String,
                     pattern: String, mode: Mode = Substring): DataFrame =
    lines
      .groupBy(col(fileCol).as("file"))
      .agg(sum(when(matchPredicate(col(lineCol), pattern, mode), 1L)
        .otherwise(0L)).as("n_match"))

  /** `grep -l`: the distinct files containing at least one match.
    * Filter-then-distinct on the bare file key: the exchange carries
    * only matching files' names, nothing line-sized.
    */
  def grepFilesWithMatches(lines: DataFrame, fileCol: String, lineCol: String,
                           pattern: String, mode: Mode = Substring): DataFrame =
    lines
      .filter(matchPredicate(col(lineCol), pattern, mode))
      .select(col(fileCol).as("file"))
      .distinct()

  /** `grep -C n`: matching lines WITH n lines of context either side,
    * per file — emitted once each even where context windows overlap
    * (gnu grep's merged-context behavior), with `is_match`
    * distinguishing match lines from context lines. One window over
    * (file, line_no): a line is emitted iff any match sits within n
    * ROWS of it — physical adjacency, exactly grep's definition.
    *
    * 100 TB shape: ONE exchange partitioned on the file + an in-
    * partition sort; the file is grep's own unit of sequential
    * semantics, so per-file parallelism is the natural maximum. A
    * single pathological giant file serializes its own window (as it
    * must — context is sequential) but never anyone else's; split such
    * corpora on line-range boundaries upstream if per-file skew bites.
    */
  def contextGrep(lines: DataFrame, fileCol: String, lineNoCol: String,
                  lineCol: String, pattern: String, n: Int,
                  mode: Mode = Substring): DataFrame = {
    require(n >= 0, s"context radius must be >= 0, got $n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("file")).orderBy(col("line_no"))
      .rowsBetween(-n.toLong, n.toLong)
    lines
      .select(col(fileCol).as("file"),
        col(lineNoCol).cast("long").as("line_no"),
        col(lineCol).as("line"))
      .withColumn("is_match",
        matchPredicate(col("line"), pattern, mode).cast("long"))
      .withColumn("ctx", max(col("is_match")).over(w))
      .filter(col("ctx") === 1L)
      .select(col("file"), col("line_no"), col("line"), col("is_match"))
  }

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
