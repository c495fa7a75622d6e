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
