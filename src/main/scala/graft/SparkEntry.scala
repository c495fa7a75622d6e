package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.GrepEngine
import graft.engine.GrepEngine.{Regex, Substring, SubstringIgnoreCase}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a matching ANSI-SQL oracle in `oracleSql`
  * (run by the driver in DuckDB over the same parquet) unless the operator
  * is not SQL-expressible, in which case the driver records a rows-only
  * check. Column names are aliased identically on both sides — the driver
  * sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's one capability (grep + frequency, SURVEY.md §0) over
    * the documents table.
    */
  def entry(spark: SparkSession): DataFrame =
    GrepEngine.grepFreq(
      Tables.documents(spark, "/root/testdata/sf0.001"), "text", "spark")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- grep family (reference parity + M1 extensions, SURVEY.md §7.2) --
    "q_grep_freq" -> ((s, d) =>
      GrepEngine.grepFreq(Tables.documents(s, d), "text", "spark")),
    "q_grep_regex" -> ((s, d) =>
      GrepEngine.grepFreq(Tables.documents(s, d), "text", "ve[ck]tor", Regex)),
    "q_grep_ci" -> ((s, d) =>
      GrepEngine.grepFreq(Tables.documents(s, d), "text", "SPARK", SubstringIgnoreCase)),
    "q_grep_multi" -> ((s, d) =>
      GrepEngine.multiGrep(Tables.documents(s, d), "text", Seq("vector", "stream"))),
    "q_grep_topk" -> ((s, d) =>
      GrepEngine.grepTopK(Tables.documents(s, d), "text", "spark", 10)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_grep_freq" ->
      "SELECT text AS line, count(*) AS freq FROM documents WHERE text LIKE '%spark%' GROUP BY text",
    "q_grep_regex" ->
      "SELECT text AS line, count(*) AS freq FROM documents WHERE regexp_matches(text, 've[ck]tor') GROUP BY text",
    "q_grep_ci" ->
      "SELECT text AS line, count(*) AS freq FROM documents WHERE lower(text) LIKE '%spark%' GROUP BY text",
    "q_grep_multi" ->
      "SELECT text AS line, count(*) AS freq FROM documents WHERE text LIKE '%vector%' OR text LIKE '%stream%' GROUP BY text",
    "q_grep_topk" ->
      "SELECT text AS line, count(*) AS freq FROM documents WHERE text LIKE '%spark%' GROUP BY text ORDER BY freq DESC, line ASC LIMIT 10",
  )
}
