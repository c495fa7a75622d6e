package graft

import graft.operators.FuzzyMatch
import org.apache.spark.sql.functions._

/** Symmetric-deletion fuzzy join: the blocking must be COMPLETE for
  * Levenshtein ≤ 1 (the scaladoc's case analysis, exercised here
  * against brute force) and the verify must kill deletion-key
  * collisions (transpositions, double edits).
  */
class FuzzyMatchSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def brute(as: Seq[String], bs: Seq[String]): Set[(String, String, Long)] =
    (for {
      a <- as.distinct; b <- bs.distinct
      d = lev(a, b) if d <= 1
    } yield (a, b, d.toLong)).toSet

  private def run(as: Seq[String], bs: Seq[String]): Set[(String, String, Long)] =
    FuzzyMatch.matchNamesOn(as.toDF("n"), bs.toDF("n"))
      .as[(String, String, Long)].collect().toSet

  test("edit classes: equal, substitution, insert/delete in; others out") {
    val got = run(
      Seq("bolt", "gear", "ring", "widget"),
      Seq("bolt",      // equal        -> dist 0
        "boat",        // substitution -> dist 1 vs bolt
        "bol",         // deletion     -> dist 1 vs bolt
        "bolts",       // insertion    -> dist 1 vs bolt
        "gaer",        // transposition = 2 subs -> OUT (shares del key)
        "ringo",       // 1 insert     -> dist 1 vs ring
        "widge",       // 1 delete     -> dist 1 vs widget? no: len 5 vs 6, dist 1
        "wodget"))     // substitution -> dist 1 vs widget
    assert(got === brute(
      Seq("bolt", "gear", "ring", "widget"),
      Seq("bolt", "boat", "bol", "bolts", "gaer", "ringo", "widge", "wodget")))
    assert(got.contains(("bolt", "boat", 1L)))
    assert(!got.exists { case (a, b, _) => a == "gear" && b == "gaer" },
      "transposition is distance 2 — the verify must kill the shared-key candidate")
  }

  test("randomized catalogs == brute force (blocking completeness under noise)") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abcd"
    def word() = (0 until (3 + rnd.nextInt(5)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    for (trial <- 0 until 4) {
      val as = Seq.fill(60)(word())
      val bs = Seq.fill(60)(word())
      assert(run(as, bs) === brute(as, bs), s"trial $trial")
    }
  }

  test("single-char and empty names") {
    // del1 of a 1-char name includes the empty string; "" matches any
    // 1-char name at distance 1 and itself at 0
    val got = run(Seq("a", ""), Seq("b", "a", ""))
    assert(got === brute(Seq("a", ""), Seq("b", "a", "")))
    assert(got.contains(("a", "b", 1L)), "substitution via shared empty-string key")
    assert(got.contains(("", "", 0L)))
  }

  test("duplicated input names pair once (internal distinct)") {
    val got = run(Seq("bolt", "bolt", "bolt"), Seq("bolt", "bolt"))
    assert(got === Set(("bolt", "bolt", 0L)))
  }

  test("driver spelling: no cartesian/BNLJ in the plan, both classes present") {
    val df = FuzzyMatch.partCatalogMatch(spark, TestSpark.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "fuzzy join must block, never cross")
    val dists = df.select($"dist").distinct().as[Long].collect().toSet
    assert(dists === Set(0L, 1L), s"match classes on the fixture: $dists")
  }
}
