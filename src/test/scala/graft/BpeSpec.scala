package graft

import graft.operators.{Bpe, TextOps}
import org.apache.spark.sql.functions._

/** BPE merge learning (q_bpe_pairs hash-checked by the driver;
  * q_bpe_merges rows-only): the iterative learner is asserted against a
  * first-principles single-machine reimplementation, and the merge
  * APPLICATION semantics (greedy leftmost-first) are pinned by hand
  * cases.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Ground truth: classic BPE on a word-frequency map, plain
    * collections. Tie-break (count desc, left asc, right asc) — the
    * engine's documented rule.
    */
  private def refBpe(wordFreq: Map[String, Long], k: Int)
      : Seq[(Int, String, String, Long)] = {
    var seg: Vector[(List[String], Long)] =
      wordFreq.toVector.map { case (w, f) => (w.split("").toList, f) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= k && !done) {
      val counts = collection.mutable.Map[(String, String), Long]()
      for ((syms, f) <- seg; Seq(a, b) <- syms.sliding(2) if syms.length >= 2)
        counts((a, b)) = counts.getOrElse((a, b), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((step, l, r, c))
        seg = seg.map { case (syms, f) =>
          val merged = syms.foldLeft(List.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == l && x == r)
              acc.init :+ (l + r)
            else acc :+ x
          }
          (merged, f)
        }
        step += 1
      }
    }
    out.result()
  }

  test("applyMerge is greedy leftmost-first: aaa with (a,a) -> [aa, a]") {
    val got = Seq(Tuple1(Seq("a", "a", "a"))).toDF("syms")
      .select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .as[Seq[String]].head()
    assert(got === Seq("aa", "a"))
  }

  test("applyMerge merges every non-overlapping occurrence") {
    val got = Seq(Tuple1(Seq("x", "a", "b", "c", "a", "b"))).toDF("syms")
      .select(Bpe.applyMerge(col("syms"), "a", "b").as("m"))
      .as[Seq[String]].head()
    assert(got === Seq("x", "ab", "c", "ab"))
  }

  test("learned merges == first-principles BPE on a hand corpus") {
    // "low" x5, "lower" x2, "newest" x6, "widest" x3 — the textbook
    // Sennrich example shape
    val docs = Seq((1L, ("low " * 5).trim), (2L, ("lower " * 2).trim),
      (3L, ("newest " * 6).trim), (4L, ("widest " * 3).trim))
      .toDF("doc_id", "text")
    val wf = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val got = Bpe.learnMergesOn(docs.select(col("text")), 6)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got === refBpe(wf, 6))
  }

  test("learned merges == first-principles BPE on the fixture corpus") {
    val docs = Tables.documents(spark, TestSpark.sf0001).select(col("text"))
    val wf = docs.select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val got = Bpe.learnMergesOn(docs, 8)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got === refBpe(wf, 8))
    assert(got.size === 8, "fixture vocabulary exhausted before 8 merges")
  }

  test("merge lineage survives multiple checkpoint windows; k ceiling guarded") {
    // five 10-char words over disjoint alphabets: no cross-word pair
    // sharing, so exactly 9 merges per word are available — 45 total,
    // letting k = 34 cross the CheckpointEvery=16 cuts at steps 16 and
    // 32 (>= 2 windows, the r18 verdict's spec shape)
    assert(Bpe.CheckpointEvery === 16, "spec fixture sized for 16-step windows")
    val ws = Seq("abcdefghij", "klmnopqrst", "uvwxyzABCD",
      "EFGHIJKLMN", "OPQRSTUVWX")
    val docs = ws.zipWithIndex
      .map { case (w, i) => ((w + " ") * (i + 2)).trim }
      .map(Tuple1(_)).toDF("text")
    val wf = ws.zipWithIndex.map { case (w, i) => (w, (i + 2).toLong) }.toMap
    val got = Bpe.learnMergesOn(docs, 34)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got === refBpe(wf, 34))
    assert(got.size === 34, "fixture must not exhaust inside the window test")
    intercept[IllegalArgumentException](
      Bpe.learnMergesOn(docs, Bpe.MaxMerges + 1))
    intercept[IllegalArgumentException](Bpe.learnMergesOn(docs, 0))
  }

  test("learner stops early on a fully merged vocabulary") {
    val docs = Seq(Tuple1("ab ab")).toDF("text")
    val got = Bpe.learnMergesOn(docs, 10)
      .as[(Int, String, String, Long)].collect().toSeq
    // only one pair exists; after merging (a,b) nothing remains
    assert(got === Seq((1, "a", "b", 2L)))
  }

  test("segmentWith applies the learned table in order") {
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"))
    val got = Seq(Tuple1("lowest")).toDF("w")
      .select(Bpe.segmentWith(col("w"), merges).as("m"))
      .as[Seq[String]].head()
    assert(got === Seq("lo", "w", "est"))
  }

  test("pair table matches the first merge decision") {
    val pairs = Bpe.bpePairs(spark, TestSpark.sf0001)
      .as[(String, String, Long)].collect()
    val merge1 = Bpe.learnMergesOn(
      Tables.documents(spark, TestSpark.sf0001).select(col("text")), 1)
      .as[(Int, String, String, Long)].head()
    assert((pairs.head._1, pairs.head._2, pairs.head._3) ===
      ((merge1._2, merge1._3, merge1._4)))
  }
}
