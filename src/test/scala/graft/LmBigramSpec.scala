package graft

import graft.operators.Lm
import org.apache.spark.sql.functions._

/** Bigram stupid-backoff LM (q_lm_bigram): the per-doc bit totals are
  * hash-checked against DuckDB by the driver; this suite asserts the
  * scoring semantics the totals can't show — which path each position
  * takes, the backoff penalty, the cap-clip guard, and composition with
  * the unigram scorer.
  */
class LmBigramSpec extends SparkSpec {
  import spark.implicits._

  private def score(docs: Seq[(Long, String)], ref: Seq[String],
                    vocab: Int = 16, bigrams: Int = 64) =
    Lm.bigramScoreOn(docs.toDF("doc_id", "text"), ref.toDF("text"),
      vocab, bigrams)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("hand-computed staircase: first-token, known-bigram, and backoff paths") {
    // reference: "a b a b" -> N=4; uni: a->2, b->2; bigrams: (a,b)->2, (b,a)->1
    val ref = Seq("a b a b")
    // doc 1 "a b": pos1 uni a: bitlen(4)-bitlen(3) = 3-2 = 1
    //              pos2 bigram (a,b) known: bitlen(2+1)-bitlen(2+1) = 0
    // doc 2 "a z": pos1 = 1; pos2 backoff (a,z) unknown:
    //              2 + bitlen(4)-bitlen(0+1) = 2 + 3 - 1 = 4
    val got = score(Seq((1L, "a b"), (2L, "a z")), ref)
    assert(got === Map(1L -> ((2L, 1L)), 2L -> ((2L, 5L))))
  }

  test("known bigram clipped at zero when prev fell below the unigram cap") {
    // vocab cap 1 keeps only "a"; bigram cap keeps everything.
    // reference "b c b c": uni kept: b->2 (cnt desc, tok asc -> b beats c)
    // doc "c b": pos1 uni c OOV: bitlen(4)-bitlen(1) = 3-1 = 2
    //            pos2 bigram (c,b) known (cnt 1): prev c is OOV ->
    //            bitlen(0+1)-bitlen(1+1) = 1-2 = -1 -> clipped to 0
    val got = score(Seq((1L, "c b")), Seq("b c b c"), vocab = 1)
    assert(got === Map(1L -> ((2L, 2L))))
  }

  test("single-token doc takes exactly the unigram path") {
    val uniBits = Lm.lmScoreOn(Seq((1L, "a")).toDF("doc_id", "text"),
      Seq("a b a b").toDF("text"), 16)
      .select("bits").as[Long].head()
    val biBits = score(Seq((1L, "a")), Seq("a b a b"))(1L)._2
    assert(biBits === uniBits)
  }

  test("driver caps leave all three scoring paths non-vacuous on the fixture") {
    val sf = TestSpark.sf0001
    val docs = Tables.documents(spark, sf)
    val uni = Lm.vocabOn(docs.filter(col("lang") === "en").select(col("text")), 16)
    val bi = Lm.bigramVocabOn(
      docs.filter(col("lang") === "en").select(col("text")), 64)
    // positional pairs of the scored corpus, tagged by path
    val pos = docs
      .select(col("doc_id"), operators.TextOps.tokens(col("text")).as("ws"))
      .select(explode(transform(sequence(lit(1), size(col("ws"))),
        i => struct(element_at(col("ws"), i).as("tok"),
          when(i > 1, element_at(col("ws"), i - 1)).as("prev")))).as("p"))
      .select(col("p.tok"), col("p.prev"))
    val tagged = pos
      .join(broadcast(bi.select(col("prev"), col("tok"), lit(1).as("hit"))),
        Seq("prev", "tok"), "left")
      .select(when(col("prev").isNull, "first")
        .when(col("hit").isNotNull, "bigram")
        .otherwise("backoff").as("path"))
      .groupBy("path").count().as[(String, Long)].collect().toMap
    assert(tagged.keySet === Set("first", "bigram", "backoff"),
      s"vacuous scoring path at driver caps: $tagged")
  }

  test("bigram buckets: exact tertile sizes, monotone along (score, doc_id)") {
    val b = Lm.bigramBuckets(spark, TestSpark.sf0001, "en", 16, 64)
      .as[(Long, Long, String)].collect()
    val n = b.length
    val sizes = b.groupBy(_._3).view.mapValues(_.length).toMap
    assert(sizes("head") === n / 3 && sizes("middle") === n * 2 / 3 - n / 3 &&
      sizes("tail") === n - n * 2 / 3)
    // global (score, doc_id) order never goes back from a later bucket
    val rank = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
    val ordered = b.sortBy(r => (r._2, r._1)).map(r => rank(r._3))
    assert(ordered.sameElements(ordered.sorted),
      "bucket membership not monotone in global score order")
  }

  test("bigram vocab cap is deterministic: (count desc, prev asc, tok asc)") {
    // four bigrams all with count 1 -> the cap of 2 must keep the two
    // lexicographically smallest
    val bi = Lm.bigramVocabOn(Seq("a b", "a c", "b a", "b c").toDF("text"), 2)
      .select("prev", "tok").as[(String, String)].collect().toSet
    assert(bi === Set(("a", "b"), ("a", "c")))
  }
}
