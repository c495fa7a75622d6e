package graft

import graft.functions.MinHash
import graft.functions.MinHash.minhashBandKeys
import graft.operators.TextOps
import org.apache.spark.sql.functions._

class MinHashSpec extends SparkSpec {
  import spark.implicits._

  test("identical sets produce identical band keys; deterministic across runs") {
    val df = Seq("x y z w q", "x y z w q").toDF("text")
      .select(minhashBandKeys(TextOps.shingles(col("text"), 3), 64, 16).as("keys"))
    val rows = df.as[Seq[Long]].collect()
    assert(rows(0) === rows(1))
    assert(rows(0).length === 16)
    val again = Seq("x y z w q").toDF("text")
      .select(minhashBandKeys(TextOps.shingles(col("text"), 3), 64, 16).as("keys"))
      .as[Seq[Long]].head
    assert(again === rows(0))
  }

  test("set order does not affect band keys (minwise property)") {
    val df = Seq(
      Array("a b c", "b c d", "c d e"),
      Array("c d e", "a b c", "b c d"),
    ).toDF("sh").select(minhashBandKeys(col("sh"), 64, 16).as("keys"))
    val rows = df.as[Seq[Long]].collect()
    assert(rows(0) === rows(1))
  }

  test("disjoint sets share no band key; high-overlap sets share at least one") {
    val base = (1 to 50).map(i => s"tok$i gram$i word$i")
    val nearDup = base.drop(2) ++ Seq("novel x y", "novel z w") // ~92% Jaccard
    val disjoint = (1 to 50).map(i => s"other$i thing$i text$i")
    val df = Seq(base.toArray, nearDup.toArray, disjoint.toArray).toDF("sh")
      .select(minhashBandKeys(col("sh"), 64, 16).as("keys"))
    val rows = df.as[Seq[Long]].collect()
    assert((rows(0).toSet & rows(1).toSet).nonEmpty,
      "0.92-Jaccard pair must collide in >=1 of 16 bands (miss prob ~1e-9)")
    assert((rows(0).toSet & rows(2).toSet).isEmpty,
      "disjoint sets colliding would mean broken hashing")
  }

  test("band keys from different band indices never equal (structural seed)") {
    val keys = Seq(Array("a b c", "d e f")).toDF("sh")
      .select(minhashBandKeys(col("sh"), 64, 16).as("keys")).as[Seq[Long]].head
    assert(keys.distinct.length === keys.length)
  }

  test("expression participates in whole-stage codegen (no fallback)") {
    // feed a codegen-able array child (split) — a HOF child like
    // TextOps.shingles would knock the whole Project out of codegen
    // regardless of this expression's own support
    val df = Tables.documents(spark, TestSpark.sf0001).limit(5)
      .select(minhashBandKeys(split(col("text"), " "), 64, 16).as("keys"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("minhashbandkeys") && l.contains("*(")), s"plan:\n$plan")
    assert(df.as[Seq[Long]].collect().forall(_.length === 16))
  }

  test("non-string-array input is rejected at analysis time") {
    val df = Seq(Array(1L, 2L)).toDF("xs")
    val e = intercept[Exception] {
      df.select(minhashBandKeys(col("xs"), 64, 16)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("minhash_band_keys") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("native word_shingles equals the composed-builtins spelling on real docs") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("text"),
        TextOps.shingles(col("text"), 3).as("native"),
        TextOps.shinglesHof(col("text"), 3).as("hof"))
    val diffs = docs.filter(not(col("native") === col("hof"))).count()
    assert(diffs === 0, "native and HOF shingles must agree exactly")
    // and on edge shapes: short docs, repeated grams, trailing spaces
    val edge = Seq("", "a", "a b", "a b c", "a b c d", "x x x x x", "a b c ",
      " a b c", "a  b c d").toDF("text")
      .select(TextOps.shingles(col("text"), 3).as("native"),
        TextOps.shinglesHof(col("text"), 3).as("hof"))
    val edgeDiffs = edge.filter(not(col("native") === col("hof"))).count()
    assert(edgeDiffs === 0)
  }

  test("word_ngrams keeps duplicates in position order; distinct view equals word_shingles") {
    import graft.functions.WordShingles.{wordNgrams, wordShingles}
    // the occurrence stream mirrors the HOF window spelling without the
    // array_distinct, on real docs and edge shapes
    val hof2 = when(size(split(col("text"), " ")) >= 2,
      transform(sequence(lit(1), size(split(col("text"), " ")) - 1),
        i => concat_ws(" ", slice(split(col("text"), " "), i, lit(2)))))
      .otherwise(array().cast("array<string>"))
    val docs = Tables.documents(spark, TestSpark.sf0001).select(col("text"))
      .union(Seq("", "a", "a b", "x x x x x", "a b c ", " a b c", "a  b").toDF("text"))
    val diffs = docs
      .select(wordNgrams(col("text"), 2).as("native"), hof2.as("hof"))
      .filter(not(col("native") === col("hof"))).count()
    assert(diffs === 0, "occurrence n-grams must mirror the HOF window spelling")
    // first-occurrence-ordered distinct of the stream IS the shingle set
    val dd = docs
      .select(array_distinct(wordNgrams(col("text"), 3)).as("viaNgrams"),
        wordShingles(col("text"), 3).as("shingles"))
      .filter(not(col("viaNgrams") === col("shingles"))).count()
    assert(dd === 0)
  }

  test("empty set yields defined keys (all-minima sentinel), no crash") {
    val keys = Seq(Array.empty[String]).toDF("sh")
      .select(minhashBandKeys(col("sh"), 64, 16).as("keys")).as[Seq[Long]].head
    assert(keys.length === 16)
  }
}
