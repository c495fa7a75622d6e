package graft

import graft.engine.GrepEngine
import graft.functions.MinHash
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based tests (SURVEY.md §5): engine results must equal brute
  * force and be invariant under row permutation and partition count —
  * the two degrees of freedom a distributed engine must not leak into
  * results.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop, n: Int = 12): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val word = Gen.oneOf("ab", "cd", "ee", "x", "spark", "sp")
  private val lineGen = Gen.listOfN(4, word).map(_.mkString(" "))
  private val bagGen = Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, lineGen))

  test("grep == brute force, invariant under permutation and partitioning") {
    val prop = Prop.forAll(bagGen, Gen.oneOf("a", "spark", "e", "zzz"),
      Gen.chooseNum(1, 7), Gen.chooseNum(0L, 99L)) { (bag, pat, parts, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(bag)
      val df = shuffled.toDF("line").repartition(parts)
      val got = GrepEngine.grepFreq(df, "line", pat)
        .as[(String, Long)].collect().toMap
      val want = bag.filter(_.contains(pat)).groupBy(identity)
        .map { case (l, xs) => l -> xs.length.toLong }
      got == want
    }
    check("grepFreq", prop)
  }

  test("minhash band keys: permutation- and multiplicity-invariant (pure)") {
    val setGen = Gen.chooseNum(1, 30)
      .flatMap(n => Gen.listOfN(n, Gen.identifier.map(_.take(8))))
    def keys(xs: Seq[String]): Seq[Long] =
      MinHash.bandKeys(
        new GenericArrayData(xs.map(s => UTF8String.fromString(s)).toArray),
        64, 16).toSeq
    val prop = Prop.forAll(setGen, Gen.chooseNum(0L, 99L)) { (xs, seed) =>
      val perm = new scala.util.Random(seed).shuffle(xs)
      keys(xs) == keys(perm) && keys(xs) == keys(xs ++ xs)
    }
    check("bandKeys", prop, n = 100)
  }

  test("integer Jaccard threshold algebra == float comparison (pure)") {
    // (den+num)*inter >= num*(sa+sb) must decide exactly like
    // inter/(sa+sb-inter) >= num/den for every integer configuration
    val prop = Prop.forAll(
      Gen.chooseNum(1, 500), Gen.chooseNum(1, 500), Gen.chooseNum(0, 500),
      Gen.oneOf((4, 5), (1, 2), (9, 10))) { (sa, sb, interRaw, t) =>
      val inter = math.min(interRaw, math.min(sa, sb))
      val (num, den) = t
      val intDecision = inter.toLong * (den + num) >= num.toLong * (sa + sb)
      val ratDecision = // exact rational compare, no floats
        BigInt(inter) * den >= BigInt(num) * (sa + sb - inter)
      intDecision == ratDecision
    }
    check("jaccardAlgebra", prop, n = 500)
  }

  test("wordset dedup key is permutation-invariant over token order") {
    val prop = Prop.forAll(bagGen.suchThat(_.nonEmpty), Gen.chooseNum(0L, 99L)) {
      (bag, seed) =>
        val rnd = new scala.util.Random(seed)
        // permute the TOKENS of each line: the wordset key must not move
        val permuted = bag.map(l => rnd.shuffle(l.split(" ").toList).mkString(" "))
        def keysOf(xs: Seq[String]) = xs.toDF("text")
          .select(org.apache.spark.sql.functions.array_join(
            org.apache.spark.sql.functions.array_sort(
              org.apache.spark.sql.functions.array_distinct(
                graft.operators.TextOps.tokens(
                  org.apache.spark.sql.functions.col("text")))), " "))
          .as[String].collect().sorted.toSeq
        keysOf(bag) == keysOf(permuted)
    }
    check("wordsetKey", prop, n = 8)
  }
}
