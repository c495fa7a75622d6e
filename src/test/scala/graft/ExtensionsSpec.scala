package graft

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("native functions are SQL-callable via GraftExtensions (no registration call)") {
    val cos = spark.sql(
      "SELECT cosine_sim(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS c")
      .as[Double].head
    assert(math.abs(cos - 1.0) < 1e-12)

    val nKeys = spark.sql(
      "SELECT size(minhash_band_keys(array('a b c', 'b c d'), 64, 16)) AS n")
      .as[Int].head
    assert(nKeys === 16)

    val hist = spark.sql(
      "SELECT byte_histogram(CAST('aaaa' AS BINARY), 16) AS h")
      .as[Seq[Float]].head
    assert(hist.length === 16)
    assert(math.abs(hist.sum - 1.0f) < 1e-6f)
    // 'a' = 0x61 -> bin 6 holds everything
    assert(hist(6) === 1.0f)

    // aggregate function: one token 'a' (count 2) and one 'b' — the
    // signature must equal the driver-side sign-of-sums computation
    val sig = spark.sql("""
      SELECT simhash_agg(xxhash64(tok)) AS sig
      FROM (SELECT explode(array('a', 'a', 'b')) AS tok)""").as[Long].head
    val expected = {
      import org.apache.spark.sql.catalyst.expressions.XxHash64Function
      import org.apache.spark.sql.types.StringType
      import org.apache.spark.unsafe.types.UTF8String
      val hs = Seq(("a", 2), ("b", 1)).map { case (t, c) =>
        (XxHash64Function.hash(UTF8String.fromString(t), StringType, 42L), c)
      }
      (0 until 64).foldLeft(0L) { (acc, b) =>
        val s = hs.map { case (h, c) => (((h >>> b) & 1L) * 2 - 1) * c }.sum
        if (s > 0) acc | (1L << b) else acc
      }
    }
    assert(sig === expected)
  }

  // Rewrite tests run over the parquet-backed documents table: a
  // Seq-based LocalRelation gets the whole projection constant-folded at
  // optimize time, leaving nothing to observe. Ground truth comes from
  // the ORDER-SWAPPED spelling array_distinct(sort_array(x)) — value-
  // identical (distinct of a sorted array stays sorted) but outside the
  // rule's pattern, so it keeps the builtin plan.
  test("optimizer rule rewrites the builtin sorted-distinct intersect size") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val ta = split(col("text"), " ")
    val tb = split(concat(col("text"), lit(" zzz qqq")), " ")
    val out = docs.select(size(array_intersect(
      sort_array(array_distinct(ta)), sort_array(array_distinct(tb)))).as("n"))
    assert(out.queryExecution.optimizedPlan.toString
      .contains("sorted_intersect_size"), "rule must fire on the canonical spelling")
    val want = docs.select(size(array_intersect(
      array_distinct(sort_array(ta)), array_distinct(sort_array(tb)))).as("n"))
    assert(!want.queryExecution.optimizedPlan.toString.contains("sorted_intersect_size"))
    assert(out.as[Int].collect().toSeq === want.as[Int].collect().toSeq)
    assert(out.agg(max(col("n"))).as[Int].head > 0, "fixture must exercise overlaps")
    // descending sort violates the merge-scan order → no rewrite
    val desc = docs.select(size(array_intersect(
      sort_array(array_distinct(ta), asc = false),
      sort_array(array_distinct(tb)))).as("n"))
    assert(!desc.queryExecution.optimizedPlan.toString.contains("sorted_intersect_size"))
  }

  test("intersect-size rewrite preserves null-element and null-array semantics") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSpark.sf0001)
    // null ELEMENT when the parity condition fails (when without
    // otherwise); both sides get nulls on different doc subsets, so the
    // fixture covers null-in-both / null-in-one / null-in-neither
    val ea = array(when(col("doc_id") % 2 === 0, lit("u")), lit("v"), lit("w"))
    val eb = array(when(col("doc_id") % 3 === 0, lit("u")), lit("v"), lit("x"))
    val out = docs.select(size(array_intersect(
      sort_array(array_distinct(ea)), sort_array(array_distinct(eb)))).as("n"))
    assert(out.queryExecution.optimizedPlan.toString.contains("sorted_intersect_size"))
    val want = docs.select(size(array_intersect(
      array_distinct(sort_array(ea)), array_distinct(sort_array(eb)))).as("n"))
    assert(out.as[Int].collect().toSeq === want.as[Int].collect().toSeq)
    // null ARRAY input (when inside the pattern) → null out, matching
    // size(array_intersect) under legacySizeOfNull=false. Elements stay
    // column-dependent: a literal-only array constant-folds the whole
    // sort_array(array_distinct(..)) subtree away before the rule sees it
    val na = when(col("doc_id") % 2 === 0, array(col("source"), lit("v"), lit("w")))
    val nb = array(col("source"), lit("v"))
    val nullArr = docs.select(size(array_intersect(
      sort_array(array_distinct(na)), sort_array(array_distinct(nb)))).as("n"))
    assert(nullArr.queryExecution.optimizedPlan.toString.contains("sorted_intersect_size"))
    val gotN = nullArr.as[java.lang.Integer].collect().toSeq
    val wantN = docs.select(size(array_intersect(
      array_distinct(sort_array(na)), array_distinct(sort_array(nb)))).as("n"))
      .as[java.lang.Integer].collect().toSeq
    assert(gotN === wantN)
    assert(gotN.contains(null) && gotN.contains(Integer.valueOf(2)))
  }

  test("non-literal band parameters are rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_band_keys(array('x'), CAST(id AS INT), 16) FROM range(1)")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("wrong arity yields an analysis-time error naming the function") {
    for ((sql, fn) <- Seq(
      ("SELECT cosine_sim(array(1.0f))", "cosine_sim"),
      ("SELECT minhash_band_keys(array('x'), 64)", "minhash_band_keys"),
      ("SELECT byte_histogram(CAST('a' AS BINARY), 16, 3)", "byte_histogram"),
      ("SELECT dot_product(array(1.0f))", "dot_product"),
      ("SELECT sorted_intersect_size(array('a'))", "sorted_intersect_size"),
      ("SELECT simhash_agg(1L, 2L)", "simhash_agg"))) {
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.getMessage.contains(fn) && e.getMessage.contains("argument"),
        s"$sql: got ${e.getMessage.take(200)}")
    }
  }
}
