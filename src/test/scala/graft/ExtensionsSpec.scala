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
      ("SELECT byte_histogram(CAST('a' AS BINARY), 16, 3)", "byte_histogram"))) {
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.getMessage.contains(fn) && e.getMessage.contains("argument"),
        s"$sql: got ${e.getMessage.take(200)}")
    }
  }
}
