package graft

import graft.functions.CosineSimilarity
import graft.functions.CosineSimilarity.cosineSim
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native expression equals composed-builtins dot on unit vectors") {
    val df = Tables.embeddings(spark, TestSpark.sf0001).limit(50)
    val a = df.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = df.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ia") < col("ib"))
    val diff = pairs.select(abs(
      cosineSim(col("ea"), col("eb")) -
        Similarity.dot(Similarity.unitVec(col("ea")), Similarity.unitVec(col("eb"))))
      .as("d")).agg(max("d")).as[Double].head
    assert(diff < 1e-12, s"native vs builtin cosine diverged by $diff")
  }

  test("dot_product: norm-free sibling agrees with cosine in sign and scale") {
    import graft.functions.DotProduct.dotProduct
    val df = Tables.embeddings(spark, TestSpark.sf0001).limit(50)
    val a = df.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = df.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ia") < col("ib"))
      .select(dotProduct(col("ea"), col("eb")).as("dp"),
        cosineSim(col("ea"), col("eb")).as("cs"),
        dotProduct(col("ea"), col("ea")).as("na2"),
        dotProduct(col("eb"), col("eb")).as("nb2"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val (dp, cs, na2, nb2) = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      // sign(dot) == sign(cosine) — the property the LSH sketch relies on
      assert(math.signum(dp) === math.signum(cs))
      // and dot / (|a||b|) IS the cosine
      assert(math.abs(dp / math.sqrt(na2 * nb2) - cs) < 1e-12)
    }
    // SQL registration via extensions
    val s = spark.sql("SELECT dot_product(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d")
      .as[Double].head
    assert(math.abs(s - 11.0) < 1e-12)
    // null ELEMENT → null result (builtin-arithmetic parity), never a
    // silent 0 — interpreted path (literal) and codegen path (column)
    assert(spark.sql(
      "SELECT dot_product(array(1.0f, CAST(NULL AS FLOAT)), array(3.0f, 4.0f)) AS d")
      .collect().head.isNullAt(0))
    val nulled = Seq((1f, 3f)).toDF("x", "y").select(
      dotProduct(array(col("x"), when(col("x") < 0, col("x"))),
        array(col("y"), col("y"))).as("d"),
      cosineSim(array(col("x"), when(col("x") < 0, col("x"))),
        array(col("y"), col("y"))).as("c"))
      .collect().head
    assert(nulled.isNullAt(0) && nulled.isNullAt(1))
  }

  test("known values: orthogonal -> 0, identical -> 1, opposite -> -1") {
    val df = Seq(
      (Array(1f, 0f), Array(0f, 1f), 0.0),
      (Array(1f, 2f), Array(1f, 2f), 1.0),
      (Array(1f, 0f), Array(-1f, 0f), -1.0),
    ).toDF("a", "b", "want")
    val got = df.select(cosineSim(col("a"), col("b")).as("c"), col("want"))
      .as[(Double, Double)].collect()
    got.foreach { case (c, want) => assert(math.abs(c - want) < 1e-9) }
  }

  test("null inputs yield null; length mismatch raises") {
    val df = Seq((Some(Array(1f, 2f)), None: Option[Array[Float]]))
      .toDF("a", "b")
    val out = df.select(cosineSim(col("a"), col("b"))).collect()
    assert(out.head.isNullAt(0))
    val bad = Seq((Array(1f, 2f), Array(1f, 2f, 3f))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(cosineSim(col("a"), col("b"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("zero vectors and empty arrays yield 0.0, never NaN") {
    val df = Seq(
      (Array(0f, 0f), Array(1f, 2f)),
      (Array(0f, 0f), Array(0f, 0f)),
      (Array.empty[Float], Array.empty[Float]),
    ).toDF("a", "b")
    val out = df.select(cosineSim(col("a"), col("b"))).as[Double].collect()
    assert(out.toSeq === Seq(0.0, 0.0, 0.0))
  }

  test("non-array input is rejected at analysis time, not execution time") {
    val df = Seq((1L, Array(1f, 2f))).toDF("x", "e")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(cosineSim(col("x"), col("e"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("cosine_sim"))
  }

  test("mixed float/double array inputs work (codegen accessor dispatch)") {
    val df = Seq((Array(3f, 4f), Array(3.0, 4.0))).toDF("a", "b")
    val c = df.select(cosineSim(col("a"), col("b"))).as[Double].head
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("SQL registration: cosine_sim callable from spark.sql") {
    CosineSimilarity.register(spark)
    Seq((Array(1f, 2f, 3f), Array(1f, 2f, 3f))).toDF("a", "b")
      .createOrReplaceTempView("vv")
    val c = spark.sql("SELECT cosine_sim(a, b) AS c FROM vv").as[Double].head
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("expression participates in whole-stage codegen (no fallback)") {
    val df = Tables.embeddings(spark, TestSpark.sf0001).limit(5)
      .select(cosineSim(col("embedding"), col("embedding")).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" marks operators fused into a WholeStageCodegen stage; the
    // Project evaluating the expression must carry it.
    assert(plan.linesIterator.exists(l =>
      l.contains("cosinesimilarity") && l.contains("*(")), s"plan:\n$plan")
    // and evaluation under codegen produces 1.0 for self-similarity
    assert(df.as[Double].collect().forall(c => math.abs(c - 1.0) < 1e-9))
  }
}
