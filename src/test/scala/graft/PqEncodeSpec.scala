package graft

import graft.functions.PqEncode.pqEncode
import graft.operators.Similarity
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The r20 native PQ encode ([[graft.functions.PqEncode]]) against the
  * composed-builtins spelling it replaced in
  * [[Similarity.quantizePqOn]] — codes must be BIT-IDENTICAL (the
  * stored fixture code tables were written by the old spelling; a
  * single flipped code would fork stored-vs-inline probes).
  */
class PqEncodeSpec extends SparkSpec {

  /** The pre-r20 composed-builtins encode, kept verbatim as the
    * reference: per-subspace squared-L2 distance arrays over codebook
    * literals + array_position/array_min argmin over the unit vector.
    */
  private def referenceCodes(emb: org.apache.spark.sql.DataFrame,
                             books: Seq[Seq[Seq[Double]]]): org.apache.spark.sql.DataFrame = {
    def l2sqAll(sub: Column, book: Seq[Seq[Double]]): Column =
      transform(typedlit(book), c =>
        aggregate(zip_with(sub, c, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x))
    val dsub = books.head.head.length
    val withU = emb.select(col("vec_id"), Similarity.unitVec(col("embedding")).as("u"))
    val withD = books.indices.foldLeft(withU) { (df, j) =>
      df.withColumn(s"__d$j", l2sqAll(slice(col("u"), j * dsub + 1, dsub), books(j)))
    }
    withD.select(col("vec_id"),
      array(books.indices.map(j =>
        (array_position(col(s"__d$j"), array_min(col(s"__d$j"))) - 1)
          .cast("tinyint")): _*).as("codes"))
  }

  private def codesOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Byte]] =
    df.collect().map(r => r.getLong(0) -> r.getSeq[Byte](1).toList).toMap

  test("native codes == composed-builtins codes on the embeddings fixture") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val books = Similarity.fitPqCodebooks(emb, "pqencodespec", 16, 32)
    val native = codesOf(emb.select(col("vec_id"),
      pqEncode(col("embedding"), books).as("codes")))
    val ref = codesOf(referenceCodes(emb, books))
    assert(native.nonEmpty && native === ref)
  }

  test("tie breaks to the FIRST minimal centroid, like array_position") {
    // two identical centroids: distance ties exactly; both spellings
    // must pick index 0
    val books = Seq(Seq(Seq(1.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 1.0)))
    import spark.implicits._
    val emb = Seq((1L, Seq(2.0f, 0.0f))).toDF("vec_id", "embedding")
    val native = codesOf(emb.select(col("vec_id"),
      pqEncode(col("embedding"), books).as("codes")))
    assert(native(1L) === List(0.toByte))
    assert(codesOf(referenceCodes(emb, books)) === native)
  }

  test("null vector yields null; wrong length throws") {
    val books = Seq(Seq(Seq(0.0, 0.0)))
    import spark.implicits._
    val emb = Seq((1L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding")
    val out = emb.select(pqEncode(col("embedding"), books).as("c")).collect()
    assert(out.head.isNullAt(0))
    val bad = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception](
      bad.select(pqEncode(col("embedding"), books).as("c")).collect())
    assert(e.getMessage != null)
  }
}
