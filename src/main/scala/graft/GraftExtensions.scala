package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SparkSessionExtensions entry point (SURVEY.md §7.3 route (c) surface):
  * registers graft's native expressions as SQL functions at session
  * build, so `spark.sql("SELECT cosine_sim(a, b) ...")` works without
  * programmatic registration. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)` — [[Sessions.builder]] does the
  * former, making every entry point (CLI, Verify, Bench, tests) uniform.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, name: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case _ => throw new IllegalArgumentException(s"$name must be an integer literal")
  }

  /** Clean analysis-time error naming the function — indexing exprs
    * unchecked would surface as IndexOutOfBoundsException.
    */
  private def arity(fn: String, exprs: Seq[Expression], n: Int): Unit =
    if (exprs.length != n)
      throw new IllegalArgumentException(
        s"function $fn expects $n arguments, got ${exprs.length}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer rule: builtin sorted-distinct intersect-size spelling →
    // native merge scan (see plans.IntersectSizeRewrite for the guards)
    ext.injectOptimizerRule(_ => plans.IntersectSizeRewrite)
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[functions.CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        arity("cosine_sim", exprs, 2)
        functions.CosineSimilarity(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_band_keys"),
      new ExpressionInfo(classOf[functions.MinHashBandKeys].getName, "minhash_band_keys"),
      (exprs: Seq[Expression]) => {
        arity("minhash_band_keys", exprs, 3)
        functions.MinHashBandKeys(exprs(0),
          intLit(exprs(1), "k"), intLit(exprs(2), "bands"))
      }))
    ext.injectFunction((
      FunctionIdentifier("byte_histogram"),
      new ExpressionInfo(classOf[functions.ByteHistogramExpr].getName, "byte_histogram"),
      (exprs: Seq[Expression]) => {
        arity("byte_histogram", exprs, 2)
        functions.ByteHistogramExpr(exprs(0), intLit(exprs(1), "bins"))
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[functions.DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => {
        arity("dot_product", exprs, 2)
        functions.DotProduct(exprs(0), exprs(1))
      }))
    // aggregate function: the analyzer wraps a bare AggregateFunction in
    // an AggregateExpression during resolution, same as built-in aggs
    ext.injectFunction((
      FunctionIdentifier("simhash_agg"),
      new ExpressionInfo(classOf[functions.SimHashAgg].getName, "simhash_agg"),
      (exprs: Seq[Expression]) => {
        arity("simhash_agg", exprs, 1)
        functions.SimHashAgg(exprs(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[functions.MisraGriesAgg].getName, "misra_gries"),
      (exprs: Seq[Expression]) => {
        arity("misra_gries", exprs, 2)
        functions.MisraGriesAgg(exprs(0), intLit(exprs(1), "k"))
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[functions.BloomAgg].getName, "bloom_agg"),
      (exprs: Seq[Expression]) => {
        arity("bloom_agg", exprs, 3)
        functions.BloomAgg(exprs(0),
          intLit(exprs(1), "m_bits"), intLit(exprs(2), "k"))
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(classOf[functions.BloomContains].getName, "bloom_contains"),
      (exprs: Seq[Expression]) => {
        arity("bloom_contains", exprs, 3)
        functions.BloomContains(exprs(0), exprs(1), intLit(exprs(2), "k"))
      }))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[functions.SortedIntersectSize].getName, "sorted_intersect_size"),
      (exprs: Seq[Expression]) => {
        arity("sorted_intersect_size", exprs, 2)
        functions.SortedIntersectSize(exprs(0), exprs(1))
      }))
  }
}
