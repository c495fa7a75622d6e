package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity of two float/double array
  * columns, computed in ONE fused pass — dot product and both norms in a
  * single loop over the raw `ArrayData`, no intermediate arrays.
  *
  * Why custom (SURVEY.md §7.3 route (b)): the built-in spelling
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` allocates a zipped array per
  * row and evaluates three lambda closures per element; for 100 TB of
  * 64-dim vectors that is the hot path. This expression generates a tight
  * scalar loop inside whole-stage codegen (doGenCode below), reading
  * primitive floats straight out of Tungsten's UnsafeArrayData.
  *
  * Null semantics: null if either side — or any ELEMENT — is null
  * (element nulls match the builtin zip_with/aggregate spelling instead
  * of silently reading 0); mismatched lengths raise, matching zip_with's
  * strictness on equal-size semantics for similarity use. Zero-norm
  * inputs (zero vector or empty array) return 0.0 — "no similarity
  * evidence" — rather than NaN, which would poison comparisons and never
  * equal itself.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // may return null for null ELEMENTS even when the array columns
  // themselves are non-nullable
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // tinyint arrays accepted since r20: SQ8 codes score through the
    // same kernel without the interpreted cast-to-float transform the
    // composed sq8Sim spelling paid per candidate row (byte -> float ->
    // double equals byte -> double exactly, so results are unchanged)
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType | ByteType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<float|double|tinyint> args, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def getterOf(e: Expression): String = e.dataType match {
    case ArrayType(FloatType, _) => "getFloat"
    case ArrayType(ByteType, _) => "getByte"
    case _ => "getDouble"
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    require(b.numElements() == n,
      s"cosine_sim: length mismatch ${n} vs ${b.numElements()}")
    def get(arr: ArrayData, e: Expression, i: Int): Double = e.dataType match {
      case ArrayType(FloatType, _) => arr.getFloat(i).toDouble
      case ArrayType(ByteType, _) => arr.getByte(i).toDouble
      case _ => arr.getDouble(i)
    }
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      // null element ⇒ null result (builtin-arithmetic parity; a vector
      // with missing dimensions has no meaningful similarity)
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = get(a, left, i)
      val y = get(b, right, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = getterOf(left)
    val bGet = getterOf(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "cosine_sim: length mismatch " + $n + " vs " + $b.numElements());
         |}
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final double $x = (double) $a.$aGet($i);
         |  final double $y = (double) $b.$bGet($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / java.lang.Math.sqrt($na * $nb);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry point: `cosine_sim(embA, embB)`. */
  def cosineSim(a: Column, b: Column): Column =
    CatalystBridge.column(CosineSimilarity(
      CatalystBridge.expression(a), CatalystBridge.expression(b)))

  /** Register as a SQL function `cosine_sim` on the session. Same
    * arity validation as the GraftExtensions route — this builder
    * REPLACES the injected one on the session, so it must be just as
    * strict or a 1-arg call degrades to an index error.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => {
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"function cosine_sim expects 2 arguments, got ${exprs.length}")
        CosineSimilarity(exprs(0), exprs(1))
      }, "built-in")
}
