package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._

/** Native logistic-regression margin: Σ over a sparse feature array of
  * `w(i) · v` against a reference-object weight vector — the per-doc
  * fold of [[graft.operators.Classifier.fitLogRegOn]] /
  * `scoreLogRegOn`, evaluated once per doc per GD iteration.
  *
  * Why custom (guide §4): the composed spelling `aggregate(feats, 0.0,
  * (acc, e) => acc + element_at(typedlit(w), e.i + 1) * e.v)` is an
  * interpreted HOF paying a literal-array probe per feature per doc —
  * ×iters at fit time.
  *
  * EXACT-PARITY semantics (NativeHofParitySpec pins it): double
  * addition in element order (acc + w·v, multiply before add, exactly
  * the composed tree); an out-of-range slot THROWS like the composed
  * `element_at` under ANSI (Spark 4 default) — the call sites' slots
  * are `pmod(xxhash64, dim)` + the bias, in range by construction; a
  * null feature struct or null field makes the margin null and it
  * STAYS null (null + x is null). Null array → null.
  */
case class LogRegMargin(child: Expression, w: Seq[Double])
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val wArr: Array[Double] = w.toArray

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
          StructField(_, IntegerType, _, _), StructField(_, DoubleType, _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"logreg_margin expects array<struct<i:int,v:double>>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val e = arr.getStruct(i, 2)
      if (e.isNullAt(0) || e.isNullAt(1)) return null
      val slot = e.getInt(0)
      if (slot < 0 || slot >= wArr.length)
        throw new ArrayIndexOutOfBoundsException(
          s"logreg_margin: slot ${slot} outside the ${wArr.length}-slot " +
            "weight vector (ANSI element_at parity)")
      acc = acc + wArr(slot) * e.getDouble(1)
      i += 1
    }
    acc
  }

  override protected def withNewChildInternal(newChild: Expression): LogRegMargin =
    copy(child = newChild)
}

object LogRegMargin {
  /** Column-API entry point: the sparse margin fold against `w`. */
  def logRegMargin(feats: Column, w: Seq[Double]): Column =
    CatalystBridge.column(LogRegMargin(CatalystBridge.expression(feats), w))
}
