package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, SQLOrderingUtil}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._

/** Native masked re-argmax step for multi-probe cell assignment: copy a
  * double array with the FIRST maximal element replaced by -2.0 — the
  * exclusion stage of [[graft.operators.Similarity.assignCells]]
  * (`nassign - 1` times per vector).
  *
  * Why custom (guide §4): the composed spelling
  * `zip_with(sims, sequence(1, n), (x, i) => when(i ===
  * array_position(sims, array_max(sims)), -2.0).otherwise(x))` is a
  * CodegenFallback HOF whose lambda re-evaluates `array_position` +
  * `array_max` PER ELEMENT — O(n²) interpreted comparisons per vector
  * per stage. This loop finds the argmax once and copies.
  *
  * EXACT-PARITY semantics (SimilaritySpec pins equality against the
  * HOF spelling): max and the first-match position both use SQL double
  * ordering (`SQLOrderingUtil.compareDoubles` — NaN ranks above
  * everything and equals itself, -0.0 equals 0.0), exactly
  * `array_max` / `array_position`'s ordering; null elements are
  * skipped by both (never the max, never matched) and copy through
  * unchanged; an all-null or empty array has a null argmax position,
  * so NOTHING is masked (`i === null` is never true) and the array
  * copies verbatim. Null array → null.
  */
case class MaskArgmax(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"mask_argmax expects array<double>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Double](n)
    var hasNull = false
    var best = 0.0
    var bestAt = -1
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) hasNull = true
      else {
        val v = arr.getDouble(i)
        out(i) = v
        if (bestAt < 0 || SQLOrderingUtil.compareDoubles(v, best) > 0) {
          best = v; bestAt = i
        }
      }
      i += 1
    }
    // first index EQUIV to the max (array_position semantics) — the
    // running argmax above keeps the first strict improvement, which is
    // already the first equiv occurrence under a total order
    if (bestAt >= 0) out(bestAt) = -2.0
    // primitive (unsafe) output on the no-null path — the CellSims /
    // Sq8.encode storage lesson (the next mask stage and the argmax
    // probes re-read this array)
    if (!hasNull)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    val boxed = new Array[Any](n)
    i = 0
    while (i < n) {
      boxed(i) = if (arr.isNullAt(i)) null else out(i)
      i += 1
    }
    new GenericArrayData(boxed)
  }

  override protected def withNewChildInternal(newChild: Expression): MaskArgmax =
    copy(child = newChild)
}

object MaskArgmax {
  /** Column-API entry point: sims with the first argmax masked to -2. */
  def maskArgmax(sims: Column): Column =
    CatalystBridge.column(MaskArgmax(CatalystBridge.expression(sims)))
}
