package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._

/** Native PCA projection: center a float/double vector on the model
  * mean and emit its dot products against the k component vectors —
  * `array<double>`(k), the per-row projection of
  * [[graft.operators.Pca.projectOn]] in one tight loop over flat
  * reference arrays.
  *
  * Why custom (the [[PqEncode]] rationale, guide §4): the composed
  * spelling — `zip_with(vec, meanLit, x - m)` staged as a column, then
  * `transform(compsLit, c => aggregate(zip_with(c, centered, a*b), 0.0,
  * +))` — is interpreted per corpus row (HOFs are CodegenFallback) and
  * allocates a zipped array per component per row; the PCA family's
  * in-flight projection was its dominant per-row cost.
  *
  * BIT-IDENTICAL arithmetic (NativeHofParitySpec pins it): centering is
  * element-order `(double) x_i − mean_i`; each component's dot is the
  * sequential fold `acc = acc + c_i · centered_i` in element order —
  * the same additions on the same accumulators in the same order as
  * the composed tree.
  *
  * Null semantics, matching the composed tree element-for-element: a
  * null VECTOR, any null COMPONENT, or a LENGTH MISMATCH (zip_with
  * null-pads the shorter side) turns every projection null — an array
  * of k nulls, never a null array (`transform` over the non-null
  * component literal always yields k elements).
  */
case class PcaProject(child: Expression, mean: Seq[Double],
                      components: Seq[Seq[Double]])
    extends UnaryExpression with CodegenFallback {

  private val k = components.length
  private val dim = mean.length

  @transient private lazy val meanArr: Array[Double] = mean.toArray
  /** Flat row-major component matrix. */
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](k * dim)
    var o = 0
    components.foreach(_.foreach { v => a(o) = v; o += 1 })
    a
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  // array of k nulls on bad input, never a null array (see scaladoc)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pca_project expects array<float|double>, got ${t.sql}")
  }

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def allNulls: GenericArrayData =
    new GenericArrayData(new Array[Any](k))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return allNulls
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n != dim) return allNulls
    val isF = elemIsFloat
    val centered = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return allNulls
      val x = if (isF) arr.getFloat(i).toDouble else arr.getDouble(i)
      centered(i) = x - meanArr(i)
      i += 1
    }
    // primitive (unsafe) output — the CellSims / Sq8.encode storage
    // lesson: the pc array is re-read by the surface scaling and the
    // PCA probes' per-candidate scoring
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      var acc = 0.0
      val base = c * dim
      i = 0
      while (i < dim) { acc = acc + flat(base + i) * centered(i); i += 1 }
      out(c) = acc
      c += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PcaProject =
    copy(child = newChild)
}

object PcaProject {
  /** Column-API entry point: k centered dot products of `vec`. */
  def pcaProject(vec: Column, mean: Seq[Double],
                 components: Seq[Seq[Double]]): Column =
    CatalystBridge.column(PcaProject(
      CatalystBridge.expression(vec), mean, components))
}
