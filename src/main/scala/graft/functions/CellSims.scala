package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._

/** Native ALL-CENTROID cosine scorer: the similarities of one
  * float/double vector against every centroid of a fitted quantizer, as
  * `array<double>` — the `sims` array of
  * [[graft.operators.Similarity.assignCells]] /
  * [[graft.operators.Clustering.assignWithSim]] and the probe-side cell
  * ranking of the IVF family, computed in one tight JVM loop over a
  * flat centroid matrix (the [[PairStructs]] CodegenFallback pattern —
  * one eval call per row replaces N independent fused-cosine
  * evaluations).
  *
  * Why custom (r21, guide §4 + §7.3-planning): the composed spelling
  * `array(cosineSim(e, typedlit(c1)), ..., cosineSim(e, typedlit(cN)))`
  * evaluates N independent fused-cosine expressions per row — each
  * re-accumulating the SAME |e|² norm (N× redundant flops) and each
  * carrying a dim-sized literal through analysis/optimization of every
  * ANN plan (the r20-flagged ~0.5–1 s/rep driver planning tax on
  * literal-heavy ANN queries). One expression = one |e|² pass + N dot
  * passes, centroid norms precomputed at construction, one plan node.
  *
  * BIT-IDENTICAL arithmetic to the composed spelling (SimilaritySpec /
  * NativeHofParitySpec pin equality): each [[CosineSimilarity]]
  * evaluation accumulates dot, |e|², |c|² as THREE INDEPENDENT
  * sequential sums in element order — separating them into one shared
  * |e|² pass, per-centroid dot passes, and construction-time |c|² sums
  * performs the exact same additions in the exact same order per
  * accumulator, so every partial and final double is unchanged,
  * including the zero-norm → 0.0 guard.
  *
  * Null semantics, matching the composed array element-for-element: a
  * null VECTOR or any null COMPONENT makes every [[CosineSimilarity]]
  * yield null, so the result is an array of N nulls (NOT a null array —
  * `array(...)` of null columns is non-null); length mismatch throws
  * like the fused kernel's strictness.
  */
case class CellSims(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private val nlist = centroids.length
  private val dim = centroids.head.length

  /** Flat row-major centroid matrix, referenced from generated code. */
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](nlist * dim)
    var o = 0
    centroids.foreach(_.foreach { v => a(o) = v; o += 1 })
    a
  }

  /** Per-centroid |c|² — the same sequential Σc_i² each composed
    * cosine evaluation re-derived per row.
    */
  @transient private lazy val normsSq: Array[Double] =
    centroids.map { c =>
      var nb = 0.0
      c.foreach { v => nb += v * v }
      nb
    }.toArray

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  // the output ARRAY is never null (see scaladoc) — its elements may be
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cell_sims expects array<float|double>, got ${t.sql}")
  }

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def allNulls: GenericArrayData =
    new GenericArrayData(new Array[Any](nlist))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return allNulls
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n != dim) throw new IllegalArgumentException(
      s"cosine_sim: length mismatch $n vs $dim")
    val isF = elemIsFloat
    val e = new Array[Double](n)
    var na = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return allNulls
      val x = if (isF) arr.getFloat(i).toDouble else arr.getDouble(i)
      e(i) = x; na += x * x
      i += 1
    }
    // primitive (unsafe) output: consumers — argmax probes, mask
    // stages, posexplode — read the sims array repeatedly, and a boxed
    // GenericArrayData from a fused-into-the-stage expression loses
    // what the composed CodegenFallback spelling got for free from its
    // unsafe-projection boundary (the Sq8.encode lesson, this round)
    val out = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      var dot = 0.0
      val base = c * dim
      i = 0
      while (i < n) { dot += e(i) * flat(base + i); i += 1 }
      val nb = normsSq(c)
      out(c) = if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
      c += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CellSims =
    copy(child = newChild)
}

object CellSims {
  /** Column-API entry point: cosines of `emb` against every centroid. */
  def cellSims(emb: Column, centroids: Seq[Seq[Double]]): Column =
    CatalystBridge.column(CellSims(CatalystBridge.expression(emb), centroids))
}
