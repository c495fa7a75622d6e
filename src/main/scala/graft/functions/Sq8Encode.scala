package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._

/** Native SQ8 scalar-quantization kernels — the per-vector max-abs fold
  * and the int8 code emission of
  * [[graft.operators.Similarity.quantizeSq8On]], each one whole-stage-
  * codegen loop over the float vector.
  *
  * Why custom (the [[PqEncode]] rationale, guide §4): the composed
  * spelling ran one `aggregate` HOF (max-abs fold) plus one `transform`
  * HOF (round/cast per component) per corpus row — higher-order
  * functions are CodegenFallback, so the whole in-flight corpus encode
  * of the SQ8/IVF-SQ probes was interpreted closures with boxed
  * per-element allocation.
  *
  * BIT-IDENTICAL arithmetic to the composed spelling (SimilaritySpec
  * pins maxabs + codes equality, which also keeps the stored fixture
  * code tables valid):
  *
  *  - maxabs: sequential fold `acc = greatest(acc, abs(double(x)))`
  *    seeded 0.0 — null elements skipped (greatest ignores nulls), NaN
  *    sticks (SQL double ordering ranks NaN above everything; plain
  *    `Double.compare` has exactly those semantics, and -0.0 cannot
  *    reach the fold through abs).
  *  - codes: `maxabs == 0.0` (Java primitive ==, the EqualTo codegen
  *    for doubles) → EVERY component 0 — including null ones, because
  *    the composed zero branch is `transform(_ => 0)`; otherwise per
  *    component `(byte)(int) round(x / maxabs * 127.0)` with Spark's
  *    double rounding (NaN/Inf pass through, else
  *    java.math.BigDecimal.valueOf(d).setScale(0, HALF_UP)), null
  *    components staying null, and a NaN rounded value THROWING like
  *    the composed `cast("int")` does under ANSI ([[Sq8.ansiToInt]] —
  *    reachable only from NaN/Inf components, which the fixtures never
  *    hold; NativeHofParitySpec pins the both-throw behavior).
  *
  * Null vector → null (both kernels).
  */
object Sq8 {
  /** Spark's Round-on-double arithmetic, verbatim (RoundBase): NaN and
    * infinities pass through, everything else rounds HALF_UP at scale 0
    * through BigDecimal.valueOf. Public so generated code can call it.
    */
  def roundHalfUp(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  /** The composed spelling's `cast("int")` under ANSI (Spark 4 default):
    * a NaN/±Inf or out-of-int-range rounded value THROWS (CAST_OVERFLOW,
    * DoubleExactNumeric.toInt) — it never silently truncates. The only
    * reachable case here is a NaN component (|x/maxabs·127| <= 127 for
    * finite inputs), but the guard mirrors the full cast contract so the
    * native path can never be more permissive than the spelling it
    * replaced. Public so generated code can call it.
    */
  def ansiToInt(d: Double): Int = {
    if (java.lang.Double.isNaN(d) || d > Int.MaxValue || d < Int.MinValue)
      throw new ArithmeticException(
        s"[CAST_OVERFLOW] The value $d of the type \"DOUBLE\" cannot be " +
          "cast to \"INT\" due to an overflow.")
    d.toInt
  }

  /** Column-API entry points. */
  def sq8MaxAbs(emb: Column): Column =
    CatalystBridge.column(Sq8MaxAbs(CatalystBridge.expression(emb)))
  def sq8Codes(emb: Column): Column =
    CatalystBridge.column(Sq8Codes(CatalystBridge.expression(emb)))

  /** The max-abs fold over one vector — the shared kernel of both
    * expressions, a STATIC method so generated code calls it in one
    * line instead of inlining the loop: an inlined spelling bloated the
    * scoring stage's whole-stage-codegen method past the JIT's
    * huge-method limit and deoptimized the WHOLE stage (measured
    * q_embed_ann_sq 0.51 → 0.70 s with inlined loops; back under the
    * composed baseline with the call spelling).
    */
  def maxAbs(arr: ArrayData, isFloat: Boolean): Double = {
    val n = arr.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = math.abs(if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
        if (java.lang.Double.compare(v, acc) > 0) acc = v
      }
      i += 1
    }
    acc
  }

  /** The full per-vector encode (max-abs fold + int8 code pass) —
    * static for the same one-line-of-generated-code reason as
    * [[maxAbs]]. Returns an UNSAFE primitive array on the no-null path
    * (the overwhelmingly common one): the downstream coarse scorer
    * probes the codes once per (query × candidate), and a boxed
    * GenericArrayData there measured q_embed_ann_sq 0.51 → 0.70 s —
    * the composed spelling, being CodegenFallback, was EXCLUDED from
    * whole-stage codegen and therefore materialized through an unsafe
    * projection for free; the native expression fuses into the scoring
    * stage, so it must hand over primitive storage itself.
    */
  def encode(arr: ArrayData, isFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    val acc = maxAbs(arr, isFloat)
    val out = new Array[Byte](n)
    var hasNull = false
    if (acc != 0.0) {
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) hasNull = true
        else {
          val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          out(i) = ansiToInt(roundHalfUp(x / acc * 127.0)).toByte
        }
        i += 1
      }
    }
    if (!hasNull)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    val boxed = new Array[Any](n)
    var i = 0
    while (i < n) {
      boxed(i) = if (arr.isNullAt(i)) null else out(i)
      i += 1
    }
    new GenericArrayData(boxed)
  }

  private[functions] def checkArrayOfFloat(dt: DataType, name: String): TypeCheckResult =
    dt match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$name expects array<float|double>, got ${t.sql}")
    }
}

/** The max-abs fold — see [[Sq8]].
  *
  * Deliberately CodegenFallback, NOT full codegen (measured, this
  * round): a stage-fusible encode gets DEFERRED by whole-stage codegen
  * into the consuming join's output loop and re-evaluates once per
  * JOINED row — the coarse scorer joins 10 queries against every
  * candidate, so the full-codegen spelling re-encoded every vector 10×
  * (q_embed_ann_sq 0.51 → 0.70 s). CodegenFallback keeps the encode
  * Project OUTSIDE whole-stage codegen, exactly like the composed HOF
  * spelling it replaced: one evaluation per row, materialized through
  * the projection boundary.
  */
case class Sq8MaxAbs(child: Expression) extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    Sq8.checkArrayOfFloat(child.dataType, "sq8_maxabs")

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    Sq8.maxAbs(input.asInstanceOf[ArrayData], elemIsFloat)

  override protected def withNewChildInternal(newChild: Expression): Sq8MaxAbs =
    copy(child = newChild)
}

/** The int8 code emission — see [[Sq8]]. Recomputes the max-abs fold
  * internally (two passes over a ~64-float vector are free next to one
  * interpreted HOF) so the two kernels stay independent expressions and
  * no struct projection can double-evaluate the heavy one.
  * CodegenFallback on purpose — the [[Sq8MaxAbs]] once-per-row note.
  */
case class Sq8Codes(child: Expression) extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(ByteType, containsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    Sq8.checkArrayOfFloat(child.dataType, "sq8_codes")

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    Sq8.encode(input.asInstanceOf[ArrayData], elemIsFloat)

  override protected def withNewChildInternal(newChild: Expression): Sq8Codes =
    copy(child = newChild)
}
