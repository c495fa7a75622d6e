package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._

/** Native expression: L1-normalized histogram of a binary column's byte
  * values in `bins` equal-width buckets, as array<float> features.
  *
  * This is the deterministic STUB standing in for media decode +
  * feature extraction in [[graft.operators.Multimodal]] (the container
  * ships no codecs): it reads the payload bytes exactly like a decoder
  * would, emits a fixed-width float feature vector like an embedding
  * model would, and is cheap enough to run at any scale. The
  * Spark-side contract (binary in, array<float> out, per-row, codegen)
  * is the production shape; only the math inside is fake.
  */
object ByteHistogram {

  /** Histogram helper shared by interpreted eval and generated code. */
  def compute(payload: Array[Byte], bins: Int): Array[Float] = {
    val counts = new Array[Int](bins)
    val width = 256 / bins
    var i = 0
    while (i < payload.length) {
      counts((payload(i) & 0xFF) / width) += 1
      i += 1
    }
    val out = new Array[Float](bins)
    val n = math.max(payload.length, 1).toFloat
    var b = 0
    while (b < bins) {
      out(b) = counts(b) / n
      b += 1
    }
    out
  }

  def byteHistogram(payload: Column, bins: Int = 16): Column = {
    require(bins > 0 && 256 % bins == 0, s"bins=$bins must divide 256")
    CatalystBridge.column(ByteHistogramExpr(CatalystBridge.expression(payload), bins))
  }
}

case class ByteHistogramExpr(child: Expression, bins: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"byte_histogram expects binary, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ByteHistogram.compute(input.asInstanceOf[Array[Byte]], bins))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.ByteHistogram.compute($c, $bins));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ByteHistogramExpr =
    copy(child = newChild)
}
