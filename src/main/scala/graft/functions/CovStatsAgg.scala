package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._

/** Native SECOND-MOMENT aggregate over a fixed-dimension vector column:
  * one pass over (embedding: ARRAY<FLOAT/DOUBLE>) rows accumulates
  * `[n, Σx_1..Σx_d, Σx_i·x_j (upper triangle, i <= j)]` — the complete
  * sufficient statistics for a mean vector and covariance matrix, in a
  * buffer of exactly `1 + d + d(d+1)/2` doubles (d = 64 → 2145, control
  * plane). This is the PCA fit's corpus pass
  * ([[graft.operators.Pca]]): everything downstream (centering, the
  * eigendecomposition) happens on the d×d driver-side matrix.
  *
  * Why a custom aggregate (SURVEY.md §7.3 route (b), the MisraGries
  * justification): no builtin composition reaches these statistics
  * without either d² aggregate expressions in one projection (the
  * codegen-blowup class — 512 flat HOF aggregates measured 8 s/query)
  * or a d²-fold explode → groupBy (a 4096× scan amplification at
  * d = 64 before map-side combine can help). The buffer MERGES by
  * plain elementwise addition, so map-side partial aggregation is
  * intact and the reduce sees one O(d²) buffer per partition — the
  * same shape that lets the statistics live in a STORED artifact and
  * merge across ingests ([[graft.sources.PcaModels]]).
  *
  * Rows whose vector is null, or whose length differs from `dim`, fail
  * LOUDLY (a silently skipped row would bias the moments — the
  * assert_true plant-guard philosophy at the aggregate layer).
  */
object CovStatsAgg {
  /** Column-API entry: `cov_stats(vec, dim)` → ARRAY<DOUBLE> of length
    * 1 + dim + dim(dim+1)/2: [n, sums.., upper-triangle products..].
    */
  def covStats(vec: Column, dim: Int): Column =
    CatalystBridge.column(
      CovStatsAgg(CatalystBridge.expression(vec), dim).toAggregateExpression())

  /** Buffer length for dimension d. */
  def statsLen(dim: Int): Int = 1 + dim + dim * (dim + 1) / 2
}

case class CovStatsAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]]
    with UnaryLike[Expression] {

  require(dim >= 1, s"cov_stats needs dim >= 1, got $dim")

  override def prettyName: String = "cov_stats"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  private def elemOk(t: DataType): Boolean =
    t == FloatType || t == DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if elemOk(et) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cov_stats expects ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }

  private val len = CovStatsAgg.statsLen(dim)
  // lazy: the expression tree is copied while `child` is still
  // unresolved (withNewChildInternal during analysis), when dataType
  // would throw — first use is at execution, post-resolution
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Double] = new Array[Double](len)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    require(v != null, "cov_stats: null vector row — filter or impute upstream")
    val arr = v.asInstanceOf[ArrayData]
    require(arr.numElements() == dim,
      s"cov_stats: vector of length ${arr.numElements()} != declared dim $dim")
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      x(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    buf(0) += 1.0
    i = 0
    var p = 1 + dim
    while (i < dim) {
      buf(1 + i) += x(i)
      var j = i
      while (j < dim) {
        buf(p) += x(i) * x(j)
        p += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < len) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any =
    new GenericArrayData(buf.map(d => d: Any))

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(len * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < len) { out.writeDouble(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Double](len)
    var i = 0
    while (i < len) { buf(i) = in.readDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CovStatsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CovStatsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CovStatsAgg =
    copy(child = newChild)
}
