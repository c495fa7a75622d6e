package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._

/** Native SimHash AGGREGATE: folds per-occurrence 64-bit token hashes
  * straight into the 64 signed bit-counters and emits the signature
  * long — `groupBy(doc_id).agg(simhash_agg(xxhash64(tok)))` over the
  * exploded token stream.
  *
  * Why a custom aggregate (SURVEY.md §7.3 route (b), aggregate flavor):
  * the composed-builtins spelling needs TWO shuffled aggregations — a
  * (doc_id, token) count (because the ±weight is the token's count)
  * followed by 64 separate `sum(when(bit,cnt).otherwise(-cnt))` columns,
  * a 64-expression-wide HashAggregate. Per-OCCURRENCE ±1 updates sum to
  * exactly the same counters (each occurrence contributes ±1 on the same
  * bits), so one ObjectHashAggregate with a 64-long buffer replaces
  * both — one shuffle, fixed 512-byte mergeable state, map-side partial
  * aggregation intact. The buffer is fixed-size regardless of document
  * length, so the aggregate holds at any corpus scale.
  *
  * The composed spelling is kept as [[graft.operators.Dedup.simHashSignaturesRef]]
  * and equivalence-asserted in DedupSpec — same honesty contract as the
  * other native twins (MinHash, WordShingles).
  */
object SimHashAgg {

  /** Column-API entry: `simhash_agg(hash64)` — aggregate over rows of a
    * group; input is the 64-bit token hash (e.g. `xxhash64(tok)`).
    */
  def simhashAgg(hash: Column): Column =
    CatalystBridge.column(
      SimHashAgg(CatalystBridge.expression(hash)).toAggregateExpression())
}

case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def prettyName: String = "simhash_agg"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_agg expects a BIGINT hash argument, got ${other.sql}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < 64) {
        buf(b) += ((h >>> b) & 1L) * 2L - 1L
        b += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var sig = 0L
    var b = 0
    while (b < 64) { if (buf(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * java.lang.Long.BYTES)
    var i = 0
    while (i < 64) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](64)
    var i = 0
    while (i < 64) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
    copy(child = newChild)
}
