package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._

/** Native Bloom filter pair: `bloom_agg(hash64, m_bits, k)` folds a
  * 64-bit key-hash stream into an m-bit filter (BinaryType), and
  * `bloom_contains(filter, hash64)` probes it — the membership-sketch
  * member of the sketch family (HLL = cardinality, Misra–Gries =
  * identity of the frequent, GK = quantiles, Bloom = membership).
  *
  * Bit positions use Kirsch–Mitzenmacher double hashing over the one
  * 64-bit input (h_i = h1 + i·h2 with h1/h2 the input's halves,
  * finalized through splitmix64 so weak inputs still spread): the
  * standard construction — k positions from one hash, no re-hashing
  * per probe. NO FALSE NEGATIVES by construction; false positives at
  * the textbook (1 − e^(−kn/m))^k rate, both spec-asserted.
  *
  * Why custom (SURVEY.md §7.3 route (b)): Spark's own runtime-filter
  * bloom machinery is internal (not callable from the public Column
  * API), and no builtin composition yields a fixed-size mergeable
  * membership state — `collect_set` materializes the keys. The buffer
  * is m/8 bytes regardless of stream length, merge is wordwise OR, so
  * map-side partial aggregation is intact and the filter broadcasts as
  * one row. [[graft.operators.Relational.bloomSemiJoinOn]] composes
  * build + probe into shuffle-reducing semi-join pruning whose OUTPUT
  * is exact (the verify join runs after the prune).
  */
object BloomFilter {

  def bloomAgg(hash: Column, mBits: Int, k: Int): Column =
    CatalystBridge.column(
      BloomAgg(CatalystBridge.expression(hash), mBits, k).toAggregateExpression())

  def bloomContains(bloom: Column, hash: Column,
                    k: Int = BloomContains.K): Column =
    CatalystBridge.column(BloomContains(
      CatalystBridge.expression(bloom), CatalystBridge.expression(hash), k))

  /** splitmix64 finalizer — same mix the MinHash banding uses. */
  @inline private[functions] def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** The k bit positions of one key-hash in an m-bit filter. Static so
    * generated code can call it (codegen forwarder pattern).
    */
  def setBits(words: Array[Long], h: Long, mBits: Int, k: Int): Unit = {
    val h1 = mix64(h)
    val h2 = mix64(h ^ 0x9E3779B97F4A7C15L) | 1L // odd stride
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, mBits).toInt
      words(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  /** Probe over the packed byte image (little-endian words). Static
    * forwarder shared by interpreted eval and generated code.
    */
  def containsBytes(bytes: Array[Byte], h: Long, k: Int): Boolean = {
    val mBits = bytes.length * 8
    val h1 = mix64(h)
    val h2 = mix64(h ^ 0x9E3779B97F4A7C15L) | 1L
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, mBits).toInt
      if ((bytes(pos >>> 3) & (1 << (pos & 7))) == 0) return false
      i += 1
    }
    true
  }

  private[functions] def wordsToBytes(words: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](words.length * 8)
    var i = 0
    while (i < bytes.length) {
      bytes(i) = ((words(i >>> 3) >>> ((i & 7) * 8)) & 0xFF).toByte
      i += 1
    }
    bytes
  }
}

case class BloomAgg(
    child: Expression,
    mBits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(mBits >= 64 && mBits % 64 == 0,
    s"bloom_agg needs m_bits >= 64 and divisible by 64, got $mBits")
  require(k >= 1 && k <= 16, s"bloom_agg needs 1 <= k <= 16, got $k")

  override def prettyName: String = "bloom_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg expects a BIGINT hash argument, got ${other.sql}")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](mBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomFilter.setBits(buf, v.asInstanceOf[Long], mBits, k)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = BloomFilter.wordsToBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomFilter.wordsToBytes(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val words = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < bytes.length) {
      words(i >>> 3) |= (bytes(i) & 0xFFL) << ((i & 7) * 8)
      i += 1
    }
    words
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** `bloom_contains(filter_binary, hash64)` — full-codegen probe. The
  * probe's `k` MUST equal the build's k (the filter image does not
  * self-describe); operators pin [[BloomContains.K]] end to end.
  */
case class BloomContains(left: Expression, right: Expression,
                         k: Int = BloomContains.K)
    extends BinaryExpression with BinaryLike[Expression] {

  require(k >= 1 && k <= 16, s"bloom_contains needs 1 <= k <= 16, got $k")

  override def prettyName: String = "bloom_contains"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains expects (BINARY, BIGINT), got (${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(bloom: Any, hash: Any): Any =
    BloomFilter.containsBytes(
      bloom.asInstanceOf[Array[Byte]], hash.asInstanceOf[Long], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) =>
      s"${ev.value} = graft.functions.BloomFilter.containsBytes($b, $h, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

object BloomContains {
  /** Default k both build and probe share unless callers pin another. */
  val K = 5
}
