package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Misra–Gries heavy-hitter CANDIDATE aggregate: at most `k`
  * counters per buffer, emitting the surviving keys as an array —
  * `agg(misra_gries(tok, k))` over a token stream returns a SUPERSET of
  * every token whose true frequency exceeds N/(k+1) (the classic MG
  * guarantee; Misra & Gries 1982). [[graft.operators.TextAnalysis
  * .heavyHittersOn]] re-counts exactly the candidates in a second pass,
  * so the operator's OUTPUT is exact (and DuckDB-oracle-checkable) while
  * the state stays O(k) regardless of vocabulary size — the property
  * that makes global top-frequency mining survive a 100 TB corpus whose
  * vocabulary does not fit in any single aggregation buffer.
  *
  * Why a custom aggregate (SURVEY.md §7.3 route (b), aggregate flavor):
  * no composition of builtins yields a bounded-state frequent-items
  * summary — `groupBy(tok)` materializes the full vocabulary (fine until
  * it isn't), and `approx_count_distinct`/HLL answer cardinality, not
  * identity. MG buffers merge associatively (Agarwal et al., "Mergeable
  * Summaries", PODS 2012: sum counters, then subtract the (k+1)-largest
  * count and drop non-positives), so map-side partial aggregation is
  * intact and the final reduce sees one O(k) buffer per partition.
  */
object MisraGriesAgg {

  /** Column-API entry: `misra_gries(tok, k)` — aggregate over rows of a
    * group; input is the string key stream, k the max counter count.
    */
  def misraGries(tok: Column, k: Int): Column =
    CatalystBridge.column(
      MisraGriesAgg(CatalystBridge.expression(tok), k).toAggregateExpression())
}

case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with UnaryLike[Expression] {

  require(k >= 1, s"misra_gries needs k >= 1, got $k")

  override def prettyName: String = "misra_gries"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"misra_gries expects a STRING key argument, got ${other.sql}")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // copy out of the reused UTF8String backing buffer before keying
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1L)
        case None if buf.size < k => buf.update(key, 1L)
        case None =>
          // decrement-all: one unmatched arrival cancels one unit of
          // every tracked key; zeros fall out, keeping size <= k
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1L)
          buf.foreach { case (t, c) => if (c <= 0L) dead += t }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest counter from all, drop <= 0:
      // restores |buf| <= k while preserving the MG error bound
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(a.size - k - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - cut)
      a.foreach { case (t, c) => if (c <= 0L) dead += t }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val keys = buf.keysIterator.toArray
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(keys.map(UTF8String.fromString(_): Any))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val bytes = t.getBytes(StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}
