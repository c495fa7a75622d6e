package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native token-weight fold: Σ over a token array of `w(tok)` with
  * out-of-vocabulary tokens at 0 — the classifier-gate score of
  * [[graft.operators.Pipeline.curateOn]]'s clf stage, one hash probe
  * per token against a reference-object weight map.
  *
  * Why custom (the [[ProfileHits]] rationale, guide §4): the composed
  * spelling `aggregate(ws, 0L, (acc, t) => acc +
  * coalesce(element_at(wlit, t), 0L))` is an interpreted HOF whose
  * closure pays a Catalyst map-literal lookup (linear scan of the
  * ArrayBasedMapData keys!) per token per doc — the curate family's
  * per-token cost wherever the clf gate runs.
  *
  * EXACT-PARITY semantics (NativeHofParitySpec pins it): per-token
  * lookup is string equality against the map's keys (a java HashMap of
  * the same UTF8String keys — element_at on a map literal compares
  * with ordering equality, which for strings is binary equality);
  * missing and null tokens contribute 0 (element_at(map, null) is null
  * → coalesce 0); long addition in element order (overflow wraps
  * identically). Null array → null (aggregate propagates null).
  */
case class TokenWeightSum(child: Expression, weights: Map[String, Long])
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val table: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](weights.size * 2)
    weights.foreach { case (k, v) => m.put(UTF8String.fromString(k), v) }
    m
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_weight_sum expects array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = table.get(arr.getUTF8String(i))
        if (w != null) acc += w.longValue()
      }
      i += 1
    }
    acc
  }

  override protected def withNewChildInternal(newChild: Expression): TokenWeightSum =
    copy(child = newChild)
}

object TokenWeightSum {
  /** Column-API entry point: Σ w(tok) over the token array. */
  def tokenWeightSum(toks: Column, weights: Map[String, Long]): Column =
    CatalystBridge.column(
      TokenWeightSum(CatalystBridge.expression(toks), weights))
}
