package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._

/** Native triangle-credit expansion: for one triangle-bearing forward
  * edge (u, v) with witness set `ws`, the per-node credit structs
  *
  *   [(u, |ws|), (v, |ws|)] ++ ws.map(w => (w, 1))
  *
  * as `array<struct<n:bigint, c:bigint>>` — the credits array of
  * [[graft.operators.Graph.triangleStatsOn]], built in one loop.
  *
  * Why custom (the [[PairStructs]] rationale, guide §4): the composed
  * `concat(array(struct(u, size), struct(v, size)), transform(ws, w =>
  * struct(w, 1L)))` pays an interpreted `transform` closure per witness
  * plus a concat copy per edge row — HOFs are CodegenFallback.
  * GraphSpec pins values AND order against the HOF spelling.
  *
  * Null semantics: any null input (u, v, or the array) → null row
  * (TernaryExpression nullSafeEval) — a shape the call site cannot
  * produce (u/v are join keys, ws intersects collect_set outputs), and
  * where the composed tree would emit null FIELDS instead; GraphSpec
  * pins parity on the real, non-null domain. A null WITNESS element
  * becomes a null `n` field exactly as `struct(w, 1L)` would surface
  * it.
  */
case class CreditStructs(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("n", LongType, nullable = true),
      StructField("c", LongType, nullable = true))),
    containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, LongType, ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"credit_structs expects (bigint, bigint, array<bigint>), got " +
          s"(${a.sql}, ${b.sql}, ${c.sql})")
    }

  override def nullSafeEval(u: Any, v: Any, wsAny: Any): Any = {
    val ws = wsAny.asInstanceOf[ArrayData]
    val n = ws.numElements()
    val sz = java.lang.Long.valueOf(n.toLong)
    val out = new Array[Any](n + 2)
    out(0) = new GenericInternalRow(Array[Any](u, sz))
    out(1) = new GenericInternalRow(Array[Any](v, sz))
    var i = 0
    while (i < n) {
      val w: Any = if (ws.isNullAt(i)) null else ws.getLong(i)
      out(i + 2) = new GenericInternalRow(Array[Any](w, 1L))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): CreditStructs =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CreditStructs {
  /** Column-API entry point: the credits array of one forward edge. */
  def creditStructs(u: Column, v: Column, ws: Column): Column =
    CatalystBridge.column(CreditStructs(CatalystBridge.expression(u),
      CatalystBridge.expression(v), CatalystBridge.expression(ws)))
}
