package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._

/** Native pair expansion: all (i < j) ordered pairs of a long array as
  * `array<struct<part_a:bigint, part_b:bigint>>` — the market-basket
  * pair HOF of [[graft.operators.Graph.copurchaseEdgesOn]] /
  * `trendingPairsOn`, computed in one tight loop.
  *
  * Why custom (the [[WordShingles]] rationale, r20 optimization round,
  * guide §4): the composed spelling
  * `flatten(transform(sequence(1, n-1), i => transform(sequence(i+1, n),
  * j => struct(element_at(i), element_at(j)))))` is interpreted per row
  * (HOFs are CodegenFallback) and allocates a sequence plus one nested
  * transform closure per outer index — the per-basket cost every graph
  * query pays at the edge build. Output order and values are IDENTICAL
  * (outer index ascending, inner ascending); GraphSpec pins equality
  * against the HOF spelling.
  *
  * Null semantics: null array → null; baskets are collect_set outputs,
  * so element nulls cannot occur (collect_set drops nulls) — a null
  * element here throws rather than silently pairing 0s. Arrays below 2
  * elements yield an empty pair array (callers filter size >= 2; the
  * expression itself is total).
  */
case class PairStructs(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("part_a", LongType, nullable = true),
      StructField("part_b", LongType, nullable = true))),
    containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pair_structs expects array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      require(!arr.isNullAt(i), "pair_structs: null basket element")
      val a = arr.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](a, arr.getLong(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PairStructs =
    copy(child = newChild)
}

object PairStructs {
  /** Column-API entry point: ordered i<j pairs of a sorted basket. */
  def pairStructs(parts: Column): Column =
    CatalystBridge.column(PairStructs(CatalystBridge.expression(parts)))
}
