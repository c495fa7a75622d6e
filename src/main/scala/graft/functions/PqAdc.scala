package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._

/** Native PQ ADC score: Σ_j luts[j][codes[j]] over a per-query lookup
  * table (`array<array<double>>`) and a code row (`array<tinyint>`) —
  * the asymmetric-distance inner loop of every PQ probe.
  *
  * Why custom (the [[PqEncode]] rationale, r20 optimization, guide §4):
  * the composed spelling `aggregate(zip_with(luts, codes, (l, c) =>
  * element_at(l, c + 1)), 0.0, +)` is an interpreted HOF allocating a
  * zipped array per CANDIDATE row — the m-lookup sum is the per-row
  * work of the coarse pass over (corpus × queries) candidates. Same
  * sequential summation order, so scores are bit-identical (pinned in
  * SimilaritySpec's stored-vs-inline and recall invariants).
  *
  * Null semantics match the builtin chain: null array on either side →
  * null; any null element → null. A code outside its table throws
  * (element_at strictness on out-of-range would return null under ANSI
  * off — but codes are produced by [[PqEncode]]/the stored index, so an
  * out-of-range code is corruption and must fail loudly).
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(ByteType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects (array<array<double>>, array<tinyint>), got ${l.sql}, ${r.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val luts = l.asInstanceOf[ArrayData]
    val codes = r.asInstanceOf[ArrayData]
    val m = luts.numElements()
    require(codes.numElements() == m,
      s"pq_adc: luts size $m != codes size ${codes.numElements()}")
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (luts.isNullAt(j) || codes.isNullAt(j)) return null
      val lut = luts.getArray(j)
      val c = codes.getByte(j).toInt
      if (lut.isNullAt(c)) return null
      acc += lut.getDouble(c)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val lut = ctx.freshName("lut")
      val c = ctx.freshName("c")
      s"""
         |final int $m = $l.numElements();
         |if ($r.numElements() != $m) {
         |  throw new IllegalArgumentException(
         |    "pq_adc: luts size " + $m + " != codes size " + $r.numElements());
         |}
         |double $acc = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  if ($l.isNullAt($j) || $r.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  final org.apache.spark.sql.catalyst.util.ArrayData $lut = $l.getArray($j);
         |  final int $c = (int) $r.getByte($j);
         |  if ($lut.isNullAt($c)) { ${ev.isNull} = true; break; }
         |  $acc += $lut.getDouble($c);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  /** Column-API entry point: ADC score of `codes` under `luts`. */
  def pqAdc(luts: Column, codes: Column): Column =
    CatalystBridge.column(PqAdc(
      CatalystBridge.expression(luts), CatalystBridge.expression(codes)))
}
