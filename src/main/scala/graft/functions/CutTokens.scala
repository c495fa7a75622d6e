package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._

/** Native verbatim-cut application: keep the tokens whose 0-based index
  * falls in NO [s, e) cut interval — the removal filter of
  * [[graft.operators.Dedup.applyVerbatimCuts]] in one loop.
  *
  * Why custom (guide §4): the composed spelling
  * `filter(toks, (_, i) => !exists(cuts, c => i >= c.s && i < c.e))`
  * nests two interpreted HOFs — O(tokens × cuts) closure evaluations
  * per doc — on the verbatim-clean path every curate variant and the
  * per-round clean loop pay.
  *
  * EXACT-PARITY semantics (NativeHofParitySpec pins it): kept order is
  * input order; the per-token predicate is the same interval probe
  * (cut membership is order-independent across the cuts array, so the
  * early-exit loop equals `exists`); a null TOKEN is kept or cut by
  * its index exactly like any other element (the composed lambda never
  * reads the token). A null CUT struct throws rather than guess — the
  * call site cannot produce one (cuts are min/max aggregates of
  * non-null spans), and the composed tree's behavior there (a null
  * `exists` silently drops the token) is a trap, not a contract.
  *
  * Null array (either side) → null.
  */
case class CutTokens(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _),
            ArrayType(StructType(Array(
              StructField(_, IntegerType | LongType, _, _),
              StructField(_, IntegerType | LongType, _, _))), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cut_tokens expects (array<string>, array<struct<s:int|bigint," +
          s"e:int|bigint>>), got (${l.sql}, ${r.sql})")
    }

  @transient private lazy val boundTypes: Array[DataType] =
    right.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[StructType].fields.map(_.dataType)

  override def nullSafeEval(toksAny: Any, cutsAny: Any): Any = {
    val toks = toksAny.asInstanceOf[ArrayData]
    val cuts = cutsAny.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val m = cuts.numElements()
    val ss = new Array[Long](m)
    val es = new Array[Long](m)
    var j = 0
    while (j < m) {
      require(!cuts.isNullAt(j), "cut_tokens: null cut struct")
      val c = cuts.getStruct(j, 2)
      ss(j) = if (boundTypes(0) == IntegerType) c.getInt(0).toLong else c.getLong(0)
      es(j) = if (boundTypes(1) == IntegerType) c.getInt(1).toLong else c.getLong(1)
      j += 1
    }
    val out = new Array[Any](n)
    var k = 0
    var i = 0
    while (i < n) {
      var cut = false
      j = 0
      while (!cut && j < m) {
        if (i >= ss(j) && i < es(j)) cut = true
        j += 1
      }
      if (!cut) {
        out(k) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
        k += 1
      }
      i += 1
    }
    new GenericArrayData(
      if (k == n) out
      else java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], k)
        .asInstanceOf[Array[Any]])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CutTokens =
    copy(left = newLeft, right = newRight)
}

object CutTokens {
  /** Column-API entry point: tokens outside every [s, e) cut. */
  def cutTokens(toks: Column, cuts: Column): Column =
    CatalystBridge.column(CutTokens(
      CatalystBridge.expression(toks), CatalystBridge.expression(cuts)))
}
