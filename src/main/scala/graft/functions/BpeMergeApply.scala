package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native greedy BPE merge: every leftmost-first adjacent (l, r) in a
  * symbol array becomes the fused symbol l+r — one O(n) pass replacing
  * [[graft.operators.Bpe.applyMerge]]'s `aggregate` fold, whose
  * interpreted closure paid a `slice` + two `concat` ARRAY COPIES per
  * element (O(n²) allocation per row), once per merge step of the
  * learn loop.
  *
  * EXACT-PARITY contract with the composed fold (BpeSpec pins it):
  * walking left to right with accumulator `acc`,
  *
  *   lastSym = acc.last if acc nonempty else ""   (the fold's seed case)
  *   if lastSym == l && x == r  → acc = acc.init :+ (l + r)
  *   else                       → acc = acc :+ x
  *
  * — so an "aa" + merge(a,a) run becomes [aa, a] (the merged symbol
  * becomes the new lastSym and does NOT re-merge), and a null element
  * never merges (SQL `===` on null is null → the fold's otherwise
  * branch appends it); a null after a merged symbol resets nothing —
  * it is appended and the next comparison reads it as lastSym, which
  * equals `l` never (null == l is false here exactly because the
  * composed `when` treats null as not-matched). Null array → null.
  */
case class BpeMergeApply(child: Expression, l: String, r: String)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val lU = UTF8String.fromString(l)
  @transient private lazy val rU = UTF8String.fromString(r)
  @transient private lazy val lrU = UTF8String.fromString(l + r)

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_merge expects array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var k = 0 // filled prefix of out == the fold's acc
    var i = 0
    while (i < n) {
      val x: UTF8String = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      // the fold's seed spelling: an empty acc reads lastSym as ""
      val last: UTF8String =
        if (k > 0) out(k - 1).asInstanceOf[UTF8String] else UTF8String.EMPTY_UTF8
      if (last != null && last.equals(lU) && x != null && x.equals(rU)) {
        out(k - 1) = lrU
      } else {
        out(k) = x
        k += 1
      }
      i += 1
    }
    new GenericArrayData(
      if (k == n) out
      else java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], k)
        .asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergeApply =
    copy(child = newChild)
}

object BpeMergeApply {
  /** Column-API entry point: one leftmost-first greedy merge pass. */
  def bpeMerge(syms: Column, l: String, r: String): Column =
    CatalystBridge.column(BpeMergeApply(CatalystBridge.expression(syms), l, r))
}
