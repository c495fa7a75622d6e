package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: distinct word n-gram shingles of a text column.
  *
  * Semantics are IDENTICAL to the composed-builtins spelling kept as
  * [[graft.operators.TextOps.shinglesHof]] (split on single space with
  * trailing empties retained, windows joined with one space, first-
  * occurrence-ordered distinct, empty array below n tokens) — asserted
  * column-for-column in MinHashSpec. Why native: that HOF pipeline
  * (transform + sequence + slice + concat_ws + array_distinct) is
  * interpreted per row and was the single hottest projection left in the
  * bench (~5 s of the minhash query at sf0.1); this expression builds
  * the shingle set in one pass over the token array inside whole-stage
  * codegen.
  */
object WordShingles {

  /** One-pass shingle construction; shared by eval and generated code. */
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    // split(" ", -1): single-space separator, trailing empties kept —
    // exactly Spark's split(text, " ") semantics
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  def wordShingles(text: Column, n: Int): Column = {
    require(n >= 1, s"n=$n must be positive")
    CatalystBridge.column(WordShinglesExpr(CatalystBridge.expression(text), n))
  }
}

case class WordShinglesExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects string, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
}
