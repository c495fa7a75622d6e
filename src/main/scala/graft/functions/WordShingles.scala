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

  /** One-pass shingle construction; shared by eval and generated code.
    * `distinct = false` keeps every window occurrence in position order —
    * the occurrence-preserving n-gram stream the repetition metrics count
    * (a duplicate-share is meaningless over a set).
    */
  def compute(text: UTF8String, n: Int, distinct: Boolean): GenericArrayData = {
    // split(" ", -1): single-space separator, trailing empties kept —
    // exactly Spark's split(text, " ") semantics
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet dedups in first-occurrence order; when duplicates are
    // wanted, a plain array of all (len - n + 1) windows
    val seen = if (distinct) new java.util.LinkedHashSet[String]() else null
    val all = if (distinct) null else new Array[Any](toks.length - n + 1)
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
      if (distinct) seen.add(sb.toString)
      else all(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    if (!distinct) return new GenericArrayData(all)
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

  /** ALL word n-grams of `text` in position order, duplicates kept —
    * the occurrence stream for repetition metrics (top-n-gram character
    * share). Same tokenization and window join as [[wordShingles]].
    */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n=$n must be positive")
    CatalystBridge.column(
      WordShinglesExpr(CatalystBridge.expression(text), n, distinct = false))
  }
}

case class WordShinglesExpr(child: Expression, n: Int,
                            distinct: Boolean = true) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects string, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
}
