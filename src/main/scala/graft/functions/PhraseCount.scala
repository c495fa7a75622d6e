package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native phrase-occurrence counter: the number of positions of a token
  * array where the full `phrase` token sequence matches — the fold of
  * [[graft.operators.TextAnalysis.searchPhraseOn]] in one loop.
  *
  * Why custom (guide §4): the composed spelling —
  * `aggregate(sequence(1, n − |p| + 1), 0L, (acc, i) => acc +
  * when(AND_j element_at(toks, i + j) = p_j, 1).otherwise(0))` — is an
  * interpreted HOF evaluating |phrase| element_at probes per position
  * per doc, the whole cost of the phrase-search scan.
  *
  * EXACT-PARITY semantics (NativeHofParitySpec pins it): positions
  * below a |p|-token window count 0 (the caller's `when(size >= |p|)`
  * guard is folded in here so the expression is total — the composed
  * sequence would descend below it); a null TOKEN matches nothing (the
  * composed `null === p_j` is null, the AND short-circuits to
  * null/false, `when` counts 0); overlapping occurrences all count
  * (every start position is probed independently).
  */
case class PhraseCount(child: Expression, phrase: Seq[String])
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val pU: Array[UTF8String] =
    phrase.map(UTF8String.fromString).toArray

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"phrase_count expects array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val m = pU.length
    if (n < m) return 0L
    var acc = 0L
    var i = 0
    while (i <= n - m) {
      var j = 0
      var hit = true
      while (hit && j < m) {
        if (toks.isNullAt(i + j) || !toks.getUTF8String(i + j).equals(pU(j)))
          hit = false
        j += 1
      }
      if (hit) acc += 1L
      i += 1
    }
    acc
  }

  override protected def withNewChildInternal(newChild: Expression): PhraseCount =
    copy(child = newChild)
}

object PhraseCount {
  /** Column-API entry point: occurrences of `phrase` in the token array. */
  def phraseCount(toks: Column, phrase: Seq[String]): Column =
    CatalystBridge.column(PhraseCount(CatalystBridge.expression(toks), phrase))
}
