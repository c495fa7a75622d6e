package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._

/** Native ADJACENT-pair expansion: the (i, i+1) string pairs of a token
  * array as `array<struct<fieldA, fieldB>>` — the bigram/symbol-pair
  * HOF of [[graft.operators.Lm.bigramVocabOn]] and
  * [[graft.operators.Bpe.pairCountsOn]], computed in one tight loop
  * (field names parameterized because the two call sites project
  * `p.prev`/`p.tok` vs `p.lsym`/`p.rsym`).
  *
  * Why custom (the [[PairStructs]] rationale, r20/r21 optimization
  * rounds, guide §4): the composed spelling
  * `transform(sequence(1, n-1), i => struct(element_at(ws, i),
  * element_at(ws, i+1)))` is interpreted per row (HOFs are
  * CodegenFallback) and allocates a boxed sequence plus one closure
  * frame per position — the per-row cost every reference-corpus bigram
  * count and every BPE merge iteration pays. Output order and values
  * are IDENTICAL (position ascending); LmSpec / BpeSpec pin equality
  * against the HOF spelling.
  *
  * Null semantics: null array → null (transform propagates null).
  * Element nulls are copied through as struct-field nulls, exactly as
  * `element_at` would surface them (tokenizers here never produce null
  * elements, but the expression must not invent a stricter contract).
  * Arrays below 2 elements yield an empty pair array — both call sites
  * filter `size >= 2` FIRST because the composed `sequence(1, n-1)`
  * spelling is wrong at n = 1 (sequence(1, 0) descends); the native
  * expression is total and returns [] there.
  */
case class AdjacentStructs(child: Expression, fieldA: String, fieldB: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField(fieldA, StringType, nullable = true),
      StructField(fieldB, StringType, nullable = true))),
    containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"adjacent_structs expects array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var prev: AnyRef = if (arr.isNullAt(0)) null else arr.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur: AnyRef = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      out(i - 1) = new GenericInternalRow(Array[Any](prev, cur))
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): AdjacentStructs =
    copy(child = newChild)
}

object AdjacentStructs {
  /** Column-API entry point: adjacent (i, i+1) pairs of a token array. */
  def adjacentStructs(toks: Column, fieldA: String, fieldB: String): Column =
    CatalystBridge.column(
      AdjacentStructs(CatalystBridge.expression(toks), fieldA, fieldB))
}

/** Native POSITIONAL-bigram expansion: one struct per token position —
  * `(tok = ws[i], prev = ws[i-1] or null at the first position)` — the
  * scoring-side HOF of [[graft.operators.Lm.bigramScoreOn]], which must
  * keep position 1 (its prev-null row is the unigram-scored document
  * head, not a droppable edge) where [[AdjacentStructs]] starts at the
  * first PAIR.
  *
  * Same CodegenFallback-HOF rationale as [[AdjacentStructs]]; output
  * values and order are IDENTICAL to
  * `transform(sequence(1, n), i => struct(element_at(ws, i),
  * when(i > 1, element_at(ws, i - 1))))` — LmSpec pins it. Null array →
  * null; element nulls copy through; n >= 1 always holds for the call
  * site (the tokenizer maps "" to [""]), and n = 0 yields [] anyway.
  */
case class PositionalBigrams(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("tok", StringType, nullable = true),
      StructField("prev", StringType, nullable = true))),
    containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"positional_bigrams expects array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var prev: AnyRef = null
    var i = 0
    while (i < n) {
      val cur: AnyRef = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      out(i) = new GenericInternalRow(Array[Any](cur, prev))
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PositionalBigrams =
    copy(child = newChild)
}

object PositionalBigrams {
  /** Column-API entry point: per-position (tok, prev) structs. */
  def positionalBigrams(toks: Column): Column =
    CatalystBridge.column(PositionalBigrams(CatalystBridge.expression(toks)))
}
