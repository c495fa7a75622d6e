package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native stopword-profile hit counter: how many elements of a string
  * array are members of a fixed word list.
  *
  * Why custom (the [[MinHash]] / [[PqEncode]] route, r20 optimization,
  * guide §4): the composed spelling `size(filter(toks, t => w1 === t ||
  * w2 === t || ...))` is an interpreted HOF (ArrayFilter is
  * CodegenFallback) evaluating a |profile|-branch OR per token — and
  * [[graft.operators.TextAnalysis.langGuess]] runs it once per language
  * profile inside every curation gate's scan projection. This
  * expression does one hash-set membership probe per token inside
  * whole-stage codegen.
  *
  * Exact-count parity with the HOF spelling (TextAnalysisSpec pins it):
  * per-OCCURRENCE counting (duplicates count), null elements skipped
  * (`null === w` is null, which `filter` treats as drop), null array →
  * null.
  */
case class ProfileHits(child: Expression, profile: Seq[String])
    extends UnaryExpression {

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](profile.size * 2)
    profile.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"profile_hits expects array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("profileSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val hits = ctx.freshName("hits")
      s"""
         |final int $n = $a.numElements();
         |int $hits = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) $hits++;
         |}
         |${ev.value} = $hits;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ProfileHits =
    copy(child = newChild)
}

object ProfileHits {
  /** Column-API entry point: occurrences of `profile` words in `toks`. */
  def profileHits(toks: Column, profile: Seq[String]): Column =
    CatalystBridge.column(ProfileHits(CatalystBridge.expression(toks), profile))
}
