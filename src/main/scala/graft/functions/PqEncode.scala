package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._

/** Native PQ ENCODE: unit-normalize a float/double vector and emit, per
  * subspace, the index of its nearest codebook centroid (squared L2,
  * ties to the FIRST minimal centroid) — `array<tinyint>` codes.
  *
  * Why custom (the [[MinHash]] / [[CosineSimilarity]] route, r20
  * optimization round, guide §4): the composed-builtins spelling (kept
  * in [[graft.operators.Similarity.quantizePqOn]]'s scaladoc history —
  * one `transform(codebook, aggregate(zip_with(...)))` distance array
  * per subspace plus `array_min`/`array_position` argmins) evaluates
  * m·ksub interpreted HOF closures with a zipped array allocation per
  * centroid per row — higher-order functions do not participate in
  * whole-stage codegen, and the in-flight corpus encode was ~75% of
  * q_embed_ann_pq / q_embed_ann_ivfpq. This expression normalizes once
  * into a scratch buffer and runs the m·ksub·dsub distance loop over a
  * flat codebook array inside whole-stage codegen.
  *
  * BIT-IDENTICAL arithmetic to the composed spelling (SimilaritySpec
  * pins codes equality, which keeps the stored fixture indexes valid):
  * norm = sqrt of the sequential Σx², u = x/norm in input order,
  * per-centroid distance = sequential Σ(u_i − c_i)², argmin keeps the
  * first strict minimum (array_position-of-array_min semantics; an
  * all-NaN distance row — the zero-vector case — likewise yields code
  * 0). Null semantics: null input → null; any null ELEMENT → null (a
  * vector with missing dimensions has no meaningful code — the
  * [[CosineSimilarity]] contract). Length must equal m·dsub, else the
  * row throws (matching slice-out-of-range strictness).
  */
case class PqEncode(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  private val m = books.length
  private val ksub = books.head.length
  private val dsub = books.head.head.length

  /** Flat codebook: centroid c of subspace j starts at
    * ((j·ksub)+c)·dsub. Referenced from generated code via
    * addReferenceObj. */
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](m * ksub * dsub)
    var o = 0
    books.foreach(_.foreach(_.foreach { v => a(o) = v; o += 1 }))
    a
  }

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode expects array<float|double>, got ${t.sql}")
    }

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    require(n == m * dsub, s"pq_encode: vector length $n != ${m * dsub}")
    val u = new Array[Double](n)
    var i = 0
    var ss = 0.0
    val isF = elemIsFloat
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val x = if (isF) arr.getFloat(i).toDouble else arr.getDouble(i)
      u(i) = x; ss += x * x
      i += 1
    }
    val nrm = math.sqrt(ss)
    i = 0
    while (i < n) { u(i) = u(i) / nrm; i += 1 }
    val codes = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < ksub) {
        var d = 0.0
        var t = 0
        val base = (j * ksub + c) * dsub
        while (t < dsub) {
          val diff = u(j * dsub + t) - flat(base + t)
          d += diff * diff
          t += 1
        }
        if (d < best) { best = d; bestC = c }
        c += 1
      }
      codes(j) = bestC.toByte
      j += 1
    }
    // primitive (unsafe) output (r21, the Sq8.encode storage lesson):
    // the ADC scan probes the codes per (query × candidate), and a
    // boxed GenericArrayData from a stage-fused expression loses the
    // unsafe-projection materialization the CodegenFallback composed
    // spelling got for free
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val flatRef = ctx.addReferenceObj("pqFlatBooks", flat, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val u = ctx.freshName("u")
      val ss = ctx.freshName("ss")
      val i = ctx.freshName("i")
      val nrm = ctx.freshName("nrm")
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val d = ctx.freshName("d")
      val base = ctx.freshName("base")
      val diff = ctx.freshName("diff")
      val done = ctx.freshName("nullElem")
      s"""
         |final int $n = $a.numElements();
         |if ($n != ${m * dsub}) {
         |  throw new IllegalArgumentException(
         |    "pq_encode: vector length " + $n + " != ${m * dsub}");
         |}
         |boolean $done = false;
         |final double[] $u = new double[$n];
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; $done = true; break; }
         |  final double ${d}x = (double) $a.$get($i);
         |  $u[$i] = ${d}x; $ss += ${d}x * ${d}x;
         |}
         |if (!$done) {
         |  final double $nrm = java.lang.Math.sqrt($ss);
         |  for (int $i = 0; $i < $n; $i++) $u[$i] = $u[$i] / $nrm;
         |  final byte[] $codes = new byte[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    double $best = Double.POSITIVE_INFINITY;
         |    int $bestC = 0;
         |    for (int $c = 0; $c < $ksub; $c++) {
         |      double $d = 0.0;
         |      final int $base = ($j * $ksub + $c) * $dsub;
         |      for (int $t = 0; $t < $dsub; $t++) {
         |        final double $diff = $u[$j * $dsub + $t] - $flatRef[$base + $t];
         |        $d += $diff * $diff;
         |      }
         |      if ($d < $best) { $best = $d; $bestC = $c; }
         |    }
         |    $codes[$j] = (byte) $bestC;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions
         |    .UnsafeArrayData.fromPrimitiveArray($codes);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  /** Column-API entry point: codes of `emb` under `books`. */
  def pqEncode(emb: Column, books: Seq[Seq[Seq[Double]]]): Column =
    CatalystBridge.column(PqEncode(CatalystBridge.expression(emb), books))
}
