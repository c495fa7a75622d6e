package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._

/** MinHash banded-LSH keys of a string-set column, computed natively.
  *
  * Why custom (SURVEY.md §7.3 route (b)): the composed-builtins spelling
  * (`transform(sequence(0,k-1), s => array_min(transform(set, g =>
  * xxhash64(g, s))))`, kept in [[graft.operators.TextOps]] as the readable
  * reference) evaluates k*|set| interpreted lambda closures per row —
  * higher-order functions do not participate in whole-stage codegen, and
  * at sf0.1 that made the minhash query 76% of the whole bench. This
  * expression hashes each element ONCE (two xxhash64 passes) and derives
  * the k minhash slots with the standard two-hash construction
  * h_i = h1 + i*h2 (Kirsch–Mitzenmacher), then folds each band of
  * `k/bands` consecutive slots into one 64-bit bucket key — the entire
  * signature never materializes per row.
  *
  * The hash family differs from the TextOps spelling, which is fine by
  * construction: band keys only ever feed a candidate bucket join whose
  * output is re-verified with EXACT set intersection
  * ([[graft.operators.Dedup.minHashNearDups]]), so any hash family with
  * the minwise property yields the same final pair set (recall argument
  * in Dedup's scaladoc; equality with brute force asserted in DedupSpec).
  */
object MinHash {

  /** Second seed for the independent hash; any odd 64-bit constant
    * distinct from xxhash64's default seed works.
    */
  private val SEED2 = 0x27D4EB2F165667C5L

  /** splitmix64 finalizer — full-avalanche 64-bit mix for band folding. */
  @inline private def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Band bucket keys for one row's shingle set. Called from both the
    * interpreted eval and generated code (static forwarder).
    *
    * k minhash slots in `bands` bands of k/bands rows; key b folds that
    * band's slot minima through splitmix64 seeded by the band index, so
    * keys from different bands never collide structurally.
    */
  def bandKeys(set: ArrayData, k: Int, bands: Int): Array[Long] = {
    val n = set.numElements()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = set.getUTF8String(i)
      val h1 = XxHash64Function.hash(s, StringType, 42L)
      val h2 = XxHash64Function.hash(s, StringType, SEED2) | 1L // odd → all k combos distinct
      var j = 0
      var v = h1
      while (j < k) {
        if (v < mins(j)) mins(j) = v
        v += h2
        j += 1
      }
      i += 1
    }
    val rows = k / bands
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = mix64(b.toLong * 0x9E3779B97F4A7C15L)
      var r = 0
      while (r < rows) {
        h = mix64(h ^ mins(b * rows + r))
        r += 1
      }
      keys(b) = h
      b += 1
    }
    keys
  }

  /** Column-API entry point: `minhash_band_keys(shingleSet)` →
    * array<bigint> of `bands` bucket keys from a k-slot signature.
    */
  def minhashBandKeys(set: Column, k: Int, bands: Int): Column = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    CatalystBridge.column(MinHashBandKeys(CatalystBridge.expression(set), k, bands))
  }
}

/** Catalyst expression wrapping [[MinHash.bandKeys]]; participates in
  * whole-stage codegen via a static call into the JIT-compiled helper.
  */
case class MinHashBandKeys(child: Expression, k: Int, bands: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_band_keys expects array<string>, got ${t.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHash.bandKeys(input.asInstanceOf[ArrayData], k, bands))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.MinHash.bandKeys($c, $k, $bands));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}
