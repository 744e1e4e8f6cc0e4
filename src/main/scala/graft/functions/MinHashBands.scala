package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash LSH band keys of a text column, as ONE codegen'd fused loop:
  * tokenize → hashed n-gram shingles ([[HashedShinglesExpr]] pass, same
  * arithmetic) → `numPerm` universal-hash minima
  * (x·(2j+1) + (12345j+1) mod P, the `Dedup.minhashSigsOf` permutation
  * family, P = 2^31−1) → `numPerm/bandSize` band strings
  * `"bandIdx|m1,m2,.."` matching `lshBandPairs`' (band_idx, band_key)
  * equality. Empty-shingle docs (< n tokens) yield an empty array.
  *
  * Why an `Expression`: the composed Catalyst form (`transform` +
  * `array_min` per permutation + `concat_ws`/`array_join` band
  * assembly) evaluates `numPerm` interpreted higher-order passes over
  * the shingle array per document — it was the per-row bottleneck of
  * the STREAMING near-dup path (round-8 bench: the `neardup_*` probes
  * ran 4–8× slower than the other stateful ops in the same harness,
  * and the signature computation, not the keep-first state check,
  * dominated). One JVM loop computes all `numPerm` minima in a single
  * pass over the shingles. Bit-identical to the batch d3/d11 signatures
  * — `StreamOpsSpec`/`DedupDifferentialSpec` assert the parity.
  */
case class MinHashBandsExpr(child: Expression, n: Int, numPerm: Int,
    bandSize: Int, p: Long) extends UnaryExpression {

  require(n >= 1 && numPerm >= 1 && bandSize >= 1 && numPerm % bandSize == 0,
    s"bad minhash geometry: n=$n numPerm=$numPerm bandSize=$bandSize")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(input: Any): Any =
    MinHashBandsExpr.compute(input.asInstanceOf[UTF8String], n, numPerm,
      bandSize, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashBandsExpr$$.MODULE$$.compute($c, $n, " +
        s"$numPerm, $bandSize, ${p}L)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandsExpr =
    copy(child = newChild)
}

object MinHashBandsExpr {

  /** Called from generated code — keep the signature Java-friendly.
    * Shingle hashes are u32 (< 2^32) and the multipliers 2j+1 ≤ 2·numPerm,
    * so x·a + c stays far below 2^63 — plain long arithmetic, and the
    * operands are non-negative so `%` ≡ `pmod`.
    */
  def compute(text: UTF8String, n: Int, numPerm: Int, bandSize: Int,
      p: Long): ArrayData = {
    val sh = HashedShinglesExpr.compute(text, n).asInstanceOf[GenericArrayData]
    val m = sh.numElements()
    if (m == 0) return new GenericArrayData(new Array[Any](0))
    val sig = new Array[Long](numPerm)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < m) {
      val x = sh.getLong(i)
      var j = 0
      while (j < numPerm) {
        val v = (x * (2L * j + 1) + (12345L * j + 1)) % p
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    val nb = numPerm / bandSize
    val out = new Array[Any](nb)
    var b = 0
    while (b < nb) {
      val sb = new java.lang.StringBuilder(8 * bandSize)
      sb.append(b).append('|')
      var k = 0
      while (k < bandSize) {
        if (k > 0) sb.append(',')
        sb.append(sig(b * bandSize + k))
        k += 1
      }
      out(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** MinHash LSH band keys of a text column (codegen'd). */
  def minhashBands(text: Column, n: Int, numPerm: Int, bandSize: Int,
      p: Long): Column =
    ColumnBridge.column(
      MinHashBandsExpr(ColumnBridge.expression(text), n, numPerm, bandSize, p))
}
