package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct hashed word-level n-gram shingles of a text column, as one
  * codegen'd Catalyst expression.
  *
  * Semantics (each step replayable in the DuckDB oracle):
  *   1. whitespace-tokenize on `\s+` (the exact Java/RE2 class
  *      `[ \t\n\x0B\f\r]`), dropping empties — `TextFunctions.wsTokens`;
  *   2. hash every token to u32 Java `String.hashCode`
  *      (`OracleFragments.javaHashU32`);
  *   3. slide an n-window, folding the n token hashes with
  *      g = (g * 1000003 + h) mod 2^32 — so a shingle never exists as a
  *      string at all;
  *   4. sorted-distinct the shingle hashes (every consumer — Jaccard
  *      counts, minhash mins, set sizes — is order-insensitive).
  *
  * Why an `Expression` and not composed Catalyst functions: the composed
  * form (`transform` + `array_join` + `slice` + `array_distinct`) runs in
  * the interpreted higher-order-function evaluator and materializes every
  * shingle as a string; on the dedup corpus it was ~6× slower than this
  * single fused loop. This is the hot inner operation of d2/d3/d6/d7
  * (reference behavior: near-dup shingling as in
  * `complete/AutoComplete.scala`-style text keying, generalized per
  * SURVEY §2 D-rows).
  */
case class HashedShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles"

  override def nullSafeEval(input: Any): Any =
    HashedShinglesExpr.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashedShinglesExpr$$.MODULE$$.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): HashedShinglesExpr =
    copy(child = newChild)
}

object HashedShinglesExpr {

  private val M = 1000003L // polynomial base for the n-gram fold
  private val U32 = 0xFFFFFFFFL

  /** Pass 1 shared by the fused text expressions (`HashedShinglesExpr`,
    * `RepetitionStatsExpr`): whitespace-tokenize on the exact Java `\\s`
    * class and u32-Java-hash each token (Java int hash accumulates with
    * natural wrap-around; & 0xFFFFFFFF == pmod(h, 2^32) for the sign
    * flip). Returns (possibly oversized) hash buffer + token count.
    * `SimHashExpr` keeps its own fold — it votes per token WITHOUT
    * materializing this array.
    */
  private[functions] def tokenHashes(s: String): (Array[Long], Int) = {
    var tok = new Array[Long](32)
    var nt = 0
    var h = 0
    var inTok = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
          c == '\f' || c == '\r') {
        if (inTok) {
          if (nt == tok.length) tok = java.util.Arrays.copyOf(tok, nt * 2)
          tok(nt) = h.toLong & U32; nt += 1; h = 0; inTok = false
        }
      } else {
        h = h * 31 + c
        inTok = true
      }
      i += 1
    }
    if (inTok) {
      if (nt == tok.length) tok = java.util.Arrays.copyOf(tok, nt + 1)
      tok(nt) = h.toLong & U32; nt += 1
    }
    (tok, nt)
  }

  /** Called from generated code — keep the signature Java-friendly. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val (tok, nt) = tokenHashes(text.toString)
    if (nt < n) return new GenericArrayData(Array.emptyLongArray)
    // pass 2: n-window polynomial fold (every intermediate < 2^52)
    val m = nt - n + 1
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      var g = tok(j)
      var k = 1
      while (k < n) { g = (g * M + tok(j + k)) & U32; k += 1 }
      out(j) = g
      j += 1
    }
    // pass 3: sorted distinct in place
    java.util.Arrays.sort(out)
    var w = 1
    var r = 1
    while (r < m) {
      if (out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(if (w == m) out else java.util.Arrays.copyOf(out, w))
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Distinct hashed n-gram shingles of a text column (codegen'd). */
  def hashedShingles(text: Column, n: Int): Column =
    ColumnBridge.column(HashedShinglesExpr(ColumnBridge.expression(text), n))
}
