package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Every W-token sliding-window polynomial fingerprint of a text
  * column, in position order, as ONE codegen'd Catalyst expression —
  * the position-sensitive sibling of [[HashedShinglesExpr]] (which
  * sorted-dedups because its consumers are set-based).
  *
  * Semantics per window j (replayable in the DuckDB oracle — identical
  * values to the composed form it replaces):
  *   1. whitespace-tokenize on the exact Java `\s` class, u32-Java-hash
  *      each token ([[HashedShinglesExpr.tokenHashes]], the shared
  *      pass-1);
  *   2. fp_j = fold over tokens j..j+W-1 of
  *      acc -> (acc * 31 + h) mod 1_000_000_007, acc0 = 0 — exactly
  *      `HashFunctions.polyFingerprint` over `slice(hs, j+1, W)`.
  *
  * Why an `Expression`: the composed form (`transform` tokenize +
  * `explode(sequence)` + `slice` + `aggregate` fold) evaluates the fold
  * lambda in the interpreted higher-order-function evaluator — W
  * interpreted multiply-mod trees per corpus POSITION, the hot inner
  * loop of the ExactSubstr family (d25 spans, d28 excision), and since
  * round 14 that loop runs in BOTH branches of the keeper/df agg+join.
  * This fuses tokenize + hash + all window folds into one compiled call
  * per document. Intermediates: acc < 2^30, acc*31 + u32 < 2^36 —
  * exact in a long, bit-identical to the interpreted fold.
  */
case class PolyFpWindowsExpr(child: Expression, w: Int)
    extends UnaryExpression {

  require(w >= 1, s"window size must be >= 1, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "poly_fp_windows"

  override def nullSafeEval(input: Any): Any =
    PolyFpWindowsExpr.compute(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PolyFpWindowsExpr$$.MODULE$$.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): PolyFpWindowsExpr =
    copy(child = newChild)
}

object PolyFpWindowsExpr {

  private val P = 1000000007L

  /** Called from generated code — keep the signature Java-friendly.
    * Returns n_tokens - w + 1 fingerprints (empty if the doc has fewer
    * than w tokens), index k = the window starting at token k.
    */
  def compute(text: UTF8String, w: Int): ArrayData = {
    val (tok, nt) = HashedShinglesExpr.tokenHashes(text.toString)
    if (nt < w) return new GenericArrayData(Array.emptyLongArray)
    val m = nt - w + 1
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      var g = 0L
      var k = 0
      while (k < w) { g = (g * 31L + tok(j + k)) % P; k += 1 }
      out(j) = g
      j += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** All W-window polynomial fingerprints of a text column, position
    * order (codegen'd).
    */
  def polyFpWindows(text: Column, w: Int): Column =
    ColumnBridge.column(PolyFpWindowsExpr(ColumnBridge.expression(text), w))
}
