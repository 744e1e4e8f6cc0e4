package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** WITHIN-document repeated-n-gram statistics as ONE codegen'd Catalyst
  * expression: struct (n_tokens, n_dup_windows, dup_tokens) — the
  * intra-document repetition-removal measurement (the Gopher-class
  * cleaning step that DELETES self-repeated spans, distinct from x8,
  * which only scores repetition, and from the d25 ExactSubstr family,
  * which finds spans repeated ACROSS the corpus).
  *
  * Semantics (replayable in the DuckDB oracle): token hashes and window
  * fingerprints exactly as [[PolyFpWindowsExpr]] (u32 Java token hash;
  * fp_j = fold (acc·31 + h) mod 1e9+7 over tokens j..j+n-1). A window
  * is DUPLICATED iff its fingerprint occurred at any earlier window
  * start in the same document (first occurrence survives — the d28
  * keep-first policy applied within the doc). `n_dup_windows` counts
  * duplicated windows; `dup_tokens` is the size of the UNION of their
  * [j, j+n) token spans — the exact token volume an excision pass would
  * remove. Docs with fewer than n tokens report (n_tokens, 0, 0).
  *
  * Why an `Expression`: the computation is a pure per-document function
  * (like [[HashEmbedExpr]]); composed, it would posexplode every window
  * into a (doc, fp) min-agg plus a doc-keyed coverage window — two
  * corpus exchanges for rowwise work. Fused, the x35 query is MAP-ONLY.
  * Fingerprint equality stands in for n-gram equality on both sides of
  * the oracle compare (the d25 family convention), so a 1e9+7 collision
  * cannot produce a mismatch.
  */
case class NgramSelfDupExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"n-gram width must be >= 1, got $n")

  override def dataType: DataType = NgramSelfDupExpr.OutType
  override def prettyName: String = "ngram_selfdup_stats"

  override def nullSafeEval(input: Any): Any =
    NgramSelfDupExpr.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NgramSelfDupExpr$$.MODULE$$.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramSelfDupExpr =
    copy(child = newChild)
}

object NgramSelfDupExpr {

  private val P = 1000000007L

  private[functions] val OutType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_dup_windows", LongType, nullable = false),
    StructField("dup_tokens", LongType, nullable = false)))

  /** Called from generated code — keep the signature Java-friendly. */
  def compute(text: UTF8String, n: Int): InternalRow = {
    val (tok, nt) = HashedShinglesExpr.tokenHashes(text.toString)
    if (nt < n)
      return new GenericInternalRow(Array[Any](nt.toLong, 0L, 0L))
    val m = nt - n + 1
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    val cov = new Array[Boolean](nt)
    var dupW = 0L
    var j = 0
    while (j < m) {
      var g = 0L
      var k = 0
      while (k < n) { g = (g * 31L + tok(j + k)) % P; k += 1 }
      if (!seen.add(g)) {
        dupW += 1
        var p = j
        while (p < j + n) { cov(p) = true; p += 1 }
      }
      j += 1
    }
    var dupT = 0L
    var p = 0
    while (p < nt) { if (cov(p)) dupT += 1; p += 1 }
    new GenericInternalRow(Array[Any](nt.toLong, dupW, dupT))
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Within-doc repeated-n-gram stats of a text column (codegen'd). */
  def ngramSelfDupStats(text: Column, n: Int): Column =
    ColumnBridge.column(NgramSelfDupExpr(ColumnBridge.expression(text), n))
}
