package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document repetition statistics (Gopher-style quality signals for
  * training-data curation) as one codegen'd Catalyst expression:
  *
  *   - `n_tokens`   — whitespace token count (`TextFunctions.wsTokens`);
  *   - `n_distinct` — distinct token count (by u32 Java `String.hashCode`,
  *                    the engine's portable token hash);
  *   - `top_bigram_n` — multiplicity of the most frequent token bigram,
  *                    bigram identity = (h1*1000003 + h2) mod 2^32 (the
  *                    same fold `HashedShinglesExpr` uses, NOT distinct'd).
  *
  * Downstream ratios (duplicate-token fraction, top-bigram fraction) are
  * plain column arithmetic. One pass per row, zero shuffle — repetition
  * scoring stays embarrassingly parallel at any corpus size, where an
  * explode + per-doc groupBy would shuffle every token. Each step replays
  * in DuckDB (`OracleFragments.javaHashU32` + explode/group SQL), so the
  * whole signal is oracle-checkable.
  *
  * Reference behavior: per-element text analysis DoFns as in
  * `WordCount.scala:73-88` / `DebuggingWordCount.scala:66-87`,
  * generalized to the corpus-quality ops the engine adds.
  */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStatsExpr.schema
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionStatsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RepetitionStatsExpr$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

object RepetitionStatsExpr {

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_bigram_n", IntegerType, nullable = false)))

  private val M = 1000003L
  private val U32 = 0xFFFFFFFFL

  /** Called from generated code — keep the signature Java-friendly. */
  def compute(text: UTF8String): InternalRow = {
    // pass 1: token u32 hashes — SHARED with HashedShinglesExpr so the
    // engine has exactly one definition of "token"
    val (tok, nt) = HashedShinglesExpr.tokenHashes(text.toString)
    // pass 2: bigram fold hashes (NOT distinct'd — multiplicities matter)
    val nb = math.max(nt - 1, 0)
    val big = new Array[Long](nb)
    var j = 0
    while (j < nb) {
      big(j) = (tok(j) * M + tok(j + 1)) & U32
      j += 1
    }
    // pass 3: sort both; distinct count from token runs, max run from bigrams
    val toks = java.util.Arrays.copyOf(tok, nt)
    java.util.Arrays.sort(toks)
    var nDistinct = if (nt > 0) 1 else 0
    var r = 1
    while (r < nt) {
      if (toks(r) != toks(r - 1)) nDistinct += 1
      r += 1
    }
    java.util.Arrays.sort(big)
    var topBigram = if (nb > 0) 1 else 0
    var run = 1
    r = 1
    while (r < nb) {
      if (big(r) == big(r - 1)) { run += 1; if (run > topBigram) topBigram = run }
      else run = 1
      r += 1
    }
    new GenericInternalRow(Array[Any](nt, nDistinct, topBigram))
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Repetition stats struct of a text column (codegen'd). */
  def repetitionStats(text: Column): Column =
    ColumnBridge.column(RepetitionStatsExpr(ColumnBridge.expression(text)))
}
