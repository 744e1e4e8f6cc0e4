package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking of a text column as ONE codegen'd Catalyst
  * expression: array of (chunk_id, chunk_len, fp) structs in chunk
  * order — the x19 primitive.
  *
  * Semantics (bit-identical to the composed form it replaces, which the
  * x19 DuckDB oracle replays end-to-end):
  *   1. whitespace-tokenize + u32 Java hash per token
  *      ([[HashedShinglesExpr.tokenHashes]], the shared pass-1);
  *   2. a token at position > 0 whose Knuth hash ≡ 0 (mod 16) OPENS a
  *      new chunk (expected chunk ≈ 16 tokens) —
  *      [[HashFunctions.knuthHashJvm]], the same multiply family the
  *      SQL surface uses;
  *   3. each chunk's fp = polynomial fold (acc*31 + h) mod 1_000_000_007
  *      over its token hashes in position order (the
  *      `HashFunctions.polyFingerprint` arithmetic).
  *
  * Why an `Expression`: the composed form needed a per-doc analytic
  * window for the boundary prefix sum, a (doc, chunk) `collect_list`
  * aggregate (ObjectHashAggregate — off codegen), and an interpreted
  * HOF fold over every collected chunk — one corpus EXCHANGE plus two
  * interpreted passes for something that is per-document sequential by
  * construction. Fused, CDC chunking is embarrassingly parallel: a
  * map-only scan at any corpus size, with the sharing stats (x19's nd)
  * the only exchange left in the query.
  */
case class CdcChunksExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = CdcChunksExpr.OutType
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    CdcChunksExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcChunksExpr$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunksExpr =
    copy(child = newChild)
}

object CdcChunksExpr {

  private val P = 1000000007L

  private[functions] val OutType: DataType = ArrayType(
    StructType(Seq(
      StructField("chunk_id", LongType, nullable = false),
      StructField("chunk_len", LongType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)

  /** Called from generated code — keep the signature Java-friendly. */
  def compute(text: UTF8String): ArrayData = {
    val (tok, nt) = HashedShinglesExpr.tokenHashes(text.toString)
    if (nt == 0) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](nt / 8)
    var chunkId = 0L
    var len = 0L
    var g = 0L
    var pos = 0
    while (pos < nt) {
      val h = tok(pos)
      if (pos > 0 && HashFunctions.knuthHashJvm(h) % 16L == 0L) {
        out += new GenericInternalRow(Array[Any](chunkId, len, g))
        chunkId += 1L
        len = 0L
        g = 0L
      }
      g = (g * 31L + h) % P
      len += 1L
      pos += 1
    }
    out += new GenericInternalRow(Array[Any](chunkId, len, g))
    new GenericArrayData(out.toArray)
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** CDC chunks of a text column: (chunk_id, chunk_len, fp) structs in
    * chunk order (codegen'd).
    */
  def cdcChunks(text: Column): Column =
    ColumnBridge.column(CdcChunksExpr(ColumnBridge.expression(text)))
}
