package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fixed-size overlapping token-window chunks of a text column as ONE
  * codegen'd Catalyst expression: array of (chunk_idx, chunk_len, fp)
  * structs — the x10/d13 primitive, sibling of [[CdcChunksExpr]].
  *
  * Semantics (bit-identical to the composed form it replaces; the x10
  * oracle replays it in SQL): chunk i covers tokens
  * [i·stride, min(i·stride + size, n)) for i < ceil(n / stride), token
  * hash = u32 Java hash ([[HashedShinglesExpr.tokenHashes]]), fp = the
  * `HashFunctions.polyFingerprint` fold over the chunk's hashes.
  *
  * Why an `Expression`: the composed form sliced a fresh sub-array and
  * ran an interpreted HOF fold per CHUNK (~size ops each); fused, the
  * whole chunk frame is one compiled call per document.
  */
case class StridedChunksExpr(child: Expression, size: Int, stride: Int)
    extends UnaryExpression {

  require(size >= 1 && stride >= 1,
    s"chunk size/stride must be >= 1, got ($size, $stride)")

  override def dataType: DataType = StridedChunksExpr.OutType
  override def prettyName: String = "strided_chunks"

  override def nullSafeEval(input: Any): Any =
    StridedChunksExpr.compute(input.asInstanceOf[UTF8String], size, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StridedChunksExpr$$.MODULE$$.compute($c, $size, $stride)")

  override protected def withNewChildInternal(newChild: Expression): StridedChunksExpr =
    copy(child = newChild)
}

object StridedChunksExpr {

  private val P = 1000000007L

  private[functions] val OutType: DataType = ArrayType(
    StructType(Seq(
      StructField("chunk_idx", LongType, nullable = false),
      StructField("chunk_len", LongType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)

  /** Called from generated code — keep the signature Java-friendly. */
  def compute(text: UTF8String, size: Int, stride: Int): ArrayData = {
    val (tok, nt) = HashedShinglesExpr.tokenHashes(text.toString)
    if (nt == 0) return new GenericArrayData(Array.empty[Any])
    val m = (nt + stride - 1) / stride
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val start = i * stride
      val end = math.min(start + size, nt)
      var g = 0L
      var k = start
      while (k < end) { g = (g * 31L + tok(k)) % P; k += 1 }
      out(i) = new GenericInternalRow(
        Array[Any](i.toLong, (end - start).toLong, g)): InternalRow
      i += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Overlapping fixed-stride chunks of a text column (codegen'd). */
  def stridedChunks(text: Column, size: Int, stride: Int): Column =
    ColumnBridge.column(
      StridedChunksExpr(ColumnBridge.expression(text), size, stride))
}
