package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The x17 signed-hash document embedding as ONE codegen'd Catalyst
  * expression: per document, array of (dim, value) structs — the
  * L2-normalized 16-dim feature-hashing vector.
  *
  * Semantics (bit-identical to the composed form it replaces; the x17
  * oracle replays it in SQL): for each whitespace token, h = u32 Java
  * hash ([[HashedShinglesExpr.tokenHashes]]), dim = h % dims,
  * sign = ((h >> 16) & 1) * 2 - 1; raw_d = Σ signs; only dims that
  * received ≥ 1 token emit a row; value = raw_d / sqrt(Σ raw²) in the
  * same IEEE order as the composed form (long sum → double → sqrt),
  * 0.0 when the norm is zero.
  *
  * Why an `Expression`: the embedding is a pure per-document function,
  * but the composed form exploded every token instance into the (doc,
  * dim) hash aggregate and re-clustered for the norm window — TWO
  * corpus exchanges for a rowwise computation. Fused, x17 is map-only:
  * scan → project/explode, zero exchanges at any corpus size (the
  * round-14 poly_fp_windows/cdc_chunks doctrine: fuse only on a
  * measured win — see SCALE.md round-15 notes for the A/B).
  */
case class HashEmbedExpr(child: Expression, dims: Int)
    extends UnaryExpression {

  require(dims >= 1, s"dims must be >= 1, got $dims")

  override def dataType: DataType = HashEmbedExpr.OutType
  override def prettyName: String = "hash_embed"

  override def nullSafeEval(input: Any): Any =
    HashEmbedExpr.compute(input.asInstanceOf[UTF8String], dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashEmbedExpr$$.MODULE$$.compute($c, $dims)")

  override protected def withNewChildInternal(newChild: Expression): HashEmbedExpr =
    copy(child = newChild)
}

object HashEmbedExpr {

  private[functions] val OutType: DataType = ArrayType(
    StructType(Seq(
      StructField("dim", LongType, nullable = false),
      StructField("value", DoubleType, nullable = false))),
    containsNull = false)

  /** Called from generated code — keep the signature Java-friendly. */
  def compute(text: UTF8String, dims: Int): ArrayData = {
    val (tok, nt) = HashedShinglesExpr.tokenHashes(text.toString)
    if (nt == 0) return new GenericArrayData(Array.empty[Any])
    val raw = new Array[Long](dims)
    val cnt = new Array[Int](dims)
    var k = 0
    while (k < nt) {
      val h = tok(k) // u32, non-negative
      val d = (h % dims).toInt
      raw(d) += ((h >> 16) & 1L) * 2L - 1L
      cnt(d) += 1
      k += 1
    }
    // norm in the composed form's IEEE order: long Σraw² → double → sqrt
    var sumsq = 0L
    var d = 0
    var m = 0
    while (d < dims) {
      sumsq += raw(d) * raw(d)
      if (cnt(d) > 0) m += 1
      d += 1
    }
    val norm = math.sqrt(sumsq.toDouble)
    val out = new Array[Any](m)
    var i = 0
    d = 0
    while (d < dims) {
      if (cnt(d) > 0) {
        out(i) = new GenericInternalRow(Array[Any](d.toLong,
          if (norm == 0.0) 0.0 else raw(d).toDouble / norm)): InternalRow
        i += 1
      }
      d += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Normalized signed-hash embedding of a text column (codegen'd). */
  def hashEmbed(text: Column, dims: Int): Column =
    ColumnBridge.column(
      HashEmbedExpr(ColumnBridge.expression(text), dims))
}
