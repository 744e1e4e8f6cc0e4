package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit SimHash of a text column as one codegen'd Catalyst expression.
  *
  * Identical semantics to the composed Catalyst form it replaces (and to
  * `OracleFragments`-replayed DuckDB SQL): whitespace-tokenize on the
  * exact `\s+` class, hash every token (with multiplicity) to u32 Java
  * `String.hashCode`, and for each bit b sum votes of +1/-1 by whether
  * bit b of the token hash is set; bit b of the result is set iff the
  * vote sum is positive. Zero-token documents hash to 0.
  *
  * Why an `Expression`: the composed form ran 32 interpreted
  * `aggregate()` higher-order traversals of the token-hash array per
  * document — the fused loop does one scan with a 32-slot vote array.
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any =
    SimHashExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHashExpr$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHashExpr {

  /** Called from generated code — keep the signature Java-friendly. */
  def compute(text: UTF8String): Long = {
    val s = text.toString
    val votes = new Array[Int](32)
    var h = 0
    var inTok = false
    var i = 0
    while (i <= s.length) {
      val ws = i == s.length || {
        val c = s.charAt(i)
        c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
          c == '\f' || c == '\r'
      }
      if (ws) {
        if (inTok) {
          val u = h.toLong & 0xFFFFFFFFL
          var b = 0
          while (b < 32) {
            votes(b) += (if (((u >>> b) & 1L) == 1L) 1 else -1)
            b += 1
          }
          h = 0; inTok = false
        }
      } else {
        h = h * 31 + s.charAt(i)
        inTok = true
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** 32-bit SimHash of a text column (codegen'd). */
  def simhash32(text: Column): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expression(text)))
}
