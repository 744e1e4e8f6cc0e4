package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Sign-random-projection LSH bucket of a float-array column as ONE
  * codegen'd Catalyst expression: bit i of the result is set iff the
  * dot product with pseudo-random hyperplane i is ≥ 0, where plane i's
  * weight for (1-based) dimension j is the Knuth-hash-derived
  * `pmod((i·64 + j) · 2654435761, 2^32) / 2^32 − 0.5`.
  *
  * Bit-identical to the composed `zip_with`/`aggregate` form it
  * replaces (and to the DuckDB `bucketSql` replay): per element the
  * weight is computed first (`u/2^32 − 0.5`), multiplied by the
  * double-promoted component, and accumulated in index order — the
  * identical IEEE operation sequence.
  *
  * Why an `Expression`: the composed form ran numPlanes interpreted
  * `aggregate(zip_with(...))` traversals per row (8 × 64 closure calls
  * per vector on every corpus row of v2/v3/v12). The fused loop is one
  * JIT'd pass and keeps the bucket projection inside WholeStageCodegen.
  */
case class LshBucketExpr(child: Expression, numPlanes: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  override def nullSafeEval(input: Any): Any =
    LshBucketExpr.compute(input.asInstanceOf[ArrayData], numPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshBucketExpr$$.MODULE$$.compute($c, $numPlanes)")

  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}

object LshBucketExpr {

  /** Called from generated code — Java-friendly signature. */
  def compute(a: ArrayData, numPlanes: Int): Long = {
    val n = a.numElements()
    var out = 0L
    var i = 0
    while (i < numPlanes) {
      var dot = 0.0
      var j = 0
      while (j < n) {
        val u = ((i * 64 + j + 1).toLong * 2654435761L) % 4294967296L
        dot += a.getFloat(j).toDouble * (u.toDouble / 4294967296.0 - 0.5)
        j += 1
      }
      if (dot >= 0) out |= 1L << i
      i += 1
    }
    out
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** LSH bucket of a float-array column (codegen'd). */
  def lshBucket(e: Column, numPlanes: Int): Column =
    ColumnBridge.column(
      LshBucketExpr(ColumnBridge.expression(e), numPlanes))
}
