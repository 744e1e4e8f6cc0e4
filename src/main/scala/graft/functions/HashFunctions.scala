package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** `java.lang.String.hashCode`-compatible hash as a native Catalyst
  * expression with whole-stage codegen.
  *
  * The reference uses Java `hashCode` twice — deterministic ~10% user
  * sampling (reference `TopWikipediaSessions.scala:191-198`) and the
  * order-insensitive result checksum (`AutoComplete.scala:362-370`).
  * Spark's built-in `hash()` is Murmur3, so parity needs this expression.
  * Implemented as an `Expression` (not a UDF) so it stays inside
  * WholeStageCodegen on the hot path.
  */
case class JavaStringHashCode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "java_string_hashcode"

  override def nullSafeEval(input: Any): Any =
    input.asInstanceOf[UTF8String].toString.hashCode

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$c.toString().hashCode()")

  override protected def withNewChildInternal(newChild: Expression): JavaStringHashCode =
    copy(child = newChild)
}

object HashFunctions {

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Java `String.hashCode` of a string column (codegen'd). */
  def javaStringHashCode(c: Column): Column =
    ColumnBridge.column(JavaStringHashCode(ColumnBridge.expression(c)))

  /** Knuth multiplicative hash of a non-negative long, in [0, 2^32).
    *
    * Pure integer arithmetic — reproducible in any SQL engine
    * (`(x * 2654435761) % 4294967296`), which makes hash-based sampling
    * oracle-checkable (unlike engine-native murmur hashes).
    */
  def knuthHash(c: Column): Column =
    pmod(c.cast("long") * lit(2654435761L), lit(4294967296L))

  /** Deterministic hash sample: keep rows where knuthHash(key) < frac * 2^32.
    * Same semantics as the reference's abs(hashCode)-threshold sampling
    * (`TopWikipediaSessions.scala:191-198`) with a portable hash. Scales
    * embarrassingly: a pure rowwise filter, pushed below shuffles.
    */
  def hashSample(key: Column, frac: Double): Column =
    knuthHash(key) < lit((frac * 4294967296.0).toLong)

  /** Polynomial rolling-hash fingerprint of an array of longs:
    * fold(acc = (acc * 31 + x) mod 1e9+7). Deterministic, order-sensitive,
    * portable to the DuckDB oracle via list_reduce.
    */
  def polyFingerprint(arr: Column): Column =
    aggregate(arr, lit(0L), (acc, x) => pmod(acc * lit(31L) + x, lit(1000000007L)))
}
