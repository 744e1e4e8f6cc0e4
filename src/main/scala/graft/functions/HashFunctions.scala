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

  /** Knuth multiplicative hash of a long key, in [0, 2^32).
    *
    * Pure integer arithmetic — reproducible in any SQL engine with
    * 128-bit (or split) multiplication, e.g. DuckDB HUGEINT
    * (`OracleFragments.knuthU32`); makes hash-based sampling
    * oracle-checkable (unlike engine-native murmur hashes).
    *
    * Overflow-safe at any key magnitude (ANSI mode throws on long
    * overflow, and even a 2^32-masked key times K exceeds Long.MaxValue):
    * the masked key is split into 16-bit halves x = xh·2^16 + xl, so
    * (x·K) mod 2^32 = ((xh·K mod 2^16)·2^16 + xl·K) mod 2^32 with every
    * intermediate ≤ 2^16·K ≈ 1.7e14 ≪ Long.MaxValue.
    */
  def knuthHash(c: Column): Column = mulU32(c, 2654435761L)

  /** (x·a) mod 2^32 for any odd u32 multiplier `a` — the universal
    * multiply family behind [[knuthHash]] and the t6 count-min row
    * hashes, with the same overflow-safe 16-bit split (see the
    * [[knuthHash]] note). Oracle replay: `(x::HUGEINT * a) % 4294967296`.
    */
  def mulU32(c: Column, a: Long): Column = {
    val x = pmod(c.cast("long"), lit(4294967296L))
    val xh = shiftright(x, 16)
    val xl = x.bitwiseAND(lit(65535L))
    pmod(pmod(xh * lit(a), lit(65536L)) * lit(65536L) + xl * lit(a),
      lit(4294967296L))
  }

  /** JVM replay of [[knuthHash]] — same split-multiply u32 arithmetic,
    * same value for any input. For driver-side constant tables and
    * JIT-escape inner loops (v10 signs, Bloom probes).
    */
  @inline def knuthHashJvm(x: Long): Long = {
    val K = 2654435761L
    val m = ((x % 4294967296L) + 4294967296L) % 4294967296L
    (((m >>> 16) * K % 65536L) * 65536L + (m & 65535L) * K) % 4294967296L
  }

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
