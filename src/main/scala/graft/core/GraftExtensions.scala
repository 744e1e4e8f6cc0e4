package graft.core

import graft.functions.JavaStringHashCode
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extensions registered via `SparkSessionExtensions` — the
  * supported Spark extension point (enable with
  * `.config("spark.sql.extensions", "graft.core.GraftExtensions")` or
  * `GraftSession.local`, which wires it in).
  *
  * Currently injects the SQL function `java_string_hashcode(str)`
  * (codegen'd `JavaStringHashCode` expression) so SQL-surface users get
  * the same hash-parity primitive as the Scala API (SURVEY §4:
  * engine-level sugar belongs in the FunctionRegistry, not a custom
  * strategy).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("java_string_hashcode"),
      new ExpressionInfo(classOf[JavaStringHashCode].getName,
        "java_string_hashcode"),
      (children: Seq[Expression]) => JavaStringHashCode(children.head)))
  }
}
