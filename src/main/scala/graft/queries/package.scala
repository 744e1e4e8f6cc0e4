package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {

  /** A named engine query: (session, sf-dir) -> result frame.
    * Each corresponds to one SURVEY §2 operator row (or a training-data
    * pipeline op) and is paired with a DuckDB oracle where SQL-expressible.
    */
  type Q = (SparkSession, String) => DataFrame

  /** Oracle-parity note: floating-point SUMs are order-dependent, so any
    * summed measure is accumulated exactly (decimal/integer) and converted
    * to double only at the end; per-row double arithmetic is IEEE-identical
    * across engines and needs no such care.
    */
  trait QueryModule {
    def queries: Map[String, Q]
    def oracle: Map[String, String]
  }
}
