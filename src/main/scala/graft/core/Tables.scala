package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated TPC-H-ish tables (TESTDATA.md).
  *
  * Each is a plain parquet scan; Catalyst pushes projections and filters
  * into the scan, so callers should NOT pre-select columns here — declare
  * the query and let column pruning reach the reader.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(table(spark, dir, "lineitem"), "l_shipdate")
  def orders(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(table(spark, dir, "orders"), "o_orderdate")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** The events table's `ts` column has arrived in three physical parquet
    * encodings across fixture generations: TIMESTAMP(NANOS) (read as
    * nano-epoch long under `spark.sql.legacy.parquet.nanosAsLong`),
    * plain-micros TIMESTAMP without isAdjustedToUTC (read as
    * TIMESTAMP_NTZ), and proper TIMESTAMP. Normalize all three to
    * session-TZ TIMESTAMP here so downstream `unix_micros`/window logic
    * is encoding-agnostic. Sessions pin UTC, so the NTZ cast is
    * instant-preserving and matches DuckDB's reading of the same file.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventTs(table(spark, dir, "events"))

  /** Normalize an events-shaped frame's `ts` column to TIMESTAMP
    * regardless of how the parquet encoding surfaced it. Public so
    * specs exercise the same path as production readers.
    */
  def normalizeEventTs(raw: DataFrame): DataFrame = normalizeTs(raw, "ts")

  /** Normalize one timestamp column to session-TZ TIMESTAMP whatever
    * its physical parquet encoding surfaced as — applied by every
    * reader with a time column (events.ts, lineitem.l_shipdate,
    * orders.o_orderdate), so query code never branches on encoding.
    */
  def normalizeTs(raw: DataFrame, colName: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    import org.apache.spark.sql.functions.{col, expr}
    raw.schema(colName).dataType match {
      case LongType =>
        // nano-epoch long (nanosAsLong legacy read); integer `div`, not
        // `/`: double division loses precision on nano-epoch magnitudes
        // (2^60 > 2^53 mantissa)
        raw.withColumn(colName,
          expr(s"timestamp_micros($colName div 1000)"))
      case TimestampNTZType =>
        // UTC session ⇒ wall-clock == instant; cast is lossless
        raw.withColumn(colName, col(colName).cast("timestamp"))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
