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

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
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
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    normalizeEventTs(raw)
  }

  /** Normalize an events-shaped frame's `ts` column to TIMESTAMP
    * regardless of how the parquet encoding surfaced it. Public so
    * specs exercise the same path as production readers.
    */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      case LongType =>
        // integer `div`, not `/`: double division loses precision on
        // nano-epoch magnitudes (2^60 > 2^53 mantissa)
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        // UTC session ⇒ wall-clock == instant; cast is lossless
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
