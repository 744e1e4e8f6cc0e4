package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** File sources/sinks (SURVEY §2.1 S1-S4, S10).
  *
  * Scale notes: text reads are splittable scans (Spark assigns file
  * splits to tasks — no per-file driver loop); the multi-file keyed read
  * is ONE scan with `input_file_name()`, not N reads + union (reference
  * did per-URI reads + Flatten, `TfIdf.scala:151-181` — that shape is a
  * driver bottleneck at 100k files). Windowed writes go through
  * `partitionBy`, so each window lands in its own directory exactly like
  * the reference's per-window `FilenamePolicy` (`WriteOneFilePerWindow`).
  */
object TextIO {

  /** S1: read text lines. */
  def readLines(spark: SparkSession, path: String): Dataset[String] =
    spark.read.textFile(path)

  /** S10: read a directory of text files keyed by source file URI —
    * (uri, line) pairs from a single scan.
    */
  def readLinesKeyedByFile(spark: SparkSession, path: String): DataFrame =
    spark.read.textFile(path)
      .withColumn("uri", input_file_name())
      .select(col("uri"), col("value").as("line"))

  /** S2: write lines as sharded text files (`shards` = output file count;
    * the reference's `withNumShards`, `WriteToText.scala:91`).
    */
  def writeLines(ds: Dataset[String], dir: String, shards: Int = 1): Unit =
    ds.repartition(shards).write.mode("overwrite").text(dir)

  /** S3: CSV-formatted write / read with explicit schema (reference
    * `TfIdf.scala:386-393` writes CSV text; schema-on-read is explicit —
    * no runtime inference pass over 100 TB).
    */
  def writeCsv(df: DataFrame, dir: String, shards: Int = 1): Unit =
    df.repartition(shards).write.mode("overwrite").option("header", "true").csv(dir)

  def readCsv(spark: SparkSession, dir: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(dir)

  /** S4 batch: one output directory per window — `partitionBy` on the
    * window-start column (reference windowed `FilenamePolicy`,
    * `WriteOneFilePerWindow.java:46-116`).
    */
  def writeWindowedText(df: DataFrame, windowStartCol: String, dir: String,
                        shards: Int = 1): Unit =
    df.repartition(shards)
      .write.mode("overwrite")
      .partitionBy(windowStartCol)
      .text(dir)

  /** S4 streaming: per-window directories via foreachBatch + partitionBy
    * (append as windows close under the watermark).
    */
  def windowedTextSink(df: DataFrame, windowStartCol: String,
                       dir: String, checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").partitionBy(windowStartCol).text(dir)
      }
}

/** S12: deterministic stand-in for the reference's Pub/Sub Injector
  * (`Injector.java:85-88,146-155`): synthetic keyed score events with
  * controlled lateness — every `lateEvery`-th event is delayed by
  * `delayMs`. Pure function of the index → reproducible fixtures for
  * watermark/trigger tests (no RNG, no wall clock).
  */
object Injector {
  case class Event(key: String, score: Long, eventTimeMs: Long, arrivalMs: Long)

  def events(n: Int, keys: Seq[String], baseMs: Long, stepMs: Long,
             lateEvery: Int, delayMs: Long): Seq[Event] =
    (0 until n).map { i =>
      val arrival = baseMs + i.toLong * stepMs
      val late = lateEvery > 0 && i % lateEvery == lateEvery - 1
      Injector.Event(
        keys(i % keys.size),
        score = (i % 7) + 1L,
        eventTimeMs = if (late) arrival - delayMs else arrival,
        arrivalMs = arrival)
    }
}
