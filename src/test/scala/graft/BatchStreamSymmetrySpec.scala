package graft

import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The engine's central design invariant (SURVEY §1.3): one declarative
  * transform, two execution modes. The tumbling-window aggregation over
  * the real `events` table must produce identical results via
  * `spark.read` and via `spark.readStream` (AvailableNow over the same
  * parquet).
  */
class BatchStreamSymmetrySpec extends SparkSpec {

  test("streaming replay of events.parquet == batch result for w1-style agg") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val batchEvents = Tables.events(spark, dir)

    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select($"w.start".as("w_start"), $"event_type", $"n")

    val expected = agg(batchEvents).collect().toSet

    val ckpt = java.nio.file.Files.createTempDirectory("graft_sym").toString
    // file-stream sources need a directory; stage the single parquet file
    val srcDir = java.nio.file.Files.createTempDirectory("graft_sym_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      srcDir.resolve("events.parquet"))
    val streamEvents = spark.readStream
      .schema(spark.read.parquet(s"$dir/events.parquet").schema)
      .parquet(srcDir.toString)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val q = agg(streamEvents)
      .writeStream.format("memory").queryName("sym_test")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      val got = spark.table("sym_test").collect().toSet
      assert(got == expected,
        s"stream/batch divergence: ${got.size} vs ${expected.size} rows")
    } finally q.stop()
  }
}
