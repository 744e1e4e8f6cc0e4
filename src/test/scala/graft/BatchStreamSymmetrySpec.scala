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
    val streamEvents = Tables.normalizeEventTs(spark.readStream
      .schema(spark.read.parquet(s"$dir/events.parquet").schema)
      .parquet(srcDir.toString))
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

  test("streaming replay of events.parquet == batch result for w3 session windows") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val batchEvents = Tables.events(spark, dir)

    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
        .agg(count(lit(1)).as("n"))
        .select($"w.start".as("w_start"), $"w.end".as("w_end"),
          $"user_id", $"n")

    val expected = agg(batchEvents).collect().toSet

    // file-source replay; a far-future SENTINEL row (its own user) pushes
    // the watermark past every real session so append mode can close and
    // emit them — the sentinel's own (still-open) session is the only row
    // filtered from the comparison
    val srcDir = java.nio.file.Files.createTempDirectory("graft_sym3_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      srcDir.resolve("events.parquet"))
    val rawDf = spark.read.parquet(s"$dir/events.parquet")
    val rawSchema = rawDf.schema
    val sentinelUser = -1L
    val sentinelStage = java.nio.file.Files
      .createTempDirectory("graft_sym3_sentinel")
    // derive the far-future sentinel from the max-ts row IN THE RAW
    // ENCODING (nano-long, NTZ, or timestamp) so the staged part file
    // round-trips through the same schema as events.parquet
    val dayAhead = rawSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr("ts + 86400000000000")   // +1 day in nanos
      case _ => expr("ts + interval 1 day")
    }
    rawDf.orderBy($"ts".desc).limit(1)
      .withColumn("ts", dayAhead)
      .withColumn("user_id", lit(sentinelUser))
      .withColumn("event_type", lit("flush"))
      .coalesce(1).write.mode("overwrite").parquet(sentinelStage.toString)
    // the file source does not recurse into the sentinel's output dir —
    // stage its part file next to events.parquet
    val part = java.nio.file.Files.list(sentinelStage).iterator()
    var staged = false
    while (part.hasNext && !staged) {
      val p = part.next()
      if (p.getFileName.toString.startsWith("part-")) {
        java.nio.file.Files.copy(p, srcDir.resolve("sentinel.parquet"))
        staged = true
      }
    }
    assert(staged, "sentinel part file not found")

    val ckpt = java.nio.file.Files.createTempDirectory("graft_sym3").toString
    val streamEvents = Tables.normalizeEventTs(spark.readStream
        .schema(rawSchema)
        .parquet(srcDir.toString))
      .withWatermark("ts", "0 seconds")
    val q = agg(streamEvents)
      .writeStream.format("memory").queryName("sym3_test")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      val got = spark.table("sym3_test")
        .filter($"user_id" =!= sentinelUser).collect().toSet
      assert(got == expected,
        s"session stream/batch divergence: ${got.size} vs ${expected.size} rows")
    } finally q.stop()
  }
}
