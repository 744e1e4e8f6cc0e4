package graft

import java.nio.file.Files

import graft.pipelines.ReferencePipelines
import org.apache.spark.sql.streaming.Trigger

/** S1-streaming: the same wordCount transform runs over a file-stream
  * source (`readStream.text` + AvailableNow), demonstrating the
  * batch/stream symmetry contract of the pipeline library.
  */
class StreamingSourceSpec extends SparkSpec {

  test("file-stream text source drives the identical wordCount transform") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_stream_src")
    Files.write(dir.resolve("a.txt"), "to be or not to be".getBytes)
    Files.write(dir.resolve("b.txt"), "be quick".getBytes)
    val ckpt = Files.createTempDirectory("graft_ckpt").toString

    val lines = spark.readStream.text(dir.toString).as[String]
    val q = ReferencePipelines.wordCount(lines)
      .writeStream.format("memory").queryName("stream_wc")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val counts = spark.table("stream_wc").as[(String, Long)].collect().toMap
      assert(counts == Map("to" -> 2L, "be" -> 3L, "or" -> 1L, "not" -> 1L,
        "quick" -> 1L))
    } finally q.stop()
  }
}
