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
    * `compression` (gzip | none — any Hadoop codec name works) matters
    * at corpus scale: 100 TB text ships compressed, and Spark's text
    * source decompresses transparently on read, so the READ path is the
    * same `readLines` either way. gzip is non-splittable (one task per
    * file on read) — size shards so a single compressed file stays a
    * sane task, the standard sharded-corpus layout.
    */
  def writeLines(ds: Dataset[String], dir: String, shards: Int = 1,
                 compression: String = "none"): Unit =
    ds.repartition(shards).write.mode("overwrite")
      .option("compression", compression).text(dir)

  /** S3: CSV-formatted write / read with explicit schema (reference
    * `TfIdf.scala:386-393` writes CSV text; schema-on-read is explicit —
    * no runtime inference pass over 100 TB).
    */
  def writeCsv(df: DataFrame, dir: String, shards: Int = 1): Unit =
    df.repartition(shards).write.mode("overwrite").option("header", "true").csv(dir)

  def readCsv(spark: SparkSession, dir: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(dir)

  /** JSONL (one JSON object per line) corpus ingest — the standard
    * training-data interchange format. PERMISSIVE mode with an explicit
    * `_corrupt` column: malformed lines survive as a corrupt-record row
    * instead of failing the job (the P13 tolerant-parse policy applied
    * to the IO layer), so a 100 TB crawl drop with a few bad shards
    * still loads; callers split on `_corrupt IS NULL` and count the
    * rejects (`jsonlRejects`). The schema is caller-supplied — schema
    * inference would be a second full pass over the data.
    */
  def readJsonl(spark: SparkSession, dir: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(dir)

  /** Writes one JSON object per line (sharded like [[writeLines]]). */
  def writeJsonl(df: DataFrame, dir: String, shards: Int = 1): Unit =
    df.repartition(shards).write.mode("overwrite").json(dir)

  /** The reject count for a [[readJsonl]] directory (a P5-style
    * counter). Spark forbids querying ONLY the corrupt column off the
    * native json source (it would prune the scan to nothing), and
    * caching a 100 TB frame just to count rejects is not a plan — so
    * this is one independent codegen'd text scan + `from_json` with the
    * same corrupt-record contract as [[readJsonl]].
    */
  def jsonlRejects(spark: SparkSession, dir: String,
                   schema: org.apache.spark.sql.types.StructType): Long = {
    import org.apache.spark.sql.functions._
    spark.read.text(dir)
      .select(from_json(col("value"), schema.add("_corrupt", "string"),
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt")).as("r"))
      .filter(col("r._corrupt").isNotNull)
      .count()
  }

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

  /** S4 with the reference's exact FILENAME policy
    * (`WriteOneFilePerWindow.java:85-110`): flat files named
    * `{prefix}-{HH:mm winStart}-{HH:mm winEnd}-{shard}-of-{numShards}`.
    *
    * Input df: (`w_start` timestamp, `w_end` timestamp, `value` string).
    * The data pass is fully distributed — one shuffle keyed on
    * (window, shard) then a partitioned text write; the renames that
    * flatten Spark's `dir/part-*` layout into the reference's filenames
    * are driver-side METADATA ops, O(#windows · shards) per call and
    * independent of data volume (cheap on HDFS; on object stores rename
    * is copy — keep the directory layout (`writeWindowedText`) there).
    * Shards with no rows produce no file, so a sparse window yields
    * fewer than `shards` files (N in `-of-N` is the actual file count,
    * exactly like Beam runners that drop empty shards).
    */
  def writeOneFilePerWindow(df: DataFrame, dir: String, prefix: String,
                            shards: Int = 1): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = df.sparkSession
    val outDir = new Path(dir)
    val staging = new Path(outDir, s".staging-${java.util.UUID.randomUUID}")
    df.select(date_format(col("w_start"), "HH:mm").as("ws"),
        date_format(col("w_end"), "HH:mm").as("we"), col("value"))
      .repartition(col("ws"), col("we"),
        pmod(hash(col("value")), lit(math.max(shards, 1))))
      .write.mode("overwrite").partitionBy("ws", "we").text(staging.toString)
    val fs = outDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // The local ChecksumFileSystem derives ".<name>.crc" sibling Paths
    // during rename, which re-trips Path's colon-as-scheme parsing; the
    // raw FS renames the data file only (stale staging crcs are deleted
    // with the staging dir).
    val renFs = fs match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case other => other
    }
    fs.mkdirs(outDir)
    def decode(part: String): String = // "ws=00%3A10" → "00:10"
      java.net.URLDecoder.decode(part.split("=", 2)(1), "UTF-8")
    // ONE listing of the destination for the whole call — a per-window
    // listStatus would make this metadata pass O(windows × dir entries)
    val existing = fs.listStatus(outDir).map(_.getPath)
    for (wsDir <- fs.listStatus(staging) if wsDir.getPath.getName.startsWith("ws=");
         weDir <- fs.listStatus(wsDir.getPath) if weDir.getPath.getName.startsWith("we=")) {
      val ws = decode(wsDir.getPath.getName)
      val we = decode(weDir.getPath.getName)
      // Re-running into the same dir must OVERWRITE a window's previous
      // file set (reference sink semantics): stale `prefix-ws-we-*` files
      // would otherwise fail the first rename and leave old/new output
      // mixed. Only windows present in THIS write are cleared.
      // raw FS: ChecksumFileSystem.delete derives a ".crc" sibling Path
      // that re-trips colon-as-scheme parsing (outputs have no crc — the
      // raw rename below never creates one)
      existing
        .filter(_.getName.startsWith(s"$prefix-$ws-$we-"))
        .foreach(p => renFs.delete(p, false))
      val parts = fs.listStatus(weDir.getPath)
        .filter(_.getPath.getName.startsWith("part-"))
        .sortBy(_.getPath.getName)
      parts.zipWithIndex.foreach { case (p, i) =>
        // Path(parent, child) parses a ':' in the child as a URI scheme;
        // a scheme-less URI keeps the reference's HH:mm filename intact
        // (legal on POSIX/local FS; object stores allow ':' too).
        val base = fs.makeQualified(outDir).toUri.getPath
        val dest = new Path(new java.net.URI(
          null, null, s"$base/$prefix-$ws-$we-$i-of-${parts.length}", null))
        // HDFS rename returns false (no throw) when e.g. the destination
        // already exists; staging is deleted below, so an unchecked false
        // would silently discard this part's rows.
        if (!renFs.rename(p.getPath, dest))
          throw new java.io.IOException(
            s"windowed sink: rename ${p.getPath} -> $dest failed " +
              "(destination exists?); staging retained")
      }
    }
    fs.delete(staging, true)
    ()
  }

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
