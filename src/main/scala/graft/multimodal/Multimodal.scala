package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns + typed metadata, with decode / feature-extract / resize /
  * frame-sample as per-partition batch transforms.
  *
  * The Spark-side shape is the real thing — schema, partitioning, and
  * batched per-partition execution mirror how a Pandas-UDF/`mapInPandas`
  * (or Scala `mapPartitions`, used here) media pipeline runs at scale:
  * one task per input split, codec state initialized once per partition
  * (not per row), output rows streamed. The codec itself is STUBBED with
  * a deterministic fake (`FakeCodec`) because no image/audio libraries
  * ship in this environment — swap `FakeCodec` for a real decoder
  * without touching any of the distributed plumbing.
  */
object Multimodal {

  /** Typed media record: opaque payload + metadata (the schema a media
    * lakehouse table would carry alongside parquet binary columns).
    */
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte],
                         width: Int, height: Int, durationMs: Long)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           checksum: Long, feature: Array[Float])

  case class Frame(media_id: Long, frameIndex: Int, tsMs: Long,
                   thumbnail: Array[Byte])

  /** STUB decoder — deterministic pure function of the payload bytes.
    * Real implementation decodes image/audio; the contract (bytes in,
    * fixed-dim feature out) is what the pipeline depends on.
    */
  object FakeCodec {
    def checksum(payload: Array[Byte]): Long =
      payload.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) & 0xffffffffL)

    /** 8-dim "embedding": byte histogram folded to 8 buckets, L1-normed. */
    def feature(payload: Array[Byte]): Array[Float] = {
      val buckets = new Array[Long](8)
      payload.foreach(b => buckets((b & 0xff) % 8) += 1)
      val total = math.max(1L, payload.length.toLong)
      buckets.map(c => c.toFloat / total)
    }

    /** "Resize": deterministic subsample of the payload to n bytes. */
    def resize(payload: Array[Byte], n: Int): Array[Byte] =
      if (payload.isEmpty) payload
      else Array.tabulate(math.min(n, payload.length))(i =>
        payload((i.toLong * payload.length / math.min(n, payload.length)).toInt))
  }

  /** Build a deterministic media table (test fixture — stands in for a
    * parquet table of real media blobs).
    */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val payload = Array.tabulate[Byte](64 + (i % 64).toInt)(j =>
        ((i * 131 + j * 17) % 251).toByte)
      MediaRecord(i, kind, payload, width = 16 + (i % 16).toInt,
        height = 16, durationMs = 1000L * (1 + i % 30))
    }
  }

  /** Decode + feature-extract, one codec per partition, batch-streamed.
    * At scale: repartition by size/kind upstream so partitions are
    * balanced; the codec init cost amortizes across the partition.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init point (real codec: open decoder once here)
      it.map { m =>
        MediaFeatures(m.media_id, m.kind, m.payload.length.toLong,
          FakeCodec.checksum(m.payload), FakeCodec.feature(m.payload))
      }
    }
  }

  /** Frame-sample videos: 1 row per sampled frame (explode-shaped 1→N,
    * like the reference's lane explode P14 but over media).
    */
  def sampleFrames(media: Dataset[MediaRecord], everyMs: Long): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      (0L until m.durationMs by everyMs).zipWithIndex.map { case (ts, idx) =>
        Frame(m.media_id, idx, ts, FakeCodec.resize(m.payload, 16))
      }
    }
  }

  /** Aggregate features per kind — downstream of decode, pure DataFrame. */
  def featureStats(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF()
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        avg(element_at(col("feature"), 1)).as("mean_f0"))
}
