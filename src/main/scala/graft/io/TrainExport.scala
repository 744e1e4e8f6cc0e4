package graft.io

import graft.queries.TextAnalytics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Deterministic curriculum training-data export — the "last mile" of a
  * pretraining pipeline: the curated corpus laid out as quality-ordered
  * shards a trainer can stream in difficulty order, plus a manifest the
  * resumed/re-run export is verified against.
  *
  * Layout: `dir/shard=K/` parquet partitions, K = quality octile from
  * `TextAnalytics.curriculumFrame` (the `x25_shard_manifest` contract);
  * within a shard rows are ordered (quality, doc_id) ascending.
  *
  * Determinism at scale: the shuffle keys on the SHARD alone, so every
  * row of a shard lands in one task (hash collisions between shard keys
  * merely co-locate two shards in a task — they still write separate
  * `shard=K` directories); `sortWithinPartitions` fixes the row order,
  * so a re-run produces an identical row sequence per shard and the
  * manifest's order-insensitive Σ knuthHash(doc_id) checksum can vouch
  * for a resume. At 100 TB the shard count scales with the corpus (the
  * 8-octile toy here is the oracle-checked shape); the export is ONE
  * shuffle + an ordered write — no global sort, no driver collect of
  * anything unbounded (the manifest is 8 rows).
  */
object TrainExport {

  /** Export `sfDir`'s documents as quality-octile curriculum shards
    * under `outDir` and write `outDir/_manifest.json` (underscore
    * prefix: invisible to Spark's file index, like `_SUCCESS`, so the
    * export root stays whole-dir readable). Returns the
    * 8-row manifest frame (shard, n_docs, n_tokens, q_min, q_max,
    * id_checksum).
    */
  def exportCurriculum(spark: SparkSession, sfDir: String,
      outDir: String): DataFrame =
    exportFrame(TextAnalytics.curriculumFrame(spark, sfDir), outDir)

  /** Export an arbitrary curated docs frame (doc_id, lang, source,
    * text) — octile shards re-balance over the GIVEN corpus (the
    * curation pipeline's last stage).
    */
  def exportCurated(docs: DataFrame, outDir: String): DataFrame =
    exportFrame(TextAnalytics.curriculumFrameOf(docs), outDir)

  private def exportFrame(frame: DataFrame, outDir: String): DataFrame = {
    frame
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("quality"), col("doc_id"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    // The manifest derives from the parquet JUST WRITTEN, not from
    // `frame`: re-evaluating the curriculum plan for the manifest would
    // re-pay the corpus scan + exact-percentile aggregate a second time
    // (advisor r8 — this is what makes the "ONE shuffle" contract above
    // actually hold), and reading the files back means the manifest
    // vouches for what is ON DISK, not what a recompute would produce.
    // (`shard` comes back as a partition-discovery int — re-widen it.)
    val back = frame.sparkSession.read.parquet(outDir)
      .withColumn("shard", col("shard").cast("long"))
    val manifest = TextAnalytics.shardManifest(back)
    val rows = manifest.orderBy(col("shard")).collect() // 8 rows, bounded
    val json = rows.map { r =>
      s"""{"shard":${r.getLong(0)},"n_docs":${r.getLong(1)},""" +
        s""""n_tokens":${r.getLong(2)},"q_min":${r.getDouble(3)},""" +
        s""""q_max":${r.getDouble(4)},"id_checksum":${r.getLong(5)}}"""
    }.mkString("[", ",", "]")
    Files.writeString(Paths.get(outDir, "_manifest.json"), json)
    manifest
  }
}
