package graft

import graft.io.TrainExport
import graft.queries.TextAnalytics
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The curriculum export writer: layout, manifest parity with the x25
  * oracle query, within-shard ordering, and re-run determinism.
  */
class TrainExportSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("export writes octile shards whose manifest matches x25; ordered; deterministic") {
    import spark.implicits._
    val out1 = Files.createTempDirectory("train-export-1").toString
    val out2 = Files.createTempDirectory("train-export-2").toString
    val m1 = TrainExport.exportCurriculum(spark, sfDir, out1)

    // manifest parity: the writer's returned frame IS the x25 query
    val expected = SparkEntry.queries("x25_shard_manifest")(spark, sfDir)
      .orderBy($"shard").collect().toSeq
    assert(m1.orderBy($"shard").collect().toSeq == expected)
    assert(Files.exists(java.nio.file.Paths.get(out1, "_manifest.json")))

    // every doc lands in exactly one shard; totals survive the round-trip
    val back = spark.read.parquet(out1)
    val nDocs = TextAnalytics.curriculumFrame(spark, sfDir).count()
    assert(back.count() == nDocs)
    val perShard = back.groupBy($"shard".cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_toks").as("n_tokens"),
        sum(graft.functions.HashFunctions.knuthHash($"doc_id"))
          .as("id_checksum"))
      .orderBy($"shard")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val expShard = expected
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(perShard == expShard)

    // within-shard curriculum order: each shard file is (quality, doc_id)
    // ascending (single file per shard at this size — one task per shard)
    val shards = back.select($"shard".cast("long")).distinct()
      .as[Long].collect().sorted
    assert(shards.length == 8)
    shards.foreach { k =>
      val rows = spark.read.parquet(s"$out1/shard=$k")
        .select($"quality", $"doc_id").as[(Double, Long)].collect()
      assert(rows.nonEmpty)
      rows.sliding(2).foreach {
        case Array((q1, d1), (q2, d2)) =>
          assert(q1 < q2 || (q1 == q2 && d1 < d2),
            s"shard $k not in (quality, doc_id) order")
        case _ =>
      }
    }

    // re-run determinism: identical per-shard row sequences
    TrainExport.exportCurriculum(spark, sfDir, out2)
    shards.foreach { k =>
      val a = spark.read.parquet(s"$out1/shard=$k")
        .select($"doc_id").as[Long].collect().toSeq
      val b = spark.read.parquet(s"$out2/shard=$k")
        .select($"doc_id").as[Long].collect().toSeq
      assert(a == b, s"shard $k row sequence differs across re-runs")
    }
  }
}
