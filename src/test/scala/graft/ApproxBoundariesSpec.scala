package graft

import graft.queries.TextAnalytics
import org.apache.spark.sql.functions._

/** x25's bounded-state boundary path, proven (round-10 verdict item 2):
  * `percentile_approx` octile boundaries behind
  * `spark.graft.export.approxBoundaries` must assign (almost) every
  * document to the same curriculum shard as the exact-percentile
  * default — only documents inside a boundary's rank-error band
  * (≤ n/accuracy ranks per boundary, 7 boundaries) may move, and then
  * only to an ADJACENT shard.
  */
class ApproxBoundariesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("approx octile boundaries: shard agreement within the accuracy bound") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, dir)
    val exact = TextAnalytics.curriculumFrameOf(docs, approx = false)
      .select($"doc_id", $"shard".as("shard_e"))
    val approx = TextAnalytics.curriculumFrameOf(docs, approx = true)
      .select($"doc_id", $"shard".as("shard_a"))
    val joined = exact.join(approx, "doc_id")
      .select($"doc_id", $"shard_e", $"shard_a").collect()
    val n = joined.length
    assert(n == docs.count())
    val moved = joined.filter(r => r.getLong(1) != r.getLong(2))
    // rank error ≤ n/accuracy per boundary; with accuracy=10000 and
    // n=5000 the sketch is rank-exact, so the only movers are docs
    // between the exact INTERPOLATED boundary and the nearest data
    // value percentile_approx returns — at most ~1 doc per boundary
    val bound = 7.0 * (n.toDouble / 10000.0 + 1.0)
    assert(moved.length <= bound,
      s"${moved.length} of $n docs changed shard (bound $bound)")
    // any mover lands in an adjacent shard, never skips one
    assert(moved.forall(r => math.abs(r.getLong(1) - r.getLong(2)) == 1),
      "approx boundaries may only shift a doc to an adjacent shard")
  }

  test("conf flag routes the x25 query through percentile_approx") {
    try {
      spark.conf.set(TextAnalytics.ApproxBoundariesKey, "true")
      val p = SparkEntry.queries("x25_shard_manifest")(spark, dir)
        .queryExecution.executedPlan.toString
      assert(p.contains("approx_percentile") || p.contains("percentile_approx"),
        s"x25 must plan the bounded-state sketch under the flag:\n$p")
    } finally spark.conf.unset(TextAnalytics.ApproxBoundariesKey)
    val pd = SparkEntry.queries("x25_shard_manifest")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!pd.contains("approx_percentile") && !pd.contains("percentile_approx"),
      "default (oracle) path must stay exact")
  }
}
