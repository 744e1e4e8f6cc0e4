package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the x25 approx-boundaries swap at fixture scale (round 19,
  * r18 verdict item 5): the `percentile_approx` octile path behind
  * `spark.graft.export.approxBoundaries` is the 100 TB form — exact
  * `percentile` keeps a value map ∝ distinct quality doubles for
  * DuckDB bit-parity — and until now the swap had a spec bound
  * (ApproxBoundariesSpec) but no at-scale number. Prints one line:
  * wall for the exact vs approx manifest (warm, best of `reps`), the
  * measured shard-disagreement count between the two curriculum
  * frames, the spec's rank-error bound 7·(n/accuracy + 1) for that n,
  * and whether every mover landed in an adjacent shard.
  *
  * Round 20 (r19 verdict item 2): the probe also reports the measured
  * DISTINCT-quality count (the exact path's value-map cardinality — on
  * the standard fixture ~5k at 100×, on ScaleFixture's `x25hc` corpora
  * ∝ docs, the swap's motivating regime) and, per path, the max task
  * `peakExecutionMemory` over the timed reps — the state-size evidence
  * that distinguishes the two aggregates where wall-clock alone cannot.
  *
  * Usage: runMain graft.tools.X25ApproxProbe <sfDir> [reps]
  */
object X25ApproxProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.TextAnalytics

    val qml = new graft.QueryMetricsListener
    spark.sparkContext.addSparkListener(qml)
    def best(flag: Option[String]): Double = {
      flag match {
        case Some(v) => spark.conf.set(TextAnalytics.ApproxBoundariesKey, v)
        case None => spark.conf.unset(TextAnalytics.ApproxBoundariesKey)
      }
      // evidence the flag routed the plan (the wall numbers are only
      // meaningful if the two runs actually took different paths)
      val p = graft.SparkEntry.queries("x25_shard_manifest")(spark, sfDir)
        .queryExecution.executedPlan.toString
      val approxPlanned =
        p.contains("approx_percentile") || p.contains("percentile_approx")
      println(s"X25PLAN flag=${flag.getOrElse("unset")} " +
        s"approx_in_plan=$approxPlanned")
      qml.current = flag.fold("exact")(_ => "approx")
      val sec = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries("x25_shard_manifest")(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      graft.Bench.drainListenerBus(spark.sparkContext)
      qml.current = ""
      sec
    }
    val exactSec = best(None)
    val approxSec = best(Some("true"))
    spark.conf.unset(TextAnalytics.ApproxBoundariesKey)
    def peakOf(k: String): Long =
      Option(qml.peakMem.get(k)).map(_.longValue()).getOrElse(-1L)
    // exchange volume ∝ aggregate state: exact percentile's partial
    // buffer serializes EVERY distinct quality double through the
    // boundary agg's exchange (peakExecutionMemory cannot see the
    // ImperativeAggregate's on-heap map; the shuffle bytes can);
    // percentile_approx ships a bounded sketch
    // summed across the timed reps -> report the per-run mean
    def shufOf(k: String): Long =
      Option(qml.shuffleWrite.get(k))
        .map(_.longValue() / math.max(1, reps)).getOrElse(-1L)

    val docs = graft.core.Tables.documents(spark, sfDir)
    val e = TextAnalytics.curriculumFrameOf(docs, approx = false)
      .select(col("doc_id"), col("shard").as("shard_e"))
    val a = TextAnalytics.curriculumFrameOf(docs, approx = true)
      .select(col("doc_id"), col("shard").as("shard_a"))
    val diff = e.join(a, "doc_id")
      .agg(count(lit(1)).as("n"),
        // coalesce: an empty fixture aggregates sum/max to NULL — the
        // probe must still print its line (round-19 review)
        coalesce(sum(when(col("shard_e") =!= col("shard_a"), 1L)
          .otherwise(0L)), lit(0L)).as("moved"),
        coalesce(max(abs(col("shard_e") - col("shard_a"))), lit(0L))
          .as("max_jump"))
      .head()
    val (n, moved, maxJump) =
      (diff.getLong(0), diff.getLong(1), diff.getLong(2))
    // the spec bound is rank error <= n/accuracy per boundary, 7
    // boundaries — read the SAME accuracy the measured query used
    // (round-19 review: a hardwired 10000 printed a wrong verdict
    // whenever spark.graft.export.approxAccuracy was set)
    val accuracy = spark.conf
      .get(TextAnalytics.ApproxAccuracyKey, "10000").toDouble
    val bound = 7.0 * (n.toDouble / accuracy + 1.0)
    // the value-map cardinality: exact percentile's per-partition state
    // buffers every distinct quality double; n_distinct ≈ n is the
    // motivating regime, n_distinct << n the harmless one
    val nDistinct = docs
      .select(TextAnalytics.qualityCol(col("text")).as("q"))
      .agg(countDistinct(col("q"))).head().getLong(0)
    println(f"X25APPROX exact_sec=$exactSec%.1f approx_sec=$approxSec%.1f " +
      f"n=$n%d n_distinct_quality=$nDistinct%d " +
      f"exact_peak_task_mem=${peakOf("exact")}%d " +
      f"approx_peak_task_mem=${peakOf("approx")}%d " +
      f"exact_shuffle_bytes=${shufOf("exact")}%d " +
      f"approx_shuffle_bytes=${shufOf("approx")}%d " +
      f"moved=$moved%d bound=$bound%.0f max_jump=$maxJump%d " +
      s"within_bound=${moved <= bound} adjacent_only=${maxJump <= 1}")
    spark.stop()
  }
}
