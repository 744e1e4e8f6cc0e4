package graft

/** Plan-inspection tool: prints the formatted physical plan of the named
  * queries (default: the headline set) against an sf dir. Used to audit
  * the scale contract — PushedFilters reaching the parquet scan, pruned
  * ReadSchema, broadcast joins on dim sides, WholeStageCodegen spans.
  *
  * Usage: runMain graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg", "q3_shipping", "q5_nation_revenue", "j1_left_outer",
        "t1_topk_per_key", "p6_filter_project",
        "d12_ngram_novelty", "d13_chunk_dedup", "v10_sign_projection",
        "p20_weighted_sample", "x13_source_divergence",
        "x14_unigram_logprob", "j10_funnel", "d15_source_cap",
        "d22_snapshot_diff", "d23_source_overlap", "d24_normalized_dedup",
        "x24_pii_scrub", "x25_shard_manifest", "x26_gopher_rules",
        "j11_bm25", "x22_zipf_slope",
        // session-2 additions worth a plan read: the pin consumers and
        // the maintenance-loop queries
        "v18_cluster_sample", "v19_ivf_increment", "v20_cell_drift",
        "d33_effective_tokens", "d34_incremental_components",
        "d35_dedup_audit", "p23_retention_cohorts", "x33_oov_rate")
    val spark = graft.core.GraftSession.local(8, "graft-explain")
    names.foreach { q =>
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
