package graft.tools

import org.apache.spark.sql.functions._

/** One-off stage-cost probe for the shared pair-gen subplan (the dedup
  * family's most expensive frame): times the scan+fused-shingle pass,
  * the exploded shingle frame, the blocked self-join pair aggregation,
  * and the CC fixpoint separately so optimization effort lands on the
  * measured hot stage instead of the guessed one.
  *
  * Usage: runMain graft.tools.PairGenProbe [sfDir]
  */
object PairGenProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(32, "graft-pairgen-probe")
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"probe,$label,${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }

    val docs = graft.core.Tables.documents(spark, dir)
    // warmup: scan + codegen
    docs.count()

    val nDocs = time("scan_count")(docs.count())
    val shingles = docs.select($"doc_id",
      graft.functions.HashedShinglesExpr.hashedShingles($"text", 3).as("arr"))
    val nSh = time("shingle_arrays")(
      shingles.agg(sum(size($"arr"))).as[Long].head())
    val exploded = shingles.select($"doc_id",
      size($"arr").cast("long").as("n_sh"), explode($"arr").as("shingle"))
    val nEx = time("explode_count")(exploded.count())
    val maxDf = time("max_shingle_df")(
      exploded.groupBy($"shingle").agg(count(lit(1)).as("df"))
        .agg(max($"df")).as[Long].head())
    val emitted = time("emitted_volume")(
      exploded.groupBy($"shingle").agg(count(lit(1)).as("df"))
        .agg(sum(($"df" * ($"df" - 1)).cast("long") / lit(2L)).cast("long"))
        .as[Long].head())
    // mirrors the production pairAgg shape (group-emit, Dedup.pairAgg)
    val pairs = time("pair_stats") {
      exploded.groupBy($"shingle")
        .agg(collect_list(struct($"doc_id", $"n_sh")).as("docs"))
        .select(explode($"docs").as("a"), $"docs")
        .select($"a", explode($"docs").as("b"))
        .where($"a.doc_id" < $"b.doc_id")
        .groupBy($"a.doc_id".as("doc_i"), $"b.doc_id".as("doc_j"))
        .agg(count(lit(1)).as("n_common"))
        .count()
    }
    println(s"probe,n_emitted,$emitted")
    println(s"probe,n_docs,$nDocs")
    println(s"probe,n_shingles,$nSh")
    println(s"probe,n_exploded,$nEx")
    println(s"probe,max_df,$maxDf")
    println(s"probe,n_pairs,$pairs")
    spark.stop()
  }
}
