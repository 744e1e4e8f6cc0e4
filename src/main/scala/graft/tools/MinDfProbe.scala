package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Planted-vocab measurement for the x16 `graft.x16.minDf` tail-prune
  * lever (round-16 verdict item 7). The driver fixtures have a tiny
  * closed vocabulary (931 distinct bigrams at 10× — verbatim copies
  * multiply instances, not vocab), so the lever's target — a Zipf-tail
  * bigram vocab that dwarfs its head — has to be PLANTED: docs draw
  * from a ~300k-word power-law vocabulary, giving millions of distinct
  * bigrams with a df=1-dominated tail. Prints the stats-side row
  * volumes and warm scoring-eval times, exact vs pruned (same session,
  * same pinned count frames — only the scoring join differs). The
  * committed numbers are in SCALE.md (round 17).
  *
  * Usage: runMain graft.tools.MinDfProbe [nDocs] [minDf]
  */
object MinDfProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 200000
    val minDf = if (args.length > 1) args(1).toLong else 4L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = spark.range(nDocs.toLong).map { id =>
      var s = id * 0x9e3779b97f4a7c15L + 11L
      def next(): Long = {
        s = (s ^ (s >>> 30)) * 0xbf58476d1ce4e5b9L
        s = (s ^ (s >>> 27)) * 0x94d049bb133111ebL
        s ^ (s >>> 31)
      }
      val toks = (0 until 60).map { _ =>
        val u = ((next() >>> 11).toDouble / (1L << 53).toDouble)
        s"w${(u * u * u * 300000).toInt}" // Zipf-ish power-law tail
      }
      (id, toks.mkString(" "))
    }.toDF("doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    def timeEval(label: String): Double = {
      val t0 = System.nanoTime()
      graft.queries.TextAnalytics.bigramLogprob(docs).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"MINDF $label%-16s sec=$sec%.2f")
      sec
    }
    timeEval("warm-pins") // builds the shared count/stats pins
    timeEval("exact#1"); timeEval("exact#2")
    spark.conf.set("graft.x16.minDf", minDf.toString)
    timeEval(s"pruned($minDf)#1"); timeEval(s"pruned($minDf)#2")
    spark.conf.unset("graft.x16.minDf")
    // stats-side volumes: full vocab vs the surviving head
    val stats = graft.queries.TextAnalytics.sharedBigramStats(docs)
    val full = stats.count()
    val head = stats.filter($"c12" >= minDf).count()
    println(s"MINDF vocab_rows=$full head_rows=$head " +
      f"head_frac=${head.toDouble / full}%.4f")
    spark.stop()
  }
}
