package graft.tools

/** Post-execution plan reader: runs the named queries (count) and prints
  * the AQE FINAL physical plan — the one that actually executed, with
  * ReusedExchange/ReusedSubquery nodes resolved. `graft.Explain` prints
  * the static plan, which under AQE hides runtime exchange reuse; this
  * is the tool for "did those two identical subtrees really both run?".
  *
  * Usage: runMain graft.tools.RunExplain [sfDir] <query ...>
  */
object RunExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-run-explain")
    names.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      df.collect() // execute THIS queryExecution so AQE finalizes it
      println(s"===== $q (executed) =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
