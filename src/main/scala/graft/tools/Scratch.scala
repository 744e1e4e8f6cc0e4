package graft.tools

import org.apache.spark.sql.SparkSession

// throwaway diagnostic main — not committed
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    def timed(name: String): Unit = {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      println(f"$name%-28s build=${(t1 - t0) / 1e9}%.3f " +
        f"count1=${(t2 - t1) / 1e9}%.3f count2=${(t3 - t2) / 1e9}%.3f")
      val p = df.queryExecution.executedPlan.toString
      println(s"  $name IMTS=" +
        "InMemoryTableScan".r.findAllIn(p).size)
    }
    def storage(tag: String): Unit = {
      val infos = spark.sparkContext.getRDDStorageInfo
      println(s"--- storage after $tag: ${infos.length} cached RDDs")
      infos.foreach(i => println(
        s"    rdd=${i.id} name=${i.name} cached=${i.numCachedPartitions}/" +
          s"${i.numPartitions} mem=${i.memSize} disk=${i.diskSize}"))
    }
    timed("d20_dup_pagerank")
    storage("d20")
    timed("d3_lsh_pairs")
    spark.stop()
  }
}
