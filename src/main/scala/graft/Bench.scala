package graft
import java.util.Locale
import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen + parquet footers for every table family
    Seq("q1_agg", "p1_wordcount", "w1_tumbling", "a5_max_per_key",
        "j1_left_outer", "v2_lsh_buckets").foreach { q =>
      try SparkEntry.queries(q)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    // (name, seconds, succeeded). A failing query is reported as -1 and
    // listed in "failed" — never silently folded into the total.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case _: Throwable => false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    def f3(v: Double): String = "%.3f".formatLocal(Locale.ROOT, v)
    val qs = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) f3(v) else "-1")
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    // ONE short JSON line. stdout gets sbt's "[info] " prefix, which
    // breaks strict JSON parsing — emit on stderr too (un-prefixed under
    // `sbt runMain`) so machine consumers get a clean line; stdout stays
    // for tail-scrapers.
    val json = s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(json)
    System.err.println(json)
    spark.stop()
  }
}
