package graft.tools
import org.apache.spark.sql.functions._
/** One-off: band-collision candidate counts at 10x vs 100x. */
object BandProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32, "graft-band-probe")
    args.foreach { dir =>
      val t0 = System.nanoTime()
      val pairs = graft.queries.Dedup.lshVerifiedPairs(spark, dir)
      val nVerified = pairs.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"bandprobe,$dir,verified=$nVerified,sec=$sec%.2f")
    }
    spark.stop()
  }
}
