package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join WITHOUT an equi key, as a binned
  * equi-join.
  *
  * Spark plans a pure inequality join as BroadcastNestedLoopJoin —
  * O(points × intervals) and a driver-memory hazard. The standard fix:
  * quantize time into fixed bins, explode each interval onto every bin
  * it overlaps, map each point to its single bin, equi-join on the bin,
  * then filter exact containment. The shuffle is keyed on the bin, cost
  * ∝ points + intervals × (avg interval length / bin width) + true
  * matches; each (point, interval) pair meets in exactly one bin (the
  * point's), so no post-join dedup is needed.
  *
  * Interval semantics are [start, end): a point exactly at `end` does
  * not match — the convention of `session_window` ends.
  */
object RangeJoin {

  /** @param binWidthSec bin quantum; tune toward typical interval length
    *                    (too small → interval rows explode wide, too
    *                    large → more false candidates filtered post-join).
    */
  def pointInInterval(points: DataFrame, tsCol: String,
                      intervals: DataFrame, startCol: String,
                      endCol: String, binWidthSec: Long): DataFrame = {
    val w = binWidthSec * 1000000L // micros
    // integer `div`, never `/`: double division of epoch-micros can land
    // a hair under the bin boundary and floor into the wrong bin.
    // Empty/inverted intervals (end <= start) match nothing and are
    // dropped BEFORE the bin explode — Spark's sequence() DESCENDS when
    // start > stop, so one dirty interval row would otherwise explode
    // into an arbitrarily long bin array.
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_bin", explode(sequence(
        expr(s"unix_micros($startCol) div ${w}L"),
        expr(s"(unix_micros($endCol) - 1) div ${w}L"))))
    val pt = points.withColumn("_bin", expr(s"unix_micros($tsCol) div ${w}L"))
    pt.join(iv, Seq("_bin"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("_bin")
  }
}
