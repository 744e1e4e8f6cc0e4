package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group running totals WITHOUT a single-partition window —
  * the two-phase distributed prefix sum.
  *
  * A plain `Window.partitionBy(group).orderBy(order)` running sum puts
  * each whole group on ONE task: at 100 TB a 20-source corpus would run
  * 20 sequential scans. Here the caller supplies a `shard` column that is
  * MONOTONE NON-DECREASING in the order column within each group
  * (canonically: the high bits of the order value, e.g.
  * `order div ceil(range/shards)`), which makes (shard, order) ordering
  * identical to global order. Phase 1 computes per-(group, shard) local
  * window cumsums in parallel; phase 2 aggregates one total per
  * (group, shard) — a tiny frame, groups × shards rows — lifts it to
  * per-shard offsets with a window over ≤`shards` rows per group, and
  * joins the offsets back. offset + local cumsum = the exact global
  * running total, for any shard count (the count cancels out — proven by
  * `OperatorsSpec` differentially and by the x12 oracle, which replays a
  * plain global window).
  */
object ShardedPrefixSum {

  /** Adds `outCol` = running sum of `valueCol` within each `groupCols`
    * group in (`orderCols`, ties included) order. `shardCol` must be
    * monotone non-decreasing in the first order column within each group.
    */
  def withRunningTotal(df: DataFrame, groupCols: Seq[String],
                       shardCol: String, orderCols: Seq[String],
                       valueCol: String, outCol: String): DataFrame = {
    val grp: Seq[Column] = groupCols.map(col)
    val localW = Window.partitionBy((grp :+ col(shardCol)): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = df.withColumn("__lcum", sum(col(valueCol)).over(localW))
    val offsets = local.groupBy((grp :+ col(shardCol)): _*)
      .agg(max(col("__lcum")).as("__stot"))
      .withColumn("__off", coalesce(sum(col("__stot")).over(
        Window.partitionBy(grp: _*).orderBy(col(shardCol))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select((grp :+ col(shardCol) :+ col("__off")): _*)
    local.join(offsets, groupCols :+ shardCol)
      .withColumn(outCol, col("__off") + col("__lcum"))
      .drop("__lcum", "__off")
  }
}
