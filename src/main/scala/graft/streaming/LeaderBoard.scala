package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The LeaderBoard pipeline shape (reference `LeaderBoard.scala:101-133`):
  * ONE unbounded source consumed by TWO sibling branches —
  *
  *  1. fixed-window team scores with allowed lateness (append after the
  *     watermark closes each window; Beam's on-time pane, W1+W8+W9);
  *  2. global-window per-user running totals re-emitted on every trigger
  *     (Beam `GlobalWindows` + `Repeatedly.forever(AfterProcessingTime)`,
  *     W5+W11 — Spark `update` output mode).
  *
  * In Spark each sink is its own streaming query over the shared input
  * DataFrame (reference runs both branches in one pipeline; SURVEY §3.2
  * documents the one-pipeline → N-queries divergence). Both transforms
  * are pure DataFrame functions — batch-testable, stream-deployable.
  */
object LeaderBoard {

  /** Branch 1: per-(window, team) score totals, append-on-watermark. */
  def teamWindowTotals(events: DataFrame, windowDur: String,
                       lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowDur).as("w"), col("team"))
      .agg(sum(col("value")).as("team_total"))
      .select(col("w.start").as("w_start"), col("team"), col("team_total"))

  /** Branch 2: global-window running user totals (update mode — each
    * trigger re-emits the keys that changed, Beam's accumulating global
    * pane).
    */
  def userRunningTotals(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(sum(col("value")).as("user_total"))
}
