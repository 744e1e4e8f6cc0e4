package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GameStats composed (reference `GameStats.scala:77-284`): the full
  * abuse-detection + engagement pipeline —
  *
  *  1. per fixed window, flag spammy users (score > mult × window mean,
  *     `GameStats.scala:235-246`);
  *  2. team scores over NON-spam events (W16 anti-join — the documented
  *     semantics, fixing the reference port's inversion at
  *     `GameStats.scala:189`; SURVEY §2.5 J6);
  *  3. user engagement: session lengths (5-min gap) → mean session
  *     duration per fixed bucket (W3+W6 re-windowing,
  *     `GameStats.scala:147-175`).
  *
  * Every stage is a pure DataFrame function over (ts, user_id, team,
  * value) — run batch, or per-microbatch via foreachBatch (both aggregates
  * of stage 1-2 derive from the same window of the same source, so batch
  * alignment is exact; SURVEY §7.4 risk 7).
  */
object GameStats {

  /** Stage 1 standalone: (window, user) spam report. */
  def spammerReport(events: DataFrame, windowDur: String,
                    mult: Double): DataFrame = {
    val userTotals = events
      .groupBy(window(col("ts"), windowDur).as("w"), col("user_id"))
      .agg(sum(col("value")).as("user_total"))
    userTotals
      .groupBy(col("w")).agg(avg(col("user_total")).as("mean_total"))
      .join(userTotals, "w")
      .filter(col("user_total") > col("mean_total") * lit(mult))
      .select(col("w.start").as("w_start"), col("user_id"),
        col("user_total"), col("mean_total"))
  }

  /** Stage 2: spam-filtered team scores (delegates to StreamOps W16). */
  def teamScores(events: DataFrame, windowDur: String,
                 mult: Double): DataFrame =
    StreamOps.spamFilteredTeamScores(events, "ts", windowDur, mult)

  /** Stage 3: mean session duration per bucket (delegates to W6). */
  def engagement(events: DataFrame, gap: String, bucket: String): DataFrame =
    StreamOps.sessionDurationMeans(events, "ts", "user_id", gap, bucket,
      lateness = "0 seconds")
}
