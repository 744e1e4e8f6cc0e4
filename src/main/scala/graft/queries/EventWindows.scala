package graft.queries

import graft.core.Tables
import org.apache.spark.sql.functions._

/** Event-time windowing over the `events` table — the batch halves of
  * SURVEY §2.7 (W1-W6). The same `window()`/`session_window()` expressions
  * run unchanged under Structured Streaming (see `graft.streaming`); here
  * they are oracle-checked in batch where DuckDB can replay the semantics.
  *
  * Scale notes: every query is a single shuffle on (window, key); the
  * window assignment itself is a rowwise projection inside codegen.
  * Sliding windows multiply rows by duration/slide (×4 here) BEFORE the
  * shuffle — at 100 TB pick slide ratios consciously.
  */
object EventWindows extends QueryModule {

  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 2) =
    sum(c.cast(s"decimal(22,$scale)")).cast("double")

  override def queries: Map[String, Q] = Map(
    // W1: tumbling 1-hour windows per event type (reference
    // `FixedWindows.of`, `WindowedWordCount.scala:46,70`).
    "w1_tumbling" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), dsum($"value", 6).as("total_value"))
        .select($"w.start".as("w_start"), $"w.end".as("w_end"),
                $"event_type", $"n", $"total_value")
    },

    // W2: sliding 1h/15min windows (reference `SlidingWindows.of(...)
    // .every(...)`, `TrafficMaxLaneFlow.scala:99-103`). Each event lands
    // in 4 windows.
    "w2_sliding" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(window($"ts", "1 hour", "15 minutes").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select($"w.start".as("w_start"), $"w.end".as("w_end"),
                $"event_type", $"n")
    },

    // W3: session windows, 10-min gap, per user (reference
    // `Sessions.withGapDuration`, `TopWikipediaSessions.scala:135`,
    // `GameStats.scala:152`). session_window merges overlapping
    // [ts, ts+gap) intervals; end = last event + gap.
    "w3_session" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(session_window($"ts", "10 minutes").as("w"), $"user_id")
        .agg(count(lit(1)).as("n_events"))
        .select($"user_id", $"w.start".as("s_start"), $"w.end".as("s_end"),
                $"n_events")
    },

    // W4: calendar-month windows (reference `CalendarWindows.months(1)`,
    // `TopWikipediaSessions.scala:154`) — no native month window in Spark;
    // date_trunc is the faithful batch equivalent (SURVEY §2.7 W4).
    "w4_calendar_month" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(date_trunc("month", $"ts").as("month"), $"event_type")
        .agg(count(lit(1)).as("n"))
    },

    // W6: re-windowing across stages (reference `GameStats.scala:147-175`):
    // sessionize per user, take each session's END as its event time, then
    // tumbling-daily mean session duration. Two shuffles — exactly the two
    // the semantics require.
    "w6_rewindow_session_mean" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(session_window($"ts", "10 minutes").as("w"), $"user_id")
        .agg(count(lit(1)).as("n"))
        .select($"w.end".as("session_end"),
          // exact integer micros — timestamp cast-to-long truncates to
          // seconds and double minutes would diverge from the oracle
          (unix_micros($"w.end") - unix_micros($"w.start")).as("dur_us"))
        .groupBy(window($"session_end", "1 day").as("d"))
        .agg((sum($"dur_us").cast("double") / count(lit(1)) / 6.0e7)
               .as("avg_session_min"),
             count(lit(1)).as("n_sessions"))
        .select($"d.start".as("day"), $"avg_session_min", $"n_sessions")
    },

    // J8: range join — purchases attributed to global error-burst
    // ("outage") intervals, with NO equi key. Intervals = keyless session
    // windows over error events (gap 2 min); the containment join runs
    // through `operators/RangeJoin` as a binned equi-join (Spark would
    // otherwise plan a BroadcastNestedLoopJoin for a pure inequality
    // join). Oracle = DuckDB gaps-and-islands + a plain range join.
    "j8_range_outage" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.events(s, dir)
      val outages = ev.filter($"event_type" === "error")
        .groupBy(session_window($"ts", "2 minutes").as("w"))
        .agg(count(lit(1)).as("n_errors"))
        .select($"w.start".as("o_start"), $"w.end".as("o_end"), $"n_errors")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"ts", $"value")
      graft.operators.RangeJoin.pointInInterval(
          purchases, "ts", outages, "o_start", "o_end", binWidthSec = 300)
        .select($"event_id", $"ts", $"o_start", $"o_end", $"n_errors")
    },
  )

  // DuckDB oracles. Epoch arithmetic (`TIMESTAMP '1970-01-01' + k seconds`)
  // avoids DuckDB's TIMESTAMPTZ local-zone coercion; Spark windows are
  // epoch-aligned so integer floor reproduces window()'s assignment exactly.
  override def oracle: Map[String, String] = Map(
    // Sessionize over DISTINCT error ts (round 15): the lag/cumsum
    // replay is tie-UNSAFE under duplicate error timestamps — lag and
    // the running sum sort ties in their own arbitrary orders, so the
    // brk=1 row can land mid-tie-group in the cumsum's order and split
    // one timestamp's copies across two "sessions" (overlapping outages
    // — the 10x duplicate-heavy fixture caught it; Spark's
    // session_window over the ts multiset is well-defined). Gap
    // sessionization depends only on the distinct ts SET, so dedupe
    // first (no ties → deterministic windows), then count every error
    // row back into its session for n_errors.
    "j8_range_outage" ->
      """WITH et AS (
        |  SELECT DISTINCT ts FROM events WHERE event_type = 'error'),
        |marked AS (
        |  SELECT ts, CASE WHEN lag(ts) OVER (ORDER BY ts) IS NULL
        |      OR ts >= lag(ts) OVER (ORDER BY ts) + INTERVAL 2 MINUTE
        |    THEN 1 ELSE 0 END AS brk
        |  FROM et),
        |grp AS (
        |  SELECT ts, sum(brk) OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING) AS g
        |  FROM marked),
        |spans AS (
        |  SELECT min(ts) AS o_start, max(ts) AS o_last FROM grp GROUP BY g),
        |outages AS (
        |  SELECT s.o_start, s.o_last + INTERVAL 2 MINUTE AS o_end,
        |    count(*) AS n_errors
        |  FROM spans s JOIN events er
        |    ON er.event_type = 'error'
        |    AND er.ts >= s.o_start AND er.ts <= s.o_last
        |  GROUP BY 1, 2)
        |SELECT e.event_id, e.ts, o.o_start, o.o_end, o.n_errors
        |FROM events e JOIN outages o
        |  ON e.ts >= o.o_start AND e.ts < o.o_end
        |WHERE e.event_type = 'purchase'""".stripMargin,

    "w1_tumbling" ->
      """SELECT date_trunc('hour', ts) AS w_start,
        |  date_trunc('hour', ts) + INTERVAL 1 HOUR AS w_end,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(22,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2, 3""".stripMargin,

    "w2_sliding" ->
      """WITH slid AS (
        |  SELECT event_type,
        |    time_bucket(INTERVAL 15 MINUTE, ts) - i * INTERVAL 15 MINUTE
        |      AS w_start
        |  FROM events CROSS JOIN (SELECT unnest([0,1,2,3]) AS i))
        |SELECT w_start, w_start + INTERVAL 1 HOUR AS w_end, event_type,
        |  count(*) AS n
        |FROM slid GROUP BY 1, 2, 3""".stripMargin,

    "w3_session" ->
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts >= lag(ts) OVER w + INTERVAL 10 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |grp AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS g
        |  FROM marked)
        |SELECT user_id, min(ts) AS s_start,
        |  max(ts) + INTERVAL 10 MINUTE AS s_end,
        |  count(*) AS n_events
        |FROM grp GROUP BY user_id, g""".stripMargin,

    "w4_calendar_month" ->
      """SELECT date_trunc('month', ts) AS month, event_type, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

    "w6_rewindow_session_mean" ->
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts >= lag(ts) OVER w + INTERVAL 10 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |grp AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS g
        |  FROM marked),
        |sessions AS (
        |  SELECT max(ts) + INTERVAL 10 MINUTE AS session_end,
        |    epoch_us(max(ts) + INTERVAL 10 MINUTE) - epoch_us(min(ts)) AS dur_us
        |  FROM grp GROUP BY user_id, g)
        |SELECT date_trunc('day', session_end) AS day,
        |  CAST(sum(dur_us) AS DOUBLE) / count(*) / 60000000.0
        |    AS avg_session_min,
        |  count(*) AS n_sessions
        |FROM sessions GROUP BY 1""".stripMargin,
  )
}
