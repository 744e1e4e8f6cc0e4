package graft.pipelines

import graft.functions.TextFunctions
import graft.operators.{KeyedOps, PrefixTopK}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The reference's example pipelines as pure Dataset→Dataset library
  * functions — one entry point per reference pipeline, mirroring
  * `PTransform.expand` composition (SURVEY §7.1). A reference user swaps
  * `pipeline.apply(...)` chains for these; batch/stream symmetric
  * transforms accept either `spark.read` or `spark.readStream` inputs.
  *
  * Pipelines whose whole substance is a streaming state machine live in
  * `graft.streaming` (LeaderBoard, StatefulTeamScore→thresholdCrossings,
  * GameStats→spamFilteredTeamScores, TriggerExample→panedCounts).
  */
object ReferencePipelines {

  /** MinimalWordCount / WordCount (`WordCount.scala:100-110`):
    * lines → (word, count), reference tokenization.
    */
  def wordCount(lines: Dataset[String]): DataFrame =
    lines.select(explode(TextFunctions.tokenizeCased(col("value"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** DebuggingWordCount (`DebuggingWordCount.scala:66-87`): wordCount
    * restricted to a regex, with matched/unmatched observe counters.
    */
  def debuggingWordCount(lines: Dataset[String],
                         pattern: String = "Flourish|stomach"): DataFrame =
    wordCount(lines)
      .observe("debug_wc",
        sum(when(col("word").rlike(pattern), 1).otherwise(0)).as("matched"),
        sum(when(col("word").rlike(pattern), 0).otherwise(1)).as("unmatched"))
      .filter(col("word").rlike(pattern))

  /** WindowedWordCount (`WindowedWordCount.scala:70-82`): timestamped
    * lines → per-window word counts (streaming-ready: add watermark
    * upstream for unbounded inputs).
    */
  def windowedWordCount(lines: DataFrame, windowDur: String): DataFrame =
    lines.select(col("ts"),
        explode(TextFunctions.tokenizeCased(col("line"))).as("word"))
      .groupBy(window(col("ts"), windowDur).as("w"), col("word"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("word"), col("n"))

  /** StreamingWordExtract (`StreamingWordExtract.scala:74-89`):
    * lines → uppercased words.
    */
  def wordExtractUpper(lines: Dataset[String]): DataFrame =
    lines.select(upper(explode(TextFunctions.tokenizeCased(col("value"))))
      .as("word"))

  /** TfIdf (`TfIdf.scala:183-297`): (uri, line) → (uri, word, tfidf).
    * The diamond derives every branch from the ONE (uri, word) counts
    * aggregate (totals = Σn per uri, df = rows per word) so exchange
    * reuse scans + shuffles the exploded token frame exactly once —
    * same shape as the `j3_tfidf` query, no corpus cache.
    */
  def tfIdf(docs: DataFrame): DataFrame = {
    val counts = docs.select(col("uri"),
        explode(TextFunctions.tokenize(col("line"))).as("word"))
      .groupBy("uri", "word").agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("uri").agg(sum(col("n")).as("total"))
    val docFreq = counts.groupBy("word").agg(count(lit(1)).as("df"))
    val nDocs = docs.select("uri").distinct()
      .agg(count(lit(1)).as("n_docs"))
    counts.join(totals, "uri")
      .withColumn("tf", col("n").cast("double") / col("total"))
      .join(docFreq, "word")
      .crossJoin(broadcast(nDocs))
      .select(col("uri"), col("word"),
        (col("tf") * log(col("n_docs").cast("double") / col("df")))
          .as("tfidf"))
  }

  /** AutoComplete (`AutoComplete.scala:234-321`): (word, n) → top-k
    * candidates per prefix; recursive trie evaluation for scale.
    */
  def autoComplete(wordCounts: DataFrame, maxPrefix: Int, k: Int,
                   recursive: Boolean = true): DataFrame =
    if (recursive) PrefixTopK.recursive(wordCounts, maxPrefix, k)
    else PrefixTopK.flat(wordCounts, maxPrefix, k)

  /** UserScore CSV ingestion (`UserScore.scala:125-154`, FIXTURES.md §1):
    * `user,team,score,timestamp_ms[,readable]` with malformed rows
    * dropped and counted (observe metric `parse_errors`) — try_cast keeps
    * tolerance explicit under ANSI mode.
    */
  def parseGameEvents(lines: Dataset[String]): DataFrame =
    lines.select(split(col("value"), ",", -1).as("f"))
      .select(
        // try_element_at + try_cast: short/garbage rows yield NULLs (not
        // ANSI runtime errors) and are counted + dropped below
        trim(expr("try_element_at(f, 1)")).as("user"),
        trim(expr("try_element_at(f, 2)")).as("team"),
        expr("try_cast(try_element_at(f, 3) AS INT)").as("score"),
        timestamp_millis(expr("try_cast(try_element_at(f, 4) AS BIGINT)")).as("ts"))
      .observe("game_parse",
        sum(when(col("score").isNull || col("ts").isNull, 1).otherwise(0))
          .as("parse_errors"))
      .filter(col("score").isNotNull && col("ts").isNotNull &&
        length(col("user")) > 0)

  /** UserScore (`UserScore.scala:171-175`): events → per-user totals. */
  def userScore(events: DataFrame, keyCol: String = "user_id"): DataFrame =
    events.groupBy(col(keyCol)).agg(sum(col("value")).as("total_score"))

  /** HourlyTeamScore (`HourlyTeamScore.scala:82-107`): time-range filter +
    * hourly windows per team.
    */
  def hourlyTeamScore(events: DataFrame, startTs: String, stopTs: String,
                      keyCol: String = "team"): DataFrame =
    events
      .filter(col("ts") >= lit(startTs).cast("timestamp") &&
        col("ts") < lit(stopTs).cast("timestamp"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col(keyCol))
      .agg(sum(col("value")).as("total_score"))
      .select(col("w.start").as("w_start"), col(keyCol), col("total_score"))

  /** TopWikipediaSessions (`TopWikipediaSessions.scala:135-160`):
    * sessionize per user (1 h gap), count session lengths, keep the top
    * session per calendar month (sampling applied upstream via
    * `HashFunctions.hashSample`).
    */
  def topSessionsPerMonth(events: DataFrame, gap: String = "1 hour"): DataFrame = {
    val sessions = events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("session_len"))
      .select(col("user_id"), col("w.start").as("s_start"),
        col("session_len"),
        date_trunc("month", col("w.start")).as("month"))
    KeyedOps.topKPerKey(sessions, Seq(col("month")),
      Seq(col("session_len").desc, col("user_id").desc), 1)
  }

  /** BigQueryTornadoes (`BigQueryTornadoes.scala:136-171`): filtered
    * per-month counts.
    */
  def monthlyCounts(rows: DataFrame, filterCol: String): DataFrame =
    rows.filter(col(filterCol))
      .groupBy(date_trunc("month", col("ts")).as("month"))
      .agg(count(lit(1)).as("n"))

  /** TrafficMaxLaneFlow (`TrafficMaxLaneFlow.scala:245-308`): per-station
    * arg-max reading over sliding windows.
    */
  def maxLaneFlow(readings: DataFrame, windowDur: String,
                  slide: String): DataFrame =
    KeyedOps.argMaxPerKey(
      readings.withColumn("w", window(col("ts"), windowDur, slide)),
      keys = Seq(col("w"), col("station")),
      ord = Seq(col("flow").as("__flow"), col("ts").cast("long").as("__ts")),
      payload = Seq("flow" -> col("flow"), "lane" -> col("lane"),
        "reading_ts" -> col("ts")))
      .select(col("w.start").as("w_start"), col("station"), col("lane"),
        col("flow"), col("reading_ts"))

  /** TrafficMaxLaneFlow CSV ingestion (`TrafficMaxLaneFlow.scala:194-236`,
    * the wide-row lane explode P14): one freeway sensor row → up to 8
    * (station, lane) readings. 0-based fields: ts(0) "MM/dd/yyyy
    * HH:mm:ss", station(1), freeway(2), direction(3), total flow(7);
    * lane i (1..8) flow/occupancy/speed at 6+5i / 7+5i / 8+5i. Rows with
    * <48 fields are dropped (reference INVALID_INPUT_LENGTH); lanes
    * missing any of the three numeric fields are skipped.
    */
  def parseLaneReadings(lines: Dataset[String]): DataFrame = {
    // try_cast throughout: ANSI mode (Spark 4 default) would otherwise
    // throw on the reference data's empty lane fields
    val lanes = (1 to 8).map { i =>
      s"""struct('lane $i' AS lane,
         |try_cast(f[${6 + 5 * i}] AS INT) AS flow,
         |try_cast(f[${7 + 5 * i}] AS DOUBLE) AS occupancy,
         |try_cast(f[${8 + 5 * i}] AS DOUBLE) AS speed)""".stripMargin
    }.mkString("array(", ", ", ")")
    lines
      .select(split(col("value"), ",", -1).as("f"))
      .filter(size(col("f")) >= 48)
      .select(
        expr("try_to_timestamp(f[0], 'MM/dd/yyyy HH:mm:ss')").as("ts"),
        col("f").getItem(1).as("station"), col("f").getItem(2).as("freeway"),
        col("f").getItem(3).as("direction"),
        expr("coalesce(try_cast(f[7] AS INT), -1)").as("total_flow"),
        explode(expr(lanes)).as("l"))
      .filter(col("ts").isNotNull && col("l.flow").isNotNull &&
        col("l.occupancy").isNotNull && col("l.speed").isNotNull)
      .select(col("ts"), col("station"), col("freeway"), col("direction"),
        col("total_flow"), col("l.lane").as("lane"), col("l.flow").as("flow"),
        col("l.occupancy").as("occupancy"), col("l.speed").as("speed"))
  }

  /** TrafficRoutes hard-wired station→route map
    * (`TrafficRoutes.scala:310-316`).
    */
  val sdStations: Map[String, String] = Map(
    "1108413" -> "SDRoute1", "1108699" -> "SDRoute2", "1108702" -> "SDRoute2")

  /** TrafficRoutes CSV ingestion (`TrafficRoutes.scala:182-199`): keep
    * mainline ("ML") readings of tracked stations, keyed by route via the
    * tiny literal lookup map (P15 — a `typedLit` map, no join needed for
    * a fixed-cardinality dimension).
    */
  def parseStationSpeeds(lines: Dataset[String]): DataFrame =
    lines
      .select(split(col("value"), ",", -1).as("f"))
      .select(
        expr("try_to_timestamp(f[0], 'MM/dd/yyyy HH:mm:ss')").as("ts"),
        col("f").getItem(1).as("station"), col("f").getItem(4).as("station_type"),
        expr("try_cast(f[9] AS DOUBLE)").as("avg_speed"))
      .withColumn("route", element_at(typedLit(sdStations), col("station")))
      .filter(col("ts").isNotNull && col("station_type") === "ML" &&
        col("avg_speed").isNotNull && col("route").isNotNull)
      .select(col("ts"), col("route"), col("station"), col("avg_speed"))

  // public: encoder codegen generates external accessor calls
  case class SpeedReading(w_start: java.sql.Timestamp, route: String,
                          station: String, avg_speed: Double,
                          ts: java.sql.Timestamp)
  case class RouteStats(w_start: java.sql.Timestamp, route: String,
                        avg_speed: Double, slowdown_event: Boolean)

  /** TrafficRoutes slowdown detection (`TrafficRoutes.scala:206-250`, the
    * A11 ordered fold): per (sliding window, route), sort readings by
    * time, compare each station's speed to its FIRST-seen speed in the
    * window (the reference records a station's speed only on first
    * sight), and flag a slowdown iff slowdowns ≥ 2×speedups. Ordering is
    * made deterministic with (ts, station, speed) — the reference sorts
    * by timestamp alone, leaving equal-timestamp order runner-defined.
    * Scale contract: one shuffle on (window, route); groups are
    * per-route readings within one window — bounded.
    */
  def routeSlowdowns(speeds: DataFrame, windowDur: String,
                     slide: String): DataFrame = {
    val spark = speeds.sparkSession
    import spark.implicits._
    val windowed = speeds
      .withColumn("w", window(col("ts"), windowDur, slide))
      .select(col("w.start").as("w_start"), col("route"), col("station"),
        col("avg_speed"), col("ts"))
      .as[SpeedReading]
    graft.operators.OrderedFold.foldSortedGroups[
        (java.sql.Timestamp, String), SpeedReading, RouteStats](
      windowed,
      key = r => (r.w_start, r.route),
      order = Ordering.by(r => (r.ts.getTime, r.station, r.avg_speed))) {
      case ((wStart, route), readings) =>
        val firstSeen = scala.collection.mutable.HashMap.empty[String, Double]
        var (sum, n, speedups, slowdowns) = (0.0, 0, 0, 0)
        readings.foreach { r =>
          firstSeen.get(r.station) match {
            case Some(first) =>
              if (first < r.avg_speed) speedups += 1 else slowdowns += 1
            case None => firstSeen(r.station) = r.avg_speed
          }
          sum += r.avg_speed; n += 1
        }
        RouteStats(wStart, route, sum / n, slowdowns >= 2 * speedups)
    }.toDF()
  }

  /** TopWikipediaSessions JSON ingestion
    * (`TopWikipediaSessions.scala:99-123`): wiki edit JSON →
    * (user_id, ts); rows missing either field are dropped.
    */
  def parseWikiEdits(lines: Dataset[String]): DataFrame =
    lines
      .select(from_json(col("value"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "contributor_username STRING, timestamp BIGINT")).as("j"))
      .select(col("j.contributor_username").as("user_id"),
        timestamp_seconds(col("j.timestamp")).as("ts"))
      .filter(col("user_id").isNotNull && col("ts").isNotNull)

  /** The reference's deterministic user sample
    * (`TopWikipediaSessions.scala:191-198`): keep a user iff
    * abs(javaHashCode(user)) ≤ MaxInt·threshold — exact Java-hash parity
    * via the codegen'd expression (P9).
    */
  def sampleUsers(events: DataFrame, threshold: Double): DataFrame =
    events.filter(
      abs(graft.functions.HashFunctions.javaStringHashCode(col("user_id"))
        .cast("long")) <= lit((Int.MaxValue * threshold).toLong))
}
