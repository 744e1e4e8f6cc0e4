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
}
