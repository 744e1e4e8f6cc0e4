package graft

import java.sql.Timestamp

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamOpsSpec extends SparkSpec {

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  test("W1/W8: windowed counts in append mode drop late rows past the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val counts = StreamOps.windowedCounts(
      in.toDF().toDF("ts", "key"), "ts", "key", "10 minutes", "5 minutes")
    val q = counts.writeStream.format("memory").queryName("w1_test")
      .outputMode("append").start()
    try {
      // window [10:00,10:10): two on-time events
      in.addData((ts(1), "a"), (ts(2), "a"), (ts(3), "b"))
      q.processAllAvailable()
      // advance watermark past 10:10 + 5min lateness => first window closes
      in.addData((ts(21), "a"))
      q.processAllAvailable()
      // this event is for the closed window -> dropped (beyond lateness)
      in.addData((ts(4), "a"))
      q.processAllAvailable()
      // close everything out
      in.addData((ts(59), "z"))
      q.processAllAvailable()
      val rows = spark.table("w1_test")
        .select($"w_start", $"key", $"n").as[(Timestamp, String, Long)]
        .collect().toSet
      assert(rows.contains((ts(0), "a", 2L)),
        s"late row must not inflate the closed window: $rows")
      assert(rows.contains((ts(0), "b", 1L)), s"got $rows")
    } finally q.stop()
  }

  test("W3: session windows merge events within the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val sessions = StreamOps.sessionCounts(
      in.toDF().toDF("ts", "key"), "ts", "key", "5 minutes", "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("w3_test")
      .outputMode("append").start()
    try {
      in.addData((ts(0), "u"), (ts(3), "u"), (ts(20), "u"))
      q.processAllAvailable()
      in.addData((ts(40), "u")) // advance watermark to close sessions
      q.processAllAvailable()
      val rows = spark.table("w3_test")
        .select($"s_start", $"s_end", $"n").as[(Timestamp, Timestamp, Long)]
        .collect().toSet
      assert(rows.contains((ts(0), ts(8), 2L)), s"got $rows")  // 10:03 + 5min gap
      assert(rows.contains((ts(20), ts(25), 1L)), s"got $rows")
    } finally q.stop()
  }

  test("W2: sliding windows aggregate each event into duration/slide windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val slid = StreamOps.slidingAgg(
      in.toDF().toDF("ts", "key", "v"), "ts", "key", "v",
      "30 minutes", "10 minutes", "0 seconds")
    val q = slid.writeStream.format("memory").queryName("w2_test")
      .outputMode("append").start()
    try {
      in.addData((ts(15), "a", 2.0))
      q.processAllAvailable()
      in.addData((ts(59), "z", 1.0)) // advance watermark, close a-windows
      q.processAllAvailable()
      val rows = spark.table("w2_test")
        .filter($"key" === "a")
        .select($"w_start", $"total").as[(Timestamp, Double)].collect().toSet
      // 10:15 lands in [09:50,10:20) [10:00,10:30) [10:10,10:40)
      assert(rows == Set(
        (Timestamp.valueOf("2024-01-01 09:50:00"), 2.0),
        (ts(0), 2.0), (ts(10), 2.0)), s"got $rows")
    } finally q.stop()
  }

  test("W15: threshold crossings emit once per multiple crossed, state survives batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamOps.ScoreEvent]
    val out = StreamOps.thresholdCrossings(in.toDS(), threshold = 10L)
    val q = out.writeStream.format("memory").queryName("w15_test")
      .outputMode("update").start()
    try {
      in.addData(StreamOps.ScoreEvent("red", 6), StreamOps.ScoreEvent("red", 6))
      q.processAllAvailable() // total 12 -> crossed 10
      in.addData(StreamOps.ScoreEvent("red", 3))
      q.processAllAvailable() // total 15 -> no new multiple
      in.addData(StreamOps.ScoreEvent("red", 7))
      q.processAllAvailable() // total 22 -> crossed 20
      val rows = spark.table("w15_test").as[StreamOps.Crossing]
        .collect().map(c => (c.key, c.total)).toSet
      assert(rows == Set(("red", 12L), ("red", 22L)), s"got $rows")
    } finally q.stop()
  }

  test("W13/W14: panes carry delta, cumulative, index and EARLY/ON_TIME/LATE timing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val panes = StreamOps.panedCounts(
      in.toDF().toDF("ts", "key"), windowMs = 600000L, lateness = "0 seconds")
    val q = panes.writeStream.format("memory").queryName("w13_test")
      .outputMode("update").start()
    try {
      in.addData((ts(1), "k"), (ts(2), "k"))
      q.processAllAvailable() // watermark still below window end -> EARLY
      in.addData((ts(3), "k"))
      q.processAllAvailable() // still EARLY, pane index 1
      in.addData((ts(15), "x"))
      q.processAllAvailable() // watermark -> 10:15 past end 10:10
      in.addData((ts(5), "k"))
      q.processAllAvailable() // first firing at/after watermark>end -> ON_TIME
      in.addData((ts(6), "k"))
      q.processAllAvailable() // subsequent -> LATE
      val rows = spark.table("w13_test").as[StreamOps.Pane].collect()
        .filter(_.key == "k")
        .map(p => (p.delta, p.cumulative, p.paneIndex, p.timing)).toSet
      assert(rows == Set(
        (2L, 2L, 0, "EARLY"),
        (1L, 3L, 1, "EARLY"),
        (1L, 4L, 2, "ON_TIME"),
        (1L, 5L, 3, "LATE")), s"got $rows")
    } finally q.stop()
  }

  test("W15 under RocksDB state store: identical semantics to the default provider") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[StreamOps.ScoreEvent]
      val out = StreamOps.thresholdCrossings(in.toDS(), threshold = 10L)
      val q = out.writeStream.format("memory").queryName("w15_rocks")
        .outputMode("update").start()
      try {
        in.addData(StreamOps.ScoreEvent("red", 6), StreamOps.ScoreEvent("red", 6))
        q.processAllAvailable()
        in.addData(StreamOps.ScoreEvent("red", 9))
        q.processAllAvailable() // total 21 -> crossed 20
        val rows = spark.table("w15_rocks").as[StreamOps.Crossing]
          .collect().map(c => (c.key, c.total)).toSet
        assert(rows == Set(("red", 12L), ("red", 21L)), s"got $rows")
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("W15 state survives a query restart from checkpoint (retry safety)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_w15_ckpt").toString
    val in = MemoryStream[StreamOps.ScoreEvent]
    // memory sinks don't support checkpoint recovery; foreachBatch does
    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Long)]()
    def start() = StreamOps.thresholdCrossings(in.toDS(), threshold = 10L)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamOps.Crossing], _: Long) =>
        batch.collect().foreach(c => got.add((c.key, c.total)))
      }
      .start()
    val q1 = start()
    try {
      in.addData(StreamOps.ScoreEvent("red", 6), StreamOps.ScoreEvent("red", 6))
      q1.processAllAvailable() // total 12 -> emits crossing 12
    } finally q1.stop()
    val q2 = start() // restart from checkpoint: state must resume at 12
    try {
      in.addData(StreamOps.ScoreEvent("red", 9))
      q2.processAllAvailable() // 12 + 9 = 21 -> crossed 20
      val rows = { import scala.jdk.CollectionConverters._; got.asScala.toSet }
      assert(rows.contains(("red", 21L)),
        s"restarted state must continue from 12: $rows")
      assert(!rows.contains(("red", 9L)), "state must not reset on restart")
    } finally q2.stop()
  }

  test("W16/J6: spam filter excludes outlier users from team totals (anti-join)") {
    import spark.implicits._
    val events = Seq(
      (ts(1), 1L, "red", 10.0), (ts(2), 2L, "red", 12.0),
      (ts(3), 3L, "blue", 11.0), (ts(4), 4L, "blue", 500.0) // user 4 spams
    ).toDF("ts", "user_id", "team", "value")
    val out = StreamOps.spamFilteredTeamScores(events, "ts", "60 minutes", mult = 2.5)
      .select($"team", $"team_total").as[(String, Double)].collect().toMap
    assert(out == Map("red" -> 22.0, "blue" -> 11.0), s"got $out")
  }

  test("GameStats composed: spam report + filtered team scores agree") {
    import spark.implicits._
    val events = Seq(
      (ts(1), 1L, "red", 10.0), (ts(2), 2L, "red", 12.0),
      (ts(3), 3L, "blue", 11.0), (ts(4), 4L, "blue", 500.0)
    ).toDF("ts", "user_id", "team", "value")
    val spammers = graft.streaming.GameStats
      .spammerReport(events, "60 minutes", 2.5)
      .select($"user_id").as[Long].collect().toSet
    assert(spammers == Set(4L))
    val teams = graft.streaming.GameStats
      .teamScores(events, "60 minutes", 2.5)
      .select($"team", $"team_total").as[(String, Double)].collect().toMap
    assert(teams == Map("red" -> 22.0, "blue" -> 11.0))
  }

  test("W6: session re-windowing produces daily mean session durations") {
    import spark.implicits._
    val events = Seq(
      (ts(0), "u1"), (ts(4), "u1"),   // session: 10:00-10:09 (4min + 5 gap)
      (ts(30), "u2")                   // session: 10:30-10:35
    ).toDF("ts", "key")
    val out = StreamOps.sessionDurationMeans(events, "ts", "key",
        gap = "5 minutes", bucket = "1 day", lateness = "0 seconds")
      .as[(Timestamp, Double)].collect().toSet
    assert(out == Set((Timestamp.valueOf("2024-01-01 00:00:00"), 7.0)),
      s"got $out") // (9 + 5)/2 = 7 minutes
  }

  test("streaming dedup: first copy passes, in-horizon dups drop, state expires") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val out = StreamOps.streamingDedup(
      in.toDF().toDF("ts", "doc_id", "text"), "ts", "text", "10 minutes")
    val q = out.writeStream.format("memory").queryName("sdedup_test")
      .outputMode("append").start()
    try {
      // batch 1: first copy of A and B pass; same-batch dup of A drops
      in.addData((ts(0), 1L, "doc A"), (ts(1), 2L, "doc A"),
        (ts(2), 3L, "doc B"))
      q.processAllAvailable()
      // batch 2: cross-batch dup inside the horizon drops
      in.addData((ts(5), 4L, "doc A"))
      q.processAllAvailable()
      // batch 3: advance the watermark far past ts(5)+10min so A's state
      // expires, then batch 4: A re-admitted (documented horizon contract)
      in.addData((ts(40), 5L, "doc C"))
      q.processAllAvailable()
      in.addData((ts(45), 6L, "doc A"))
      q.processAllAvailable()
      val ids = spark.table("sdedup_test").select($"doc_id")
        .as[Long].collect().toSet
      assert(ids == Set(1L, 3L, 5L, 6L),
        s"expected first copies + horizon-expired readmission, got $ids")
    } finally q.stop()
  }

  test("W12: composite trigger fires EARLY* -> timer ON_TIME(delta 0) -> LATE* -> expiry drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    // 10-minute windows, 5 minutes allowed lateness; window [10:00,10:10)
    // ends at 10:10 and expires when the (Beam) watermark passes 10:15
    val panes = StreamOps.sequencedPanes(
      in.toDF().toDF("ts", "key"), windowMs = 600000L, latenessMs = 300000L)
    val q = panes.writeStream.format("memory").queryName("w12_test")
      .outputMode("update").start()
    try {
      in.addData((ts(1), "k"), (ts(2), "k"))
      q.processAllAvailable() // watermark below window end -> EARLY pane 0
      in.addData((ts(3), "k"))
      q.processAllAvailable() // still EARLY, pane 1
      // advance max event time to 10:12: the watermark crosses window end
      // 10:10 with NO new rows for k's window -> the event-time timer must
      // fire exactly one ON_TIME pane with delta 0, cumulative unchanged
      in.addData((ts(12), "x"))
      q.processAllAvailable()
      // late row within allowed lateness (watermark 10:12 < expiry 10:15):
      // must survive Spark's late-row filter and emit a LATE pane
      in.addData((ts(4), "k"))
      q.processAllAvailable()
      // advance watermark past 10:15 -> expiry timer GCs k's window state
      in.addData((ts(30), "z"))
      q.processAllAvailable()
      // straggler past end+lateness: dropped, no pane
      in.addData((ts(5), "k"))
      q.processAllAvailable()
      val rows = spark.table("w12_test").as[StreamOps.Pane].collect()
        .filter(_.key == "k")
        .map(p => (p.delta, p.cumulative, p.paneIndex, p.timing)).toSet
      assert(rows == Set(
        (2L, 2L, 0, "EARLY"),
        (1L, 3L, 1, "EARLY"),
        (0L, 3L, 2, "ON_TIME"), // timer-fired, data-free
        (1L, 4L, 3, "LATE")), s"got $rows")
      val onTime = spark.table("w12_test").as[StreamOps.Pane].collect()
        .count(p => p.key == "k" && p.timing == "ON_TIME")
      assert(onTime == 1, s"exactly one ON_TIME pane expected, got $onTime")
    } finally q.stop()
  }

  test("W12: single-jump watermark past end+lateness fires the final ON_TIME pane and GCs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val panes = StreamOps.sequencedPanes(
      in.toDF().toDF("ts", "key"), windowMs = 600000L, latenessMs = 300000L)
    val q = panes.writeStream.format("memory").queryName("w12_jump")
      .outputMode("update").start()
    try {
      in.addData((ts(1), "k"))
      q.processAllAvailable() // EARLY pane 0
      // one advance jumps the watermark from 10:01 straight past
      // end (10:10) AND end+lateness (10:15): Beam fires the pending
      // on-time pane as part of window expiry — exactly one ON_TIME pane,
      // then immediate GC
      in.addData((ts(30), "z"))
      q.processAllAvailable()
      // straggler after the jump: the window is expired -> dropped as a
      // straggler, NOT emitted as LATE
      in.addData((ts(6), "k"))
      q.processAllAvailable()
      val rows = spark.table("w12_jump").as[StreamOps.Pane].collect()
        .filter(_.key == "k")
        .map(p => (p.delta, p.cumulative, p.paneIndex, p.timing)).toSet
      assert(rows == Set(
        (1L, 1L, 0, "EARLY"),
        (0L, 1L, 1, "ON_TIME")), s"got $rows")
    } finally q.stop()
  }

  test("W12: pane sequence survives a query restart from checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_w12_ckpt").toString
    val in = MemoryStream[(Timestamp, String)]
    val got = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(String, Long, Long, Int, String)]()
    def start() = StreamOps.sequencedPanes(
        in.toDF().toDF("ts", "key"), windowMs = 600000L, latenessMs = 300000L)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamOps.Pane], _: Long) =>
        batch.collect().foreach(p =>
          got.add((p.key, p.delta, p.cumulative, p.paneIndex, p.timing)))
      }
      .start()
    val q1 = start()
    try {
      in.addData((ts(1), "k"), (ts(2), "k"))
      q1.processAllAvailable() // EARLY pane 0, cumulative 2
    } finally q1.stop()
    val q2 = start() // restart mid-sequence: accumulated total must survive
    try {
      in.addData((ts(12), "x")) // watermark crosses window end -> timer
      q2.processAllAvailable()
      in.addData((ts(4), "k")) // within lateness -> LATE on restored total
      q2.processAllAvailable()
      val k = { import scala.jdk.CollectionConverters._
        got.asScala.filter(_._1 == "k").map(t => (t._2, t._3, t._4, t._5)).toSet }
      assert(k == Set(
        (2L, 2L, 0, "EARLY"),
        (0L, 2L, 1, "ON_TIME"),  // timer fired after restart, cumulative restored
        (1L, 3L, 2, "LATE")), s"got $k")
    } finally q2.stop()
  }

  test("streaming curation: quality gates + dedup on an unbounded stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val out = StreamOps.streamingCurate(
      in.toDF().toDF("ts", "doc_id", "text"), "ts", "text",
      minTokens = 3, maxTokens = 10, maxDupFrac = 0.5, horizon = "10 minutes")
    val q = out.writeStream.format("memory").queryName("scurate_test")
      .outputMode("append").start()
    try {
      in.addData(
        (ts(0), 1L, "a clean short document here"), // passes
        (ts(1), 2L, "too few"),                     // 2 tokens < min
        (ts(2), 3L, "spam spam spam spam spam ok"), // dup frac 4/6 > 0.5
        (ts(3), 4L, "a clean short document here"), // digest dup of 1
        (ts(4), 5L, "another good document flows through"))
      q.processAllAvailable()
      val ids = spark.table("scurate_test").select($"doc_id")
        .as[Long].collect().toSet
      assert(ids == Set(1L, 5L), s"got $ids")
    } finally q.stop()
  }

  test("stream-stream attribution join: purchases match in-horizon views only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val joined = StreamOps.attributionJoin(
      views.toDF().toDF("user_id", "ts"),
      purchases.toDF().toDF("user_id", "p_ts", "amount"),
      "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj_test")
      .outputMode("append").start()
    try {
      // user 1: view at 10:01, purchase at 10:05 → attributed
      // user 2: view at 10:00, purchase at 10:20 → OUTSIDE the horizon
      // user 3: purchase with no view at all → no row (inner join)
      // user 1's second view at 10:04 → BOTH views attribute (1:N)
      views.addData((1L, ts(1)), (1L, ts(4)), (2L, ts(0)))
      purchases.addData((1L, ts(5), 9.99), (2L, ts(20), 5.0),
        (3L, ts(6), 1.0))
      q.processAllAvailable()
      // advance both watermarks so results flush in append mode
      // (disjoint sentinel users — they must not attribute to each other)
      views.addData((8L, ts(59)))
      purchases.addData((9L, ts(59), 0.0))
      q.processAllAvailable()
      val rows = spark.table("ssj_test")
        .select($"user_id", $"v_ts", $"p_ts", $"amount")
        .as[(Long, Timestamp, Timestamp, Double)].collect().toSet
      assert(rows == Set(
        (1L, ts(1), ts(5), 9.99),
        (1L, ts(4), ts(5), 9.99)), s"got $rows")
    } finally q.stop()
  }

  test("streaming near-dedup: LSH band hits match the batch algebra; band state expires") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val aTxt = "the quick brown fox jumps over the lazy dog and runs far away home"
    val bTxt = "the quick brown fox jumps over the lazy dog and runs far away tonight"
    val cTxt = "completely different content about spark structured streaming state stores"
    val xTxt = "yet another unrelated filler document advancing the watermark forward now"
    // fixture validation against the BATCH algebra: (A, B) must be an
    // LSH band pair, C must pair with nothing, and the rowwise band
    // keys must equal the batch signatures band-for-band
    val docs = Seq((0L, aTxt), (1L, bTxt), (2L, cTxt)).toDF("doc_id", "text")
    val shingleRows = docs.select($"doc_id",
      explode(graft.functions.HashedShinglesExpr.hashedShingles($"text", 3))
        .as("shingle"))
    val sigs = graft.queries.Dedup.minhashSigsOf(shingleRows)
    val pairs = graft.queries.Dedup.lshBandPairs(sigs)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)),
      s"fixture: expected exactly the (A,B) band pair, got $pairs")
    val batchBands = sigs.as[(Long, Seq[Long])].collect().map {
      case (id, sig) =>
        id -> sig.grouped(4).zipWithIndex
          .map { case (b, i) => s"$i|${b.mkString(",")}" }.toSet
    }.toMap
    val rowwise = docs.select($"doc_id",
        graft.queries.Dedup.rowwiseBandKeys($"text").as("bks"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, bks) => id -> bks.toSet }.toMap
    assert(rowwise == batchBands,
      "rowwise band keys must be bit-identical to the batch signatures")

    val in = MemoryStream[(Timestamp, Long, String)]
    val out = StreamOps.streamingNearDedup(
      in.toDF().toDF("ts", "doc_id", "text"), "ts", "doc_id", "text",
      horizonMs = 60000L)
    val q = out.writeStream.format("memory").queryName("sneardup_test")
      .outputMode("append").start()
    try {
      // batch 1: A first, near-dup B and distinct C within the horizon
      in.addData((ts(0), 0L, aTxt), (ts(0, 20), 1L, bTxt),
        (ts(0, 40), 2L, cTxt))
      q.processAllAvailable()
      // batch 2: filler advances the watermark to 10:04 — past every
      // batch-1 band's expiry (last sighting 10:00:20 + 60 s)
      in.addData((ts(5), 9L, xTxt))
      q.processAllAvailable()
      // batch 3: a byte-copy of A AFTER expiry must re-claim, not flag
      in.addData((ts(5, 30), 3L, aTxt))
      q.processAllAvailable()
      // batch 4: advance the watermark past batch 3 so its row emits
      in.addData((ts(10), 10L, xTxt))
      q.processAllAvailable()
      val got = spark.table("sneardup_test")
        .select($"doc_id", $"n_band_hits",
          coalesce($"dup_of", lit(-1L)).as("dup_of"))
        .as[(Long, Long, Long)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
      assert(got(1L)._1 >= 1L && got(1L)._2 == 0L,
        s"near-dup B must hit >=1 of A's bands: $got")
      assert(got(0L) == ((0L, -1L)), s"first-seen A is novel: $got")
      assert(got(2L) == ((0L, -1L)), s"distinct C is novel: $got")
      assert(got(3L) == ((0L, -1L)),
        s"post-expiry copy must re-claim A's bands, not flag: $got")
    } finally q.stop()
  }

  // Round-10 verdict item 5: kill-and-resume for the LSH band state
  // machine. A claims its bands in run 1; after a restart from the
  // checkpoint, an in-horizon near-dup must still flag against A's
  // RESTORED ownership, and nothing may emit twice (the idempotent
  // batchId-keyed sink below makes replayed microbatches overwrite,
  // so a duplicate verdict row would surface as a doc_id collision).
  // Runs under BOTH state-store providers — restart recovery exercises
  // the provider's snapshot/replay path, which differs materially
  // between the HDFS-backed and RocksDB backends.
  private def nearDedupRestartScenario(): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val aTxt = "the quick brown fox jumps over the lazy dog and runs far away home"
    val bTxt = "the quick brown fox jumps over the lazy dog and runs far away tonight"
    val xTxt = "yet another unrelated filler document advancing the watermark forward now"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sndr_ckpt").toString
    val in = MemoryStream[(Timestamp, Long, String)]
    val batches = new java.util.concurrent.ConcurrentHashMap[
      Long, Seq[(Long, Long, Long)]]()
    def start() = StreamOps.streamingNearDedup(
        in.toDF().toDF("ts", "doc_id", "text"), "ts", "doc_id", "text",
        horizonMs = 600000L)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        batches.put(bid, batch
          .select($"doc_id", $"n_band_hits",
            coalesce($"dup_of", lit(-1L)).as("dup_of"))
          .as[(Long, Long, Long)].collect().toSeq)
        ()
      }
      .start()
    val q1 = start()
    try {
      in.addData((ts(0), 0L, aTxt)) // A claims every band
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start() // restart: band owners must come back from state
    try {
      in.addData((ts(1), 1L, bTxt)) // in-horizon near-dup of A
      q2.processAllAvailable()
      in.addData((ts(30), 9L, xTxt)) // watermark past ts(1)+horizon
      q2.processAllAvailable()
      in.addData((ts(45), 10L, xTxt)) // flush the final agg
      q2.processAllAvailable()
      val rows = { import scala.jdk.CollectionConverters._
        batches.asScala.values.flatten.toSeq }
      val byDoc = rows.groupBy(_._1)
      assert(byDoc.getOrElse(0L, Nil).map(r => (r._2, r._3)) == Seq((0L, -1L)),
        s"A must emit exactly one novel verdict across the restart: $rows")
      val b = byDoc.getOrElse(1L, Nil)
      assert(b.size == 1 && b.head._2 >= 1L && b.head._3 == 0L,
        s"B must flag against A's restored band ownership exactly once: $rows")
    } finally q2.stop()
  }

  test("streaming near-dedup: band ownership survives a query restart from checkpoint") {
    nearDedupRestartScenario()
  }

  test("streaming near-dedup restart under RocksDB: identical recovery semantics") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try nearDedupRestartScenario()
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("attribution join: buffered view state survives a query restart from checkpoint") {
    // Round-10 verdict item 5: the stream-stream join buffers views in
    // the state store; a purchase arriving AFTER a kill must still
    // attribute to the view buffered BEFORE it, exactly once.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ssj_ckpt").toString
    val views = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val batches = new java.util.concurrent.ConcurrentHashMap[
      Long, Seq[(Long, Timestamp, Timestamp, Double)]]()
    def start() = StreamOps.attributionJoin(
        views.toDF().toDF("user_id", "ts"),
        purchases.toDF().toDF("user_id", "p_ts", "amount"),
        "10 minutes")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        batches.put(bid, batch
          .select($"user_id", $"v_ts", $"p_ts", $"amount")
          .as[(Long, Timestamp, Timestamp, Double)].collect().toSeq)
        ()
      }
      .start()
    val q1 = start()
    try {
      views.addData((1L, ts(1))) // buffered into join state, no match yet
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start() // restart: the purchase must match the restored view
    try {
      purchases.addData((1L, ts(5), 9.99))
      q2.processAllAvailable()
      views.addData((8L, ts(59))) // advance both watermarks
      purchases.addData((9L, ts(59), 0.0))
      q2.processAllAvailable()
      val rows = { import scala.jdk.CollectionConverters._
        batches.asScala.values.flatten.toSeq }
      assert(rows == Seq((1L, ts(1), ts(5), 9.99)),
        s"exactly one attribution across the restart, no loss/dup: $rows")
    } finally q2.stop()
  }

  test("streaming AutoComplete: per-window prefix top-k == batch PrefixTopK.flat") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val counts = StreamOps.windowedWordCounts(
      in.toDF().toDF("ts", "word"), "ts", "word", "10 minutes",
      "10 minutes", "0 seconds")
    val ranked = scala.collection.mutable.ArrayBuffer
      .empty[(Timestamp, String, String, Long, Int)]
    val q = counts.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        ranked.synchronized {
          ranked ++= StreamOps.rankWindowPrefixes(batch, maxPrefix = 2, k = 2)
            .select($"w_start", $"prefix", $"word", $"n",
              $"rank".cast("int"))
            .as[(Timestamp, String, String, Long, Int)].collect()
        }
        ()
      }
      .outputMode("append").start()
    try {
      // window [10:00,10:10): flourish×3, flag×2, stomach×1
      val w1Words = Seq.fill(3)("flourish") ++ Seq.fill(2)("flag") ++
        Seq("stomach")
      in.addData(w1Words.zipWithIndex.map { case (w, i) => (ts(1, i), w) }: _*)
      q.processAllAvailable()
      // close window 1; window 2 carries a different mix then closes too
      in.addData((ts(11), "fig"), (ts(11, 1), "fig"), (ts(11, 2), "flourish"))
      q.processAllAvailable()
      in.addData((ts(31), "zzz"))
      q.processAllAvailable()
      val gotW1 = ranked.synchronized {
        ranked.filter(_._1 == ts(0)).map(r => (r._2, r._3, r._4, r._5)).toSet
      }
      // batch identity: the SAME words through the batch pipeline
      val batchW1 = graft.operators.PrefixTopK.flat(
        w1Words.groupBy(identity).toSeq
          .map { case (w, xs) => (w, xs.size.toLong) }.toDF("word", "n"),
        maxLen = 2, k = 2)
        .select($"prefix", $"word", $"n", $"rank".cast("int"))
        .as[(String, String, Long, Int)].collect().toSet
      assert(gotW1 == batchW1,
        s"stream/batch AutoComplete divergence:\n$gotW1\nvs\n$batchW1")
      // the second window ranked independently ("f" top-2 now fig, flourish)
      val gotW2 = ranked.synchronized {
        ranked.filter(_._1 == ts(10)).map(r => (r._2, r._3, r._4)).toSet
      }
      assert(gotW2.contains(("f", "fig", 2L)) &&
        gotW2.contains(("f", "flourish", 1L)), s"window 2 mix: $gotW2")
    } finally q.stop()
  }

  /** Deterministic 32×24 block-color PNG (shared by the image-dedup
    * specs, including the restart scenario).
    */
  private def png(seed: Int): Array[Byte] = {
    val rng = new scala.util.Random(seed * 7919L + 5)
    val img = new java.awt.image.BufferedImage(
      32, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (by <- 0 until 6; bx <- 0 until 8) {
      val c = rng.nextInt(0xffffff)
      for (y <- by * 4 until by * 4 + 4; x <- bx * 4 until bx * 4 + 4)
        img.setRGB(x, y, c)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic 440 Hz WAV with a seeded amplitude envelope (shared
    * by the audio-dedup specs, including the restart scenario).
    */
  private def wav(seed: Long, scale: Double): Array[Byte] = {
    val rate = 8000f
    val nSeg = 65; val perSeg = 40
    val rng = new scala.util.Random(seed)
    val amps = Array.fill(nSeg)(2000 + rng.nextInt(10000))
    val pcm = new Array[Byte](nSeg * perSeg * 2)
    for (s <- 0 until nSeg; j <- 0 until perSeg) {
      val t = s * perSeg + j
      val v = (math.sin(2 * math.Pi * 440.0 * t / rate) *
        amps(s) * scale).toInt
      pcm(2 * t) = (v & 0xff).toByte
      pcm(2 * t + 1) = ((v >> 8) & 0xff).toByte
    }
    import javax.sound.sampled.{AudioFileFormat, AudioFormat,
      AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, (nSeg * perSeg).toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("streaming image dedup: re-upload hits all 4 dHash bands, distinct " +
      "images are novel, corrupt payloads drop without wedging the stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Array[Byte])]
    val out = graft.streaming.StreamOps.streamingImageDedup(
      in.toDF().toDF("ts", "media_id", "payload"),
      "ts", "media_id", "payload", horizonMs = 60000L)
    val q = out.writeStream.format("memory").queryName("simg_test")
      .outputMode("append").start()
    try {
      // A, a byte-identical re-upload of A, a distinct image, garbage
      in.addData((ts(0), 0L, png(1)), (ts(0, 20), 1L, png(1)),
        (ts(0, 40), 2L, png(2)), (ts(0, 50), 3L, Array[Byte](1, 2, 3)))
      q.processAllAvailable()
      // advance the watermark so the batch-1 rows emit
      in.addData((ts(5), 9L, png(3)))
      q.processAllAvailable()
      in.addData((ts(10), 10L, png(4)))
      q.processAllAvailable()
      val got = spark.table("simg_test")
        .select($"doc_id", $"n_band_hits",
          coalesce($"dup_of", lit(-1L)).as("dup_of"))
        .as[(Long, Long, Long)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
      assert(got(0L) == ((0L, -1L)), s"first upload is novel: $got")
      assert(got(1L) == ((4L, 0L)),
        s"byte-identical re-upload must hit all 4 bands with dup_of=0: $got")
      assert(got(2L) == ((0L, -1L)), s"distinct image is novel: $got")
      assert(!got.contains(3L), s"corrupt payload must produce no row: $got")
    } finally q.stop()
  }

  test("streaming video dedup: re-upload hits all 4 temporal-mean bands, " +
      "distinct clips are novel, corrupt payloads drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // tiny indexed-palette animated GIFs, the MediaQueries.fixtureVideos
    // shape (explicit palette => lossless round-trip)
    def gif(seed: Long): Array[Byte] = {
      val (w, h, nFrames) = (16, 12, 3)
      val entries = ((0 until 8).map(g => (g * 36).toByte) :+ 255.toByte)
        .toArray
      val cm = new java.awt.image.IndexColorModel(
        8, entries.length, entries, entries, entries)
      import javax.imageio.{IIOImage, ImageIO}
      import javax.imageio.stream.MemoryCacheImageOutputStream
      val bos = new java.io.ByteArrayOutputStream()
      val out = new MemoryCacheImageOutputStream(bos)
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      try {
        writer.setOutput(out)
        writer.prepareWriteSequence(null)
        for (f <- 0 until nFrames) {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
          for (y <- 0 until h; x <- 0 until w)
            img.getRaster.setSample(x, y, 0,
              (((seed * 7907 + f * 8191 + y * 131 + x) * 2654435761L >>> 13)
                & 0x7).toInt)
          writer.writeToSequence(new IIOImage(img, null, null), null)
        }
        writer.endWriteSequence()
      } finally { writer.dispose(); out.close() }
      bos.toByteArray
    }
    val in = MemoryStream[(Timestamp, Long, Array[Byte])]
    val out = graft.streaming.StreamOps.streamingVideoDedup(
      in.toDF().toDF("ts", "media_id", "payload"),
      "ts", "media_id", "payload", horizonMs = 60000L)
    val q = out.writeStream.format("memory").queryName("svid_test")
      .outputMode("append").start()
    try {
      // A, a byte-identical re-upload of A, a distinct clip, garbage
      in.addData((ts(0), 0L, gif(1)), (ts(0, 20), 1L, gif(1)),
        (ts(0, 40), 2L, gif(2)), (ts(0, 50), 3L, Array[Byte](4, 5, 6)))
      q.processAllAvailable()
      in.addData((ts(5), 9L, gif(3))) // advance the watermark
      q.processAllAvailable()
      in.addData((ts(10), 10L, gif(4)))
      q.processAllAvailable()
      val got = spark.table("svid_test")
        .select($"doc_id", $"n_band_hits",
          coalesce($"dup_of", lit(-1L)).as("dup_of"))
        .as[(Long, Long, Long)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
      assert(got(0L) == ((0L, -1L)), s"first upload is novel: $got")
      assert(got(1L) == ((4L, 0L)),
        s"re-upload must hit all 4 bands with dup_of=0: $got")
      assert(got(2L) == ((0L, -1L)), s"distinct clip is novel: $got")
      assert(!got.contains(3L), s"corrupt payload must produce no row: $got")
      // batch-key identity: the stream's blocking hash IS the batch one
      val hs = Seq(1L, 2L).map(s =>
        graft.multimodal.Multimodal.VideoCodec.dHashOf(
          graft.multimodal.Multimodal.VideoCodec.decodeFrames(gif(s)).get))
      assert(hs.distinct.size == 2, "fixture clips must hash apart")
    } finally q.stop()
  }

  test("streaming IVF ingest: frozen-centroid assignment matches the JVM " +
      "argmax, windowed per-cell stats replay exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = 8
    // two orthogonal-ish centroids
    val c0 = Array.tabulate(dim)(i => if (i < 4) 1.0f else 0.0f)
    val c1 = Array.tabulate(dim)(i => if (i >= 4) 1.0f else 0.0f)
    val cents = Array((0L, c0), (1L, c1))
    def near(c: Array[Float], eps: Float): Array[Float] =
      c.zipWithIndex.map { case (v, i) => v + (if (i % 2 == 0) eps else -eps) }
    val rows = Seq( // 3 near c0, 2 near c1, all in one 10-min window
      (ts(0), 10L, near(c0, 0.01f)), (ts(0, 10), 11L, near(c0, 0.05f)),
      (ts(0, 20), 12L, near(c0, 0.1f)), (ts(0, 30), 20L, near(c1, 0.02f)),
      (ts(0, 40), 21L, near(c1, 0.2f)))
    val in = MemoryStream[(Timestamp, Long, Array[Float])]
    val out = graft.streaming.StreamOps.streamingIvfIngest(
      in.toDF().toDF("ts", "vec_id", "embedding"),
      "ts", "vec_id", "embedding", cents, "10 minutes", "1 minute")
    val q = out.writeStream.format("memory").queryName("sivf_test")
      .outputMode("append").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      in.addData((ts(30), 99L, near(c0, 0.3f))) // advance the watermark
      q.processAllAvailable()
      val got = spark.table("sivf_test")
        .select($"cid", $"n", $"mean_csim")
        .as[(Long, Long, Double)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
      // JVM replay with the SAME round-9 → decimal → round-6 math
      def csim(e: Array[Float], c: Array[Float]) =
        graft.functions.VectorFunctions.cosineJvm(e, c)
      val want = rows.groupBy { case (_, _, e) =>
        if (csim(e, c0) >= csim(e, c1)) 0L else 1L
      }.map { case (cid, rs) =>
        val cc = if (cid == 0L) c0 else c1
        val s9 = rs.foldLeft(BigDecimal(0)) { case (acc, (_, _, e)) =>
          acc + BigDecimal(csim(e, cc))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        }
        cid -> ((rs.size.toLong,
          BigDecimal(s9.toDouble / rs.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
      assert(got(0L)._1 == want(0L)._1 && got(1L)._1 == want(1L)._1,
        s"per-cell counts: $got vs $want")
      assert(got(0L)._2 == want(0L)._2 && got(1L)._2 == want(1L)._2,
        s"per-cell means: $got vs $want")
    } finally q.stop()
  }

  test("streaming audio dedup: VOLUME-SCALED re-upload hits all 4 envelope " +
      "bands (amplitude invariance at ingest), corrupt payloads drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Array[Byte])]
    val out = graft.streaming.StreamOps.streamingAudioDedup(
      in.toDF().toDF("ts", "media_id", "payload"),
      "ts", "media_id", "payload", horizonMs = 60000L)
    val q = out.writeStream.format("memory").queryName("saud_test")
      .outputMode("append").start()
    try {
      // A, a half-volume re-upload of A, a distinct clip, garbage
      in.addData((ts(0), 0L, wav(11L, 1.0)), (ts(0, 20), 1L, wav(11L, 0.5)),
        (ts(0, 40), 2L, wav(22L, 1.0)), (ts(0, 50), 3L, Array[Byte](9, 9)))
      q.processAllAvailable()
      in.addData((ts(5), 9L, wav(33L, 1.0)))
      q.processAllAvailable()
      in.addData((ts(10), 10L, wav(44L, 1.0)))
      q.processAllAvailable()
      val got = spark.table("saud_test")
        .select($"doc_id", $"n_band_hits",
          coalesce($"dup_of", lit(-1L)).as("dup_of"))
        .as[(Long, Long, Long)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
      assert(got(0L) == ((0L, -1L)), s"first upload is novel: $got")
      assert(got(1L) == ((4L, 0L)),
        s"half-volume re-upload must hit all 4 bands with dup_of=0: $got")
      assert(got(2L) == ((0L, -1L)), s"distinct clip is novel: $got")
      assert(!got.contains(3L), s"corrupt payload must produce no row: $got")
    } finally q.stop()
  }

  // Round-13 (r11 verdict item 8): kill-and-resume for streamingIvfIngest
  // — the one stateful streaming op without a restart spec. Run 1 feeds
  // part of a window's vectors and dies BEFORE the window closes; after
  // a restart from the checkpoint the windowed per-cell agg state must
  // restore, absorb run 2's vectors into the SAME window, and emit the
  // combined stats exactly once (the idempotent batchId-keyed sink
  // surfaces any replay as a duplicate (w_start, cid) row). Runs under
  // BOTH state-store providers — restart recovery exercises the
  // provider's snapshot/replay path.
  private def ivfIngestRestartScenario(): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = 8
    val c0 = Array.tabulate(dim)(i => if (i < 4) 1.0f else 0.0f)
    val c1 = Array.tabulate(dim)(i => if (i >= 4) 1.0f else 0.0f)
    val cents = Array((0L, c0), (1L, c1))
    def near(c: Array[Float], eps: Float): Array[Float] =
      c.zipWithIndex.map { case (v, i) => v + (if (i % 2 == 0) eps else -eps) }
    // 3 near c0 fed before the kill, 2 near c1 after — same 10-min window
    val run1 = Seq((ts(0), 10L, near(c0, 0.01f)),
      (ts(0, 10), 11L, near(c0, 0.05f)), (ts(0, 20), 12L, near(c0, 0.1f)))
    val run2 = Seq((ts(0, 30), 20L, near(c1, 0.02f)),
      (ts(0, 40), 21L, near(c1, 0.2f)))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sivf_ckpt").toString
    val in = MemoryStream[(Timestamp, Long, Array[Float])]
    val batches = new java.util.concurrent.ConcurrentHashMap[
      Long, Seq[(Timestamp, Long, Long, Double)]]()
    def start() = graft.streaming.StreamOps.streamingIvfIngest(
        in.toDF().toDF("ts", "vec_id", "embedding"),
        "ts", "vec_id", "embedding", cents, "10 minutes", "1 minute")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        batches.put(bid, batch
          .select($"w_start", $"cid", $"n", $"mean_csim")
          .as[(Timestamp, Long, Long, Double)].collect().toSeq)
        ()
      }
      .start()
    val q1 = start()
    try {
      in.addData(run1: _*) // buffered in the windowed agg state, no emit
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start() // restart: the open window's partials must restore
    try {
      in.addData(run2: _*)
      q2.processAllAvailable()
      in.addData((ts(30), 98L, near(c0, 0.3f))) // watermark past w end
      q2.processAllAvailable()
      in.addData((ts(45), 99L, near(c1, 0.3f))) // flush the 30-min window
      q2.processAllAvailable()
      val w0 = { import scala.jdk.CollectionConverters._
        batches.asScala.values.flatten.toSeq }.filter(_._1 == ts(0))
      // exactly one row per cell for the spanning window, stats over
      // ALL 5 vectors — the same round-9 → decimal → round-6 replay as
      // the assignment spec above
      def csim(e: Array[Float], c: Array[Float]) =
        graft.functions.VectorFunctions.cosineJvm(e, c)
      val want = (run1 ++ run2).groupBy { case (_, _, e) =>
        if (csim(e, c0) >= csim(e, c1)) 0L else 1L
      }.map { case (cid, rs) =>
        val cc = if (cid == 0L) c0 else c1
        val s9 = rs.foldLeft(BigDecimal(0)) { case (acc, (_, _, e)) =>
          acc + BigDecimal(csim(e, cc))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        }
        cid -> ((rs.size.toLong,
          BigDecimal(s9.toDouble / rs.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
      assert(w0.map(_._2).sorted == Seq(0L, 1L),
        s"exactly one row per cell across the restart, no loss/dup: $w0")
      val got = w0.map(r => r._2 -> ((r._3, r._4))).toMap
      assert(got(0L) == want(0L) && got(1L) == want(1L),
        s"restored window must combine run-1 AND run-2 vectors: $got vs $want")
    } finally q2.stop()
  }

  test("streaming IVF ingest: windowed cell state survives a query restart") {
    ivfIngestRestartScenario()
  }

  test("streaming IVF ingest restart under RocksDB: identical recovery") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try ivfIngestRestartScenario()
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  // Direct restart coverage for the MEDIA dedup fronts (they share the
  // bandOwnerVerdicts state machine whose text form has both-provider
  // restart specs above — these prove the media decode+band path feeds
  // that machine identically across a kill: run 1 claims the bands from
  // the ORIGINAL payload, run 2 must flag a transformed re-upload
  // against the RESTORED ownership, exactly once).
  private def perceptualRestartScenario(
      op: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      payloadA: Array[Byte], payloadA2: Array[Byte],
      filler: Int => Array[Byte]): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_smr_ckpt").toString
    val in = MemoryStream[(Timestamp, Long, Array[Byte])]
    val batches = new java.util.concurrent.ConcurrentHashMap[
      Long, Seq[(Long, Long, Long)]]()
    def start() = op(in.toDF().toDF("ts", "media_id", "payload"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        batches.put(bid, batch
          .select($"doc_id", $"n_band_hits",
            coalesce($"dup_of", lit(-1L)).as("dup_of"))
          .as[(Long, Long, Long)].collect().toSeq)
        ()
      }
      .start()
    val q1 = start()
    try {
      in.addData((ts(0), 0L, payloadA)) // A claims all 4 bands
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start()
    try {
      in.addData((ts(1), 1L, payloadA2)) // in-horizon re-upload of A
      q2.processAllAvailable()
      in.addData((ts(30), 9L, filler(91))) // watermark past ts(1)+horizon
      q2.processAllAvailable()
      in.addData((ts(45), 10L, filler(92))) // flush the final agg
      q2.processAllAvailable()
      val rows = { import scala.jdk.CollectionConverters._
        batches.asScala.values.flatten.toSeq }
      val byDoc = rows.groupBy(_._1)
      assert(byDoc.getOrElse(0L, Nil).map(r => (r._2, r._3)) == Seq((0L, -1L)),
        s"A must emit exactly one novel verdict across the restart: $rows")
      assert(byDoc.getOrElse(1L, Nil).map(r => (r._2, r._3)) == Seq((4L, 0L)),
        s"re-upload must hit A's 4 restored bands exactly once: $rows")
    } finally q2.stop()
  }

  test("streaming image dedup: band ownership survives a query restart") {
    perceptualRestartScenario(
      df => graft.streaming.StreamOps.streamingImageDedup(
        df, "ts", "media_id", "payload", horizonMs = 600000L),
      png(1), png(1), s => png(s))
  }

  test("streaming audio dedup: restored bands catch a volume-scaled " +
      "re-upload after restart") {
    perceptualRestartScenario(
      df => graft.streaming.StreamOps.streamingAudioDedup(
        df, "ts", "media_id", "payload", horizonMs = 600000L),
      wav(11L, 1.0), wav(11L, 0.5), s => wav(s.toLong, 1.0))
  }
}
