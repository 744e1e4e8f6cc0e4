package graft

import java.sql.Timestamp

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** W10 EXACT per-pane cadence (round 20, r19 verdict item 7 — the last
  * documented trigger relaxation in SURVEY §7.4 risk 1): Beam's
  * `AfterProcessingTime.pastFirstElementInPane().plusDelayOf(d)` fires
  * a pane d of processing time after the pane's FIRST element, with all
  * elements arriving during the delay riding the same pane — a
  * coalescing the fire-per-trigger `panedCounts` shape cannot express.
  * `cadencedPanes` carries (paneFirstProcMs, firedProcMs) on every pane
  * precisely so these specs can pin the cadence arithmetic rather than
  * sleep-and-hope: the LOWER bound (fired >= first + delay) is exact
  * and asserted unconditionally; wall-clock-dependent "nothing fired
  * yet" / "all rows rode one pane" checks guard on measured elapsed
  * time so a slow CI box skips them instead of flaking.
  *
  * NOTE on driving the query: with ProcessingTimeTimeout the engine's
  * `shouldRunAnotherBatch` is permanently true (timer batches), so
  * `processAllAvailable()` LIVELOCKS — its no-new-data signal never
  * fires. These specs therefore never call it: the engine runs batches
  * continuously on its own, and the specs poll the memory sink with a
  * bounded timeout.
  */
class W10CadenceSpec extends SparkSpec {

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  private val earlyMs = 1500L
  private val lateMs = 2000L

  private def await(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val t0 = System.currentTimeMillis()
    var ok = cond
    while (!ok && System.currentTimeMillis() - t0 < timeoutMs) {
      Thread.sleep(150L); ok = cond
    }
    ok
  }

  test("W10: early panes coalesce to first-element + delay cadence; " +
      "ON_TIME at watermark; late cadence; expiry GC") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    // 10-minute windows, 5 min lateness: k's window [10:00,10:10) ends
    // 10:10, expires at Beam watermark 10:15
    val panes = StreamOps.cadencedPanes(
      in.toDF().toDF("key", "ts"), windowMs = 600000L,
      latenessMs = 300000L, earlyDelayMs = earlyMs, lateDelayMs = lateMs,
      pollMs = 100L)
    val q = panes.toDF().writeStream.format("memory").queryName("w10_test")
      .outputMode("update").start()
    def kPanes(): Seq[StreamOps.CadencePane] =
      spark.table("w10_test").as[StreamOps.CadencePane].collect()
        .filter(_.key == "k").sortBy(_.paneIndex).toSeq
    try {
      // three adds within the early delay: per-trigger firing (the old
      // relaxation) would emit up to 3 panes; exact cadence emits ONE,
      // earlyMs after the first element
      val t0 = System.currentTimeMillis()
      in.addData(("k", ts(1)), ("k", ts(2)))
      in.addData(("k", ts(3)))
      val addElapsed = System.currentTimeMillis() - t0
      assert(await(20000L)(kPanes().nonEmpty), "no EARLY pane within 20s")
      val early = kPanes()
      assert(early.head.timing == "EARLY" && early.head.paneIndex == 0,
        s"got $early")
      assert(early.map(_.delta).sum == 3L && early.last.cumulative == 3L,
        s"got $early")
      if (addElapsed < earlyMs)
        // all three rows arrived inside one cadence window -> they must
        // have ridden ONE pane (the coalescing panedCounts cannot do)
        assert(early.size == 1 && early.head.delta == 3L,
          s"rows within one cadence window split panes: $early")
      assert(early.head.firedProcMs - early.head.paneFirstProcMs >= earlyMs,
        s"EARLY fired ${early.head.firedProcMs - early.head.paneFirstProcMs}" +
          s" ms after first element — cadence $earlyMs not honored")
      val nEarly = kPanes().size
      // watermark crosses window end 10:10 -> exactly one ON_TIME pane,
      // delta 0 (no pending data), detected by the poll timer
      in.addData(("w", ts(12)))
      assert(await(20000L)(kPanes().exists(_.timing == "ON_TIME")),
        "no ON_TIME pane within 20s of the watermark crossing")
      val afterOT = kPanes()
      assert(afterOT.size == nEarly + 1 &&
        afterOT.last.timing == "ON_TIME" && afterOT.last.delta == 0L &&
        afterOT.last.cumulative == 3L, s"got $afterOT")
      // late row within lateness (wm 10:12 < expiry 10:15): a late pane
      // opens and fires lateMs after ITS first element
      in.addData(("k", ts(5)))
      assert(await(20000L)(kPanes().exists(_.timing == "LATE")),
        "no LATE pane within 20s")
      val late = kPanes().filter(_.timing == "LATE")
      assert(late.size == 1 && late.head.delta == 1L &&
        late.head.cumulative == 4L, s"got $late")
      assert(late.head.firedProcMs - late.head.paneFirstProcMs >= lateMs,
        s"LATE fired ${late.head.firedProcMs - late.head.paneFirstProcMs}" +
          s" ms after first late element — cadence $lateMs not honored")
      // watermark past expiry 10:15: state GC'd (nothing pending ->
      // nothing flushed); straggler discarded, cumulative stays 4
      val sizeBefore = kPanes().size
      in.addData(("z", ts(30)))
      Thread.sleep(1000L)
      in.addData(("k", ts(6)))
      // bounded settle: give a straggler pane every chance to appear
      await(3000L)(kPanes().size > sizeBefore)
      val fin = kPanes()
      assert(fin.size == sizeBefore && fin.map(_.cumulative).max == 4L,
        s"straggler past expiry must be discarded, got $fin")
    } finally q.stop()
  }

  test("W10: expiry flushes a pending pane (FIRE_IF_NON_EMPTY) and " +
      "exactly one ON_TIME fires even on a single-jump watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val panes = StreamOps.cadencedPanes(
      in.toDF().toDF("key", "ts"), windowMs = 600000L,
      latenessMs = 300000L, earlyDelayMs = earlyMs, lateDelayMs = lateMs,
      pollMs = 100L)
    val q = panes.toDF().writeStream.format("memory").queryName("w10_jump")
      .outputMode("update").start()
    def mPanes(): Seq[StreamOps.CadencePane] =
      spark.table("w10_jump").as[StreamOps.CadencePane].collect()
        .filter(_.key == "m").sortBy(_.paneIndex).toSeq
    try {
      in.addData(("m", ts(21))) // window [10:20,10:30), expiry 10:35
      // one advance jumps the watermark past end AND end+lateness: the
      // pending element must flush (ON_TIME — the on-time firing never
      // happened), then the window GCs. On a slow box the early cadence
      // may legitimately fire first; either way: exactly one ON_TIME
      // pane, final cumulative 1, at most two panes total.
      in.addData(("z", ts(40)))
      assert(await(20000L)(mPanes().exists(_.timing == "ON_TIME")),
        "no ON_TIME flush within 20s of the watermark jump")
      val got = mPanes()
      assert(got.count(_.timing == "ON_TIME") == 1, s"got $got")
      assert(got.last.cumulative == 1L && got.size <= 2, s"got $got")
      // straggler: window expired, no further panes
      in.addData(("m", ts(22)))
      await(3000L)(mPanes().size > got.size)
      assert(mPanes().size == got.size,
        s"straggler emitted a pane: ${mPanes()}")
    } finally q.stop()
  }
}
