package graft

import java.sql.Timestamp

import graft.streaming.LeaderBoard
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class LeaderBoardSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("one source, two branches: windowed team totals + running user totals (W5/W11)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String, Double)]
    val events = in.toDF().toDF("ts", "user_id", "team", "value")

    val teamQ = LeaderBoard.teamWindowTotals(events, "10 minutes", "1 minute")
      .writeStream.format("memory").queryName("lb_team")
      .outputMode("append").start()
    val userQ = LeaderBoard.userRunningTotals(events)
      .writeStream.format("memory").queryName("lb_user")
      .outputMode("update").start()
    try {
      in.addData((ts(1), 1L, "red", 5.0), (ts(2), 2L, "blue", 3.0))
      teamQ.processAllAvailable(); userQ.processAllAvailable()
      in.addData((ts(3), 1L, "red", 2.0))
      teamQ.processAllAvailable(); userQ.processAllAvailable()
      // user totals accumulate across triggers (global window, update mode)
      val users = spark.table("lb_user").as[(Long, Double)].collect()
        .groupBy(_._1).map { case (u, rows) => u -> rows.map(_._2).max }
      assert(users == Map(1L -> 7.0, 2L -> 3.0), s"got $users")

      // close the 10:00 window: watermark past 10:10 + 1min
      in.addData((ts(12), 3L, "red", 1.0))
      teamQ.processAllAvailable()
      val teams = spark.table("lb_team").as[(Timestamp, String, Double)]
        .collect().toSet
      assert(teams == Set((ts(0), "red", 7.0), (ts(0), "blue", 3.0)),
        s"got $teams")
    } finally { teamQ.stop(); userQ.stop() }
  }
}
