package graft

import java.sql.Timestamp

import graft.pipelines.ReferencePipelines
import org.apache.spark.sql.functions._

class ReferencePipelinesSpec extends SparkSpec {

  private def ts(h: Int, m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("wordCount counts reference-tokenized words") {
    import spark.implicits._
    val out = ReferencePipelines.wordCount(
        Seq("a b a", "b! c?").toDS())
      .as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
  }

  test("debuggingWordCount filters and reports observe counters") {
    import spark.implicits._
    val df = ReferencePipelines.debuggingWordCount(
      Seq("Flourish and Flourish", "the stomach of it").toDS())
    val rows = df.as[(String, Long)].collect().toMap
    assert(rows == Map("Flourish" -> 2L, "stomach" -> 1L))
  }

  test("windowedWordCount buckets words by event-time window") {
    import spark.implicits._
    val lines = Seq((ts(10, 5), "x y"), (ts(10, 20), "x"), (ts(11, 1), "x"))
      .toDF("ts", "line")
    val out = ReferencePipelines.windowedWordCount(lines, "1 hour")
      .as[(Timestamp, String, Long)].collect().toSet
    assert(out == Set((ts(10, 0), "x", 2L), (ts(10, 0), "y", 1L),
      (ts(11, 0), "x", 1L)))
  }

  test("tfIdf: rarer words score higher at equal tf") {
    import spark.implicits._
    val docs = Seq(("u1", "apple banana"), ("u2", "apple cherry"))
      .toDF("uri", "line")
    val out = ReferencePipelines.tfIdf(docs)
      .as[(String, String, Double)].collect()
      .map { case (u, w, s) => (u, w) -> s }.toMap
    assert(out(("u1", "apple")) == 0.0) // df = 2 of 2 docs -> ln(1) = 0
    assert(out(("u1", "banana")) > 0.0 && out(("u2", "cherry")) > 0.0)
    assert(out(("u1", "banana")) == out(("u2", "cherry")))
  }

  test("hourlyTeamScore filters the time range then windows hourly") {
    import spark.implicits._
    val events = Seq(
      (ts(9, 59), "red", 1.0), (ts(10, 1), "red", 2.0),
      (ts(10, 30), "red", 3.0), (ts(11, 1), "blue", 4.0), (ts(12, 1), "red", 9.0)
    ).toDF("ts", "team", "value")
    val out = ReferencePipelines.hourlyTeamScore(events,
        "2024-01-01 10:00:00", "2024-01-01 12:00:00")
      .as[(Timestamp, String, Double)].collect().toSet
    assert(out == Set((ts(10, 0), "red", 5.0), (ts(11, 0), "blue", 4.0)))
  }

  test("topSessionsPerMonth keeps the longest session per month") {
    import spark.implicits._
    val events = Seq(
      (ts(10, 0), 1L), (ts(10, 30), 1L), (ts(10, 50), 1L), // u1: 3-event session
      (ts(14, 0), 2L), (ts(14, 10), 2L)                    // u2: 2-event session
    ).toDF("ts", "user_id")
    val out = ReferencePipelines.topSessionsPerMonth(events)
      .select($"user_id", $"session_len").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 3L)))
  }

  test("maxLaneFlow keeps the arg-max reading per (window, station)") {
    import spark.implicits._
    val readings = Seq(
      (ts(10, 0), "s1", 1, 10.0), (ts(10, 2), "s1", 2, 30.0),
      (ts(10, 4), "s2", 1, 5.0)
    ).toDF("ts", "station", "lane", "flow")
    val out = ReferencePipelines.maxLaneFlow(readings, "10 minutes", "5 minutes")
      .select($"station", $"lane", $"flow")
      .as[(String, Int, Double)].collect().toSet
    // each reading lands in 2 sliding windows; arg-max per (window, station)
    assert(out.contains(("s1", 2, 30.0)) && out.contains(("s2", 1, 5.0)))
    assert(!out.exists(r => r._1 == "s1" && r._3 == 10.0))
  }

  test("parseGameEvents tolerates malformed CSV and counts errors (FIXTURES §1)") {
    import spark.implicits._
    val lines = Seq(
      "user1_A,A,10,1445230923951,2015-11-02 09:09:28.224",
      "user2_B,B,7,1445230923952",
      "THIS IS NOT CSV",
      "user3_C,C,notanumber,1445230923953",
      "user4_D,D,3,alsobad").toDS()
    val parsed = ReferencePipelines.parseGameEvents(lines)
    val rows = parsed.select($"user", $"score").as[(String, Int)].collect().toSet
    assert(rows == Set(("user1_A", 10), ("user2_B", 7)))
  }

  test("SQL surface exposes java_string_hashcode via GraftExtensions") {
    val r = spark.sql("SELECT java_string_hashcode('Flourish') AS h")
      .collect().head.getInt(0)
    assert(r == "Flourish".hashCode)
  }

  test("SQL surface exposes hashed_shingles and simhash32") {
    val sh = spark.sql("SELECT hashed_shingles('a b c d', 3) AS sh")
      .collect().head.getSeq[Long](0)
    def u32(s: String) = BigInt(s.hashCode).mod(BigInt(4294967296L))
    def fold(ws: Seq[String]) = ws.map(u32)
      .reduceLeft((g, h) => (g * 1000003 + h) mod BigInt(4294967296L)).toLong
    assert(sh.sorted == Seq(fold(Seq("a", "b", "c")),
      fold(Seq("b", "c", "d"))).sorted)
    assert(sh == sh.sorted) // expression contract: sorted distinct
    val sim = spark.sql("SELECT simhash32('a') AS s").collect().head.getLong(0)
    assert(sim == u32("a").toLong) // single token: bits = its own hash
    // non-literal n is rejected with a usable message
    val err = intercept[Exception](
      spark.sql("SELECT hashed_shingles('a b c', length('xy')) AS sh")
        .collect())
    assert(err.getMessage.contains("hashed_shingles"))
    val rep = spark.sql(
      "SELECT r.* FROM (SELECT repetition_stats('dup dup dup') AS r)")
      .collect().head
    assert((rep.getInt(0), rep.getInt(1), rep.getInt(2)) == ((3, 1, 2)),
      "3 tokens, 1 distinct, (dup,dup) bigram twice")
  }
}
