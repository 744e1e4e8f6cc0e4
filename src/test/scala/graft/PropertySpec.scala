package graft

import java.sql.Timestamp

import graft.functions.HashFunctions
import graft.operators.KeyedOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style invariants (SURVEY §5): deterministic scalacheck
  * generators (fixed seed — CI-reproducible), Spark-evaluated assertions.
  */
class PropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(42L))

  private val tsGen: Gen[Long] = // micros across ~3 days
    Gen.chooseNum(0L, 3L * 86400 * 1000000)

  test("tumbling windows partition the timeline: every event in exactly one window") {
    import spark.implicits._
    val events = sample(tsGen, 500).map(us => new Timestamp(us / 1000))
      .toDF("ts")
    val n = events.count()
    val windowed = events.groupBy(window($"ts", "1 hour")).agg(count(lit(1)).as("c"))
    assert(windowed.agg(sum($"c")).head.getLong(0) == n)
    // window bounds actually contain their events
    val bad = events.select($"ts", window($"ts", "1 hour").as("w"))
      .filter($"ts" < $"w.start" || $"ts" >= $"w.end").count()
    assert(bad == 0)
  }

  test("sliding windows assign exactly duration/slide windows per event") {
    import spark.implicits._
    val events = sample(tsGen, 300).map(us => new Timestamp(us / 1000))
      .toDF("ts")
    val n = events.count()
    val windowed = events
      .groupBy(window($"ts", "1 hour", "15 minutes")).agg(count(lit(1)).as("c"))
    assert(windowed.agg(sum($"c")).head.getLong(0) == n * 4)
  }

  test("session windows partition events and sessions are gap-separated") {
    import spark.implicits._
    val events = sample(Gen.zip(Gen.chooseNum(1L, 5L), tsGen), 400)
      .map { case (u, us) => (u, new Timestamp(us / 1000)) }
      .toDF("user_id", "ts")
    val n = events.count()
    val sessions = events
      .groupBy(session_window($"ts", "10 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("c"))
    assert(sessions.agg(sum($"c")).head.getLong(0) == n)
    // consecutive sessions of one user are >= gap apart
    val gaps = sessions
      .withColumn("prev_end", lag($"w.end", 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"w.start")))
      .filter($"prev_end".isNotNull &&
        $"w.start" < $"prev_end")
      .count()
    assert(gaps == 0)
  }

  test("tolerant parsing never throws and classifies every row (P13)") {
    import spark.implicits._
    val junk = sample(Gen.oneOf(
      Gen.alphaNumStr, Gen.const(""), Gen.const("{\"k\": 12}"),
      Gen.const("{\"k\": }"), Gen.asciiPrintableStr), 500)
    val df = junk.toDF("props")
      .withColumn("k", expr(
        "try_cast(regexp_extract(props, '\"k\": (\\\\d+)', 1) AS INT)"))
    val total = df.count()
    val classified = df.filter($"k".isNotNull).count() +
      df.filter($"k".isNull).count()
    assert(classified == total)
  }

  test("traffic lane parse (P14 CSV): never throws, matches the reference extraction model") {
    import spark.implicits._
    // random rows: valid layouts, short rows, garbage numerics, empty lanes
    val fieldGen: Gen[String] = Gen.oneOf(
      Gen.const(""), Gen.chooseNum(0, 500).map(_.toString),
      Gen.const("garbage"), Gen.const("-1"), Gen.const(".0092"))
    val rowGen: Gen[String] = for {
      nFields <- Gen.oneOf(Gen.chooseNum(0, 47), Gen.const(50))
      ts <- Gen.oneOf("01/01/2010 00:05:00", "not a time", "")
      fields <- Gen.listOfN(math.max(0, nFields - 1), fieldGen)
    } yield (ts +: fields).mkString(",")
    val rows = sample(rowGen, 400)
    val got = graft.pipelines.ReferencePipelines
      .parseLaneReadings(rows.toDS())
      .select($"station", $"lane", $"flow", $"occupancy", $"speed")
      .as[(String, String, Int, Double, Double)]
      .collect().toSet
    // reference model (`TrafficMaxLaneFlow.scala:199-236`): >=48 fields,
    // parsable ts, lane i kept iff flow/occupancy/speed all numeric
    def toInt(s: String) = scala.util.Try(s.toInt).toOption
    def toDbl(s: String) = scala.util.Try(s.toDouble).toOption
    val expected = (for {
      r <- rows
      f = r.split(",", -1)
      if f.length >= 48 && f(0) == "01/01/2010 00:05:00"
      i <- 1 to 8
      flow <- toInt(f(6 + 5 * i))
      occ <- toDbl(f(7 + 5 * i))
      speed <- toDbl(f(8 + 5 * i))
    } yield (f(1), s"lane $i", flow, occ, speed)).toSet
    assert(got == expected,
      s"missing=${expected -- got}\nspurious=${got -- expected}")
    assert(expected.nonEmpty, "degenerate sample: no valid lanes generated")
  }

  test("salted top-k == plain top-k on random skewed data") {
    import spark.implicits._
    val rows = sample(Gen.zip(Gen.oneOf("hot", "hot", "hot", "a", "b"),
      Gen.chooseNum(0, 1000000)), 2000)
      .zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
      .toDF("k", "v", "id")
    val plain = KeyedOps.topKPerKey(rows, Seq($"k"), Seq($"v".desc, $"id".desc), 7)
      .select($"k", $"id").collect().toSet
    val salted = KeyedOps.topKPerKeySalted(rows, Seq($"k"),
        Seq($"v".desc, $"id".desc), 7, fanout = 8)
      .select($"k", $"id").collect().toSet
    assert(plain == salted)
  }

  test("hash sampling rate concentrates near the target fraction") {
    import spark.implicits._
    val ids = (0L until 20000L).toDF("id")
    val kept = ids.filter(HashFunctions.hashSample($"id", 0.1)).count()
    assert(kept > 1600 && kept < 2400, s"kept $kept of 20000 at frac 0.1")
  }

  test("MinHash signature agreement estimates Jaccard (sanity bound)") {
    import spark.implicits._
    // identical sets -> identical signatures; disjoint sets -> (almost
    // surely) different first components
    val h = (c: org.apache.spark.sql.Column) =>
      pmod(HashFunctions.javaStringHashCode(c).cast("long"), lit(4294967296L))
    val df = Seq(
      ("x", Seq("a b c", "b c d")), ("y", Seq("a b c", "b c d")),
      ("z", Seq("p q r", "q r s"))).toDF("id", "shingles")
    val sig2 = df.select($"id", explode($"shingles").as("s"))
      .select($"id", h($"s").as("hs"))
      .groupBy($"id").agg(min($"hs").as("m0"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sig2("x") == sig2("y"))
    assert(sig2("x") != sig2("z"))
  }

  // random "documents": word runs with varied whitespace separators,
  // occasional unicode and empty/degenerate shapes
  private val docGen: Gen[String] = {
    val word = Gen.oneOf(
      Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString),
      Gen.oneOf("a", "b", "the", "Ünï", "x1", "!?#"))
    val sep = Gen.nonEmptyListOf(Gen.oneOf(' ', ' ', ' ', '\t', '\n', '\u000B', '\f', '\r'))
      .map(_.mkString)
    for {
      n <- Gen.chooseNum(0, 12)
      ws <- Gen.listOfN(n, word)
      ss <- Gen.listOfN(n + 1, sep)
    } yield (ss.head +: ws.zip(ss.tail).flatMap { case (w, s) => Seq(w, s) })
      .mkString
  }

  test("hashedShingles: fused expr == reference fold on random docs") {
    import spark.implicits._
    import graft.functions.HashedShinglesExpr
    def ref(text: String, n: Int): Seq[Long] = {
      val toks = text.split("\\s+").filter(_.nonEmpty)
      if (toks.length < n) Seq.empty
      else toks.sliding(n).map(_.map(t =>
        BigInt(t.hashCode) mod BigInt(4294967296L))
        .reduceLeft((g, h) => (g * 1000003 + h) mod BigInt(4294967296L))
        .toLong).toSeq.distinct.sorted
    }
    val docs = sample(docGen, 300)
    Seq(1, 2, 3, 5).foreach { n =>
      val got = docs.toDF("t")
        .select(HashedShinglesExpr.hashedShingles($"t", n).as("sh"))
        .as[Seq[Long]].collect()
      docs.zip(got).foreach { case (d, g) =>
        assert(g == ref(d, n), s"n=$n doc=${d.replace("\n", "\\n")}")
      }
    }
  }

  test("simhash32: fused expr == reference bit-vote on random docs") {
    import spark.implicits._
    import graft.functions.SimHashExpr
    def ref(text: String): Long = {
      val hs = text.split("\\s+").filter(_.nonEmpty)
        .map(t => BigInt(t.hashCode).mod(BigInt(4294967296L)).toLong)
      (0 until 32).map { b =>
        val votes = hs.map(h => if (((h >> b) & 1L) == 1L) 1 else -1).sum
        if (votes > 0) 1L << b else 0L
      }.sum
    }
    val docs = sample(docGen, 300)
    val got = docs.toDF("t")
      .select(SimHashExpr.simhash32($"t")).as[Long].collect()
    docs.zip(got).foreach { case (d, g) =>
      assert(g == ref(d), s"doc=${d.replace("\n", "\\n")}")
    }
  }
}
