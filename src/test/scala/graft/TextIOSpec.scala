package graft

import java.nio.file.Files

import graft.io.{Injector, TextIO}
import org.apache.spark.sql.functions._

class TextIOSpec extends SparkSpec {

  test("S1/S2: write-read text roundtrip with sharding") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_text").toString + "/out"
    val lines = (1 to 100).map(i => s"line-$i")
    TextIO.writeLines(lines.toDS(), dir, shards = 3)
    val back = TextIO.readLines(spark, dir).collect().toSet
    assert(back == lines.toSet)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".txt")) == 3)
  }

  test("S2 compressed: gzip-sharded write reads back transparently; " +
      "files actually compressed") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_gz").toString + "/out"
    val lines = (1 to 500).map(i => s"compressible line $i " + ("pad " * 20))
    TextIO.writeLines(lines.toDS(), dir, shards = 2, compression = "gzip")
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".txt.gz"))
    assert(files.length == 2, "expected 2 gzip shards")
    // genuinely compressed: far smaller than the raw bytes
    val raw = lines.map(_.length + 1L).sum
    assert(files.map(_.length).sum < raw / 4,
      s"gzip shards not compressed: ${files.map(_.length).sum} vs $raw")
    // the READ path is the same readLines — decompression is transparent
    val back = TextIO.readLines(spark, dir).collect().toSet
    assert(back == lines.toSet)
  }

  test("S5 format breadth: ORC write-read roundtrip preserves the " +
      "documents schema and rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_orc").toString + "/docs_orc"
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == docs.schema, "ORC roundtrip must preserve schema")
    assert(back.count() == docs.count())
    // spot content: same doc_id -> text mapping
    val a = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().toMap
    val b = back.select($"doc_id", $"text").as[(Long, String)]
      .collect().toMap
    assert(a == b, "ORC roundtrip must preserve rows")
  }

  test("S10: keyed-by-file read tags each line with its source uri") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_multi")
    Files.write(base.resolve("a.txt"), "alpha\nbeta".getBytes)
    Files.write(base.resolve("b.txt"), "gamma".getBytes)
    val df = TextIO.readLinesKeyedByFile(spark, base.toString)
    val rows = df.select(element_at(split($"uri", "/"), -1).as("f"), $"line")
      .as[(String, String)].collect().toSet
    assert(rows == Set(("a.txt", "alpha"), ("a.txt", "beta"), ("b.txt", "gamma")))
  }

  test("S4: windowed write creates one directory per window partition") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_win").toString + "/out"
    val df = Seq(("2024-01-01 10:00:00", "x: 3"), ("2024-01-01 11:00:00", "y: 4"))
      .toDF("w_start", "line")
    TextIO.writeWindowedText(df, "w_start", dir)
    val parts = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(parts.exists(_.startsWith("w_start=2024-01-01 10")), s"got $parts")
    assert(parts.size == 2)
  }

  test("S4: writeOneFilePerWindow matches the reference filename policy") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_wofpw").toString + "/out"
    val df = Seq(
      ("2024-01-01 10:00:00", "2024-01-01 10:10:00", "a: 1"),
      ("2024-01-01 10:00:00", "2024-01-01 10:10:00", "b: 2"),
      ("2024-01-01 10:10:00", "2024-01-01 10:20:00", "c: 3"))
      .toDF("ws", "we", "value")
      .select($"ws".cast("timestamp").as("w_start"),
        $"we".cast("timestamp").as("w_end"), $"value")
    TextIO.writeOneFilePerWindow(df, dir, "output", shards = 2)
    val files = new java.io.File(dir).listFiles().filter(_.isFile)
      .map(_.getName).toSet
    // prefix-<HH:mm start>-<HH:mm end>-<shard>-of-<N>, per WriteOneFilePerWindow.java:85-110
    val pat = """output-\d\d:\d\d-\d\d:\d\d-\d+-of-\d+""".r
    assert(files.nonEmpty && files.forall(f => pat.matches(f)), s"got $files")
    assert(files.exists(_.startsWith("output-10:00-10:10-")) &&
      files.exists(_.startsWith("output-10:10-10:20-")), s"got $files")
    // all rows land exactly once across the window's shard files
    val lines = new java.io.File(dir).listFiles().filter(_.isFile)
      .flatMap(f => scala.io.Source.fromFile(f).getLines()).toSeq.sorted
    assert(lines == Seq("a: 1", "b: 2", "c: 3"))
    // no staging leftovers
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith(".staging")))

    // Re-run into the SAME dir with different data: a window's previous
    // file set must be overwritten, not collide on rename or mix with
    // the new files (reference sink overwrite semantics). The second
    // write has fewer shards, so stale -1-of-2 files must also go.
    val df2 = Seq(("2024-01-01 10:00:00", "2024-01-01 10:10:00", "z: 9"))
      .toDF("ws", "we", "value")
      .select($"ws".cast("timestamp").as("w_start"),
        $"we".cast("timestamp").as("w_end"), $"value")
    TextIO.writeOneFilePerWindow(df2, dir, "output", shards = 1)
    val files2 = new java.io.File(dir).listFiles().filter(_.isFile)
      .map(_.getName).toSet
    assert(files2.count(_.startsWith("output-10:00-10:10-")) == 1, s"got $files2")
    // the untouched 10:10-10:20 window keeps its round-1 output
    assert(files2.exists(_.startsWith("output-10:10-10:20-")), s"got $files2")
    val lines2 = new java.io.File(dir).listFiles().filter(_.isFile)
      .filter(_.getName.startsWith("output-10:00-10:10-"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines()).toSeq
    assert(lines2 == Seq("z: 9"), s"got $lines2")
  }

  test("S3: CSV write-read roundtrip with explicit schema") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_csv").toString + "/out"
    val df = Seq((1L, "a", 1.5), (2L, "b", -0.25)).toDF("id", "name", "v")
    TextIO.writeCsv(df, dir)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("v", DoubleType)))
    val back = TextIO.readCsv(spark, dir, schema)
      .as[(Long, String, Double)].collect().toSet
    assert(back == Set((1L, "a", 1.5), (2L, "b", -0.25)))
  }

  test("S7: parquet table sink honors overwrite and append dispositions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pq").toString + "/t"
    Seq((1L, "x")).toDF("k", "v").write.mode("overwrite").parquet(dir)
    Seq((2L, "y")).toDF("k", "v").write.mode("append").parquet(dir)
    assert(spark.read.parquet(dir).count() == 2)
    Seq((3L, "z")).toDF("k", "v").write.mode("overwrite").parquet(dir)
    assert(spark.read.parquet(dir).as[(Long, String)].collect().toSet ==
      Set((3L, "z")))
  }

  test("S12: injector lateness model is deterministic") {
    val ev = Injector.events(n = 20, keys = Seq("a", "b"), baseMs = 0L,
      stepMs = 1000L, lateEvery = 5, delayMs = 60000L)
    assert(ev.count(e => e.eventTimeMs != e.arrivalMs) == 4)
    assert(ev == Injector.events(20, Seq("a", "b"), 0L, 1000L, 5, 60000L))
  }

  test("S13: JSONL roundtrip; corrupt lines survive as counted rejects") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    // write a valid JSONL shard, then append a hand-broken one
    val docs = Seq((1L, "alpha", "en"), (2L, "beta", "de"))
      .toDF("doc_id", "text", "lang")
    TextIO.writeJsonl(docs, s"$dir/out")
    val extra = new java.io.PrintWriter(s"$dir/out/part-corrupt.json")
    extra.println("""{"doc_id": 3, "text": "gamma", "lang": "fr"}""")
    extra.println("""{"doc_id": 4, "text": BROKEN""")
    extra.close()
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType)))
    val got = TextIO.readJsonl(spark, s"$dir/out", schema)
    assert(TextIO.jsonlRejects(spark, s"$dir/out", schema) == 1,
      "exactly the broken line rejects")
    val ok = got.filter($"_corrupt".isNull)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSet
    assert(ok == Set((1L, "alpha"), (2L, "beta"), (3L, "gamma")),
      s"valid rows must all load: $ok")
  }
}
