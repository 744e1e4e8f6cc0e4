package graft

import graft.operators.BloomDecontaminate
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {

  private def shingleRows(nDocs: Int, perDoc: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(5)
    // draw from a vocab small enough that cross-doc overlap exists
    (0 until nDocs).flatMap { d =>
      Seq.fill(perDoc)(rnd.nextLong(4000L)).distinct
        .map(sh => (d.toLong, sh))
    }
  }

  test("bloom build: every inserted element is contained (zero false negatives)") {
    import spark.implicits._
    val xs = (0L until 5000L).map(_ * 2654435761L % 1000000007L).distinct
    val bloom = BloomDecontaminate.build(xs.toDS(), numBits = 1 << 16)
    xs.foreach(x => assert(bloom.mightContain(x), s"lost element $x"))
  }

  test("bloom build is partition-independent (OR-merge associativity)") {
    import spark.implicits._
    val xs = (0L until 2000L).map(x => x * x + 7)
    val one = BloomDecontaminate.build(
      xs.toDS().repartition(1), numBits = 1 << 14)
    val eight = BloomDecontaminate.build(
      xs.toDS().repartition(8), numBits = 1 << 14)
    assert(one.bits.sameElements(eight.bits))
  }

  test("false-positive rate stays near theory at the sized load") {
    import spark.implicits._
    // n=2000 into m=2^15 bits, k=4: theory FP = (1-e^(-kn/m))^k ≈ 0.31%
    val inserted = (0L until 2000L).map(x => x * 31 + 1)
    val bloom = BloomDecontaminate.build(inserted.toDS(), numBits = 1 << 15)
    val insertedSet = inserted.toSet
    val probes = (1L to 100000L).map(_ + 1000000L).filterNot(insertedSet)
    val fp = probes.count(bloom.mightContain)
    assert(fp.toDouble / probes.size < 0.01,
      s"$fp false positives in ${probes.size} probes")
    assert(fp > 0, "a loaded bloom filter should show SOME false positives")
  }

  test("bloom path reproduces the d9 query on the real documents table") {
    import spark.implicits._
    // the PRODUCTION shingle pipeline (fused 8-gram expr over documents),
    // d9's exact hash-sample split, an oversized filter: the Bloom path
    // must reproduce the oracle-checked d9 output verbatim
    val dir = "/root/testdata/sf0.001"
    val sh = graft.core.Tables.documents(spark, dir).select($"doc_id",
      explode(graft.functions.HashedShinglesExpr
        .hashedShingles($"text", 8)).as("shingle"))
    val viaBloom = graft.operators.BloomDecontaminate
      .decontaminate(spark, sh, benchFrac = 0.05, numBits = 1 << 22)
      .as[(Long, Long)].collect().toMap
    val exact = SparkEntry.queries("d9_decontaminate")(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(exact.nonEmpty && viaBloom == exact)
  }

  test("decontaminate: exact-join flags are a subset; counts match on true hits") {
    import spark.implicits._
    val rows = shingleRows(nDocs = 300, perDoc = 12)
    val df = rows.toDF("doc_id", "shingle")
    val benchFrac = 0.1
    // exact reference: d9's equi-join shape
    val isBench = graft.functions.HashFunctions.hashSample($"doc_id", benchFrac)
    val bench = df.filter(isBench).select($"shingle").distinct()
    val exact = df.filter(!isBench).join(bench, Seq("shingle"))
      .groupBy($"doc_id").agg(count(lit(1)).as("n_hit"))
      .as[(Long, Long)].collect().toMap
    val bloom = BloomDecontaminate
      .decontaminate(spark, df, benchFrac, numBits = 1 << 20)
      .as[(Long, Long)].collect().toMap
    assert(exact.nonEmpty, "fixture must produce genuine contamination")
    // no false negatives: every exactly-flagged doc is bloom-flagged with
    // AT LEAST the exact count (bloom can only add hits, never drop them)
    exact.foreach { case (doc, n) =>
      assert(bloom.contains(doc), s"doc $doc lost by bloom path")
      assert(bloom(doc) >= n, s"doc $doc: bloom ${bloom(doc)} < exact $n")
    }
    // at 2^20 bits for ~a few hundred shingles, FP ≈ 0: paths agree
    assert(bloom == exact,
      "oversized filter should reproduce the exact join verbatim")
  }
}
