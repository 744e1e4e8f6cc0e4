package graft.operators

import graft.functions.HashFunctions
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-filter decontamination — the broadcast twin of the exact
  * `d9_decontaminate` equi-join.
  *
  * d9's shape shuffles the corpus shingles against the benchmark shingle
  * set; at 100 TB that is a corpus-sized shuffle even though the
  * benchmark side is tiny. The production alternative: fold the
  * benchmark shingles into a fixed-size Bloom bitset ONCE (size set by
  * the PARAMETER, not the data — 2^27 bits = 16 MiB holds ~10M shingles
  * at k=4 with FP ≈ 0.3%), broadcast it, and probe rowwise — the corpus
  * never shuffles, never joins. The trade is explicit: false POSITIVES
  * at the advertised rate (docs flagged that share nothing), NEVER false
  * negatives (`BloomSpec` proves exact-flagged ⊆ bloom-flagged
  * differentially).
  *
  * Hashing: double hashing h_i(x) = (a + i·b) mod m with a, b derived
  * from two avalanched knuth rounds (`HashFunctions.knuthHash` of x,
  * then of a ⊕ (a >> 16) — the same portable u32 arithmetic as the rest
  * of the engine; b is forced odd so the probe sequence cycles through
  * all of m when m is a power of two). Build is a `treeAggregate` of
  * OR-able bitsets — associative and commutative, so partitioning never
  * changes the filter (spec-asserted).
  *
  * Reference analog: the reference's side-input filter patterns (e.g.
  * `/root/reference/src/main/scala/org/apache/beam/examples/scala/complete/game/GameStats.scala`
  * spammy-user map side input) — a small derived set broadcast against
  * the big stream; here the set is compressed to bits so "small" stays
  * true at millions of entries.
  */
object BloomDecontaminate {

  /** Immutable bitset Bloom filter; `bits.length * 64` is a power of
    * two (enforced by [[build]]).
    */
  final case class BloomFilter(bits: Array[Long], numHashes: Int) {
    def mightContain(x: Long): Boolean = {
      val mask = bits.length * 64L - 1
      val a = knuthU32(x)
      val b = knuthU32(a ^ (a >>> 16)) | 1L
      var i = 0
      while (i < numHashes) {
        val bit = (a + i * b) & mask
        if ((bits((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
        i += 1
      }
      true
    }
  }

  private def addTo(bits: Array[Long], numHashes: Int, x: Long): Unit = {
    val mask = bits.length * 64L - 1
    val a = knuthU32(x)
    val b = knuthU32(a ^ (a >>> 16)) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = (a + i * b) & mask
      bits((bit >>> 6).toInt) |= 1L << (bit & 63)
      i += 1
    }
  }

  @inline private def knuthU32(x: Long): Long =
    HashFunctions.knuthHashJvm(x)

  /** Builds the filter from a column of long shingle hashes.
    *
    * @param numBits power of two; the DRIVER holds numBits/8 bytes —
    *   bounded by this parameter, independent of the data (the bounded-
    *   collect category, like v1's query slice). 2^27 ≈ 16 MiB.
    */
  def build(shingles: Dataset[Long], numBits: Int,
            numHashes: Int = 4): BloomFilter = {
    require(numBits >= 64 && Integer.bitCount(numBits) == 1,
      s"numBits must be a power of two >= 64, got $numBits")
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    val k = numHashes
    val bits = shingles.rdd.treeAggregate(new Array[Long](numBits / 64))(
      seqOp = { (buf, x) => addTo(buf, k, x); buf },
      combOp = { (a, b) =>
        var i = 0
        while (i < a.length) { a(i) |= b(i); i += 1 }
        a
      })
    BloomFilter(bits, k)
  }

  /** Per-doc Bloom hit counts over (doc_id, shingle) rows — the d9
    * output shape. The probe is a rowwise filter (JIT escape, the
    * v1/v9 pattern); the only shuffle left is the final per-doc agg,
    * which carries flagged rows only.
    */
  def flaggedCounts(s: SparkSession, corpusShingles: DataFrame,
                    bloom: BloomFilter): DataFrame = {
    import s.implicits._
    val bc = s.sparkContext.broadcast(bloom)
    corpusShingles.select(col("doc_id").cast("long"),
        col("shingle").cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val f = bc.value
        it.filter { case (_, sh) => f.mightContain(sh) }
      }
      .toDF("doc_id", "shingle")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_hit_bloom"))
  }

  /** d9's full pipeline on the Bloom path: hash-sample benchmark split,
    * build from the benchmark's distinct shingles, probe the rest.
    */
  def decontaminate(s: SparkSession, docShingles: DataFrame,
                    benchFrac: Double, numBits: Int,
                    numHashes: Int = 4): DataFrame = {
    import s.implicits._
    val isBench = HashFunctions.hashSample(col("doc_id"), benchFrac)
    val bench = docShingles.filter(isBench)
      .select(col("shingle").cast("long")).distinct().as[Long]
    val bloom = build(bench, numBits, numHashes)
    flaggedCounts(s, docShingles.filter(!isBench), bloom)
  }
}
