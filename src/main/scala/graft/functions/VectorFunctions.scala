package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns, built from native
  * higher-order functions (`zip_with`/`aggregate`) so the whole similarity
  * computation stays inside codegen — no UDF, no driver collect.
  *
  * All arithmetic is promoted to double, summed in index order, so results
  * are deterministic and reproducible by the oracle.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine over float-array columns — since round 11 the fused codegen
    * [[CosineSimExpr]] (one JIT'd loop, inside WholeStageCodegen) rather
    * than the composed `dot/(norm*norm)` HOF form: `zip_with`/
    * `aggregate` lambdas evaluate INTERPRETED per element, 3×dim closure
    * calls per candidate pair on the bucket-joined kNN frames.
    * Bit-identical by construction (same index-order double folds).
    */
  def cosine(a: Column, b: Column): Column =
    CosineSimExpr.cosineF32(a, b)

  /** The composed higher-order-function cosine (the pre-round-11 form,
    * kept as the differential-parity reference for the spec).
    */
  private[graft] def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance (cheaper than sqrt for nearest-neighbor ranking). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), (acc, v) => acc + v)

  /** JVM-side cosine with the IDENTICAL operation order as `cosine`
    * (left-fold of double-promoted products, then dot/(normA*normB)) —
    * bit-for-bit the same result, but JIT-compiled. Catalyst higher-order
    * functions run interpreted per element, which dominates pairwise
    * loops (N·M·dim); hot pairwise paths use this inside `mapPartitions`.
    */
  def cosineJvm(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** [[cosineJvm]] against a double-valued vector (k-means centroid
    * means): identical operation order to `cosine(a, bDoubles)` — the
    * per-element double cast is a no-op on the double side, so the fold
    * is bit-for-bit the Catalyst result.
    */
  def cosineJvmD(a: Array[Float], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** JVM-side product-quantization code for one subspace: argmin over the
    * codebook of the L2² distance on dims [m*sub, (m+1)*sub). Same
    * left-fold-in-index-order double arithmetic as `l2sq` (adding the 0.0
    * seed is exact: d² ≥ 0), strict `<` keeps the SMALLEST codebook id on
    * ties — the lexicographic struct-min / `ORDER BY dist, k` contract —
    * so the result is bit-identical to the Catalyst/DuckDB forms while
    * running as one JIT'd loop instead of an interpreted expression tree.
    */
  def pqCodeJvm(e: Array[Float], codebook: Array[Array[Float]],
                m: Int, sub: Int): Int = {
    var best = Double.PositiveInfinity
    var bestK = 0
    var k = 0
    while (k < codebook.length) {
      val ce = codebook(k)
      var acc = 0.0
      var j = 0
      while (j < sub) {
        val i = m * sub + j
        val d = e(i).toDouble - ce(i).toDouble
        acc += d * d
        j += 1
      }
      if (acc < best) { best = acc; bestK = k }
      k += 1
    }
    bestK
  }
}
