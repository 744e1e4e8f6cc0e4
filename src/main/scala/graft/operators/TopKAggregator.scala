package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-buffer top-K as a typed `Aggregator` — the shuffle-volume-
  * optimal top-K form (reference combiner-lifting rationale,
  * `CombinePerKeyExamples.scala:124-126`): each map partition reduces its
  * rows into a ≤K buffer BEFORE the shuffle, so the exchange carries at
  * most K·partitions rows per key regardless of input size — strictly
  * less data than the rank-window formulation shuffles (all rows).
  *
  * Ordering: (score desc, id desc) by default, (score desc, id asc)
  * with `idAsc = true` — total orders under SQL DESC semantics
  * (`java.lang.Double.compare`: NaN sorts greatest-first, -0.0 below
  * 0.0; long compare avoids the -Long.MinValue overflow a
  * negation-based ordering has — callers needing the ascending
  * tiebreak should pass `idAsc` rather than negate ids, which breaks
  * at id == Long.MinValue), so results are deterministic and equal
  * to `KeyedOps.topKPerKey` with the same keys.
  */
case class Scored(score: Double, id: Long)

class TopKAggregator(k: Int, idAsc: Boolean = false)
    extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private val ord: Ordering[Scored] = new Ordering[Scored] {
    override def compare(x: Scored, y: Scored): Int = {
      val c = java.lang.Double.compare(y.score, x.score) // score desc
      if (c != 0) c
      else if (idAsc) java.lang.Long.compare(x.id, y.id) // id asc
      else java.lang.Long.compare(y.id, x.id) // id desc
    }
  }

  /** Invariant: the buffer is always sorted best-first and ≤ K long, so
    * at most K rows per key per map partition ever cross the exchange.
    * Once saturated, a row only costs a re-sort when it beats the
    * current K-th best (probability ~k/n on shuffled input).
    */
  override def zero: Seq[Scored] = Vector.empty
  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
    if (k <= 0) b // degenerate top-0: empty result, never touch b.last
    else if (b.length < k) (b :+ a).sorted(ord)
    else if (ord.lt(a, b.last)) (b.dropRight(1) :+ a).sorted(ord)
    else b
  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
    (x ++ y).sorted(ord).take(k)
  override def finish(b: Seq[Scored]): Seq[Scored] = b

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
