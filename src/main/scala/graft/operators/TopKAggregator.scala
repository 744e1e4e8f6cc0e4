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
  * Ordering: (score desc, id desc) — a total order, so results are
  * deterministic and equal to `KeyedOps.topKPerKey` with the same keys.
  */
case class Scored(score: Double, id: Long)

class TopKAggregator(k: Int)
    extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, -s.id))

  /** Keep the buffer bounded but amortize sorting: trim only at 4K. */
  private def trim(buf: Seq[Scored]): Seq[Scored] =
    if (buf.length <= 4 * k) buf else buf.sorted(ord).take(k)

  override def zero: Seq[Scored] = Vector.empty
  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = trim(b :+ a)
  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = trim(x ++ y)
  override def finish(b: Seq[Scored]): Seq[Scored] = b.sorted(ord).take(k)

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
