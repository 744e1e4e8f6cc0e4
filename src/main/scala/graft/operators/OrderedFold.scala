package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}

/** Per-key ordered fold — the typed escape hatch for group logic that is
  * genuinely imperative (reference `TrafficRoutes.scala:207-250`: sort a
  * route's readings by timestamp, compare each to the first-seen speed,
  * classify slowdowns).
  *
  * Scale contract: one shuffle on the key; each group is sorted in executor
  * memory, so keys must have bounded cardinality-per-key (true for the
  * reference's per-route / per-user groups). For unbounded groups prefer a
  * window-function formulation.
  */
object OrderedFold {

  def foldSortedGroups[K, V, O: Encoder](
      ds: Dataset[V],
      key: V => K,
      order: Ordering[V])(fold: (K, Seq[V]) => O)(
      implicit kEnc: Encoder[K], kvEnc: Encoder[(K, V)]): Dataset[O] =
    ds.groupByKey(key)
      .mapGroups((k, it) => fold(k, it.toSeq.sorted(order)))
}
