package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the transitive-closure step real dedup needs (near-dup pairs form
  * cliques/chains; one-pass keep rules miss transitivity).
  *
  * Each round every node takes the min label among itself and its
  * neighbors; fixpoint = every node labeled with the min node id of its
  * component. The fixpoint is iteration-order independent, so results are
  * deterministic and oracle-reproducible (DuckDB recursive CTE).
  *
  * Scale contract: each round is one join + one agg shuffle, both keyed
  * on node id; `localCheckpoint` breaks lineage so plans stay flat across
  * rounds. Rounds needed = component diameter (near-dup clusters are
  * shallow; cap with maxIter). For planet-scale graphs swap in
  * large-star/small-star — same API.
  */
object ConnectedComponents {

  /** nodes: (id) one row per node; edges: (src, dst) undirected (either
    * orientation). Returns (id, component) with component = min id
    * reachable.
    */
  def run(nodes: DataFrame, edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()

    var labels = nodes.select(col("id"), col("id").as("component"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val prop = sym.join(labels, sym("src") === labels("id"))
        .groupBy(col("dst")).agg(min(col("component")).as("nbr_min"))
      val next = labels.join(prop, labels("id") === prop("dst"), "left_outer")
        .select(labels("id"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component"))
        .localCheckpoint()
      changed = next.as("n").join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.component") < col("o.component")).count()
      labels = next
      iter += 1
    }
    labels
  }
}
