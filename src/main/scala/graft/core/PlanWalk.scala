package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Physical-plan traversal that sees what a query EXECUTES without
  * re-asserting what its pinned inputs were built from.
  *
  * Since round 14 the session pins (shared pair/posting/assignment
  * frames) are `persist(MEMORY_AND_DISK)` datasets, not
  * `localCheckpoint` RDD scans — persisted plans keep their lineage, so
  * an executor loss recomputes the blocks instead of failing the query
  * (PinRecoverySpec), and `Dataset.unpersist` actually releases them
  * (the round-13 `.rdd.unpersist` leak). The cost of keeping lineage is
  * cosmetic: every consumer's `executedPlan.toString` now embeds the
  * whole cached BUILD plan under `InMemoryRelation`, so naive
  * string-matching plan assertions see scans/exchanges/windows that run
  * zero times per consumer. This walker is the fix: it descends through
  * the AQE wrapper nodes (stage / adaptive / reused-exchange) in
  * execution order and STOPS at [[InMemoryTableScanExec]] — a pinned
  * frame's build plan is asserted once, where it is built, not at every
  * consumer.
  */
object PlanWalk {

  /** Children in execution order: through AQE wrappers, not into cached
    * build plans.
    */
  def kids(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case q: QueryStageExec => Seq(q.plan)
    case r: ReusedExchangeExec => Seq(r.child)
    case _: InMemoryTableScanExec => Nil
    case other => other.children
  }

  /** Pre-order traversal under [[kids]]. */
  def nodes(p: SparkPlan): Seq[SparkPlan] = p +: kids(p).flatMap(nodes)

  def nodes(df: DataFrame): Seq[SparkPlan] =
    nodes(df.queryExecution.executedPlan)

  /** One line per [[nodes]] node — the string plan assertions match
    * against (cached inner build plans excluded, AQE initial-plan
    * duplicates excluded).
    */
  def outer(df: DataFrame): String =
    nodes(df).map(_.simpleString(1000)).mkString("\n")
}
