package graft

import graft.core.Tables
import graft.io.Bucketing
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: the repeated-large-join strategy at scale.
  * Proves (a) result parity with the shuffled join and (b) the plan
  * property that makes bucketing worth it — ZERO shuffle exchanges in
  * the bucketed join.
  */
class BucketingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed orders x customer join: no exchange, same result") {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val c = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_name")
    Bucketing.writeBucketed(o, "orders_b", "o_custkey", 4)
    Bucketing.writeBucketed(
      c.withColumnRenamed("c_custkey", "o_custkey"), "customer_b",
      "o_custkey", 4)

    val ob = Bucketing.readBucketed(spark, "orders_b")
    val cb = Bucketing.readBucketed(spark, "customer_b")
    // disable broadcast so the join strategy choice is bucketing's to win
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // decimal sum => order-exact, comparable across partitionings
      val dsum = sum($"o_totalprice".cast("decimal(22,2)")).as("spent")
      val bucketed = ob.join(cb, "o_custkey").groupBy($"c_name").agg(dsum)
      bucketed.collect() // finalize AQE
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(o_custkey"),
        s"bucketed join must not shuffle on the join key:\n$plan")
      // parity with the plain shuffled join on the raw parquet
      val expected = o.join(
          c.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
        .groupBy($"c_name").agg(dsum)
        .as[(String, java.math.BigDecimal)].collect().toMap
      val got = bucketed
        .as[(String, java.math.BigDecimal)].collect().toMap
      assert(got == expected)
      assert(got.nonEmpty)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
