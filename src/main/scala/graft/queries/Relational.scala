package graft.queries

import graft.core.Tables
import org.apache.spark.sql.functions._

/** Batch relational core — SURVEY §2.2-§2.5 operator equivalents over the
  * TPC-H-ish testdata. Every query is declarative DataFrame API so Catalyst
  * handles pushdown, partial aggregation, and join strategy (broadcast for
  * the small dims); nothing here collects to the driver.
  */
object Relational extends QueryModule {

  /** Exact-sum helper: accumulate in decimal (exact, order-insensitive),
    * surface as double. See package doc.
    */
  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 2) =
    sum(c.cast(s"decimal(22,$scale)")).cast("double")

  override def queries: Map[String, Q] = Map(
    // A1/A3/A6 + P4: the flagship scan-filter-agg (TPC-H Q1 shape).
    // Filter reaches the parquet scan (PushedFilters); partial agg map-side.
    "q1_agg" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6).as("sum_disc_price"),
          (dsum($"l_discount") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
  )

  override def oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(22,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(22,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(22,2))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
