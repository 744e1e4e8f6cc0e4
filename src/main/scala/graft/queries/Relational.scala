package graft.queries

import graft.core.Tables
import graft.functions.HashFunctions
import graft.operators.KeyedOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch relational core — SURVEY §2.2-§2.5 operator equivalents over the
  * TPC-H-ish testdata. Every query is declarative DataFrame API so Catalyst
  * handles pushdown, partial aggregation, and join strategy (broadcast for
  * the small dims); nothing here collects to the driver.
  *
  * Scale contract per query is noted inline: what shuffles, what
  * broadcasts, what pushes into the scan.
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

    // P4: time-range predicate filter (reference HourlyTeamScore
    // `HourlyTeamScore.scala:82-95`). Both bounds push into the scan.
    "p4_filter_range" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .filter($"ts" >= lit("2024-01-10 00:00:00").cast("timestamp") &&
                $"ts" <  lit("2024-01-12 00:00:00").cast("timestamp"))
        .select($"event_id", $"ts", $"event_type", $"value")
    },

    // P6+P7: equality filter + column projection (reference
    // `FilterExamples.scala:88-122`). ReadSchema prunes to 3 columns.
    "p6_filter_project" -> { (s, dir) =>
      import s.implicits._
      Tables.orders(s, dir)
        .filter($"o_orderstatus" === "O")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    },

    // P9: deterministic hash sampling (reference
    // `TopWikipediaSessions.scala:191-198`), with a portable Knuth
    // multiplicative hash so the oracle reproduces the exact sample.
    // Pure rowwise filter — no shuffle, pushes below any downstream agg.
    "p9_hash_sample" -> { (s, dir) =>
      import s.implicits._
      Tables.customer(s, dir)
        .filter(HashFunctions.hashSample($"c_custkey", 0.1))
        .select($"c_custkey", $"c_name")
    },

    // P10: predicate partition/split (reference `Partition.of`,
    // `AutoComplete.scala:268-276`) — modeled as a tagged split + count
    // per side, one pass, map-side combine.
    "p10_partition_split" -> { (s, dir) =>
      import s.implicits._
      Tables.part(s, dir)
        .withColumn("bucket", when($"p_size" <= 25, "small").otherwise("large"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"), dsum($"p_retailprice").as("total_price"))
    },

    // P12: element-wise string transform (reference
    // `StreamingWordExtract.scala:85-89`).
    "p12_upper" -> { (s, dir) =>
      import s.implicits._
      Tables.nation(s, dir).select($"n_nationkey", upper($"n_name").as("n_name_upper"))
    },

    // P18: external-binary ParDo (reference `subprocess/ExampleEchoPipeline
    // .scala:20-28`) — pipe rows through a line-oriented subprocess, one
    // process per partition. `tr` upper-cases ASCII, so plain SQL upper()
    // oracles the whole exec-feed-collect plumbing.
    "p18_subprocess_upper" -> { (s, dir) =>
      import s.implicits._
      graft.operators.Subprocess.pipePartitions(
        Tables.customer(s, dir).select($"c_name").as[String],
        Seq("tr", "a-z", "A-Z")).toDF("name_upper")
    },

    // P13/§2.6 JSON: tolerant parse of a JSON-ish props column via
    // regexp_extract + null-on-failure cast (reference `UserScore.scala:130-154`
    // parse-with-Try; `TopWikipediaSessions.scala:99-109` JSON ingest).
    "p13_parse_tolerant" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        // try_cast, not cast: ANSI mode (Spark 4 default) throws on ''
        // from a non-matching regexp_extract — tolerance must be explicit
        .withColumn("k", expr(
          "try_cast(regexp_extract(props, '\"k\": (\\\\d+)', 1) AS INT)"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
             sum(when($"k".isNull, 1).otherwise(0)).cast("bigint").as("parse_errors"),
             sum($"k").cast("bigint").as("sum_k"))
    },

    // P14: wide-row → long explode (reference lane explode,
    // `TrafficMaxLaneFlow.scala:194-236`): 1 lineitem row → 4 measure rows,
    // then re-aggregate. explode stays in codegen; agg map-side combines.
    "p14_explode_wide" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .select(explode(array(
          struct(lit("quantity").as("metric"), $"l_quantity".as("v")),
          struct(lit("extendedprice").as("metric"), $"l_extendedprice".as("v")),
          struct(lit("discount").as("metric"), $"l_discount".as("v")),
          struct(lit("tax").as("metric"), $"l_tax".as("v")))).as("m"))
        .select($"m.metric".as("metric"), $"m.v".as("v"))
        .groupBy($"metric")
        .agg(dsum($"v", 6).as("total"), count(lit(1)).as("n"))
    },

    // A2: global count (reference `Count.globally`, `TfIdf.scala:199`).
    "a2_count_global" -> { (s, dir) =>
      Tables.lineitem(s, dir).agg(count(lit(1)).as("n_rows"))
    },

    // A5: per-key max (reference `Max.doublesPerKey`,
    // `MaxPerKeyExamples.scala:113`).
    "a5_max_per_key" -> { (s, dir) =>
      import s.implicits._
      Tables.orders(s, dir)
        .groupBy($"o_orderpriority")
        .agg(max($"o_totalprice").as("max_price"))
    },

    // A6+J5: global mean as broadcast side input, then filter rows above
    // it (reference `FilterExamples.scala:146-166`, `View.asSingleton`).
    // 1-row agg side broadcast by Catalyst — big side never shuffles.
    "j5_above_global_avg" -> { (s, dir) =>
      import s.implicits._
      val c = Tables.customer(s, dir)
      KeyedOps.withGlobalAgg(c, (dsum($"c_acctbal") / count(lit(1))).as("avg_bal"))
        .filter($"c_acctbal" > $"avg_bal")
        .select($"c_custkey", $"c_acctbal")
    },

    // A7: arg-max per key carrying full payload (reference `MaxFlow`,
    // `TrafficMaxLaneFlow.scala:245-248,299-308`). ONE hash agg via
    // max-of-struct (map-side combine; no per-key sort), deterministic
    // tiebreak (orderkey, linenumber) — SURVEY §7.4 risk 5.
    "a7_argmax" -> { (s, dir) =>
      import s.implicits._
      KeyedOps.argMaxPerKey(
        Tables.lineitem(s, dir),
        keys = Seq($"l_returnflag"),
        ord = Seq($"l_extendedprice".as("__p"), $"l_orderkey".as("__o"),
                  $"l_linenumber".as("__l")),
        payload = Seq(
          "l_extendedprice" -> $"l_extendedprice",
          "l_orderkey" -> $"l_orderkey",
          "l_linenumber" -> $"l_linenumber"))
    },

    // A8: per-key deterministic string concat (reference `ConcatWords`,
    // `CombinePerKeyExamples.scala:128-148`); sort-then-join makes the
    // result shuffle-order-independent.
    "a8_concat_per_key" -> { (s, dir) =>
      import s.implicits._
      Tables.customer(s, dir)
        .groupBy($"c_mktsegment")
        .agg(KeyedOps.concatPerKey($"c_name").as("names"))
    },

    // A13: distinct (reference `DistinctExample.scala:60`).
    "a13_distinct" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir).select($"l_returnflag", $"l_linestatus").distinct()
    },

    // A15: order-insensitive Java-hashCode checksum (reference
    // `AutoComplete.scala:362-370`) through the custom codegen'd
    // Catalyst expression — exercises JavaStringHashCode end-to-end.
    "a15_checksum" -> { (s, dir) =>
      import s.implicits._
      Tables.customer(s, dir)
        .agg(sum(HashFunctions.javaStringHashCode($"c_name").cast("long"))
          .as("checksum"))
    },

    // T1: top-K per key via ranked window (reference `Top.largestPerKey`,
    // `AutoComplete.scala:246-249`). One shuffle on the key; no global sort.
    "t1_topk_per_key" -> { (s, dir) =>
      import s.implicits._
      KeyedOps.topKPerKey(
          Tables.orders(s, dir),
          keys = Seq($"o_custkey"),
          order = Seq($"o_totalprice".desc, $"o_orderkey".desc), k = 3)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rank")
    },

    // T2: identical semantics via the salted two-phase path (reference
    // `withHotKeyFanout`, `AutoComplete.scala:249-254`) — same oracle SQL
    // as t1 proves salting is a pure perf transform.
    "t2_topk_salted" -> { (s, dir) =>
      import s.implicits._
      KeyedOps.topKPerKeySalted(
          Tables.orders(s, dir),
          keys = Seq($"o_custkey"),
          order = Seq($"o_totalprice".desc, $"o_orderkey".desc), k = 3, fanout = 4)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rank")
    },

    // T4: top-1 per calendar month (reference `Top.of(1)` per month window,
    // `TopWikipediaSessions.scala:140-160`): most-active user per month.
    "t4_top1_per_month" -> { (s, dir) =>
      import s.implicits._
      val counts = Tables.events(s, dir)
        .groupBy(date_trunc("month", $"ts").as("month"), $"user_id")
        .agg(count(lit(1)).as("n_events"))
      KeyedOps.topKPerKey(counts, Seq($"month"),
          Seq($"n_events".desc, $"user_id".desc), k = 1)
        .select($"month", $"user_id", $"n_events")
    },

    // T2b: third top-K formulation — bounded-buffer typed Aggregator
    // (map-side combine caps the shuffle at K rows per key per map
    // partition). Same oracle as t1/t2: all three strategies are
    // result-identical, they differ only in shuffle volume.
    "t5_topk_bounded" -> { (s, dir) =>
      import s.implicits._
      import graft.operators.{Scored, TopKAggregator}
      Tables.orders(s, dir)
        .select($"o_custkey", $"o_totalprice", $"o_orderkey")
        .as[(Long, Double, Long)]
        .groupByKey(_._1)
        .mapValues(r => Scored(r._2, r._3))
        .agg(new TopKAggregator(3).toColumn.name("top"))
        .flatMap { case (cust, top) =>
          top.zipWithIndex.map { case (sc, i) =>
            (cust, sc.id, sc.score, i + 1)
          }
        }
        .toDF("o_custkey", "o_orderkey", "o_totalprice", "rank")
    },

    // J1: left-outer lookup join with default for misses (reference
    // CoGroupByKey + getOnly(tag, "none"), `JoinExamples.scala:71-102`).
    // customer scales with SF, so no broadcast HINT: size-based selection
    // (static stats / AQE) broadcasts it while it fits and shuffle-joins
    // past that — the 100 TB-safe shape.
    "j1_left_outer" -> { (s, dir) =>
      import s.implicits._
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(c, $"o_custkey" === $"c_custkey", "left_outer")
        .select($"o_orderkey",
                coalesce($"c_name", lit("none")).as("customer_name"),
                $"o_totalprice")
    },

    // J4: union + re-aggregate (reference `Flatten.pCollections`,
    // `TfIdf.scala:170`). Union is metadata-only in Spark (no shuffle
    // until the agg).
    "j4_union" -> { (s, dir) =>
      import s.implicits._
      val o = Tables.orders(s, dir)
      o.filter($"o_orderpriority" === "1-URGENT")
        .unionAll(o.filter($"o_orderpriority" === "2-HIGH"))
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"))
    },

    // J6a: broadcast semi join (reference spammer-map side input used as
    // include-filter, `GameStats.scala:184-192` as written).
    "j6_semi_join" -> { (s, dir) =>
      import s.implicits._
      val bigSpenders = Tables.orders(s, dir)
        .groupBy($"o_custkey").agg(dsum($"o_totalprice").as("spent"))
        .filter($"spent" > 300000.0)
        .select($"o_custkey".as("c_custkey"))
      // bigSpenders is aggregate-derived and unbounded at scale — no
      // hint; the planner broadcasts it from its actual size.
      Tables.customer(s, dir)
        .join(bigSpenders, Seq("c_custkey"), "left_semi")
        .select($"c_custkey", $"c_name")
    },

    // J6b: broadcast anti join (the documented GameStats semantics —
    // exclude keys present in the side map; SURVEY §2.5 J6 port-bug note).
    "j6_anti_join" -> { (s, dir) =>
      import s.implicits._
      val bigSpenders = Tables.orders(s, dir)
        .groupBy($"o_custkey").agg(dsum($"o_totalprice").as("spent"))
        .filter($"spent" > 300000.0)
        .select($"o_custkey".as("c_custkey"))
      Tables.customer(s, dir)
        .join(bigSpenders, Seq("c_custkey"), "left_anti")
        .select($"c_custkey", $"c_name")
    },

    // Headline 3-table join (TPC-H Q3 shape): pruned scans, single
    // shuffle agg on orderkey, deterministic top-10. The filtered
    // customer side carries no broadcast HINT (customer scales with SF);
    // size-based selection broadcasts it while it fits.
    "q3_shipping" -> { (s, dir) =>
      import s.implicits._
      val c = Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
        .select($"c_custkey")
      val o = Tables.orders(s, dir).select($"o_orderkey", $"o_custkey", $"o_orderdate")
      val l = Tables.lineitem(s, dir)
        .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(c, $"o_custkey" === $"c_custkey")
        .groupBy($"o_orderkey", $"o_orderdate")
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6).as("revenue"))
        .orderBy($"revenue".desc, $"o_orderkey")
        .limit(10)
    },

    // Headline star join (TPC-H Q5 shape): revenue by customer nation;
    // fixed-cardinality nation+region are HINTED broadcast, SF-scaling
    // customer is left to size-based selection, one shuffle final agg.
    "q5_nation_revenue" -> { (s, dir) =>
      import s.implicits._
      val l = Tables.lineitem(s, dir)
        .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      val o = Tables.orders(s, dir).select($"o_orderkey", $"o_custkey")
      val c = Tables.customer(s, dir).select($"c_custkey", $"c_nationkey")
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(c, $"o_custkey" === $"c_custkey")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6).as("revenue"),
             count(lit(1)).as("n_items"))
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

    "p4_filter_range" ->
      """SELECT event_id, ts, event_type, value FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts <  TIMESTAMP '2024-01-12 00:00:00'""".stripMargin,

    "p6_filter_project" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'O'",

    "p9_hash_sample" ->
      s"""SELECT c_custkey, c_name FROM customer
         |WHERE ${OracleFragments.knuthU32("c_custkey")} < 429496729""".stripMargin,

    "p10_partition_split" ->
      """SELECT CASE WHEN p_size <= 25 THEN 'small' ELSE 'large' END AS bucket,
        |  count(*) AS n,
        |  CAST(sum(CAST(p_retailprice AS DECIMAL(22,2))) AS DOUBLE) AS total_price
        |FROM part GROUP BY 1""".stripMargin,

    "p12_upper" ->
      "SELECT n_nationkey, upper(n_name) AS n_name_upper FROM nation",

    "p18_subprocess_upper" ->
      "SELECT upper(c_name) AS name_upper FROM customer",

    "p13_parse_tolerant" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS parse_errors,
        |  CAST(sum(k) AS BIGINT) AS sum_k
        |FROM (SELECT event_type,
        |        TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER) AS k
        |      FROM events)
        |GROUP BY event_type""".stripMargin,

    "p14_explode_wide" ->
      """SELECT metric,
        |  CAST(sum(CAST(v AS DECIMAL(22,6))) AS DOUBLE) AS total,
        |  count(*) AS n
        |FROM (
        |  SELECT 'quantity' AS metric, l_quantity AS v FROM lineitem
        |  UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'tax', l_tax FROM lineitem)
        |GROUP BY metric""".stripMargin,

    "a2_count_global" -> "SELECT count(*) AS n_rows FROM lineitem",

    "a5_max_per_key" ->
      "SELECT o_orderpriority, max(o_totalprice) AS max_price FROM orders GROUP BY o_orderpriority",

    "j5_above_global_avg" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(22,2))) AS DOUBLE) / count(*)
        |                   FROM customer)""".stripMargin,

    "a7_argmax" ->
      """SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber
        |FROM (SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
        |        row_number() OVER (PARTITION BY l_returnflag
        |          ORDER BY l_extendedprice DESC, l_orderkey DESC, l_linenumber DESC) AS rn
        |      FROM lineitem)
        |WHERE rn = 1""".stripMargin,

    "a8_concat_per_key" ->
      """SELECT c_mktsegment, string_agg(c_name, ',' ORDER BY c_name) AS names
        |FROM customer GROUP BY c_mktsegment""".stripMargin,

    "a13_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",

    "a15_checksum" ->
      """SELECT CAST(sum(CASE WHEN h >= 2147483648 THEN h - 4294967296 ELSE h END) AS BIGINT) AS checksum
        |FROM (SELECT list_reduce(
        |        list_prepend(0::BIGINT,
        |          list_transform(string_split(c_name, ''), c -> ord(c)::BIGINT)),
        |        (a, c) -> (a * 31 + c) % 4294967296) AS h
        |      FROM customer)""".stripMargin,

    "t1_topk_per_key" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rank AS INTEGER) AS rank
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey DESC) AS rank
        |      FROM orders)
        |WHERE rank <= 3""".stripMargin,

    "t2_topk_salted" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rank AS INTEGER) AS rank
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey DESC) AS rank
        |      FROM orders)
        |WHERE rank <= 3""".stripMargin,

    "t4_top1_per_month" ->
      """SELECT month, user_id, n_events
        |FROM (SELECT month, user_id, n_events,
        |        row_number() OVER (PARTITION BY month
        |          ORDER BY n_events DESC, user_id DESC) AS rn
        |      FROM (SELECT date_trunc('month', ts) AS month, user_id,
        |              count(*) AS n_events
        |            FROM events GROUP BY 1, 2))
        |WHERE rn = 1""".stripMargin,

    "t5_topk_bounded" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rank AS INTEGER) AS rank
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey DESC) AS rank
        |      FROM orders)
        |WHERE rank <= 3""".stripMargin,

    "j1_left_outer" ->
      """SELECT o_orderkey, coalesce(c_name, 'none') AS customer_name, o_totalprice
        |FROM orders LEFT OUTER JOIN customer ON o_custkey = c_custkey""".stripMargin,

    "j4_union" ->
      """SELECT o_orderpriority, count(*) AS n FROM (
        |  SELECT o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT o_orderpriority FROM orders WHERE o_orderpriority = '2-HIGH')
        |GROUP BY o_orderpriority""".stripMargin,

    "j6_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (
        |  SELECT o_custkey FROM orders GROUP BY o_custkey
        |  HAVING CAST(sum(CAST(o_totalprice AS DECIMAL(22,2))) AS DOUBLE) > 300000.0)""".stripMargin,

    "j6_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (
        |  SELECT o_custkey FROM orders GROUP BY o_custkey
        |  HAVING CAST(sum(CAST(o_totalprice AS DECIMAL(22,2))) AS DOUBLE) > 300000.0)""".stripMargin,

    "q3_shipping" ->
      """SELECT o_orderkey, o_orderdate,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q5_nation_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
  )
}
