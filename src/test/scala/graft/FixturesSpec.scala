package graft

import graft.core.Tables
import org.apache.spark.sql.types._

/** Fixture-drift tripwire (round-9 lesson: the driver regenerated
  * events.parquet with a different physical timestamp encoding and the
  * failure surfaced as 12 scattered `unix_micros` analysis errors).
  * This spec pins the LOGICAL schema each reader must deliver — names
  * in order, plus Spark types after `Tables.events` normalization — so
  * the next encoding or column change fails HERE with one message
  * naming the table and the diff.
  *
  * Every time column (events.ts, lineitem.l_shipdate,
  * orders.o_orderdate) must surface as TIMESTAMP after its reader's
  * `Tables.normalizeTs` — that is the contract every
  * `unix_micros`/window/date-compare consumer relies on, whatever the
  * physical parquet encoding.
  */
class FixturesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  // expected name -> acceptable Spark types (first listed = canonical)
  private type Col = (String, Seq[DataType])
  private def ts2: Seq[DataType] = Seq(TimestampType)

  private val expected: Map[String, Seq[Col]] = Map(
    "region" -> Seq("r_regionkey" -> Seq(IntegerType), "r_name" -> Seq(StringType)),
    "nation" -> Seq("n_nationkey" -> Seq(IntegerType), "n_name" -> Seq(StringType),
      "n_regionkey" -> Seq(IntegerType)),
    "customer" -> Seq("c_custkey" -> Seq(LongType), "c_name" -> Seq(StringType),
      "c_nationkey" -> Seq(IntegerType), "c_acctbal" -> Seq(DoubleType),
      "c_mktsegment" -> Seq(StringType)),
    "supplier" -> Seq("s_suppkey" -> Seq(LongType), "s_name" -> Seq(StringType),
      "s_nationkey" -> Seq(IntegerType), "s_acctbal" -> Seq(DoubleType)),
    "part" -> Seq("p_partkey" -> Seq(LongType), "p_name" -> Seq(StringType),
      "p_brand" -> Seq(StringType), "p_type" -> Seq(StringType),
      "p_size" -> Seq(IntegerType), "p_retailprice" -> Seq(DoubleType)),
    "orders" -> Seq("o_orderkey" -> Seq(LongType), "o_custkey" -> Seq(LongType),
      "o_orderstatus" -> Seq(StringType), "o_totalprice" -> Seq(DoubleType),
      "o_orderdate" -> ts2, "o_orderpriority" -> Seq(StringType)),
    "lineitem" -> Seq("l_orderkey" -> Seq(LongType), "l_partkey" -> Seq(LongType),
      "l_suppkey" -> Seq(LongType), "l_linenumber" -> Seq(IntegerType),
      "l_quantity" -> Seq(DoubleType), "l_extendedprice" -> Seq(DoubleType),
      "l_discount" -> Seq(DoubleType), "l_tax" -> Seq(DoubleType),
      "l_returnflag" -> Seq(StringType), "l_linestatus" -> Seq(StringType),
      "l_shipdate" -> ts2),
    // events: ts must be TIMESTAMP — the normalizer's whole point
    "events" -> Seq("event_id" -> Seq(LongType), "ts" -> Seq(TimestampType),
      "user_id" -> Seq(LongType), "event_type" -> Seq(StringType),
      "value" -> Seq(DoubleType), "props" -> Seq(StringType)),
    "documents" -> Seq("doc_id" -> Seq(LongType), "text" -> Seq(StringType),
      "lang" -> Seq(StringType), "source" -> Seq(StringType),
      "n_chars" -> Seq(LongType)),
    "embeddings" -> Seq("vec_id" -> Seq(LongType),
      "embedding" -> Seq(ArrayType(FloatType), ArrayType(FloatType, containsNull = false)),
      "label" -> Seq(IntegerType))
  )

  test("every table reader delivers the pinned logical schema at sf0.001") {
    val problems = expected.toSeq.sortBy(_._1).flatMap { case (name, cols) =>
      // route through the NAMED readers — the normalization contract is
      // part of what this spec pins
      val df = name match {
        case "events"   => Tables.events(spark, dir)
        case "lineitem" => Tables.lineitem(spark, dir)
        case "orders"   => Tables.orders(spark, dir)
        case other      => Tables.table(spark, dir, other)
      }
      val got = df.schema.fields.map(f => (f.name, f.dataType))
      if (got.map(_._1).toSeq != cols.map(_._1))
        Some(s"$name columns drifted: got ${got.map(_._1).mkString(",")} " +
          s"expected ${cols.map(_._1).mkString(",")}")
      else {
        val typeDiffs = got.zip(cols).collect {
          case ((n, t), (_, ok)) if !ok.contains(t) =>
            s"$n is $t (accepted: ${ok.mkString("/")})"
        }
        if (typeDiffs.nonEmpty)
          Some(s"$name types drifted: ${typeDiffs.mkString("; ")}")
        else None
      }
    }
    assert(problems.isEmpty,
      "fixture schema drift — update readers/normalizers, then this spec:\n" +
        problems.mkString("\n"))
  }

  test("normalizeEventTs handles all three historical ts encodings") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = Seq((1L, 1700000000000000L)).toDF("event_id", "us")
    // nano-epoch long
    val fromNanos = Tables.normalizeEventTs(
      base.select($"event_id", ($"us" * 1000).as("ts")))
    // TIMESTAMP_NTZ
    val fromNtz = Tables.normalizeEventTs(
      base.select($"event_id",
        timestamp_micros($"us").cast(TimestampNTZType).as("ts")))
    // already TIMESTAMP
    val fromTs = Tables.normalizeEventTs(
      base.select($"event_id", timestamp_micros($"us").as("ts")))
    for (df <- Seq(fromNanos, fromNtz, fromTs)) {
      assert(df.schema("ts").dataType == TimestampType)
      assert(df.select(unix_micros($"ts")).as[Long].head() == 1700000000000000L)
    }
  }
}
