package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: for each left row, attach the payload of the right
  * row with the greatest `right.ts <= left.ts` in the same key group —
  * the standard event-attribution / point-in-time-lookup operator, which
  * Spark has no native join type for (DuckDB: `ASOF JOIN`).
  *
  * Composed from existing operators (no custom physical plan needed):
  * union both sides, then ONE window pass per key ordered by
  * (ts, side) taking the last non-null right payload at or before each
  * left row. That is the merge-scan shape a native as-of join runs: a
  * single shuffle + sort on the key, no per-row range probing, no
  * quadratic key-group blowup. At 100 TB the shuffle carries each side
  * once; skewed keys are ordinary sort-skew handled by AQE.
  *
  * Right rows tie-break BEFORE left rows at equal ts, so the match is
  * inclusive (`right.ts <= left.ts`). Callers must pre-aggregate the
  * right side to one row per (key, ts) — with several right rows on the
  * exact same key+timestamp, "the" as-of match is undefined (DuckDB
  * picks arbitrarily; this operator takes the sort-last one).
  */
object AsOfJoin {

  /** @param payload right-side columns to carry; they appear in the
    *                output as `asof_<name>`, plus `asof_ts` = matched
    *                right timestamp. Unmatched left rows keep them null.
    */
  def leftAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, payload: Seq[String]): DataFrame = {
    // Working names (_asof/_side/_m) and output names (asof_ts,
    // asof_<payload>) are reserved: withColumn silently REPLACES an
    // existing column, so a colliding left input would corrupt data
    // rather than fail. Fail fast instead.
    val reserved = Seq("_asof", "_side", "_m", "asof_ts") ++
      payload.map(p => s"asof_$p")
    val clash = left.columns.intersect(reserved)
    require(clash.isEmpty,
      s"leftAsOf: left input columns ${clash.mkString(", ")} collide " +
        "with reserved working/output names; rename them first")
    require(!payload.contains(tsCol),
      s"leftAsOf: payload must not repeat tsCol '$tsCol' (asof_ts already carries it)")
    val pStruct = struct((tsCol +: payload).map(right(_)): _*)
    // A null right timestamp must match nothing (ASOF `l.ts >= NULL` is
    // no-match) — unfiltered it would sort nulls-first and become a
    // universal fallback payload for otherwise-unmatched left rows.
    val r2 = right
      .filter(right(tsCol).isNotNull)
      .select(keys.map(right(_)) ++
        Seq(right(tsCol), pStruct.as("_asof")): _*)
      .withColumn("_side", lit(0))
    val asofType = r2.schema("_asof").dataType
    val l2 = left
      .withColumn("_asof", lit(null).cast(asofType))
      .withColumn("_side", lit(1))
    val leftOther = left.columns.filterNot(c => keys.contains(c) || c == tsCol)
    val r3 = leftOther.foldLeft(r2) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val cols = left.columns :+ "_asof" :+ "_side"
    val all = l2.select(cols.map(col): _*)
      .unionByName(r3.select(cols.map(col): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    all
      .withColumn("_m", last(col("_asof"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.map(col) ++
        (col(s"_m.$tsCol").as("asof_ts") +:
          payload.map(p => col(s"_m.$p").as(s"asof_$p"))): _*)
  }
}
