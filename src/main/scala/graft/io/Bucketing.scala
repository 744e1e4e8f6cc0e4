package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support — the co-located-join strategy for repeated
  * large-×-large joins at 100 TB.
  *
  * A fact table bucketed (and sorted) by its join key is hash-partitioned
  * ON DISK: a join between two tables bucketed by the same key into the
  * same bucket count needs NO shuffle exchange and NO sort at read time —
  * each task zips bucket i with bucket i. For a join run once, the bucket
  * write costs exactly the shuffle it saves; the win is for keys joined
  * repeatedly (a dimension joined by every downstream query, a dedup pair
  * set re-joined each round), where one write amortizes across every
  * later join. `BucketingSpec` proves the exchange-free plan and result
  * parity against the unbucketed join.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table. Spark's
    * bucket files are hash(key) mod n, one set per task — layout survives
    * restarts and is picked up by any session with the same warehouse.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table) // managed: lives in spark.sql.warehouse.dir

  /** Read a bucketed table back (bucket metadata rides the catalog). */
  def readBucketed(s: SparkSession, table: String): DataFrame =
    s.table(table)
}
