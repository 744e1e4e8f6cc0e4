package graft.io

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** S9: keyed-entity sink — the local analog of the reference's Cloud
  * Datastore output (`AutoComplete.scala:98-108`, entity construction
  * `:413-433`). Each row becomes one entity: a hierarchical key path
  * `[(kind, ancestor), (kind, name)]` (the reference's ancestor-key
  * strong-consistency layout) plus a properties map. Entities serialize
  * as one JSON object per line via `to_json` over nested structs — pure
  * codegen'd expressions, no UDF — and land through the engine's sharded
  * text sink with overwrite-on-rerun, so a re-run upserts the same key
  * set exactly like Datastore's keyed writes (idempotent at the
  * directory level; per-partition batched writes, no driver collect).
  */
object EntitySink {

  /** Generic entity JSON: key path + arbitrary properties struct. */
  def entityJson(kind: String, ancestorKey: String, nameCol: org.apache.spark.sql.Column,
                 properties: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    to_json(struct(
      struct(array(
        struct(lit(kind).as("kind"), lit(ancestorKey).as("name")),
        struct(lit(kind).as("kind"), nameCol.cast("string").as("name")))
        .as("path")).as("key"),
      properties.as("properties")))

  /** The reference's FormatForDatastoreFn shape
    * (`AutoComplete.scala:413-433`): per prefix one entity whose
    * `candidates` property lists {tag, count} ordered by (count, tag)
    * descending — `CompletionCandidate.compare` (`AutoComplete.scala:
    * 341-345`). Input: the flat (prefix, word, n) top-K frame; one hash
    * agg groups it back to per-prefix lists (bounded by k).
    */
  def autoCompleteEntities(top: DataFrame, kind: String,
                           ancestorKey: String): Dataset[String] = {
    import top.sparkSession.implicits._
    top
      .groupBy(col("prefix"))
      .agg(sort_array(collect_list(struct(col("n"), col("word"))),
        asc = false).as("cands"))
      .select(entityJson(kind, ancestorKey, col("prefix"),
        struct(transform(col("cands"), c =>
          struct(c.getField("word").as("tag"), c.getField("n").as("count")))
          .as("candidates"))).as("value"))
      .as[String]
  }

  /** Write entities as JSON lines, overwrite-on-rerun (keyed upsert
    * analog), `shards` output files per the S2 sink contract.
    */
  def write(entities: Dataset[String], dir: String, shards: Int = 1): Unit =
    TextIO.writeLines(entities, dir, shards)
}
