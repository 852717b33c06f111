package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot merge (SCD-1 upsert with delete markers) — the "daily
  * refresh" half of a maintained table: `new_snapshot = base ⊕ changes`
  * where a change row replaces the base row with its key, a delete
  * marker removes it, and unmatched base rows carry over.
  *
  * The Spark-idiomatic shape WITHOUT a table format: union the tagged
  * frames and keep, per key, the highest-precedence row via `max_by`
  * over a (source-tag, order) struct — ONE map-side-combinable hash
  * aggregate, the same algebra that makes the line-dedup struct-min
  * skew-safe (SCALE.md round 16: safety is the aggregate's own
  * property, not an optimizer pattern-match on a window). The window
  * formulation (`row_number over key order by precedence desc`) is the
  * UpsertSpec cross-check oracle, not the shipped path. At 100 TB +
  * 100 GB of changes: one shuffle keyed on the merge key, partial
  * aggregation collapses the duplicate keys map-side, and a hot key
  * (one entity updated in every batch) never serializes into one task.
  *
  * Contract: `base` and `changes` share the key + payload columns
  * (changes may carry `deleteCol` extra); within one merge, duplicate
  * keys inside `changes` are resolved by `orderCol` (highest wins —
  * pass an ingest version/sequence; ties are unspecified, same as SQL
  * MERGE). Deletes are rows, not tombstones: the key disappears from
  * the output snapshot.
  */
object Upsert {

  def merge(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
            deleteCol: Option[String] = None,
            orderCol: Column = lit(0L)): DataFrame = {
    val payload = base.columns.filterNot(keyCols.contains)
    require(payload.nonEmpty, "merge needs at least one payload column")
    val del = deleteCol.map(col).getOrElse(lit(false))
    val tagged = base
      .select((keyCols ++ payload).map(col): _*)
      .withColumn("__del", lit(false))
      .withColumn("__prec", struct(lit(0).as("src"), lit(0L).as("ord")))
      .unionByName(changes
        .withColumn("__del", del) // before the payload projection: the
        .withColumn("__ord", orderCol) // marker/order cols may be extras
        .select((keyCols ++ payload).map(col) :+ col("__del") :+ col("__ord"): _*)
        .withColumn("__prec", struct(lit(1).as("src"), col("__ord").as("ord")))
        .drop("__ord"))
    tagged
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(
        struct((payload :+ "__del").map(col): _*), col("__prec")).as("__r"))
      .filter(!col("__r.__del"))
      .select(keyCols.map(col) ++ payload.map(c => col(s"__r.$c").as(c)): _*)
  }
}
