package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff / change-data-capture derivation: given two full
  * snapshots of a keyed table (yesterday's and today's dump — the
  * common shape when an upstream system can only export full tables),
  * derive the changelog: which keys were inserted, deleted, or updated,
  * and for updates, WHICH compared columns changed. The inverse of
  * [[Upsert.merge]]: `merge(old, diff)` reproduces `new`, and
  * `diff(old, upserted)` recovers the change batch.
  *
  * ==Semantics==
  * One output row per key whose state changed:
  *   - `insert` — key present only in the new snapshot
  *   - `delete` — key present only in the old snapshot
  *   - `update` — key in both, at least one compared column differs
  *     (null-safe: null→value and value→null count as changes)
  * Unchanged keys are dropped (`includeUnchanged = true` keeps them,
  * for audit counts). `changed_cols` lists the differing column names
  * in `compareCols` order, comma-joined (empty for insert/delete —
  * the whole row is the change). Old/new values are emitted side by
  * side as `old_<col>` / `new_<col>`.
  *
  * ==Scale shape (100 TB)==
  * ONE full-outer sort-merge join keyed on the merge key — both sides
  * are corpus-sized, so this shuffle is the floor for any diff; all
  * change classification is map-side column arithmetic above it. Two
  * levers remove even that shuffle: snapshots written bucketed on the
  * key join exchange-free (pinned in SnapshotDiffSpec — zero
  * ShuffleExchange over two `bucketBy(key)` tables), and with AQE the
  * per-key skew is irrelevant because keys are unique per side (no
  * fanout: full-outer on a unique key is 1:1). Nothing collects, no
  * window, no cartesian.
  */
object SnapshotDiff {

  def diff(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String],
           compareCols: Seq[String],
           includeUnchanged: Boolean = false): DataFrame = {
    val keyCols = keys.map(col)
    val o = oldSnap.select(
      keyCols ++ Seq(lit(true).as("__old_p")) ++
        compareCols.map(c => col(c).as(s"old_$c")): _*)
    val n = newSnap.select(
      keyCols ++ Seq(lit(true).as("__new_p")) ++
        compareCols.map(c => col(c).as(s"new_$c")): _*)
    val joined = o.join(n, keys, "full_outer")
    val oldP = coalesce(col("__old_p"), lit(false))
    val newP = coalesce(col("__new_p"), lit(false))
    def differs(c: String): Column = !(col(s"old_$c") <=> col(s"new_$c"))
    val anyDiff = compareCols.map(differs)
      .reduceOption(_ || _).getOrElse(lit(false))
    val changeType = when(!oldP, lit("insert"))
      .when(!newP, lit("delete"))
      .when(anyDiff, lit("update"))
      .otherwise(lit("unchanged"))
    val changedCols =
      if (compareCols.isEmpty) lit("")
      else when(oldP && newP, array_join(array_compact(array(
        compareCols.map(c => when(differs(c), lit(c))): _*)), ","))
        .otherwise(lit(""))
    val out = joined
      .withColumn("change_type", changeType)
      .withColumn("changed_cols", changedCols)
      .drop("__old_p", "__new_p")
      .select(keyCols ++ Seq(col("change_type"), col("changed_cols")) ++
        compareCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
    if (includeUnchanged) out
    else out.filter(col("change_type") =!= "unchanged")
  }
}
