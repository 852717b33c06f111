package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join (backward and forward): for every left row, attach the
  * payload of the nearest right row at-or-before (or at-or-after) its
  * timestamp for the same key
  * (the alignment the reference performs when pairing mains readings
  * with the latest appliance sample, `UnifiedNILM.py:205-312`, and the
  * standard "trade ↤ latest quote" time-series join).
  *
  * Implementation is the union-and-carry form, not a range join: tag
  * both sides, union them, sort each key by (ts, side) so right rows at
  * an equal timestamp precede left rows (inclusive at-or-before match,
  * same tie rule as DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`), then
  * carry the last non-null payload forward with one running
  * `last(ignoreNulls)` window and keep only left rows.
  *
  * Scale notes: ONE shuffle on the key for any data size — a theta/range
  * join would either broadcast a full side or explode candidate pairs,
  * and Spark's window needs no per-key buffering here because
  * `last(..., ignoreNulls)` over a running frame is a streaming frame
  * (each partition is consumed in sort order, O(1) state per payload
  * column). Skewed keys concentrate in single tasks, as with every
  * keyed window — salt upstream if one key dominates.
  *
  * Preconditions: payload columns must exist in `right` and not in
  * `left`; none may be named `__graft_match_ts` (the carry struct's
  * timestamp field — a collision would shadow the payload); and the
  * working columns `__side` / `__match` must be absent from both
  * inputs (asserted). If `right` can hold several rows at one
  * (key, ts), pre-aggregate it — otherwise which of the tied rows wins
  * is tie-broken only by input order.
  *
  * Null join keys never match (SQL/DuckDB ASOF equi-join semantics):
  * null-key right rows are dropped before the union, so a null-key
  * left row comes back with null payloads rather than picking up a
  * null-key right row's values.
  */
object AsOfJoin {

  /** Most recent right row at-or-before each left row (DuckDB
    * `ASOF ... ON l.ts >= r.ts`, pandas `merge_asof` default).
    *
    * @param keys          equi-join key columns (present on both sides)
    * @param tsCol         timestamp column name (present on both sides)
    * @param payloadCols   right-side columns to carry onto left rows
    *                      (null when no right row is at-or-before)
    * @param toleranceSec  optional max staleness: a match further than
    *                      this many seconds is nulled out (pandas
    *                      `merge_asof(tolerance=...)`)
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, payloadCols: Seq[String],
               toleranceSec: Option[Long] = None): DataFrame =
    asOf(left, right, keys, tsCol, payloadCols, toleranceSec, forward = false)

  /** First right row at-or-after each left row (DuckDB
    * `ASOF ... ON l.ts <= r.ts`, `merge_asof(direction='forward')`) —
    * the time axis traversed in reverse, same single-shuffle shape. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              tsCol: String, payloadCols: Seq[String],
              toleranceSec: Option[Long] = None): DataFrame =
    asOf(left, right, keys, tsCol, payloadCols, toleranceSec, forward = true)

  private def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
                   tsCol: String, payloadCols: Seq[String],
                   toleranceSec: Option[Long], forward: Boolean): DataFrame = {
    val rightCols = (keys :+ tsCol) ++ payloadCols
    Seq("__side", "__match").foreach { c =>
      require(!left.columns.contains(c) && !right.columns.contains(c),
        s"AsOfJoin reserves column name '$c'; rename it on the input")
    }
    val l = left.withColumn("__side", lit(1))
    // null keys never match (SQL equi-join semantics): a null-key right
    // row must not be carried onto null-key left rows by the window,
    // which groups nulls together
    // foldLeft over lit(true) keeps the keyless (global-window) form legal
    val nonNullKeys = keys.map(col(_).isNotNull).foldLeft(lit(true))(_ && _)
    val r = right.select(rightCols.map(col): _*).filter(nonNullKeys)
      .withColumn("__side", lit(0))
    // unionByName fills columns unique to one side with nulls
    val all = l.unionByName(r, allowMissingColumns = true)
    // right rows at an equal timestamp must precede left rows in
    // traversal order, so ties are inclusive in either direction
    val tsOrder = if (forward) col(tsCol).desc else col(tsCol).asc
    val order = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("__side").asc)
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry the nearest right row as ONE struct (match ts + payloads):
    // carrying payload columns individually with last(ignoreNulls) would
    // tear rows whenever a payload value is legitimately null — the null
    // field would fall back to an OLDER right row while the others (and
    // the staleness check) advance to the newer one
    val matchStruct = last(
      when(col("__side") === 0,
        struct(col(tsCol).as("__graft_match_ts") +: payloadCols.map(col): _*)),
      ignoreNulls = true).over(running)
    val carried = all.withColumn("__match", matchStruct)
      .filter(col("__side") === 1)
    val matchTs = col("__match")("__graft_match_ts")
    val fresh = toleranceSec.fold(col("__match").isNotNull) { tol =>
      val gap =
        if (forward) unix_micros(matchTs) - unix_micros(col(tsCol))
        else unix_micros(col(tsCol)) - unix_micros(matchTs)
      col("__match").isNotNull && gap <= tol * 1000000L
    }
    payloadCols.foldLeft(carried) { (df, c) =>
        df.withColumn(c, when(fresh, col("__match")(c)).otherwise(lit(null)))
      }
      .drop("__side", "__match")
  }
}
