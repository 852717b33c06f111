package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys: two-phase *salted*
  * aggregation. Phase 1 groups on (keys..., salt) so a hot key's rows
  * spread over `buckets` reducers; phase 2 merges the partials on the
  * true keys — a shuffle of at most `buckets` rows per key.
  *
  * When to use: algebraic aggregates (sum/count/min/max, and avg via
  * sum+count) over keys with pathological frequency skew that even
  * map-side partial aggregation can't flatten (e.g. one device id
  * carrying half the readings). For built-in aggregates Spark's own
  * partial aggregation usually suffices — measure first; this exists
  * for the cases (collect_list-like buffers, extreme cardinality
  * imbalance) where it doesn't. Ordered-window operators can NOT be
  * salted (they need a total order per key); for those the answer is
  * finer-grained keys, e.g. (dataset, house, channel) rather than
  * house (see SCALE.md).
  *
  * The salt is deterministic (hash of all columns mod buckets), so
  * results are reproducible. AQE's skew-join handling covers the join
  * side of the same problem; this covers aggregation.
  */
object Skew {

  /** Salted sum: exact same result as
    * `df.groupBy(keys).agg(sum(value))`, robust to hot keys.
    * Output: keys..., `alias` (the summed value). */
  def saltedSum(df: DataFrame, keys: Seq[Column], value: Column,
                alias: String, buckets: Int = 64): DataFrame = {
    require(buckets > 0)
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(buckets)))
    salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(sum(value).as("__partial"))
      .groupBy(keys: _*)
      .agg(sum(col("__partial")).as(alias))
  }

  /** Salted count — same contract as [[saltedSum]]. */
  def saltedCount(df: DataFrame, keys: Seq[Column], alias: String,
                  buckets: Int = 64): DataFrame =
    saltedSum(df.withColumn("__one", lit(1L)), keys, col("__one"),
      alias, buckets)
}
