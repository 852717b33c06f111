package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join: pair every point row with the interval
  * rows of the same key whose `[start, end]` (inclusive) contains the
  * point's timestamp (the shape behind "events inside an activation
  * window", `bert_single_appliance/preprocessing.py` activation slicing).
  *
  * A naive formulation — equi-join on the key plus a residual
  * `ts BETWEEN start AND end` — makes every point meet every interval of
  * its key; with K intervals per key that is a K-fold row explosion
  * before the filter. This operator instead quantizes time into
  * `bucketSeconds` buckets: each interval is exploded to the buckets it
  * overlaps, each point maps to exactly one bucket, and the join runs on
  * (key, bucket) with the exact bounds as a residual predicate. A point
  * can match an interval in only one bucket (the point's own), so no
  * dedup pass is needed.
  *
  * Scale notes: bucket count per interval is `span/bucketSeconds + 1` —
  * size the bucket near the TYPICAL interval span so intervals explode
  * to O(1) copies while each (key, bucket) cell stays small. Both sides
  * shuffle once on (key, bucket); AQE handles residual skew.
  *
  * `joinType` "inner" yields exactly the matching pairs. "left_outer"
  * keeps intervals with no points BUT emits one null-point row per
  * exploded bucket copy of an unmatched interval — correct only under a
  * later `GROUP BY interval-id` with null-ignoring aggregates
  * (count(pointCol), sum, ...), which is the intended aggregation use.
  */
object RangeJoin {

  /** @param intervals  frame holding `keys`, `startCol`, `endCol`
    * @param points     frame holding `keys`, `tsCol`; its non-key columns
    *                   must not collide with interval column names (both
    *                   sides often derive from one table — the point-side
    *                   keys are renamed internally so the join never
    *                   depends on self-join attribute disambiguation)
    * @param bucketSeconds  time-bucket width for the equi-join key
    */
  def pointsInIntervals(intervals: DataFrame, points: DataFrame,
                        keys: Seq[String], startCol: String, endCol: String,
                        tsCol: String, bucketSeconds: Long,
                        joinType: String = "inner"): DataFrame = {
    val bUs = bucketSeconds * 1000000L
    // malformed intervals (end < start) collapse to ONE null-bucket
    // copy: Spark's sequence() would otherwise count DOWN, emitting
    // |span| junk copies (an unbounded explode on bad data). A null
    // bucket can never equi-join a point, so inner output is unchanged
    // and left_outer still surfaces the interval as an unmatched row
    // (null-ignoring aggregates see it as zero matches).
    val lo = floor(unix_micros(col(startCol)) / bUs).cast("long")
    val hi = floor(unix_micros(col(endCol)) / bUs).cast("long")
    val iv = intervals.withColumn("__bucket",
      explode(when(col(endCol) >= col(startCol), sequence(lo, hi))
        .otherwise(array(lit(null).cast("long")))))
    val pt = keys.foldLeft(points) { (df, k) => df.withColumnRenamed(k, "__pt_" + k) }
      .withColumn("__pt_bucket", floor(unix_micros(col(tsCol)) / bUs).cast("long"))
    val cond = keys.map(k => col(k) === col("__pt_" + k)).reduce(_ && _) &&
      col("__bucket") === col("__pt_bucket") &&
      col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol)
    iv.join(pt, cond, joinType)
      .drop("__bucket" +: "__pt_bucket" +: keys.map("__pt_" + _): _*)
  }
}
