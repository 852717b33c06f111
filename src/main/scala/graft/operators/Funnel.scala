package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis over an event stream: for each user,
  * the earliest time they completed step 1, then step 2 strictly after
  * step 1, …, with every later step bounded by `horizonSeconds` after
  * the step-1 time (the classic "conversion within N days" contract).
  * Output: one row per user that reached at least step 1, with the
  * per-step timestamps (null once a step is missed) and the furthest
  * `stage` reached — the product-analytics operator (view → click →
  * purchase) the star-schema `events` table exists for.
  *
  * ==Semantics==
  * t₁ = min ts where type = steps(0);
  * tᵢ = min ts where type = steps(i−1) ∧ ts > tᵢ₋₁ ∧ ts ≤ t₁ + horizon.
  * Strict `>` between consecutive steps: a same-timestamp pair does not
  * count as ordered progression (and both engines agree exactly on the
  * boundary because timestamps compare at µs precision).
  *
  * ==Scale shape (100 TB)==
  * One type-filtered aggregation per step, each keyed on the user —
  * every wide operation (the per-step min-aggs and the left joins
  * stitching them) hashes on the SAME key, so the exchanges are
  * pipelined co-partitioned (no re-keying anywhere, AQE reuses the
  * layout). The per-step frames are user-cardinality (≪ events), and
  * per-user event counts never buffer anywhere — deliberately NOT the
  * `sort_array(collect_list(...))` + fold form, whose per-user array is
  * unbounded for a hot user at corpus scale. The step filters push to
  * the scan (`event_type` dictionary pages skip at the row-group
  * level).
  */
object Funnel {

  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             horizonSeconds: Long): DataFrame = {
    require(steps.size >= 2, "funnel needs at least two steps")
    val u = col(userCol)
    val t1 = events.filter(col(typeCol) === steps.head)
      .groupBy(u).agg(min(col(tsCol)).as("ts_1"))
      .withColumn("__dl",
        col("ts_1") + expr(s"INTERVAL $horizonSeconds SECONDS"))
    // each step frame carries (user, ts_i, __dl); __dl is constant per
    // user so first() re-derives it through the agg
    val stepFrames = steps.tail.zipWithIndex.scanLeft(t1) {
      case (prev, (stepType, i)) =>
        events.filter(col(typeCol) === stepType)
          .join(prev.select(u, col(s"ts_${i + 1}"), col("__dl")), userCol)
          .filter(col(tsCol) > col(s"ts_${i + 1}") &&
            col(tsCol) <= col("__dl"))
          .groupBy(u)
          .agg(min(col(tsCol)).as(s"ts_${i + 2}"),
            first(col("__dl")).as("__dl"))
    }
    val joinedAll = stepFrames.tail.foldLeft(t1.drop("__dl")) { (acc, f) =>
      acc.join(f.drop("__dl"), Seq(userCol), "left")
    }
    val stage = steps.indices.reverse.map(i =>
        when(col(s"ts_${i + 1}").isNotNull, lit((i + 1).toLong)))
      .reduce((a, b) => coalesce(a, b))
    joinedAll.withColumn("stage", stage)
  }
}
