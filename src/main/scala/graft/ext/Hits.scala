package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HITS-style hub centrality on a bipartite user↔type interaction
  * graph — the link-analysis scorer a web-crawl curation pipeline runs
  * over source↔domain edges, done WITHOUT ever materializing the
  * user×user co-occurrence graph: both power-iteration hops stay on
  * the |users|·|types|-bounded collapsed edge list, and the |types|-row
  * authority frames join back broadcast.
  *
  * All arithmetic is integer (counts × integer scores, one DIV-1000
  * rescale between hops to bound magnitudes), so the scores are
  * bit-exact at any partitioning/layout — no float-summation order
  * anywhere. Under ANSI mode (Spark 4 default) a corpus large enough
  * to overflow int64 fails LOUDLY (SparkArithmeticException) rather
  * than wrapping; at such scales pass `use128 = true` to run the same
  * iteration on decimal(38,0) — 10³⁸ headroom, identical floor-division
  * semantics, bit-identical values in the int64-safe range (red-tested
  * in HitsSpec).
  *
  * Plan shape: raw edges shuffle ONCE (repartition by user feeds the
  * (u,t) rollup into the cache); `scored` (the hub1 frame) is persisted
  * too because BOTH the a1 rollup and the hub2 hop read it — without
  * that persist, a1's branch would replan the a0-join + hub1-window
  * subtree and the executed plan would carry it twice (the r17 q136
  * plan-pin bug). Library persists go through [[graft.Caching]]; the
  * caller releases after its terminal action.
  */
object Hits {

  /** Two-hop hub scores from a raw edge list (one row per
    * interaction). Output: (userCol, hub1, hub2) — long columns, or
    * decimal(38,0) when `use128`. */
  def hubScores(edges: DataFrame, userCol: String, typeCol: String,
                use128: Boolean = false): DataFrame =
    hubScoresFromCounts(
      graft.Caching.persisted(
        edges.select(col(userCol), col(typeCol))
          .repartition(col(userCol))
          .groupBy(col(userCol), col(typeCol))
          .agg(count(lit(1)).as("c"))),
      userCol, typeCol, use128)

  /** Same iteration over a PRE-AGGREGATED (user, type, c) edge-count
    * frame (long `c`, already persisted or small). Exposed so the
    * overflow contract is testable with planted extreme counts that no
    * physical row fixture could produce. */
  def hubScoresFromCounts(counts: DataFrame, userCol: String,
                          typeCol: String,
                          use128: Boolean = false): DataFrame = {
    val w =
      if (use128) counts.withColumn("c", col("c").cast("decimal(38,0)"))
      else counts
    val a0 = w.groupBy(col(typeCol)).agg(sum(col("c")).as("s0"))
    val wu = Window.partitionBy(col(userCol))
    // persisted: both the a1 rollup and the hub2 hop read this frame
    val scored = graft.Caching.persisted(
      w.join(broadcast(a0), Seq(typeCol))
        .withColumn("hub1", sum(col("c") * col("s0")).over(wu)))
    // inter-hop rescale: integer DIV 1000; scores are nonnegative so
    // floor-division on decimal is the same function
    val s1Expr =
      if (use128) floor(sum(col("c") * col("hub1")) / 1000)
        .cast("decimal(38,0)")
      else expr("sum(c * hub1) DIV 1000")
    val a1 = scored.groupBy(col(typeCol)).agg(s1Expr.as("s1"))
    scored.join(broadcast(a1), Seq(typeCol))
      .withColumn("hub2", sum(col("c") * col("s1")).over(wu))
      .groupBy(col(userCol))
      .agg(max(col("hub1")).as("hub1"), max(col("hub2")).as("hub2"))
  }
}
