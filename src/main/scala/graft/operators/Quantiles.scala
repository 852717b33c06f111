package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantile aggregation with an explicit exact-vs-approximate choice
  * (A13/A9 and the q16-style per-group percentiles).
  *
  * Exact `percentile` buffers every value of a group in executor
  * memory — fine for quantized domains (inter-sample deltas take a
  * handful of distinct values) and for oracle parity, but a
  * high-cardinality double column at 100 TB makes the buffer an OOM
  * risk. The scale default for engine users is `approx = true`, which
  * routes to `approx_percentile` (t-digest-style sketch: fixed-size
  * state, map-side combinable, rank error bounded by 1/accuracy).
  * The oracle-facing queries keep `approx = false` because DuckDB's
  * `quantile_cont` is exact.
  */
object Quantiles {

  val DefaultAccuracy = 10000

  /** Aggregate expression: continuous p-quantile of `value`.
    *
    * The exact path has NO memory bound — see [[assertExactFeasible]]
    * for the loud pre-flight that replaces a silent executor OOM on
    * skewed groups. */
  def quantile(value: Column, p: Double, approx: Boolean,
               accuracy: Int = DefaultAccuracy): Column =
    if (approx) approx_percentile(value, lit(p), lit(accuracy))
    else percentile(value, lit(p))

  /** Loud pre-flight for the exact path (round-8 verdict #8): exact
    * `percentile` buffers EVERY value of a group in one executor's
    * memory, and the ObjectHashAggregate sort-based fallback
    * (`spark.sql.objectHashAggregate.sortBased.fallbackThreshold`)
    * spills by GROUP COUNT, not per-group state size — so one
    * 100×-skewed group still OOMs with nothing visible in the plan.
    * This runs one cheap map-side-combinable count pass and throws if
    * any group's value count exceeds `maxPerGroup`. The contract for
    * unbounded data: either call this first (and catch the loud
    * failure), or use `approx = true` (fixed-size sketch, no bound
    * needed). `groupCols` empty = global aggregate. */
  def assertExactFeasible(df: DataFrame, groupCols: Seq[Column],
                          value: Column, maxPerGroup: Long): Unit = {
    val worst = df.filter(value.isNotNull)
      .groupBy(groupCols: _*)
      .agg(count(lit(1)).as("__n"))
      .agg(max(col("__n")))
      .head()
    val m = if (worst.isNullAt(0)) 0L else worst.getLong(0)
    if (m > maxPerGroup) throw new IllegalStateException(
      s"exact percentile infeasible: a group buffers $m values " +
        s"(bound $maxPerGroup). Use approx = true (fixed-size sketch) " +
        "or raise the bound if the executors have the memory.")
  }
}
