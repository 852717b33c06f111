package graft.operators

import org.apache.spark.sql.Column
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

  /** Aggregate expression: continuous p-quantile of `value`. */
  def quantile(value: Column, p: Double, approx: Boolean,
               accuracy: Int = DefaultAccuracy): Column =
    if (approx) approx_percentile(value, lit(p), lit(accuracy))
    else percentile(value, lit(p))
}
