package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** On/off-series postprocessing operators from the reference's
  * disaggregation pipeline (`bert_single_appliance/postprocessing.py`):
  * binary thresholding, run-length analysis, minimum-duration run
  * zeroing, and sliding-median smoothing — all as single-shuffle window
  * compositions instead of the reference's driver-side numpy scans.
  */
object Postprocess {

  // internal working columns — prefixed so they can't collide with (or
  // silently overwrite) caller columns of the same name
  private val StateCol = "__graft_state"
  private val RunIdCol = "__graft_run_id"
  private val RunLenCol = "__graft_run_len"

  /** Binary threshold (postprocessing.py:32-42): 1 where value >= t. */
  def threshold(value: Column, t: Double): Column =
    when(value >= t, 1).otherwise(0).cast("int")

  /** Run-length encoding: consecutive equal `state` values per key form a
    * run. Returns run-level rows: key, state, run_id, run_len.
    * (postprocessing.py:5-24 computes this with an imperative scan.) */
  def runs(df: DataFrame, key: Column, orderCols: Seq[Column],
           state: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
    val withState = df.withColumn(StateCol, state)
    // edge = state changed vs previous row (null-safe: first row is an edge)
    val edge = when(!(lag(col(StateCol), 1).over(w) <=> col(StateCol)), 1L)
      .otherwise(0L)
    withState
      .withColumn(RunIdCol,
        sum(edge).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(key, col(StateCol), col(RunIdCol))
      .agg(count(lit(1)).as("run_len"))
      .withColumnRenamed(StateCol, "state")
      .withColumnRenamed(RunIdCol, "run_id")
  }

  /** Zero-out ON runs shorter than `minLen` rows — the reference's
    * minimum-ON-duration filter (postprocessing.py:5-24, 80 s at 8 s rate
    * = 10 samples). Note the reference zeroes a trailing ON run only when
    * it is short (postprocessing.py:22-23) — same here, since the trailing
    * run is just another run. Row-level: returns the input columns plus
    * `state` (the thresholded input) and `state_filtered`. */
  def minDurationFilter(df: DataFrame, key: Column, orderCols: Seq[Column],
                        state: Column, minLen: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
    val withState = df.withColumn(StateCol, state)
    val edge = when(!(lag(col(StateCol), 1).over(w) <=> col(StateCol)), 1L)
      .otherwise(0L)
    val withRun = withState.withColumn(RunIdCol,
      sum(edge).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wRun = Window.partitionBy(key, col(RunIdCol))
    withRun
      .withColumn(RunLenCol, count(lit(1)).over(wRun))
      .withColumn("state_filtered",
        when(col(StateCol) === 1 && col(RunLenCol) < minLen, 0)
          .otherwise(col(StateCol)))
      .withColumn("state", col(StateCol))
      .drop(StateCol, RunIdCol, RunLenCol)
  }

  /** Exact sliding median over rows [-k, +k] per key — the distributed
    * counterpart of the reference's smoothing step (postprocessing.py:27-30,
    * which uses `scipy.ndimage.median_filter`). Semantics here follow SQL
    * `quantile_cont(x, 0.5)` — shrinking frames at partition edges and
    * linear interpolation for even counts — NOT scipy exactly (scipy
    * reflect-pads the boundary and picks a low element for even windows);
    * quantile_cont is what the DuckDB oracle compares. Null values are
    * skipped by collect_list; an all-null frame yields null (guarded).
    * Adds column `median_value`. */
  def slidingMedian(df: DataFrame, key: Column, orderCols: Seq[Column],
                    value: Column, k: Int): DataFrame = {
    // Small k (the reference's windows are 5-11 samples): build the
    // frame from codegen'd lag/lead columns instead of a per-row
    // collect_list window buffer (~2× faster at k=2 on 100k rows); the
    // partition-edge nulls are dropped, replicating the shrinking
    // frame. Large k falls back to the collect_list form.
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
    val arr =
      if (k <= 8) {
        val neighbors = (-k to k).map {
          case 0 => value
          case i if i < 0 => lag(value, -i).over(w)
          case i => lead(value, i).over(w)
        }
        array_sort(filter(array(neighbors: _*), v => v.isNotNull))
      } else
        array_sort(collect_list(value).over(w.rowsBetween(-k, k)))
    val n = size(arr)
    // odd n → middle element; even n > 0 → mean of the two middle elements
    val mid = ((n + lit(1)) / lit(2)).cast("int")
    val lo = (n / lit(2)).cast("int")
    val med = when(n % 2 === 1, element_at(arr, mid))
      .when(n > 0, (element_at(arr, lo) + element_at(arr, lo + lit(1))) / 2.0)
      .otherwise(lit(null))
    df.withColumn("median_value", med)
  }
}
