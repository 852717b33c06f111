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

  /** Binary threshold (postprocessing.py:32-42): 1 where value >= t. */
  def threshold(value: Column, t: Double): Column =
    when(value >= t, 1).otherwise(0).cast("int")

  /** Run-length encoding: consecutive equal `state` values per key form a
    * run. Returns run-level rows: key, state, run_id, run_len.
    * (postprocessing.py:5-24 computes this with an imperative scan.) */
  def runs(df: DataFrame, key: Column, orderCols: Seq[Column],
           state: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
    val withState = df.withColumn("state", state)
    // edge = state changed vs previous row (null-safe: first row is an edge)
    val edge = when(!(lag(col("state"), 1).over(w) <=> col("state")), 1L)
      .otherwise(0L)
    withState
      .withColumn("run_id",
        sum(edge).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(key, col("state"), col("run_id"))
      .agg(count(lit(1)).as("run_len"))
  }

  /** Zero-out ON runs shorter than `minLen` rows — the reference's
    * minimum-ON-duration filter (postprocessing.py:5-24, 80 s at 8 s rate
    * = 10 samples). Row-level: returns input + `state_filtered`. */
  def minDurationFilter(df: DataFrame, key: Column, orderCols: Seq[Column],
                        state: Column, minLen: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
    val withState = df.withColumn("state", state)
    val edge = when(!(lag(col("state"), 1).over(w) <=> col("state")), 1L)
      .otherwise(0L)
    val withRun = withState.withColumn("run_id",
      sum(edge).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wRun = Window.partitionBy(key, col("run_id"))
    withRun
      .withColumn("run_len", count(lit(1)).over(wRun))
      .withColumn("state_filtered",
        when(col("state") === 1 && col("run_len") < minLen, 0)
          .otherwise(col("state")))
      .drop("run_id", "run_len")
  }

  /** Exact sliding median over rows [-k, +k] per key (the reference's
    * `scipy.ndimage.median_filter`, postprocessing.py:27-30). Uses a
    * sorted collect over the row frame + linear interpolation for even
    * counts — matches `quantile_cont(x, 0.5)` semantics exactly, so it is
    * DuckDB-oracle comparable. Adds column `median_value`. */
  def slidingMedian(df: DataFrame, key: Column, orderCols: Seq[Column],
                    value: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(key).orderBy(orderCols: _*).rowsBetween(-k, k)
    val arr = array_sort(collect_list(value).over(w))
    val n = size(arr)
    // odd n → middle element; even n → mean of the two middle elements
    val mid = ((n + lit(1)) / lit(2)).cast("int")
    val lo = (n / lit(2)).cast("int")
    val med = when(n % 2 === 1, element_at(arr, mid))
      .otherwise((element_at(arr, lo) + element_at(arr, lo + lit(1))) / 2.0)
    df.withColumn("median_value", med)
  }
}
