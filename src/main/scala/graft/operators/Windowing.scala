package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Overlapping fixed-length sequence windows over ordered per-key series
  * — the distributed form of the reference's numpy stride-trick
  * windowing (`channel_utils.py:179-188, 222-235`,
  * `ConvertToTensor.py:60-88`): windows of `seqLen` rows every `step`
  * rows, partial tail dropped, so a series of n rows yields
  * ⌊(n − seqLen)/step⌋ + 1 windows (0 when n < seqLen).
  *
  * Formulation: each row computes its 0-based position `idx` (one
  * ordered-window pass per key), then *emits itself into every window
  * that contains it* via an exploded id range — ≤ ⌈seqLen/step⌉ copies
  * per row — and windows assemble with one groupBy. This is the
  * Generator plan SURVEY §4 calls for: data expansion is exactly the
  * overlap factor, shuffles are on (key, window_id), and no window frame
  * is recomputed per row (a rowsBetween collect_list frame would copy
  * seqLen values per row, i.e. step× more traffic).
  *
  * Scale note: per-key series must be orderable within a partition for
  * the row_number pass — keys are fine-grained (dataset, house, channel)
  * streams. The emit/groupBy stage is keyed by (key, window_id), so
  * window assembly parallelizes beyond the key count.
  */
object Windowing {

  /** Per-row window membership: input + `idx` (0-based) + exploded
    * `window_id` (0-based). A row at idx belongs to window w when
    * w*step <= idx < w*step + seqLen and the window is complete
    * (w*step + seqLen <= n, n = series length). */
  def emit(df: DataFrame, keys: Seq[Column], orderCols: Seq[Column],
           seqLen: Int, step: Int): DataFrame = {
    require(seqLen > 0 && step > 0, s"seqLen/step must be positive")
    val w = Window.partitionBy(keys: _*).orderBy(orderCols: _*)
    val withIdx = df
      .withColumn("idx", row_number().over(w).cast("long") - 1)
      .withColumn("n", count(lit(1)).over(Window.partitionBy(keys: _*)))
    val lastWin = least(
      floor(col("idx") / step), // windows starting at or before idx
      floor((col("n") - seqLen) / step)) // last complete window
    val firstWin = greatest(
      lit(0L), ceil((col("idx") - seqLen + 1).cast("double") / step).cast("long"))
    withIdx
      .withColumn("window_id",
        explode(when(firstWin <= lastWin, sequence(firstWin, lastWin))
          .otherwise(array().cast("array<long>"))))
      .drop("n")
  }

  /** The reference's step from (seqLen, overlap): fractional overlap is
    * a share of seqLen, integer overlap is rows
    * (`channel_utils.py:187-188`), min 1. */
  def stepOf(seqLen: Int, overlap: Double, fractional: Boolean): Int = {
    val raw = if (fractional) seqLen - (overlap * seqLen).toInt
    else seqLen - overlap.toInt
    math.max(1, raw)
  }

  /** Assembled windows: one row per (keys..., window_id) with the
    * ordered value array (exactly seqLen elements, float32 like the
    * reference's tensors, `channel_utils.py:203`). */
  def collect(df: DataFrame, keys: Seq[Column], orderCols: Seq[Column],
              value: Column, seqLen: Int, step: Int): DataFrame = {
    val emitted = emit(df.withColumn("__v", value.cast("float")),
      keys, orderCols, seqLen, step)
    emitted
      .groupBy(keys :+ col("window_id"): _*)
      .agg(transform(array_sort(collect_list(struct(col("idx"), col("__v")))),
        s => s("__v")).as("window"))
  }

  /** W5 — truncate every key's series to the minimum length across keys
    * (`channel_utils.py:213-220`): rows with idx >= min(n) are dropped.
    * `group` spans the series being aligned (e.g. a house); `keys` the
    * individual series (e.g. channels). */
  def truncateToMin(df: DataFrame, group: Seq[Column], keys: Seq[Column],
                    orderCols: Seq[Column]): DataFrame = {
    val wKey = Window.partitionBy(group ++ keys: _*).orderBy(orderCols: _*)
    val wGroupKey = Window.partitionBy(group ++ keys: _*)
    val wGroup = Window.partitionBy(group: _*)
    df.withColumn("idx", row_number().over(wKey).cast("long") - 1)
      .withColumn("__n", count(lit(1)).over(wGroupKey))
      .withColumn("__minN", min(col("__n")).over(wGroup))
      .filter(col("idx") < col("__minN"))
      .drop("__n", "__minN")
  }
}
