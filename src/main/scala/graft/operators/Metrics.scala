package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** E3's closing step: binary-classification metric aggregation over
  * (ground-truth, prediction) series — the distributed form of the
  * reference's sklearn metric calls (`train_bert_single.py:278-330`,
  * whose published numbers are `performance_metrics.txt`). Confusion
  * counts are one map-side-combinable aggregate; the scalar metrics
  * derive from the one-row result, never from a driver-side loop. */
object Metrics {

  /** One row: tp, fp, fn, tn, precision, recall, f1, accuracy.
    * `gt`/`pred` are boolean columns. */
  def binaryMetrics(df: DataFrame, gt: Column, pred: Column): DataFrame = {
    val g = gt.cast("boolean")
    val p = pred.cast("boolean")
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    val counts = df.agg(
      cnt(g && p).as("tp"),
      cnt(!g && p).as("fp"),
      cnt(g && !p).as("fn"),
      cnt(!g && !p).as("tn"))
    counts
      .withColumn("precision", col("tp") / (col("tp") + col("fp")))
      .withColumn("recall", col("tp") / (col("tp") + col("fn")))
      .withColumn("f1",
        lit(2) * col("precision") * col("recall") /
          (col("precision") + col("recall")))
      .withColumn("accuracy",
        (col("tp") + col("tn")) /
          (col("tp") + col("fp") + col("fn") + col("tn")))
  }
}
