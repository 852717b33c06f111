package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-bucket resampling — the Spark-native form of pandas
  * `data.resample(rate).agg(...)` (reference: `UnifiedNILM.py:66-124`,
  * downsample-mean over all channels `UnifiedNILM.py:162-185`).
  *
  * Pandas buckets are epoch-aligned, left-closed, labeled by the left
  * edge; Spark's `window(ts, dur)` has exactly those semantics, so the
  * mapping is direct. The groupBy shuffles on (keys..., bucket) — at
  * 100 TB this is a single map-side-combinable exchange; no per-key
  * driver loop like the reference's channel fan-out.
  */
object Resample {

  /** Bucket `tsCol` into windows of `duration` per `keys` and aggregate.
    * Output columns: keys..., aggs..., `bucket_start` (timestamp). */
  def bucketAgg(df: DataFrame, tsCol: String, duration: String,
                keys: Seq[String], aggs: Column*): DataFrame =
    df.groupBy(keys.map(col) :+ window(col(tsCol), duration).as("w"): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("bucket_start", col("w.start"))
      .drop("w")

  /** Downsample one value column with mean — the reference's only
    * resample aggregate (`UnifiedNILM.py:115`). Refuses to upsample when
    * the data's inferred median rate is already coarser than `seconds`
    * (the `UnifiedNILM.py:118-120` guard). */
  def downsampleMean(df: DataFrame, keys: Seq[String], tsCol: String,
                     value: Column, seconds: Long,
                     inferredRateSeconds: Option[Double] = None): DataFrame = {
    inferredRateSeconds.foreach { r =>
      require(seconds >= r,
        s"refusing to upsample: target ${seconds}s < inferred ${r}s " +
          "(reference guard UnifiedNILM.py:118-120)")
    }
    bucketAgg(df, tsCol, s"$seconds seconds", keys, avg(value).as("value"))
  }
}
