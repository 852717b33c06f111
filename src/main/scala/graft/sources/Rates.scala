package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sample-rate inference (U2/A9/W1): the reference infers every
  * channel's rate as the median of positive inter-sample deltas,
  * truncated to whole seconds and formatted `"{n}S"`
  * (`UKDALELoader.py:77-82`, `REFITLoader.py:83-89`, `OlaLoader.py:21-30`,
  * `preprocess_shelly.py:89-92`). One ordered-window pass per key plus a
  * map-side-combinable aggregate — no driver loops.
  */
object Rates {

  /** Per-key inferred rate: keys... , `rate_s` (LONG, null when no
    * positive delta exists) and `sample_rate` (`"{n}S"` or "unknown").
    * Deltas ≤ 0 (duplicate timestamps) are dropped before the median
    * (P10, `REFITLoader.py:84`).
    *
    * `approx = false` (default) keeps the exact median for oracle /
    * reference parity — safe here even at scale because deltas are
    * quantized to a few distinct values per channel, so the exact
    * percentile buffer stays tiny. `approx = true` switches to the
    * sketch-based quantile ([[graft.operators.Quantiles]]) for inputs
    * where that assumption fails (e.g. high-jitter event streams). */
  def inferPerKey(df: DataFrame, keys: Seq[Column], ts: Column,
                  approx: Boolean = false): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(ts)
    val d = unix_micros(ts) - lag(unix_micros(ts), 1).over(w)
    df.withColumn("__delta_us", d)
      .filter(col("__delta_us") > 0)
      .groupBy(keys: _*)
      .agg(floor(graft.operators.Quantiles.quantile(col("__delta_us"), 0.5, approx) / 1e6)
        .cast("long").as("rate_s"))
      .withColumn("sample_rate",
        when(col("rate_s").isNotNull, concat(col("rate_s"), lit("S")))
          .otherwise("unknown"))
  }
}
