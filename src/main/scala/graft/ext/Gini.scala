package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gini concentration from a value HISTOGRAM — the q137 core, factored
  * out so the int64-overflow contract is testable with planted
  * histograms (the q136/Hits pattern). A run of m items sharing value
  * t contributes t·(m·prev + m(m+1)/2) to the rank-weighted sum, so
  * tie order provably cancels and the cumulative window runs over
  * ≤ distinct-values×keys rows — never a per-key sort of raw items.
  * All rank/mass arithmetic is integer; the single final division of
  * exact values makes the 6dp gini bit-exact at any partitioning.
  */
object Gini {

  /** Per-key Gini from one row per (key, t, m): value `t` occurring
    * `m` times (both long). Output: (key, n_items, total_mass, gini) —
    * gini null when total_mass is 0 (all-zero values).
    *
    * Under ANSI (Spark 4 default) a histogram whose t·cumm·m products
    * overflow int64 fails LOUDLY; pass `use128 = true` to run the
    * identical arithmetic on decimal(38,0) — bit-identical ginis in
    * the int64-safe range, n_items/total_mass come back as
    * decimal(38,0) (red-tested in SeriesStatsSpec). */
  def fromHistogram(hist: DataFrame, keyCol: String, tCol: String,
                    mCol: String, use128: Boolean = false): DataFrame = {
    val base = hist.select(col(keyCol),
      (if (use128) col(tCol).cast("decimal(38,0)") else col(tCol)).as("t0"),
      (if (use128) col(mCol).cast("decimal(38,0)") else col(mCol)).as("m0"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("t0"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // m(m+1)/2 is always integral; the scores are nonnegative so
    // floor-division on decimal is the same function as integer DIV
    val half =
      if (use128) floor(col("m0") * (col("m0") + 1) / 2)
      else expr("m0 * (m0 + 1) DIV 2")
    val contrib = col("t0") * (col("m0") * (col("cumm") - col("m0")) + half)
    base
      .withColumn("cumm", sum(col("m0")).over(w))
      .groupBy(col(keyCol))
      .agg(sum(col("m0")).as("n_items"),
        sum(col("t0") * col("m0")).as("total_mass"),
        sum(contrib).as("__s1"))
      .select(col(keyCol), col("n_items"), col("total_mass"),
        when(col("total_mass") === 0, lit(null).cast("double"))
          .otherwise(round(
            (lit(2) * col("__s1") - (col("n_items") + 1) * col("total_mass"))
              .cast("double") /
              (col("n_items") * col("total_mass")).cast("double"), 6))
          .as("gini"))
  }
}
