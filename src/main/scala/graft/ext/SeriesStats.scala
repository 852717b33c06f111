package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Integer-exact series statistics over collapsed count frames — the
  * q141 core, factored out so the int64-overflow contract is testable
  * with planted counts (the q136/Hits pattern: a physical row fixture
  * can never reach 2⁶³, a counts frame can).
  */
object SeriesStats {

  /** Lag-1 autocorrelation per key over an ordered count series.
    *
    * Input: one row per (key, ord) with a long count `c` (e.g. the
    * daily-collapsed event frame — ≤ days×keys rows). Numerator and
    * denominator are computed in SCALED integers (n·c_k − S is exact;
    * the common n² factor cancels in the ratio), so both sums are
    * bit-exact and order-free; the single final division is the only
    * float op. n = 1 or an all-equal series yields a 0 denominator →
    * null. All window passes share one `key` clustering.
    *
    * Under ANSI (Spark 4 default) a series whose (n·c − S)² products
    * overflow int64 fails LOUDLY; pass `use128 = true` to run the
    * identical arithmetic on decimal(38,0) — bit-identical ratios in
    * the int64-safe range (red-tested in SeriesStatsSpec). */
  /** Calendar-aligned lag-k autocorrelation per key — the seasonality
    * strength read (k=7: weekly). Unlike [[lag1Autocorr]]'s row lag,
    * the k-back value comes from a RANGE frame over a NUMERIC order
    * column (epoch day), so a gappy calendar pairs day d with day
    * d−k exactly or not at all (a missing d−k contributes no
    * numerator term; the denominator still spans the full series) —
    * a row lag would silently pair across gaps and fake the phase.
    * Same scaled-integer arithmetic and int64/decimal128 overflow
    * contract as [[lag1Autocorr]] (red-tested in SeriesStatsSpec). */
  def calendarLagAutocorr(counts: DataFrame, keyCol: String,
                          ordCol: String, cCol: String, k: Int,
                          use128: Boolean = false): DataFrame = {
    val base =
      if (use128)
        counts.withColumn(cCol, col(cCol).cast("decimal(38,0)"))
      else counts
    val wt = Window.partitionBy(col(keyCol))
    val wr = wt.orderBy(col(ordCol)).rangeBetween(-k, -k)
    val dev = col("n") * col("c0") - col("s")
    val devPrev = col("n") * col("prev") - col("s")
    base
      .withColumn("c0", col(cCol))
      .withColumn("n", count(lit(1)).over(wt))
      .withColumn("s", sum(col("c0")).over(wt))
      .withColumn("prev", max(col("c0")).over(wr))
      .groupBy(col(keyCol))
      .agg(max(col("n")).as("n_points"),
        sum(when(col("prev").isNotNull, lit(1L)).otherwise(0L))
          .as("n_pairs"),
        sum(when(col("prev").isNotNull, dev * devPrev)).as("num"),
        sum(dev * dev).as("den"))
      .select(col(keyCol), col("n_points"), col("n_pairs"),
        when(col("den") === 0 || col("n_pairs") === 0,
          lit(null).cast("double"))
          .otherwise(round(col("num").cast("double") /
            col("den").cast("double"), 6))
          .as(s"lag${k}_autocorr"))
  }

  def lag1Autocorr(counts: DataFrame, keyCol: String, ordCol: String,
                   cCol: String, use128: Boolean = false): DataFrame = {
    val base =
      if (use128)
        counts.withColumn(cCol, col(cCol).cast("decimal(38,0)"))
      else counts
    val wt = Window.partitionBy(col(keyCol))
    val wd = wt.orderBy(col(ordCol))
    val dev = col("n") * col("c0") - col("s")
    val devPrev = col("n") * col("prev") - col("s")
    base
      .withColumn("c0", col(cCol))
      .withColumn("n", count(lit(1)).over(wt))
      .withColumn("s", sum(col("c0")).over(wt))
      .withColumn("prev", lag(col("c0"), 1).over(wd))
      .groupBy(col(keyCol))
      .agg(max(col("n")).as("n_points"),
        sum(when(col("prev").isNotNull, dev * devPrev)).as("num"),
        sum(dev * dev).as("den"))
      .select(col(keyCol), col("n_points"),
        when(col("den") === 0, lit(null).cast("double"))
          .otherwise(round(col("num").cast("double") /
            col("den").cast("double"), 6))
          .as("lag1_autocorr"))
  }
}
