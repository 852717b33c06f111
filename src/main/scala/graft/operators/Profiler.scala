package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality column profiler: per-column row/null/distinct counts
  * and numeric range/mean, the audit a pipeline runs before trusting a
  * new data drop (schema drift, null floods, and out-of-range values
  * are the classic silent killers of a scheduled 100 TB ingest).
  *
  * ONE pass over the data for all requested columns: every statistic is
  * an aggregate of the same scan, and the per-column rows are produced
  * by unpivoting the single aggregate row with `stack` — never one job
  * per column (profiling N columns with N scans is the anti-pattern
  * this exists to replace). The distinct counts are exact and add one
  * expand per column; pass `approxDistinct = true` to use HLL sketches
  * (`approx_count_distinct`) instead, which keeps the scan single-pass
  * with O(1) state — the right default at fact scale (same
  * exact-for-oracle / approx-for-scale split as
  * [[graft.operators.Quantiles]]).
  */
object Profiler {

  def numericProfile(df: DataFrame, cols: Seq[String],
                     approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    val aggs = cols.flatMap { c =>
      val distinct =
        if (approxDistinct) approx_count_distinct(col(c))
        else countDistinct(col(c))
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        distinct.as(s"${c}__distinct"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        avg(col(c)).as(s"${c}__mean"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `${c}__n`, `${c}__nulls`, `${c}__distinct`, " +
        s"`${c}__min`, `${c}__max`, `${c}__mean`"
    }.mkString(", ")
    row.select(expr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n, n_nulls, n_distinct, vmin, vmax, vmean)"))
  }
}
