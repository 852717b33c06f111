package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Gap-based sessionization: two ordered window passes — flag a session
  * break where the inter-event gap exceeds `gapSeconds`, then a running
  * sum turns break flags into session ids. This is the distributed form
  * of the reference's linear scan over a binary series
  * (`bert_single_appliance/postprocessing.py:5-24`).
  *
  * Scale note: both window passes share one partitioning (the key), so
  * Spark shuffles once; per-key data must fit a task, which holds for
  * per-device sensor streams (keys are fine-grained).
  */
object Sessionize {

  /** Row-level output: input columns + `session_id` (1-based per key). */
  def assignSessions(df: DataFrame, key: Column, ts: Column,
                     tieBreak: Seq[Column], gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts +: tieBreak: _*)
    val prevTs = lag(unix_micros(ts), 1).over(w)
    val isBreak = when(
      prevTs.isNull || (unix_micros(ts) - prevTs) > gapSeconds * 1000000L,
      1L).otherwise(0L)
    df.withColumn("session_id",
      sum(isBreak).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Row-level output with per-session length attached (`session_len`).
    * `tieBreak` orders equal timestamps deterministically (e.g. an
    * ingest-order id column); pass Nil when timestamps are unique. */
  def sessions(df: DataFrame, key: Column, ts: Column, gapSeconds: Long,
               tieBreak: Seq[Column] = Seq(col("event_id"))): DataFrame = {
    val assigned = assignSessions(df, key, ts, tieBreak, gapSeconds)
    val wSess = Window.partitionBy(key, col("session_id"))
    assigned.withColumn("session_len", count(lit(1)).over(wSess))
  }
}
