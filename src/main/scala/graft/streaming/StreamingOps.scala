package graft.streaming

import graft.sources.MqttSource
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY §2.9): the reference is
  * batch-only, so this is the designed extension — the batch parse and
  * bucket-aggregate logic reused verbatim under `readStream`, with
  * watermarks for late data and within-watermark dedup for duplicates.
  *
  * Design rule: the streaming readings schema is identical to the batch
  * one, so every downstream operator (resample, threshold, sessionize)
  * applies unchanged; only the source/sink edges differ.
  */
object StreamingOps {

  /** S4 as a stream: MQTT JSON-lines files appearing under `path`
    * (same per-line schema as [[MqttSource]]; a Kafka source would
    * substitute `readStream.format("kafka")` with the same parse). */
  def mqttStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .text(path)
      .select(from_json(col("value"), MqttSource.schema).as("j"))
      .select(
        col("j.ts").as("ts_s"),
        col("j.payload.dst").as("dst"),
        col("j.payload.params.`switch:0`.apower").as("apower"))
      .filter(col("ts_s").isNotNull && col("dst").isNotNull &&
        col("dst").contains("/events") && col("apower").isNotNull)
      .select(
        regexp_replace(col("dst"), "/events", "").as("device"),
        timestamp_seconds(col("ts_s")).as("ts"),
        col("apower"))

  /** A1/A5 online: event-time bucket mean with a watermark — the
    * streaming form of resample-mean. Late rows beyond `lateness` are
    * dropped at the state boundary instead of growing state forever. */
  def bucketMean(readings: DataFrame, bucket: String,
                 lateness: String): DataFrame =
    readings
      .withWatermark("ts", lateness)
      .groupBy(col("device"), window(col("ts"), bucket).as("w"))
      .agg(avg(col("apower")).as("apower"))
      .select(col("device"), col("w.start").as("bucket_start"),
        col("apower"))

  /** P11 online: keep-first per (device, ts) with bounded state —
    * `dropDuplicatesWithinWatermark` is the streaming form of the batch
    * keep-first dedup. */
  def dedupKeepFirst(readings: DataFrame, lateness: String): DataFrame =
    readings
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("device", "ts")

  case class Reading(device: String, ts: java.sql.Timestamp, apower: Double)
  case class Transition(device: String, ts: java.sql.Timestamp, on: Boolean)

  /** Event time in MICROseconds — `Timestamp.getTime` truncates to ms,
    * which would make gap/ordering comparisons disagree with the batch
    * operators (they compare `unix_micros`). */
  private def micros(ts: java.sql.Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  case class SessionRow(device: String, ts: java.sql.Timestamp,
                        apower: Double, session_id: Long)

  /** Per-device sessionizer state: running session counter + max event
    * time processed in µs (same late-row guard as [[OnOffState]]). */
  case class SessionState(sessionId: Long, maxTsUs: Long)

  /** The streaming form of [[graft.operators.Sessionize]]: gap-based
    * session assignment with `flatMapGroupsWithState` — a reading more
    * than `gapSeconds` after the previous one starts a new session.
    * State per device is two longs (bounded); rows are processed in
    * event-time order within a batch and late rows (at-or-before the
    * max seen event time) are dropped, so session ids never travel
    * backward across micro-batches. Ids are 1-based per device,
    * consistent with the batch operator. */
  def sessionize(readings: DataFrame, gapSeconds: Long): Dataset[SessionRow] = {
    implicit val re = Encoders.product[Reading]
    implicit val oe = Encoders.product[SessionRow]
    implicit val se = Encoders.product[SessionState]
    implicit val ke = Encoders.STRING
    readings.as[Reading]
      .groupByKey(_.device)
      .flatMapGroupsWithState[SessionState, SessionRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (device: String, rows: Iterator[Reading], state: GroupState[SessionState]) =>
          val st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
          var sid = st.sessionId
          var maxTs = st.maxTsUs
          val out = scala.collection.mutable.ArrayBuffer[SessionRow]()
          rows.toSeq.sortBy(r => micros(r.ts)).foreach { r =>
            val t = micros(r.ts)
            if (t > maxTs) {
              if (sid == 0L || t - maxTs > gapSeconds * 1000000L) sid += 1
              out += SessionRow(device, r.ts, r.apower, sid)
              maxTs = t
            }
          }
          state.update(SessionState(sid, maxTs))
          out.iterator
      }
  }

  /** Per-device transition-detector state: current ON/OFF plus the
    * max event time already processed (µs) — the event-time guard that
    * makes cross-batch ordering sound (a bare boolean state would let
    * a late row in a later micro-batch emit a transition that travels
    * BACKWARD in event time). */
  case class OnOffState(on: Boolean, maxTsUs: Long)

  /** W6/W8 online: per-device ON/OFF transition detection with custom
    * state — the `flatMapGroupsWithState` form of the batch threshold +
    * run-length pass (postprocessing.py:32-42 + 5-24's edge detection).
    * State is (boolean, max-event-ts) per device — bounded. Each
    * micro-batch's rows are ordered by event time before the scan, and
    * rows at-or-before the state's max-seen event time are DROPPED:
    * they arrived after a newer reading was already processed, and
    * emitting their transition now would be out of event-time order
    * (the enclosing query's watermark bounds how long such late rows
    * can keep arriving; this guard makes the operator itself safe
    * regardless). Emits one row per state change, including the
    * initial OFF→ON if the first reading is above threshold. */
  def onOffTransitions(readings: DataFrame,
                       threshold: Double): Dataset[Transition] = {
    implicit val re = Encoders.product[Reading]
    implicit val te = Encoders.product[Transition]
    implicit val se = Encoders.product[OnOffState]
    implicit val ke = Encoders.STRING
    readings.as[Reading]
      .groupByKey(_.device)
      .flatMapGroupsWithState[OnOffState, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (device: String, rows: Iterator[Reading], state: GroupState[OnOffState]) =>
          val st = state.getOption.getOrElse(OnOffState(on = false, Long.MinValue))
          var on = st.on
          var maxTs = st.maxTsUs
          val out = scala.collection.mutable.ArrayBuffer[Transition]()
          rows.toSeq.sortBy(r => micros(r.ts)).foreach { r =>
            val t = micros(r.ts)
            if (t > maxTs) { // late (<= max-seen) rows are dropped
              val nowOn = r.apower >= threshold
              if (nowOn != on) {
                out += Transition(device, r.ts, nowOn)
                on = nowOn
              }
              maxTs = t
            }
          }
          state.update(OnOffState(on, maxTs))
          out.iterator
      }
  }
}
