package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming throughput datapoints (round-8 verdict #7): drives the two
  * flagship StreamingOps shapes from a `rate` source and reports
  * sustained rows/s, grounding the "same schema, swap readStream"
  * claim with a measured number:
  *
  *   - `bucketMean` — watermarked event-time windowed aggregation (the
  *     shuffle-bearing shape: state store + exchange per microbatch);
  *   - `dedupDocsNear` — SimHash-keyed TTL'd stateful dedup (the
  *     flatMapGroupsWithState shape; the native `graft_simhash`
  *     projection runs per input row).
  *
  * Method: rate source at SPARK_GRAFT_STREAM_RPS rows/s (default
  * 200000) for SPARK_GRAFT_STREAM_SECS seconds (default 30), noop
  * sink, throughput = median `processedRowsPerSecond` over completed
  * micro-batches after the first two (JIT + state-store warmup).
  * A result ≈ the offered rate means source-bound (raise the rate);
  * the reported number is a LOWER bound on pipeline capacity either
  * way. Prints one JSON line.
  *
  * Two further knobs (round-9 verdict #5 — find where the near-dup
  * ceiling goes and test the state-store lever):
  *
  *   - SPARK_GRAFT_STREAM_STORE=rocksdb swaps the state store
  *     provider to RocksDBStateStoreProvider (ships with Spark) —
  *     the standard lever for TTL'd high-cardinality state, where
  *     the default HDFS-backed store keeps every key on the JVM heap
  *     and pays full-map snapshot costs per batch;
  *   - the dedup measurement is DECOMPOSED: `dedup_proj_rps` runs
  *     the SimHash projection with no stateful operator (the
  *     stateless ceiling), `dedup_exact_rps` runs the same stateful
  *     core keyed on md5 (cheap key, same state round-trips), and
  *     `dedup_near_rps` is the full SimHash-keyed pipeline — so
  *     (proj − near) splits into projection vs state-store cost.
  *
  * Run: `tools/streaming_bench.sh` or
  * `sbt -batch "runMain graft.StreamingBench"`.
  */
object StreamingBench {

  private def medianRate(q: org.apache.spark.sql.streaming.StreamingQuery): Double = {
    // warmup cut: drop the first two ROW-PROCESSING batches still in
    // the buffer (batch 0/1 often carry zero rows, so a bare batchId
    // cut would keep the JIT/state-store-cold batches 2-3 in the
    // median; and recentProgress is a ~100-entry ring buffer, so a
    // positional drop(2) on long runs discards steady-state samples
    // after the true warmup entries were evicted)
    val rows = q.recentProgress.toSeq.filter(_.numInputRows > 0)
    val cut = rows.map(_.batchId).minOption.getOrElse(0L) + 2
    val rates = rows
      .filter(_.batchId >= cut)
      .map(_.processedRowsPerSecond)
      .filterNot(_.isNaN)
      .sorted
    if (rates.isEmpty) -1.0 else rates(rates.length / 2)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rps = sys.env.getOrElse("SPARK_GRAFT_STREAM_RPS", "200000").toLong
    val secs = sys.env.getOrElse("SPARK_GRAFT_STREAM_SECS", "30").toInt
    val store = sys.env.getOrElse("SPARK_GRAFT_STREAM_STORE", "hdfs")
    // an unrecognized value must not silently bench the default store
    // while STAMPING the requested name into the result line — that
    // would let an A/B "confirm" parity by comparing HDFS to itself
    require(Set("hdfs", "rocksdb")(store),
      s"SPARK_GRAFT_STREAM_STORE=$store — use 'hdfs' or 'rocksdb'")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (store == "rocksdb")
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)

    // source parallelism knob: the stateless shapes (e.g. the SimHash
    // projection) never shuffle, so they run on exactly this many
    // cores — raising it is how the projection ceiling scales out,
    // on this box and on a cluster
    val parts = sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "8").toInt
    def rate(): DataFrame = spark.readStream.format("rate")
      .option("rowsPerSecond", rps)
      .option("numPartitions", parts)
      .load()

    def run(name: String, out: DataFrame): Double = {
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft_sb_$name").toString
      val q = out.writeStream.format("noop")
        .option("checkpointLocation", ckpt).start()
      Thread.sleep(secs * 1000L)
      val r = medianRate(q)
      q.stop()
      r
    }

    // shape 1: watermarked bucket mean over (device, 1-min window)
    val readings = rate().select(
      col("timestamp").as("ts"),
      concat(lit("d"), pmod(col("value"), lit(50))).as("device"),
      (col("value") % 1000).cast("double").as("apower"))
    val bucketRate = run("bucket",
      graft.streaming.StreamingOps.bucketMean(readings, "1 minute", "10 seconds"))

    // shape 2: SimHash-keyed near-dup dedup; every 4 consecutive rows
    // share a word SET but in a row-dependent rotation (value % 4), so
    // the stateful core exercises both first-wins and drop paths AND
    // the drops come from SimHash's order-invariance, not byte-equal text
    def docs(): DataFrame = rate().select(
      col("value").as("doc_id"),
      col("timestamp").as("ts"),
      (0 until 4).foldLeft(lit(null).cast("string")) { (acc, r) =>
        when(pmod(col("value"), lit(4)) === r,
          concat_ws(" ", (0 until 20).map { j =>
            val jr = (j + 5 * r) % 20 // rotate the word order per row
            concat(lit("w"), pmod(col("value").divide(lit(4)).cast("long")
              * 31 + jr * 7, lit(5000)))
          }: _*)).otherwise(acc)
      }.as("text"))
      .withWatermark("ts", "10 seconds")
    // decomposition arms (scaladoc): stateless projection ceiling,
    // cheap-key stateful, full near-dup
    val projRate = run("dedup_proj",
      docs().select(col("doc_id"), col("ts"),
        expr("graft_simhash(text)").as("sig")))
    val exactRate = run("dedup_exact",
      graft.streaming.StreamingOps.dedupDocsExact(docs(), ttlSeconds = 3600).toDF())
    val dedupRate = run("dedup",
      graft.streaming.StreamingOps.dedupDocsNear(docs(), ttlSeconds = 3600).toDF())
    // the built-in-operator formulation (TTL ≈ watermark delay): same
    // SimHash key, state machine run by dropDuplicatesWithinWatermark
    // instead of the fMGWS lambda — the stateful-side ceiling probe
    val wwRate = run("dedup_ww",
      graft.streaming.StreamingOps.dedupDocsNearWithinWatermark(docs()).toDF())

    // shape 3 (round 17): native session_window summaries — per-device
    // merged-session state, the third state-store access pattern
    // (window-merge) beside windowed-agg and per-key fMGWS
    val sessRate = run("session_agg",
      graft.streaming.StreamingOps.sessionAgg(readings, gapSeconds = 30,
        lateness = "10 seconds"))

    def f(v: Double) = "%.0f".formatLocal(java.util.Locale.ROOT, v)
    val line = s"""{"offered_rps":$rps,"secs":$secs,"store":"$store",""" +
      s""""bucket_mean_rows_per_sec":${f(bucketRate)},""" +
      s""""dedup_proj_rows_per_sec":${f(projRate)},""" +
      s""""dedup_exact_rows_per_sec":${f(exactRate)},""" +
      s""""dedup_near_rows_per_sec":${f(dedupRate)},""" +
      s""""dedup_near_ww_rows_per_sec":${f(wwRate)},""" +
      s""""session_agg_rows_per_sec":${f(sessRate)}}"""
    println(line)
    System.err.println(line)
    spark.stop()
  }
}
