package graft

import graft.nilm.{NilmDataset, TensorPrep}
import org.apache.spark.sql.functions._

/** E2/E3 tensor prep: label order, ts alignment with zero fill,
  * aggregate requirement, window shapes, S10 sink round-trip. */
class TensorPrepSpec extends SparkSpec {

  import spark.implicits._

  private def ts(i: Int) =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1600000000L + 8L * i))

  /** house 1: aggregate + kettle + fridge on a shared 8-row grid;
    * house 2: aggregate + kettle only (fridge must zero-fill);
    * house 3: kettle only (no aggregate → skipped). */
  private def dataset: NilmDataset = {
    def rows(h: Long, ch: String, vals: Seq[Double]) =
      vals.zipWithIndex.map { case (v, i) => ("d1", h, ch, ts(i), v) }
    val readings = (
      rows(1L, "agg", Seq(10, 20, 30, 40, 50, 60, 70, 80)) ++
        rows(1L, "ket", Seq(1, 2, 3, 4, 5, 6, 7, 8)) ++
        rows(1L, "fri", Seq(5, 5, 5, 5, 5, 5, 5, 5)) ++
        rows(2L, "agg", Seq(9, 9, 9, 9, 9, 9)) ++
        rows(2L, "ket", Seq(2, 2, 2, 2, 2, 2)) ++
        rows(3L, "ket", Seq(7, 7, 7, 7))
      ).toDF("dataset", "house_id", "channel_id", "ts", "power")
    val channels = Seq(
      ("d1", 1L, "agg", "aggregate", "aggregate"),
      ("d1", 1L, "ket", "kettle", "kettle"),
      ("d1", 1L, "fri", "fridge", "fridge"),
      ("d2", 2L, "agg", "aggregate", "aggregate"),
      ("d2", 2L, "ket", "kettle", "kettle"),
      ("d3", 3L, "ket", "kettle", "kettle"))
      .toDF("dataset", "house_id", "channel_id", "raw_label", "universal_label")
      .withColumn("dataset", lit("d1"))
      .withColumn("unit", lit("watts"))
      .withColumn("data_type", lit("active"))
      .withColumn("sample_rate_s", lit(8L))
      .withColumn("manufacturer", lit("?"))
      .withColumn("model", lit("?"))
      .withColumn("acquisition_device", lit("?"))
    NilmDataset(readings, channels)
  }

  test("applianceOrder: sorted distinct labels, aggregate excluded") {
    assert(TensorPrep.applianceOrder(dataset) == Seq("fridge", "kettle"))
  }

  test("windows: X/Y content, zero fill, aggregate-less house skipped") {
    val w = TensorPrep.windows(dataset, seqLen = 4, step = 2)
      .orderBy("house_id", "window_id")
      .select($"house_id", $"window_id", $"x", $"y")
      .as[(Long, Long, Seq[Float], Seq[Seq[Float]])]
      .collect().toSeq

    // house 1: 8 rows → (8-4)/2+1 = 3 windows; house 2: 6 rows → 2;
    // house 3 skipped (no aggregate)
    assert(w.map(r => (r._1, r._2)) ==
      Seq((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L), (2L, 1L)))

    val h1w0 = w.head
    assert(h1w0._3 == Seq(10f, 20f, 30f, 40f))
    // label order (fridge, kettle): per-row [fridge, kettle]
    assert(h1w0._4 == Seq(Seq(5f, 1f), Seq(5f, 2f), Seq(5f, 3f), Seq(5f, 4f)))

    // house 2 has no fridge channel → zero-filled first component
    val h2w0 = w(3)
    assert(h2w0._3 == Seq(9f, 9f, 9f, 9f))
    assert(h2w0._4 == Seq.fill(4)(Seq(0f, 2f)))
  }

  test("windowsOverlap: fraction and sample forms reduce to the step form") {
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("house_id", "window_id")
      .select($"house_id", $"window_id", $"x", $"y")
      .as[(Long, Long, Seq[Float], Seq[Seq[Float]])].collect().toSeq
    val byStep = rows(TensorPrep.windows(dataset, seqLen = 4, step = 2))
    // channel_utils.py:187-188: float < 1 → fraction of seqLen
    // (0.5 · 4 → step 2); >= 1 → overlap in samples (4 − 2 → step 2)
    assert(rows(TensorPrep.windowsOverlap(dataset, 4, overlap = 0.5)) == byStep)
    assert(rows(TensorPrep.windowsOverlap(dataset, 4, overlap = 2.0)) == byStep)
    // full-overlap degenerate form clamps to step 1 (max(1, ·))
    val dense = rows(TensorPrep.windowsOverlap(dataset, 4, overlap = 4.0))
    assert(dense.count(_._1 == 1L) == 5) // 8 rows, seqLen 4, step 1
  }

  test("commonChannels: requiredDataTypes filters candidates before scoring") {
    // house 1: kettle on an active channel (low variance) AND a reactive
    // channel (high variance); house 2's only kettle is reactive
    def r(h: Long, ch: String, vals: Seq[Double]) =
      vals.zipWithIndex.map { case (v, i) => ("d1", h, ch, ts(i), v) }
    val readings = (
      r(1L, "ket_a", Seq(1, 2, 1, 2)) ++
        r(1L, "ket_r", Seq(0, 100, 0, 100)) ++
        r(2L, "ket_r", Seq(5, 50, 5, 50))
      ).toDF("dataset", "house_id", "channel_id", "ts", "power")
    val channels = Seq(
      ("d1", 1L, "ket_a", "active"),
      ("d1", 1L, "ket_r", "reactive"),
      ("d1", 2L, "ket_r", "reactive"))
      .toDF("dataset", "house_id", "channel_id", "data_type")
      .withColumn("raw_label", lit("kettle"))
      .withColumn("universal_label", lit("kettle"))
      .withColumn("unit", lit("watts"))
      .withColumn("sample_rate_s", lit(8L))
      .withColumn("manufacturer", lit("?"))
      .withColumn("model", lit("?"))
      .withColumn("acquisition_device", lit("?"))
    val ds = NilmDataset(readings, channels)
    try {
      // no type filter: the high-variance reactive channel wins house 1
      val open = ds.commonChannels(Seq("kettle"))
        .select($"house_id", $"channel_id").as[(Long, String)]
        .collect().toMap
      assert(open == Map(1L -> "ket_r", 2L -> "ket_r"))
      // 'active' only: winner flips in house 1; house 2 has no active
      // kettle left, so it no longer qualifies (channel_utils.py:75)
      val active = ds.commonChannels(Seq("kettle"), Seq("active"))
        .select($"house_id", $"channel_id").as[(Long, String)]
        .collect().toMap
      assert(active == Map(1L -> "ket_a"))
      // required_labels=None form (channel_utils.py:46,75): every house
      // kept, best per (house, label) over ALL channels — composes with
      // the type filter
      val all = ds.commonChannels()
        .select($"house_id", $"channel_id").as[(Long, String)]
        .collect().toMap
      assert(all == Map(1L -> "ket_r", 2L -> "ket_r"))
      val allActive = ds.commonChannels(requiredDataTypes = Seq("active"))
        .select($"house_id", $"channel_id").as[(Long, String)]
        .collect().toMap
      assert(allActive == Map(1L -> "ket_a"))
    } finally Caching.release()
  }

  test("resampleAllChannels: bucket-means fine channels, skips coarse ones") {
    // dataset fixture rates are 8 s; mark the fridge channel as 32 s so
    // the per-channel no-upsample guard passes it through untouched
    val ds0 = dataset
    val ds = ds0.copy(channels = ds0.channels.withColumn("sample_rate_s",
      when($"channel_id" === "fri", 32L).otherwise($"sample_rate_s")))
    val out = ds.resampleAllChannels(seconds = 16)
    val counts = out.readings.filter($"house_id" === 1)
      .groupBy("channel_id").count().orderBy("channel_id")
      .as[(String, Long)].collect().toSeq
    // agg/ket: 8 rows @8s → 4 buckets of 16s; fri (32s) passes through: 8
    assert(counts == Seq(("agg", 4L), ("fri", 8L), ("ket", 4L)))
    // bucket means: agg pairs (10,20),(30,40),(50,60),(70,80)
    val aggVals = out.readings
      .filter($"house_id" === 1 && $"channel_id" === "agg")
      .orderBy("ts").select("power").as[Double].collect().toSeq
    assert(aggVals == Seq(15.0, 35.0, 55.0, 75.0))
    // dim rates updated only for resampled channels
    val rates = out.channels.filter($"house_id" === 1)
      .select("channel_id", "sample_rate_s").as[(String, Long)]
      .collect().toMap
    assert(rates("agg") == 16L && rates("fri") == 32L)
  }

  test("activityFilter keeps windows with > minCount active samples") {
    val w = TensorPrep.windows(dataset, seqLen = 4, step = 2)
    // house 1 x-windows contain values 10..80: threshold 35 → window 0
    // has 1 active (40), window 1 has 3 (40,50,60), window 2 has 4
    val kept = TensorPrep.activityFilter(w.filter($"house_id" === 1),
        $"x", threshold = 35.0, minCount = 2)
      .select($"window_id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(1L, 2L))
  }

  test("normalizeClip: in-plan 0.99-quantile scaling clamped to [0,1]") {
    val w = TensorPrep.windows(dataset, seqLen = 4, step = 2)
    val normed = TensorPrep.normalizeClip(w)
    val rows = normed.select($"x_norm").as[Seq[Float]].collect()
    assert(rows.forall(_.forall(v => v >= 0f && v <= 1f)))
    // max value (80) exceeds the 0.99 quantile → clamps to exactly 1
    assert(rows.exists(_.contains(1f)))
  }

  test("S10 sink: array-typed parquet round-trip") {
    val out = java.nio.file.Files.createTempDirectory("graft_tensors").toString
    val w = TensorPrep.windows(dataset, seqLen = 4, step = 4)
    TensorPrep.write(w, out)
    val back = spark.read.parquet(out)
    assert(back.count() == w.count())
    val row = back.filter($"house_id" === 1 && $"window_id" === 0)
      .select($"x", $"y")
      .as[(Seq[Float], Seq[Seq[Float]])].head()
    assert(row._1 == Seq(10f, 20f, 30f, 40f))
    assert(row._2.forall(_.size == 2)) // Z = 2 appliances
  }
}
