package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** §2.9 — streaming parse/aggregate/dedup against the MQTT fixture via
  * a file stream + memory sink. */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private def stageFixtureDir(): String = {
    val dir = Files.createTempDirectory("graft_stream")
    val src = Paths.get(new java.net.URI(fixture("mqtt") + "/mqtt.log.20240101"))
    Files.copy(src, dir.resolve("mqtt.log.20240101"),
      StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("mqttStream parses the same rows as the batch source") {
    val q = StreamingOps.mqttStream(spark, stageFixtureDir())
      .writeStream.format("memory").queryName("mq_parse")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("mq_parse")
        .orderBy("device", "ts", "apower")
        .select($"device", unix_timestamp($"ts"), $"apower")
        .as[(String, Long, Double)].collect().toSeq
      // 4 valid lines (malformed/no-events/missing-apower dropped);
      // duplicates NOT averaged at parse stage
      assert(rows == Seq(
        ("shelly-kitchen", 1600000000L, 44.5),
        ("shelly-kitchen", 1600000000L, 55.5),
        ("shelly-kitchen", 1600000010L, 60.0),
        ("shelly-lamp", 1600000010L, 5.0)))
    } finally q.stop()
  }

  test("bucketMean: event-time windowed mean with watermark") {
    val q = StreamingOps.bucketMean(
        StreamingOps.mqttStream(spark, stageFixtureDir()),
        bucket = "10 seconds", lateness = "30 seconds")
      .writeStream.format("memory").queryName("mq_bucket")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("mq_bucket")
        .orderBy("device", "bucket_start")
        .select($"device", unix_timestamp($"bucket_start"), $"apower")
        .as[(String, Long, Double)].collect().toSeq
      assert(rows == Seq(
        ("shelly-kitchen", 1600000000L, 50.0), // mean of 55.5, 44.5
        ("shelly-kitchen", 1600000010L, 60.0),
        ("shelly-lamp", 1600000010L, 5.0)))
    } finally q.stop()
  }

  test("onOffTransitions: stateful per-device edge detection") {
    val q = StreamingOps.onOffTransitions(
        StreamingOps.mqttStream(spark, stageFixtureDir()), threshold = 30.0)
      .writeStream.format("memory").queryName("mq_onoff")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("mq_onoff")
        .orderBy("device", "ts")
        .select($"device", unix_timestamp($"ts"), $"on")
        .as[(String, Long, Boolean)].collect().toSeq
      // kitchen: 55.5/44.5 at t0 and 60 at t10 all >= 30 → exactly one
      // OFF→ON edge at t0; lamp: 5.0 stays OFF → no rows
      assert(rows == Seq(("shelly-kitchen", 1600000000L, true)))
    } finally q.stop()
  }

  test("onOffTransitions: cross-batch late rows cannot emit out-of-order transitions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    val readings = mem.toDS().toDF("device", "ts_s", "apower")
      .select($"device", timestamp_seconds($"ts_s").as("ts"), $"apower")
    val q = StreamingOps.onOffTransitions(readings, threshold = 30.0)
      .writeStream.format("memory").queryName("mq_late")
      .outputMode("append").start()
    try {
      // batch 1: ON at t=100, OFF at t=200
      mem.addData(("dev", 100L, 50.0), ("dev", 200L, 5.0))
      q.processAllAvailable()
      // batch 2: a LATE above-threshold row at t=150 — without the
      // max-event-ts guard it would emit ON@150 *after* OFF@200 was
      // already output (event-time travel backwards) — plus a genuinely
      // new row at t=300
      mem.addData(("dev", 150L, 80.0), ("dev", 300L, 45.0))
      q.processAllAvailable()
      val rows = spark.table("mq_late")
        .orderBy("ts")
        .select($"device", unix_timestamp($"ts"), $"on")
        .as[(String, Long, Boolean)].collect().toSeq
      assert(rows == Seq(
        ("dev", 100L, true),
        ("dev", 200L, false),
        ("dev", 300L, true))) // late t=150 dropped, no out-of-order edge
    } finally q.stop()
  }

  test("asOfEnrich: stream-stream as-of with refs-first ties and cross-batch state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val readMem = MemoryStream[(String, Long, Double)]
    val refMem = MemoryStream[(String, Long, Option[Double])]
    val readings = readMem.toDS().toDF("device", "ts_s", "apower")
      .select($"device", timestamp_seconds($"ts_s").as("ts"), $"apower")
    val refs = refMem.toDS().toDF("device", "ts_s", "ref")
      .select($"device", timestamp_seconds($"ts_s").as("ts"), $"ref")
    val q = StreamingOps.asOfEnrich(readings, refs)
      .writeStream.format("memory").queryName("mq_asof")
      .outputMode("append").start()
    try {
      // phase 1: a reading BEFORE any ref (null enrich), a ref, a
      // reading at the ref's exact ts (inclusive tie), one after.
      // Refs are added first so no micro-batch can process a reading
      // before its reference is available (ref-arrives-later is the one
      // documented uncovered skew).
      refMem.addData(("dev", 100L, Some(10.0)))
      readMem.addData(("dev", 50L, 1.0), ("dev", 100L, 2.0), ("dev", 120L, 3.0))
      q.processAllAvailable()
      // phase 2: a newer ref at t=200 plus readings straddling it — the
      // t=150 reading must match the OLD ref@100 even though ref@200 is
      // already in state (the buffer keeps superseded refs until the
      // reading high-water mark passes them), and a stale ref at t=90
      // must be trimmed, never matched
      refMem.addData(("dev", 200L, Some(20.0)), ("dev", 90L, Some(99.0)))
      readMem.addData(("dev", 150L, 4.0), ("dev", 250L, 5.0))
      q.processAllAvailable()
      // phase 3: a NULL-valued reference (a real sample: it matches and
      // enriches with null — ref_ts set, ref_value null — not with the
      // older 20.0, and it must not crash the query), then two readings
      // at the SAME event time (both must emit — equal ts is not
      // out-of-order)
      refMem.addData(("dev", 300L, None))
      q.processAllAvailable()
      readMem.addData(("dev", 310L, 6.0), ("dev", 310L, 7.0))
      q.processAllAvailable()
      val rows = spark.table("mq_asof")
        .orderBy("ts", "apower")
        .select(unix_timestamp($"ts"), $"apower", $"ref_value",
          unix_timestamp($"ref_ts"))
        .as[(Long, Double, Option[Double], Option[Long])].collect().toSeq
      assert(rows == Seq(
        (50L, 1.0, None, None),
        (100L, 2.0, Some(10.0), Some(100L)),
        (120L, 3.0, Some(10.0), Some(100L)),
        (150L, 4.0, Some(10.0), Some(100L)),
        (250L, 5.0, Some(20.0), Some(200L)),
        (310L, 6.0, None, Some(300L)),
        (310L, 7.0, None, Some(300L))))
    } finally q.stop()
  }

  test("asOfEnrich keeps the floor ref when the buffer cap binds") {
    // the reference stream runs far ahead of the readings: the cap
    // evicts ahead-of-maxRead refs, but the FLOOR sample (newest
    // at-or-before the reading high-water mark) must survive, or the
    // next reading would enrich to null where batch as-of matches
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val readMem = MemoryStream[(String, Long, Double)]
    val refMem = MemoryStream[(String, Long, Option[Double])]
    val readings = readMem.toDS().toDF("device", "ts_s", "apower")
      .select($"device", timestamp_seconds($"ts_s").as("ts"), $"apower")
    val refs = refMem.toDS().toDF("device", "ts_s", "ref")
      .select($"device", timestamp_seconds($"ts_s").as("ts"), $"ref")
    val q = StreamingOps.asOfEnrich(readings, refs, maxRefBuffer = 2)
      .writeStream.format("memory").queryName("mq_asof_floor")
      .outputMode("append").start()
    try {
      // establish the floor and the reading high-water mark first (one
      // batch each, so micro-batch boundaries are deterministic)
      refMem.addData(("dev", 90L, Some(9.0)))
      q.processAllAvailable()
      readMem.addData(("dev", 100L, 1.0))
      q.processAllAvailable()
      // now the reference stream runs 4 samples ahead of the readings,
      // overflowing the cap of 2 — the ahead-tail is evicted but the
      // floor ref@90 must survive
      refMem.addData(("dev", 200L, Some(20.0)), ("dev", 210L, Some(21.0)),
        ("dev", 220L, Some(22.0)), ("dev", 230L, Some(23.0)))
      q.processAllAvailable()
      // a reading between the floor and the capped tail must still see
      // ref@90 (pre-fix the takeRight evicted it → null)
      readMem.addData(("dev", 150L, 2.0))
      q.processAllAvailable()
      val rows = spark.table("mq_asof_floor")
        .orderBy("ts")
        .select(unix_timestamp($"ts"), $"ref_value", unix_timestamp($"ref_ts"))
        .as[(Long, Option[Double], Option[Long])].collect().toSeq
      assert(rows == Seq(
        (100L, Some(9.0), Some(90L)),
        (150L, Some(9.0), Some(90L))))
    } finally q.stop()
  }

  test("asOfEnrich single-batch matches the batch AsOfJoin on random data") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(7)
    val devs = Seq("d1", "d2", "d3")
    val refRows = Seq.tabulate(15)(i =>
      (devs(rnd.nextInt(3)), 1000L + rnd.nextInt(200), i * 1.0)).distinctBy(r => (r._1, r._2))
    val readRows = Seq.tabulate(30)(i =>
      (devs(rnd.nextInt(3)), 1000L + rnd.nextInt(220), 100.0 + i))
    val readMem = MemoryStream[(String, Long, Double)]
    val refMem = MemoryStream[(String, Long, Double)]
    val readings = readMem.toDS().toDF("device", "ts_s", "apower")
      .select($"device", timestamp_seconds($"ts_s").as("ts"), $"apower")
    val refs = refMem.toDS().toDF("device", "ts_s", "ref")
      .select($"device", timestamp_seconds($"ts_s").as("ts"), $"ref")
    refMem.addData(refRows: _*)
    readMem.addData(readRows: _*)
    val q = StreamingOps.asOfEnrich(readings, refs)
      .writeStream.format("memory").queryName("mq_asof_eq")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("mq_asof_eq")
        .select($"device", unix_timestamp($"ts"), $"apower", $"ref_value")
        .as[(String, Long, Double, Option[Double])].collect().toSeq.sorted
      val batchLeft = readRows
        .toDF("device", "ts_s", "apower")
        .select($"device", timestamp_seconds($"ts_s").as("ts"), $"apower")
      val batchRight = refRows.toDF("device", "ts_s", "ref")
        .select($"device", timestamp_seconds($"ts_s").as("ts"), $"ref")
      val want = graft.operators.AsOfJoin
        .backward(batchLeft, batchRight, Seq("device"), "ts", Seq("ref"))
        .select($"device", unix_timestamp($"ts"), $"apower", $"ref")
        .as[(String, Long, Double, Option[Double])].collect().toSeq.sorted
      assert(got == want)
    } finally q.stop()
  }

  test("sessionize: gap sessions across micro-batches match the batch operator") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    val readings = mem.toDS().toDF("device", "ts_s", "apower")
      .select($"device", timestamp_seconds($"ts_s").as("ts"), $"apower")
    val q = StreamingOps.sessionize(readings, gapSeconds = 60)
      .writeStream.format("memory").queryName("mq_sess")
      .outputMode("append").start()
    try {
      mem.addData(("dev", 100L, 1.0), ("dev", 110L, 2.0), ("dev", 300L, 3.0))
      q.processAllAvailable()
      // batch 2: late duplicate-era row (dropped) + session-2 tail + a
      // gap opening session 3
      mem.addData(("dev", 105L, 9.0), ("dev", 310L, 4.0), ("dev", 500L, 5.0))
      q.processAllAvailable()
      val got = spark.table("mq_sess")
        .orderBy("ts")
        .select(unix_timestamp($"ts"), $"session_id")
        .as[(Long, Long)].collect().toSeq
      assert(got == Seq((100L, 1L), (110L, 1L), (300L, 2L),
        (310L, 2L), (500L, 3L)))
      // equivalence with the batch operator on the same (non-late) rows
      val batch = graft.operators.Sessionize.assignSessions(
          Seq(("dev", 100L), ("dev", 110L), ("dev", 300L), ("dev", 310L),
            ("dev", 500L)).toDF("device", "ts_s")
            .select($"device", timestamp_seconds($"ts_s").as("ts")),
          $"device", $"ts", Nil, gapSeconds = 60)
        .orderBy("ts").select(unix_timestamp($"ts"), $"session_id")
        .as[(Long, Long)].collect().toSeq
      assert(batch == got)
    } finally q.stop()
  }

  test("sessionAgg: native session_window summaries match the batch operator") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(7)
    // random per-device streams; deltas drawn from {1..50, 70..200} so
    // no inter-event delta ever equals the 60 s gap (the documented
    // boundary-tie convention difference vs the batch operator)
    val rows = Seq("a", "b", "c").flatMap { dev =>
      var t = 1000L + rnd.nextInt(100)
      Seq.fill(40) {
        t += (if (rnd.nextBoolean()) 1 + rnd.nextInt(50)
              else 70 + rnd.nextInt(131))
        (dev, t, rnd.nextInt(100).toDouble)
      }
    }
    val mem = MemoryStream[(String, Long, Double)]
    val readings = mem.toDS().toDF("device", "ts_s", "apower")
      .select($"device", timestamp_seconds($"ts_s").as("ts"), $"apower")
    val q = StreamingOps.sessionAgg(readings, gapSeconds = 60,
        lateness = "0 seconds")
      .writeStream.format("memory").queryName("mq_sessagg")
      .outputMode("append").start()
    try {
      // arrival in global event-time order — a per-device split would
      // put device c's whole stream behind the watermark batch 1 set
      val (b1, b2) = rows.sortBy(_._2).splitAt(rows.size / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      // two far-future sentinel batches advance the watermark past every
      // real session end so append mode seals and emits them
      mem.addData(("zz", 10_000_000L, 0.0)); q.processAllAvailable()
      mem.addData(("zz", 20_000_000L, 0.0)); q.processAllAvailable()
      val got = spark.table("mq_sessagg")
        .filter($"device" =!= "zz")
        .select($"device", unix_timestamp($"session_start"),
          unix_timestamp($"session_end"), $"n_events", $"sum_apower")
        .as[(String, Long, Long, Long, Double)].collect().toSet
      // batch reference: Sessionize.assignSessions → per-session summary;
      // session_window end = last ts + gap
      val want = graft.operators.Sessionize.assignSessions(
          rows.toDF("device", "ts_s", "apower")
            .select($"device", timestamp_seconds($"ts_s").as("ts"), $"apower"),
          $"device", $"ts", Nil, gapSeconds = 60)
        .groupBy($"device", $"session_id")
        .agg(unix_timestamp(min($"ts")).as("s"),
          (unix_timestamp(max($"ts")) + 60).as("e"),
          count(lit(1)).as("n"), sum($"apower").as("p"))
        .select($"device", $"s", $"e", $"n", $"p")
        .as[(String, Long, Long, Long, Double)].collect().toSet
      assert(want.nonEmpty && got == want,
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    } finally q.stop()
  }

  test("trendingTerms: windowed Misra-Gries matches exact batch counts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    graft.plans.GraftExtensions.register(spark)
    val rnd = new scala.util.Random(13)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon")
    // Zipf-ish draws over a 5-word vocab, two 60s windows of docs
    val rows = (0 until 120).map { i =>
      val t = 1000L + i // window 1: 960-1020, window 2: 1020-1080
      val text = Seq.fill(1 + rnd.nextInt(6))(
        vocab(math.min(rnd.nextInt(6), 4) % 5)).mkString(" ")
      (t, text)
    }
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDS().toDF("ts_s", "text")
      .select(timestamp_seconds($"ts_s").as("ts"), $"text")
    val q = StreamingOps.trendingTerms(docs, "60 seconds", "0 seconds",
        capacity = 1024) // capacity >> 5 distinct terms → exact counts
      .writeStream.format("memory").queryName("mq_trend")
      .outputMode("append").start()
    try {
      val (b1, b2) = rows.splitAt(60)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData((1_000_000L, "x")); q.processAllAvailable()
      mem.addData((2_000_000L, "x")); q.processAllAvailable()
      val got = spark.table("mq_trend")
        .filter(unix_timestamp($"window_start") < 10000)
        .select(unix_timestamp($"window_start").as("ws"),
          explode($"hh").as("e"))
        .select($"ws", $"e.item", $"e.count")
        .as[(Long, String, Long)].collect().toSet
      val want = rows.toDF("ts_s", "text")
        .select(($"ts_s" - $"ts_s" % 60).as("ws"),
          explode(graft.ext.TextOps.words($"text")).as("term"))
        .groupBy($"ws", $"term").agg(count(lit(1)).as("n"))
        .as[(Long, String, Long)].collect().toSet
      assert(want.nonEmpty && got == want,
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    } finally q.stop()
  }

  test("dedupKeepFirst: within-watermark duplicate drop") {
    val q = StreamingOps.dedupKeepFirst(
        StreamingOps.mqttStream(spark, stageFixtureDir()),
        lateness = "30 seconds")
      .writeStream.format("memory").queryName("mq_dedup")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // the two kitchen@t0 readings collapse to one
      assert(spark.table("mq_dedup").count() == 3)
    } finally q.stop()
  }

  test("dedupDocsExact: first-wins, cross-batch dedup, TTL expiry re-admits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val docs = mem.toDS().toDF("doc_id", "ts_s", "text")
      .select($"doc_id", timestamp_seconds($"ts_s").as("ts"), $"text")
      .withWatermark("ts", "10 seconds")
    val q = StreamingOps.dedupDocsExact(docs, ttlSeconds = 100L)
      .writeStream.format("memory").queryName("mq_docdedup")
      .outputMode("append").start()
    try {
      // b1: same-ts duplicate (ids 1,2 → min id 1 wins) + a distinct doc
      mem.addData((1L, 100L, "aaa"), (2L, 100L, "aaa"), (3L, 110L, "bbb"))
      q.processAllAvailable()
      // b2: cross-batch duplicate (dropped, but REFRESHES aaa's TTL to
      // 120+100=220) + a new doc
      mem.addData((4L, 120L, "aaa"), (5L, 130L, "ccc"))
      q.processAllAvailable()
      // b3: advance the watermark past every TTL (wm := 500-10 = 490)
      mem.addData((6L, 500L, "ddd"))
      q.processAllAvailable()
      // b4: with wm=490 > 220, aaa's state times out during this batch
      mem.addData((8L, 600L, "eee"))
      q.processAllAvailable()
      // b5: aaa re-admitted after expiry — a re-crawl beyond the dedup
      // horizon is a fresh document
      mem.addData((9L, 650L, "aaa"))
      q.processAllAvailable()
      val got = spark.table("mq_docdedup")
        .orderBy("ts").select($"doc_id", $"text")
        .as[(Long, String)].collect().toSeq
      assert(got == Seq((1L, "aaa"), (3L, "bbb"), (5L, "ccc"),
        (6L, "ddd"), (8L, "eee"), (9L, "aaa")))
    } finally q.stop()
  }

  test("dedupDocsNearWithinWatermark: signature dedup via the built-in operator") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val docs = mem.toDS().toDF("doc_id", "ts_s", "text")
      .select($"doc_id", timestamp_seconds($"ts_s").as("ts"), $"text")
      .withWatermark("ts", "10 seconds")
    val q = StreamingOps.dedupDocsNearWithinWatermark(docs)
      .writeStream.format("memory").queryName("mq_wwdedup")
      .outputMode("append").start()
    try {
      // doc 2 is a token rotation of doc 1 → same SimHash signature →
      // dropped by the built-in operator; doc 3's bag differs
      mem.addData((1L, 100L, "quick brown fox"),
        (3L, 110L, "slow green turtle"))
      q.processAllAvailable()
      // cross-batch duplicate inside the watermark horizon still drops
      mem.addData((2L, 105L, "fox quick brown"))
      q.processAllAvailable()
      val got = spark.table("mq_wwdedup")
        .select($"doc_id", $"text").as[(Long, String)].collect().toSet
      assert(got == Set((1L, "quick brown fox"), (3L, "slow green turtle")))
    } finally q.stop()
  }

  test("dedupDocsNear: token-reordered docs collapse by simhash signature") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val docs = mem.toDS().toDF("doc_id", "ts_s", "text")
      .select($"doc_id", timestamp_seconds($"ts_s").as("ts"), $"text")
      .withWatermark("ts", "10 seconds")
    val q = StreamingOps.dedupDocsNear(docs, ttlSeconds = 100L)
      .writeStream.format("memory").queryName("mq_neardedup")
      .outputMode("append").start()
    try {
      // SimHash is a bag-of-tokens vote: the reordered doc 2 has the
      // SAME signature as doc 1 (md5 keying would keep both) and drops;
      // doc 3's different bag survives
      mem.addData((1L, 100L, "quick brown fox"),
        (2L, 105L, "fox quick brown"),
        (3L, 110L, "slow green turtle"))
      q.processAllAvailable()
      // cross-batch: another permutation still collapses
      mem.addData((4L, 120L, "brown fox quick"))
      q.processAllAvailable()
      val got = spark.table("mq_neardedup")
        .orderBy("ts").select($"doc_id", $"text")
        .as[(Long, String)].collect().toSeq
      assert(got == Seq((1L, "quick brown fox"), (3L, "slow green turtle")))
    } finally q.stop()
  }

  test("dedupDocsNear matches the batch simhash keep-first on random docs") {
    // round-7 verdict #6: prove the streaming near-dup path equivalent
    // to the batch SimHash dedup on the same inputs — same keep set,
    // same drop set. Docs draw from a 5-token pool at lengths 1-3, so
    // bag-of-tokens signature collisions (including reorderings) are
    // dense; event time ascends and the TTL outlives the run, so the
    // streaming first-wins rule coincides with the batch
    // min-(ts, doc_id)-per-signature rule.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(23)
    val pool = Seq("alpha", "beta", "gamma", "delta", "eps")
    val rows = (0 until 60).map { i =>
      val text = Seq.fill(1 + rnd.nextInt(3))(pool(rnd.nextInt(pool.size)))
        .mkString(" ")
      (i.toLong, 100L + i, text)
    }
    val mem = MemoryStream[(Long, Long, String)]
    val docs = mem.toDS().toDF("doc_id", "ts_s", "text")
      .select($"doc_id", timestamp_seconds($"ts_s").as("ts"), $"text")
      .withWatermark("ts", "10 seconds")
    val q = StreamingOps.dedupDocsNear(docs, ttlSeconds = 100000L)
      .writeStream.format("memory").queryName("mq_neardedup_eq")
      .outputMode("append").start()
    try {
      // three micro-batches in event-time order
      rows.grouped(20).foreach { batch =>
        mem.addData(batch: _*)
        q.processAllAvailable()
      }
      val got = spark.table("mq_neardedup_eq")
        .select($"doc_id").as[Long].collect().toSet
      // batch reference: keep min (ts, doc_id) per simhash signature
      graft.plans.GraftExtensions.register(spark)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(expr("graft_simhash(text)"))
        .orderBy($"ts", $"doc_id")
      val want = rows.toDF("doc_id", "ts_s", "text")
        .select($"doc_id", timestamp_seconds($"ts_s").as("ts"), $"text")
        .withColumn("__rn", row_number().over(w))
        .filter($"__rn" === 1)
        .select($"doc_id").as[Long].collect().toSet
      assert(want.size < rows.size, "fixture must contain duplicates")
      assert(got == want)
    } finally q.stop()
  }

  test("funnelStages: event-ordered stream reproduces the batch funnel") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(23)
    val types = Vector("view", "click", "purchase", "error")
    val base = 1700000000L
    val rows = (for (u <- 0L until 60L; _ <- 0 until rnd.nextInt(10)) yield
      (u, base + rnd.nextInt(12 * 86400), types(rnd.nextInt(types.size))))
      .sortBy(_._2) // event-time order: the stream contract under which
                    // the op promises batch equivalence
    val horizon = 5L * 86400L
    val mem = MemoryStream[(Long, Long, String)]
    val events = mem.toDS().toDF("user_id", "ts_s", "event_type")
      .select($"user_id", timestamp_seconds($"ts_s").as("ts"),
        $"event_type")
    val q = StreamingOps.funnelStages(events,
        Seq("view", "click", "purchase"), horizon)
      .writeStream.format("memory").queryName("mq_funnel")
      .outputMode("append").start()
    try {
      // three consecutive event-time chunks across micro-batches so
      // state carries stages over batch boundaries
      rows.grouped((rows.size + 2) / 3).foreach { chunk =>
        mem.addData(chunk: _*)
        q.processAllAvailable()
      }
      val got = spark.table("mq_funnel")
        .select($"user_id", $"stage", unix_timestamp($"ts"))
        .as[(Long, Int, Long)].collect().toSet
      // batch reference on the same rows
      val batch = graft.operators.Funnel.funnel(
          rows.toDF("user_id", "ts_s", "event_type")
            .select($"user_id", timestamp_seconds($"ts_s").as("ts"),
              $"event_type"),
          "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"), horizon)
      val want = batch.collect().flatMap { r =>
        (1 to 3).flatMap { i =>
          Option(r.getTimestamp(i)).map(t =>
            (r.getLong(0), i, t.getTime / 1000L))
        }
      }.toSet
      assert(want.exists(_._2 == 3), "fixture must complete some funnels")
      assert(got == want)
    } finally q.stop()
  }

  test("funnelStages: strictly-late events are dropped, not time-travel") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val events = mem.toDS().toDF("user_id", "ts_s", "event_type")
      .select($"user_id", timestamp_seconds($"ts_s").as("ts"),
        $"event_type")
    val q = StreamingOps.funnelStages(events, Seq("view", "click"), 86400L)
      .writeStream.format("memory").queryName("mq_funnel_late")
      .outputMode("append").start()
    try {
      mem.addData((1L, 1000L, "view"), (1L, 2000L, "click"))
      q.processAllAvailable()
      // a late view at t=500 must NOT rewrite stage 1 backwards
      mem.addData((1L, 500L, "view"))
      q.processAllAvailable()
      val got = spark.table("mq_funnel_late")
        .select($"stage", unix_timestamp($"ts")).as[(Int, Long)]
        .collect().toSet
      assert(got == Set((1, 1000L), (2, 2000L)))
    } finally q.stop()
  }
}
