package graft

import graft.operators.{Postprocess, Resample, Sessionize}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Resample guard, postprocessing (min-duration incl. trailing run,
  * sliding median even/odd), sessionization, and a ScalaCheck
  * run-length-reconstruction property. */
class OperatorsSpec extends SparkSpec {

  import spark.implicits._

  private def series(vals: Seq[Double]) =
    vals.zipWithIndex.map { case (v, i) =>
      (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1600000000L + 8L * i)), v)
    }.toDF("key", "ts", "value")

  test("downsampleMean refuses to upsample (UnifiedNILM.py:118-120)") {
    val df = series(Seq(1, 2, 3, 4))
    val e = intercept[IllegalArgumentException] {
      Resample.downsampleMean(df, Seq("key"), "ts", $"value", seconds = 4,
        inferredRateSeconds = Some(8.0))
    }
    assert(e.getMessage.contains("refusing to upsample"))
  }

  test("downsampleMean buckets epoch-aligned, left-closed, mean") {
    val df = series(Seq(10, 20, 30, 40)) // ts at +0, +8, +16, +24 s
    val out = Resample.downsampleMean(df, Seq("key"), "ts", $"value",
        seconds = 16, inferredRateSeconds = Some(8.0))
      .orderBy("bucket_start")
      .select("value").as[Double].collect()
    assert(out.toSeq == Seq(15.0, 35.0)) // [0,16) and [16,32)
  }

  test("minDurationFilter zeroes short ON runs incl. trailing run") {
    // states: 1 1 1 | 0 0 | 1 1  with minLen 3 → trailing run of 2 zeroed
    val df = series(Seq(20, 20, 20, 0, 0, 20, 20))
    val out = Postprocess.minDurationFilter(df, $"key", Seq($"ts"),
        Postprocess.threshold($"value", 10.0), minLen = 3)
      .orderBy("ts")
      .select("state", "state_filtered")
      .as[(Int, Int)].collect().toSeq
    assert(out.map(_._1) == Seq(1, 1, 1, 0, 0, 1, 1))
    assert(out.map(_._2) == Seq(1, 1, 1, 0, 0, 0, 0))
  }

  test("minDurationFilter keeps OFF runs regardless of length") {
    val df = series(Seq(0, 20, 0, 20, 20, 20))
    val out = Postprocess.minDurationFilter(df, $"key", Seq($"ts"),
        Postprocess.threshold($"value", 10.0), minLen = 2)
      .orderBy("ts").select("state_filtered").as[Int].collect().toSeq
    assert(out == Seq(0, 0, 0, 1, 1, 1)) // lone ON zeroed, short OFFs kept
  }

  test("slidingMedian odd and even frame sizes (quantile_cont semantics)") {
    val df = series(Seq(1, 9, 5, 7, 3))
    val out = Postprocess.slidingMedian(df, $"key", Seq($"ts"), $"value", k = 1)
      .orderBy("ts").select("median_value").as[Double].collect().toSeq
    // frames: [1,9]→5.0 (even, interpolated), [1,9,5]→5, [9,5,7]→7,
    // [5,7,3]→5, [7,3]→5.0
    assert(out == Seq(5.0, 5.0, 7.0, 5.0, 5.0))
  }

  test("ewma matches hand-computed pandas adjust=True weighting") {
    val df = series(Seq(1, 2, 4, 8))
    val out = Postprocess.ewma(df, $"key", Seq($"ts"), $"value",
        alpha = 0.5, span = 10)
      .orderBy("ts").select("ewma").as[Double].collect().toSeq
    // pandas ewm(alpha=0.5, adjust=True).mean() on [1,2,4,8]:
    // t1: 1; t2: (0.5+2)/1.5; t3: (0.25+1+4)/1.75 = 3;
    // t4: (0.125 + 0.5 + 2 + 8)/1.875
    val want = Seq(1.0, 2.5 / 1.5, 3.0, 10.625 / 1.875)
    out.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-12, s"got $g want $w") }
  }

  test("ewma: both branches match a driver-side brute force") {
    // span 12 runs the lag composition, span 20 the collect_list fold
    // — each checked against an independent per-row weighted mean
    val rnd = new scala.util.Random(3)
    val df = Seq.tabulate(200)(i =>
      ("k" + i % 3, i.toLong, rnd.nextInt(1000) / 7.0))
      .toDF("key", "ts", "value")
    val rows = df.as[(String, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    def brute(span: Int) = rows.toSeq.sortBy(_._1).flatMap { case (_, vs) =>
      vs.indices.map { i =>
        val frame = vs.slice(math.max(0, i - span + 1), i + 1)
        val wts = frame.indices.map(j =>
          math.pow(0.7, frame.size - 1 - j))
        frame.zip(wts).map { case (x, wt) => x * wt }.sum / wts.sum
      }
    }
    Seq(12, 20).foreach { span =>
      val got = Postprocess.ewma(df, $"key", Seq($"ts"), $"value",
          alpha = 0.3, span = span)
        .orderBy("key", "ts").select("ewma").as[Double].collect().toSeq
      got.zip(brute(span)).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-9, s"span $span: got $g want $w") }
    }
  }

  test("ewma span truncates the tail; keys do not bleed") {
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 4.0),
      ("b", 1L, 100.0)).toDF("key", "ts", "value")
    val out = Postprocess.ewma(df, $"key", Seq($"ts"), $"value",
        alpha = 0.5, span = 2)
      .orderBy("key", "ts").select("ewma").as[Double].collect().toSeq
    // span=2 → frame is (prev, cur): t3 sees only [2,4]: (1+4)/1.5
    val want = Seq(1.0, 2.5 / 1.5, 5.0 / 1.5, 100.0)
    out.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-12, s"got $g want $w") }
  }

  test("slidingMedianScipy matches precomputed scipy.ndimage.median_filter vectors") {
    // golden vectors for x = [5,1,4,2,8,3,9,7,6,0] computed from
    // median_filter's documented semantics (mode='reflect' pad,
    // rank size//2 selection — it is rank_filter(size//2), no
    // interpolation); boundary values hand-checked: size=3 first
    // window is reflect-pad [5|5,1] → sorted [1,5,5][1] = 5
    val x = Seq(5.0, 1, 4, 2, 8, 3, 9, 7, 6, 0)
    val golden = Map(
      3 -> Seq(5.0, 4, 2, 4, 3, 8, 7, 7, 6, 0),
      4 -> Seq(5.0, 5, 4, 4, 4, 8, 8, 7, 7, 6),
      5 -> Seq(4.0, 4, 4, 3, 4, 7, 7, 6, 6, 6))
    val df = series(x.map(_.toInt))
    for ((sz, want) <- golden) {
      val out = Postprocess.slidingMedianScipy(df, $"key", Seq($"ts"), $"value", sz)
        .orderBy("ts").select("median_value").as[Double].collect().toSeq
      assert(out == want, s"size=$sz")
    }
  }

  test("slidingMedianPartitioned matches the window-composition form") {
    // multi-key, nulls, duplicate values, enough rows to cross task
    // boundaries; k=3 exercises the lag/lead branch of slidingMedian,
    // k=12 its collect_list branch — the dual-heap must match BOTH
    val rows = (0 until 400).map { i =>
      val v: java.lang.Double =
        if (i % 17 == 0) null else (((i * 2654435761L) % 97) % 13).toDouble
      (s"k${i % 3}", i.toLong, v)
    }
    val df = rows.toDF("key", "ts", "value")
    for (k <- Seq(3, 12)) {
      val want = Postprocess.slidingMedian(df, $"key", Seq($"ts"), $"value", k)
        .select("key", "ts", "median_value")
        .collect().map(r => (r.getString(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Double]))).sortBy(t => (t._1, t._2))
      val got = Postprocess
        .slidingMedianPartitioned(df, Seq("key"), Seq("ts"), "value", k)
        .select("key", "ts", "median_value")
        .collect().map(r => (r.getString(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Double]))).sortBy(t => (t._1, t._2))
      assert(got.toSeq == want.toSeq, s"k=$k")
    }
  }

  test("slidingMedianPartitioned: all-null frame yields null, empty key ok") {
    val df = Seq(("a", 1L, null: java.lang.Double),
        ("a", 2L, null: java.lang.Double), ("b", 1L, 5.0: java.lang.Double))
      .toDF("key", "ts", "value")
    val out = Postprocess
      .slidingMedianPartitioned(df, Seq("key"), Seq("ts"), "value", 1)
      .orderBy("key", "ts").select("median_value").collect()
      .map(r => Option(r.get(0))).toSeq
    assert(out == Seq(None, None, Some(5.0)))
  }

  test("slidingMedianScipy is partition-local (keys do not bleed)") {
    val df = Seq(("a", 1, 10.0), ("a", 2, 0.0), ("a", 3, 10.0),
        ("b", 1, 99.0), ("b", 2, 99.0), ("b", 3, 99.0))
      .toDF("key", "ts", "value")
    val out = Postprocess.slidingMedianScipy(df, $"key", Seq($"ts"), $"value", 3)
      .orderBy("key", "ts").select("median_value").as[Double].collect().toSeq
    // a: [10|10,0]→10, [10,0,10]→10, [0,10|10]→10 ; b: all 99
    assert(out == Seq(10.0, 10.0, 10.0, 99.0, 99.0, 99.0))
  }

  test("runs produces alternating run-length encoding") {
    val df = series(Seq(20, 20, 0, 20, 0, 0, 0))
    val out = Postprocess.runs(df, $"key", Seq($"ts"),
        Postprocess.threshold($"value", 10.0))
      .orderBy("run_id").select("state", "run_len")
      .as[(Int, Long)].collect().toSeq
    assert(out == Seq((1, 2L), (0, 1L), (1, 1L), (0, 3L)))
  }

  test("sessionize splits on gaps > threshold") {
    val ts = Seq(0L, 10L, 20L, 100L, 110L, 500L)
    val df = ts.zipWithIndex.map { case (t, i) =>
      (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1600000000L + t)), i.toLong)
    }.toDF("key", "ts", "event_id")
    val out = Sessionize.sessions(df, $"key", $"ts", gapSeconds = 30)
      .orderBy("ts").select("session_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 1L, 1L, 2L, 2L, 3L))
  }

  test("property: bucket means recombine to the global mean (A1)") {
    val gen = Gen.listOfN(30, Gen.choose(0.0, 1000.0)).suchThat(_.nonEmpty)
    val prop = Prop.forAll(gen) { vals =>
      val df = series(vals)
      // weighted mean of bucket means == global mean
      val withCounts = df
        .groupBy(window($"ts", "24 seconds")).agg(
          avg($"value").as("m"), count(lit(1)).as("c"))
      val (sumW, n) = withCounts
        .agg(sum($"m" * $"c"), sum($"c")).as[(Double, Long)].head()
      math.abs(sumW / n - vals.sum / vals.size) < 1e-9
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: keep-first dedup is idempotent (P11)") {
    val gen = Gen.listOfN(20, Gen.choose(0, 5)).suchThat(_.nonEmpty)
    val prop = Prop.forAll(gen) { tsOffsets =>
      // duplicate timestamps on purpose: offsets collide mod 5
      val df = tsOffsets.zipWithIndex.map { case (o, i) =>
        (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1600000000L + o)), i.toLong)
      }.toDF("key", "ts", "ord")
      import org.apache.spark.sql.expressions.Window
      def dedup(x: org.apache.spark.sql.DataFrame) = x
        .withColumn("rn", row_number().over(
          Window.partitionBy($"key", $"ts").orderBy($"ord")))
        .filter($"rn" === 1).drop("rn")
      val once = dedup(df).orderBy("ts", "ord").collect().toSeq
      val twice = dedup(dedup(df)).orderBy("ts", "ord").collect().toSeq
      once == twice && once.size == tsOffsets.distinct.size
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("eventsSliced: pushed raw-nanos bounds match the plain filter") {
    val d = "/root/testdata/sf0.001"
    val plain = graft.Tables.events(spark, d)
      .filter($"ts".between(
        lit("2024-01-03 00:00:00").cast("timestamp"),
        lit("2024-01-04 00:00:00").cast("timestamp")))
      .select($"event_id").as[Long].collect().toSet
    val pushed = graft.Tables
      .eventsSliced(spark, d, "2024-01-03 00:00:00", "2024-01-04 00:00:00")
      .select($"event_id").as[Long].collect().toSet
    assert(pushed == plain && plain.nonEmpty)
  }

  test("property: salted aggregation equals direct groupBy (skew path)") {
    val gen = Gen.listOfN(40, Gen.zip(Gen.oneOf(1L, 1L, 1L, 2L), Gen.choose(0.0, 100.0)))
    val prop = Prop.forAll(gen.suchThat(_.nonEmpty)) { rows =>
      val df = rows.zipWithIndex
        .map { case ((k, v), i) => (k, i.toLong, v) }
        .toDF("key", "ord", "value")
      val direct = df.groupBy($"key").agg(sum($"value").as("s"))
        .orderBy("key").as[(Long, Double)].collect().toSeq
      val salted = graft.operators.Skew
        .saltedSum(df, Seq($"key"), $"value", "s", buckets = 8)
        .orderBy("key").as[(Long, Double)].collect().toSeq
      direct.map(_._1) == salted.map(_._1) &&
        direct.zip(salted).forall { case ((_, a), (_, b)) =>
          math.abs(a - b) < 1e-9
        }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: run-length encoding reconstructs the series") {
    val gen = Gen.listOfN(24, Gen.oneOf(0, 1)).suchThat(_.nonEmpty)
    val prop = Prop.forAll(gen) { states =>
      val df = series(states.map(s => if (s == 1) 50.0 else 0.0))
      val runs = Postprocess.runs(df, $"key", Seq($"ts"),
          Postprocess.threshold($"value", 10.0))
        .orderBy("run_id").select("state", "run_len")
        .as[(Int, Long)].collect().toSeq
      val reconstructed = runs.flatMap { case (st, len) =>
        Seq.fill(len.toInt)(st)
      }
      val alternates = runs.map(_._1).sliding(2).forall {
        case Seq(a, b) => a != b
        case _ => true
      }
      reconstructed == states && alternates
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
