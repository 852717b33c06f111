package graft

import graft.operators.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** As-of join (backward/forward, inclusive ties, tolerance) and
  * bucketed point-in-interval range join, each property-checked
  * against a brute-force reference on random data. */
class JoinOpsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(sec: Long) =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1600000000L + sec))

  test("asOf backward picks most recent at-or-before, per key") {
    val left = Seq((1L, ts(10), "l1"), (1L, ts(25), "l2"), (2L, ts(5), "l3"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, ts(5), 50.0), (1L, ts(10), 100.0), (1L, ts(20), 200.0),
        (2L, ts(9), 9.0))
      .toDF("k", "ts", "ref")
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", Seq("ref"))
      .orderBy("k", "ts").select("tag", "ref")
      .as[(String, Option[Double])].collect().toSeq
    // l1: tie at ts=10 is inclusive → 100; l2: latest ≤25 is 200;
    // l3: no right row at-or-before → null
    assert(out == Seq(("l1", Some(100.0)), ("l2", Some(200.0)), ("l3", None)))
  }

  test("asOf tolerance nulls out stale matches") {
    val left = Seq((1L, ts(100), "a"), (1L, ts(500), "b")).toDF("k", "ts", "tag")
    val right = Seq((1L, ts(90), 1.0)).toDF("k", "ts", "ref")
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", Seq("ref"),
        toleranceSec = Some(60L))
      .orderBy("ts").select("tag", "ref")
      .as[(String, Option[Double])].collect().toSeq
    // a: 10 s stale → kept; b: 410 s stale → nulled
    assert(out == Seq(("a", Some(1.0)), ("b", None)))
  }

  test("asOf forward picks first at-or-after, inclusive ties, tolerance") {
    val left = Seq((1L, ts(10), "l1"), (1L, ts(15), "l2"), (1L, ts(90), "l3"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, ts(10), 1.0), (1L, ts(20), 2.0), (1L, ts(200), 3.0))
      .toDF("k", "ts", "ref")
    val out = AsOfJoin.forward(left, right, Seq("k"), "ts", Seq("ref"))
      .orderBy("ts").select("tag", "ref")
      .as[(String, Option[Double])].collect().toSeq
    // l1: tie at 10 inclusive; l2: next is 20; l3: next is 200
    assert(out == Seq(("l1", Some(1.0)), ("l2", Some(2.0)), ("l3", Some(3.0))))
    val tol = AsOfJoin.forward(left, right, Seq("k"), "ts", Seq("ref"),
        toleranceSec = Some(30L))
      .orderBy("ts").select("tag", "ref")
      .as[(String, Option[Double])].collect().toSeq
    // l3's match is 110 s ahead → nulled by the 30 s tolerance
    assert(tol == Seq(("l1", Some(1.0)), ("l2", Some(2.0)), ("l3", None)))
  }

  test("asOf keyless form: one global timeline, backward and forward") {
    // keys = Seq.empty → single global window (the foldLeft-over-lit(true)
    // null-key filter must be a no-op, not an empty AND)
    val left = Seq((ts(10), "l1"), (ts(25), "l2"), (ts(4), "l3"))
      .toDF("ts", "tag")
    val right = Seq((ts(5), 50.0), (ts(10), 100.0), (ts(20), 200.0))
      .toDF("ts", "ref")
    val back = AsOfJoin.backward(left, right, Seq.empty, "ts", Seq("ref"))
      .orderBy("ts").select("tag", "ref")
      .as[(String, Option[Double])].collect().toSeq
    // l3 (ts 4): nothing at-or-before; l1: inclusive tie at 10; l2: 20
    assert(back == Seq(("l3", None), ("l1", Some(100.0)), ("l2", Some(200.0))))
    val fwd = AsOfJoin.forward(left, right, Seq.empty, "ts", Seq("ref"))
      .orderBy("ts").select("tag", "ref")
      .as[(String, Option[Double])].collect().toSeq
    // l3: first at-or-after is 5; l1: inclusive tie at 10; l2: none after 25
    assert(fwd == Seq(("l3", Some(50.0)), ("l1", Some(100.0)), ("l2", None)))
  }

  test("asOf carries multiple payload columns from the same match row") {
    val left = Seq((1L, ts(10), "x")).toDF("k", "ts", "tag")
    val right = Seq((1L, ts(3), 7.0, "m1"), (1L, ts(8), 8.0, "m2"))
      .toDF("k", "ts", "ref", "label")
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", Seq("ref", "label"))
      .select("ref", "label").as[(Double, String)].collect().toSeq
    assert(out == Seq((8.0, "m2")))
  }

  test("asOf does not tear rows when the match row's payload is null") {
    // the nearest right row has ref=NULL: the correct as-of result is
    // null (that row matched), NOT the older row's 5.0
    val left = Seq((1L, ts(30), "x")).toDF("k", "ts", "tag")
    val right = Seq((1L, ts(10), Some(5.0), "old"), (1L, ts(20), None, "new"))
      .toDF("k", "ts", "ref", "label")
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", Seq("ref", "label"))
      .select("ref", "label").as[(Option[Double], String)].collect().toSeq
    assert(out == Seq((None, "new")))
  }

  test("asOf null join keys never match (SQL equi-join semantics)") {
    // a null-key right row must not enrich a null-key left row — the
    // window's partitionBy groups nulls together, so without the guard
    // the null-key left row would pick up 9.0
    val left = Seq((Some(1L), ts(10), "a"), (None: Option[Long], ts(10), "b"))
      .toDF("k", "ts", "tag")
    val right = Seq((Some(1L), ts(5), 5.0), (None: Option[Long], ts(5), 9.0))
      .toDF("k", "ts", "ref")
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", Seq("ref"))
      .orderBy("tag").select("tag", "ref")
      .as[(String, Option[Double])].collect().toSeq
    assert(out == Seq(("a", Some(5.0)), ("b", None)))
  }

  test("asOf rejects inputs that carry its reserved working columns") {
    val left = Seq((1L, ts(10), 0)).toDF("k", "ts", "__side")
    val right = Seq((1L, ts(5), 1.0)).toDF("k", "ts", "ref")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(left, right, Seq("k"), "ts", Seq("ref"))
    }
    assert(e.getMessage.contains("__side"))
  }

  test("range join matches inclusive bounds exactly once across buckets") {
    // bucketSeconds=10; interval [5, 25] spans buckets 0,1,2 — each point
    // must appear exactly once even though the interval has three copies
    val iv = Seq((100L, 1L, ts(5), ts(25))).toDF("id", "k", "lo", "hi")
    val pts = Seq((1L, ts(4)), (1L, ts(5)), (1L, ts(15)), (1L, ts(25)),
        (1L, ts(26)), (2L, ts(15)))
      .toDF("k", "ts")
    val out = RangeJoin.pointsInIntervals(iv, pts, Seq("k"), "lo", "hi", "ts",
        bucketSeconds = 10L)
      .select("id", "ts").as[(Long, java.sql.Timestamp)].collect().toSeq
    assert(out.map(_._1).forall(_ == 100L))
    assert(out.map(_._2).sorted.map(_.getTime / 1000 - 1600000000L) ==
      Seq(5L, 15L, 25L))
  }

  test("range join left_outer keeps empty intervals for null-ignoring aggs") {
    val iv = Seq((1L, 1L, ts(0), ts(30)), (2L, 1L, ts(100), ts(130)))
      .toDF("id", "k", "lo", "hi")
    val pts = Seq((1L, ts(10), 5.0), (1L, ts(20), 7.0)).toDF("k", "ts", "v")
    val out = RangeJoin.pointsInIntervals(iv, pts, Seq("k"), "lo", "hi", "ts",
        bucketSeconds = 10L, joinType = "left_outer")
      .groupBy("id")
      .agg(count($"ts").as("n"), coalesce(sum($"v"), lit(0.0)).as("tot"))
      .orderBy("id").as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 12.0), (2L, 0L, 0.0)))
  }

  test("range join guards malformed intervals (end < start) without exploding") {
    val iv = Seq((1L, 1L, ts(100), ts(0)), (2L, 1L, ts(0), ts(10)))
      .toDF("id", "k", "lo", "hi")
    val pts = Seq((1L, ts(5)), (1L, ts(50))).toDF("k", "ts")
    val inner = RangeJoin.pointsInIntervals(iv, pts, Seq("k"), "lo", "hi", "ts",
        bucketSeconds = 10L)
      .select("id").as[Long].collect().toSeq
    assert(inner == Seq(2L)) // the inverted interval matches nothing
    // left_outer still surfaces the inverted interval (as zero matches)
    val outer = RangeJoin.pointsInIntervals(iv, pts, Seq("k"), "lo", "hi", "ts",
        bucketSeconds = 10L, joinType = "left_outer")
      .groupBy("id").agg(count($"ts").as("n"))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(outer == Seq((1L, 0L), (2L, 1L)))
  }

  test("property: asOf backward/forward equal a brute-force scan") {
    // right timestamps are unique per (key, ts) by construction (the
    // operator's documented precondition)
    val gen = for {
      ls <- Gen.listOfN(20, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 40L)))
      rsRaw <- Gen.listOfN(12, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 40L)))
    } yield (ls, rsRaw.distinct)
    val prop = Prop.forAll(gen) { case (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, ts(t)) }.toDF("lid", "k", "ts")
      val right = rs.map { case (k, t) => (k, ts(t), k * 1000.0 + t) }
        .toDF("k", "ts", "ref")
      def brute(fwd: Boolean) = ls.zipWithIndex.map { case ((k, t), i) =>
        val cands = rs.filter { case (rk, rt) =>
          rk == k && (if (fwd) rt >= t else rt <= t) }
        val m = if (fwd) cands.minByOption(_._2) else cands.maxByOption(_._2)
        i.toLong -> m.map { case (rk, rt) => rk * 1000.0 + rt }
      }.toMap
      def run(fwd: Boolean) = {
        val f = if (fwd) AsOfJoin.forward _ else AsOfJoin.backward _
        f(left, right, Seq("k"), "ts", Seq("ref"), None)
          .select("lid", "ref").as[(Long, Option[Double])]
          .collect().toMap
      }
      run(fwd = false) == brute(false) && run(fwd = true) == brute(true)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: bucketed range join equals the theta join") {
    val gen = for {
      ivs <- Gen.listOfN(8, Gen.zip(Gen.choose(1L, 2L), Gen.choose(0L, 50L),
        Gen.choose(0L, 25L)))
      pts <- Gen.listOfN(25, Gen.zip(Gen.choose(1L, 2L), Gen.choose(0L, 80L)))
      bucket <- Gen.oneOf(3L, 10L, 64L)
    } yield (ivs, pts, bucket)
    val prop = Prop.forAll(gen) { case (ivs, pts, bucket) =>
      val iv = ivs.zipWithIndex.map { case ((k, lo, span), i) =>
        (i.toLong, k, ts(lo), ts(lo + span)) }.toDF("id", "k", "lo", "hi")
      val pt = pts.map { case (k, t) => (k, ts(t)) }.toDF("k", "ts")
      val got = RangeJoin.pointsInIntervals(iv, pt, Seq("k"), "lo", "hi", "ts",
          bucketSeconds = bucket)
        .select("id", "ts").as[(Long, java.sql.Timestamp)]
        .collect().toSeq.sorted.map { case (i, t) => (i, t.getTime) }
      val want = ivs.zipWithIndex.flatMap { case ((k, lo, span), i) =>
        pts.collect { case (pk, t) if pk == k && t >= lo && t <= lo + span =>
          (i.toLong, ts(t).getTime) }
      }.sorted
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
