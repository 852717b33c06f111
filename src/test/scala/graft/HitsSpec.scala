package graft

import org.apache.spark.sql.functions._

/** Contract tests for ext/Hits — the q136 core:
  *   - decimal128 path ≡ int64 path bit-exactly in the safe range;
  *   - int64 overflow is LOUD (ANSI arithmetic error), never a wrapped
  *     score, and the decimal128 fallback carries the identical math
  *     past 2⁶³ (checked against a driver-side BigInt iteration on
  *     planted counts no physical row fixture could produce);
  *   - randomized third route: hubScores from raw edges equals a
  *     driver-side integer power iteration over seeds and adversarial
  *     shapes (single user, single type, all-equal tie storm).
  */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference iteration in BigInt (never overflows). */
  private def reference(edges: Seq[(Long, String)]): Map[Long, (BigInt, BigInt)] = {
    val w = edges.groupBy(identity).view.mapValues(r => BigInt(r.size)).toMap
    val s0 = w.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val h1 = w.groupBy(_._1._1).view
      .mapValues(_.map { case ((_, t), c) => c * s0(t) }.sum).toMap
    val s1 = w.groupBy(_._1._2).view
      .mapValues(_.map { case ((u, _), c) => c * h1(u) }.sum / 1000).toMap
    val h2 = w.groupBy(_._1._1).view
      .mapValues(_.map { case ((_, t), c) => c * s1(t) }.sum).toMap
    h1.keys.map(u => u -> (h1(u), h2(u))).toMap
  }

  test("decimal128 path agrees bit-exactly with the int64 path in the safe range") {
    val rnd = new scala.util.Random(18)
    val counts = (for (u <- 1L to 12L; t <- Seq("a", "b", "c", "d", "e")
                       if rnd.nextInt(4) > 0)
      yield (u, t, (rnd.nextInt(1000) + 1).toLong))
      .toDF("user_id", "event_type", "c")
    def run(use128: Boolean): Seq[(Long, Long, Long)] = {
      val out = graft.ext.Hits
        .hubScoresFromCounts(counts, "user_id", "event_type", use128)
        .select($"user_id", $"hub1".cast("long").as("h1"),
          $"hub2".cast("long").as("h2"))
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      Caching.release()
      out
    }
    val viaLong = run(use128 = false)
    val via128 = run(use128 = true)
    assert(viaLong.nonEmpty && viaLong == via128)
  }

  test("int64 overflow fails loudly and decimal128 carries the math past 2^63") {
    // planted counts: c = 1e5 on every edge of a 10-user × 5-type
    // biclique ⇒ s0 = 1e6, hub1 = 5e11 (int64-safe), s1 = 5e14, and
    // hub2 = 2.5e20 > 2⁶³ — the c*s1 product alone is 5e19
    val counts = (for (u <- 1L to 10L; t <- Seq("a", "b", "c", "d", "e"))
      yield (u, t, 100000L)).toDF("user_id", "event_type", "c")

    // int64 path: ANSI arithmetic overflow, loud and typed — a silent
    // wrap (ansi off) would return garbage scores and fail intercept
    val thrown = intercept[Throwable] {
      graft.ext.Hits
        .hubScoresFromCounts(counts, "user_id", "event_type").collect()
    }
    Caching.release()
    def chain(e: Throwable): List[Throwable] =
      if (e == null) Nil else e :: chain(e.getCause)
    assert(chain(thrown).exists(e => e.isInstanceOf[ArithmeticException] ||
      Option(e.getMessage).exists(m => m.toLowerCase.contains("overflow"))),
      s"expected a loud arithmetic overflow, got: ${chain(thrown).map(_.getClass.getName)}")

    // decimal128 path: exact values, checked against BigInt by string
    val got = graft.ext.Hits
      .hubScoresFromCounts(counts, "user_id", "event_type", use128 = true)
      .select($"user_id", $"hub1".cast("string").as("h1"),
        $"hub2".cast("string").as("h2"))
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    Caching.release()
    assert(got.size == 10)
    got.foreach { case (u, h1, h2) =>
      assert(BigInt(h1) == BigInt("500000000000"), s"hub1($u) = $h1")
      assert(BigInt(h2) == BigInt("250000000000000000000"), s"hub2($u) = $h2")
    }
  }

  test("randomized edges: hubScores equals a BigInt power iteration") {
    val shapes: Seq[(String, Seq[(Long, String)])] =
      Seq(1, 2, 3).map { seed =>
        val rnd = new scala.util.Random(seed)
        s"seed$seed" -> Seq.fill(400)(
          (rnd.nextInt(15).toLong + 1,
            s"t${rnd.nextInt(1 + rnd.nextInt(6))}")) // skewed type draw
      } ++ Seq(
        "single-user" -> (Seq.fill(50)((7L, "a")) ++
          (1 to 5).map(i => (7L, s"b$i"))),
        "single-type" -> (1L to 20L).map((_, "only")),
        "tie-storm" -> (for (u <- 1L to 8L; t <- Seq("x", "y", "z");
                             _ <- 1 to 3) yield (u, t)))
    for ((label, edges) <- shapes) {
      val df = edges.toDF("user_id", "event_type")
      val got = graft.ext.Hits.hubScores(df, "user_id", "event_type")
        .select($"user_id", $"hub1", $"hub2")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      Caching.release()
      val want = reference(edges).toSeq
        .map { case (u, (h1, h2)) => (u, h1.toLong, h2.toLong) }
        .sortBy(_._1)
      assert(got == want, s"$label: got=${got.take(3)} want=${want.take(3)}")
    }
  }
}
