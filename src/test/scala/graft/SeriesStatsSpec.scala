package graft

import org.apache.spark.sql.functions._

/** Overflow contracts for the factored q137/q141 cores (the Hits
  * pattern): int64 overflow is LOUD under ANSI, the decimal(38,0)
  * path carries the identical arithmetic past 2⁶³ (checked against
  * driver-side BigInt), and the two paths agree bit-exactly in the
  * int64-safe range.
  */
class SeriesStatsSpec extends SparkSpec {
  import spark.implicits._

  private def causes(e: Throwable): List[Throwable] =
    if (e == null) Nil else e :: causes(e.getCause)

  private def isLoudOverflow(t: Throwable): Boolean =
    causes(t).exists(e => e.isInstanceOf[ArithmeticException] ||
      Option(e.getMessage).exists(_.toLowerCase.contains("overflow")))

  test("lag1Autocorr: decimal128 agrees bit-exactly with int64 in the safe range") {
    val rnd = new scala.util.Random(141)
    val counts = (for (k <- Seq("a", "b", "c"); day <- 1 to 30;
                       if rnd.nextInt(5) > 0)
      yield (k, day, (rnd.nextInt(5000) + 1).toLong)).toDF("k", "d", "c")
    def run(use128: Boolean) = graft.ext.SeriesStats
      .lag1Autocorr(counts, "k", "d", "c", use128)
      .select($"k", $"n_points".cast("long"), $"lag1_autocorr")
      .collect().map(_.toString).sorted.toSeq
    assert(run(false) == run(true))
  }

  test("lag1Autocorr: int64 overflow is loud; decimal128 matches BigInt past 2^63") {
    // alternating 0 / 2e9 over 10 days: S = 1e10, dev = ±1e10,
    // dev² = 1e20 > 2⁶³ — the very first squared term overflows
    val cs = (1 to 10).map(d => ("k", d, if (d % 2 == 0) 2000000000L else 0L))
    val counts = cs.toDF("k", "d", "c")
    val thrown = intercept[Throwable] {
      graft.ext.SeriesStats.lag1Autocorr(counts, "k", "d", "c").collect()
    }
    assert(isLoudOverflow(thrown), causes(thrown).map(_.getClass.getName))

    val got = graft.ext.SeriesStats
      .lag1Autocorr(counts, "k", "d", "c", use128 = true)
      .select($"n_points".cast("long"), $"lag1_autocorr")
      .as[(Long, Double)].collect().head
    // BigInt reference
    val vals = cs.map(_._3).map(BigInt(_))
    val n = BigInt(vals.size); val s = vals.sum
    val dev = vals.map(n * _ - s)
    val num = dev.zip(dev.drop(1)).map { case (a, b) => a * b }.sum
    val den = dev.map(d => d * d).sum
    val want = math.rint(
      (BigDecimal(num) / BigDecimal(den)).toDouble * 1e6) / 1e6
    assert(got._1 == 10L)
    assert(got._2 == want, s"${got._2} vs $want")
  }

  test("Gini.fromHistogram: decimal128 agrees bit-exactly with int64 in the safe range") {
    val rnd = new scala.util.Random(137)
    val hist = (for (k <- Seq("a", "b"); t <- 1 to 40; if rnd.nextInt(3) > 0)
      yield (k, t.toLong, (rnd.nextInt(20) + 1).toLong)).toDF("k", "t", "m")
    def run(use128: Boolean) = graft.ext.Gini
      .fromHistogram(hist, "k", "t", "m", use128)
      .select($"k", $"n_items".cast("long"), $"total_mass".cast("long"),
        $"gini")
      .collect().map(_.toString).sorted.toSeq
    assert(run(false) == run(true))
  }

  test("Gini.fromHistogram: int64 overflow is loud; decimal128 matches BigInt past 2^63") {
    // two runs of 1e7 items at values 1e6 / 2e6: the first contrib is
    // t·m(m+1)/2 ≈ 5e19 > 2⁶³ — the multiply itself overflows
    val hist = Seq(("k", 1000000L, 10000000L), ("k", 2000000L, 10000000L))
      .toDF("k", "t", "m")
    val thrown = intercept[Throwable] {
      graft.ext.Gini.fromHistogram(hist, "k", "t", "m").collect()
    }
    assert(isLoudOverflow(thrown), causes(thrown).map(_.getClass.getName))

    val got = graft.ext.Gini.fromHistogram(hist, "k", "t", "m", use128 = true)
      .select($"n_items".cast("string"), $"total_mass".cast("string"),
        $"gini")
      .as[(String, String, Double)].collect().head
    // BigInt reference over the expanded (sorted) population
    val runs = Seq((BigInt(1000000), BigInt(10000000)),
      (BigInt(2000000), BigInt(10000000)))
    val n = runs.map(_._2).sum
    val tot = runs.map { case (t, m) => t * m }.sum
    var prev = BigInt(0); var s1 = BigInt(0)
    for ((t, m) <- runs) { // ascending t
      s1 += t * (m * prev + m * (m + 1) / 2)
      prev += m
    }
    val want = math.rint((BigDecimal(2 * s1 - (n + 1) * tot) /
      BigDecimal(n * tot)).toDouble * 1e6) / 1e6
    assert(BigInt(got._1) == n && BigInt(got._2) == tot)
    assert(got._3 == want, s"${got._3} vs $want")
  }
}
