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

  test("calendarLagAutocorr: a gappy calendar pairs d with d-k exactly or not at all") {
    // days 8 and 15 missing: day 14 has no d-7 partner (day 7 exists
    // but day 14... plant so some rows lose their partner), and a row
    // lag would silently pair across the gaps
    val rnd = new scala.util.Random(77)
    val days = (1 to 25).filterNot(d => d == 8 || d == 15)
    val cs = days.map(d => ("k", d.toLong, (rnd.nextInt(100) + 1).toLong))
    val got = graft.ext.SeriesStats
      .calendarLagAutocorr(cs.toDF("k", "d", "c"), "k", "d", "c", 7)
      .select($"n_points".cast("long"), $"n_pairs".cast("long"),
        $"lag7_autocorr")
      .as[(Long, Long, Double)].collect().head
    // BigInt reference with an explicit d-7 map lookup
    val m = cs.map(c => c._2 -> BigInt(c._3)).toMap
    val n = BigInt(cs.size); val s = cs.map(c => BigInt(c._3)).sum
    def dev(v: BigInt) = n * v - s
    val pairs = cs.flatMap(c => m.get(c._2 - 7)
      .map(p => (dev(BigInt(c._3)), dev(p))))
    val num = pairs.map(p => p._1 * p._2).sum
    val den = cs.map(c => dev(BigInt(c._3))).map(d => d * d).sum
    val want = math.rint((BigDecimal(num) / BigDecimal(den)).toDouble * 1e6) / 1e6
    assert(got._1 == cs.size.toLong)
    assert(got._2 == pairs.size.toLong, s"${got._2} vs ${pairs.size}")
    assert(got._3 == want, s"${got._3} vs $want")
    // the gaps must cost pairs — otherwise this fixture proves nothing
    assert(pairs.size < cs.size - 7)
    // and a row-k lag over the same gappy series gives a DIFFERENT
    // answer (it pairs across the gaps): the range frame is load-bearing
    val rowPairs = cs.sortBy(_._2).map(c => dev(BigInt(c._3)))
      .sliding(8).filter(_.size == 8).map(w => (w.last, w.head)).toSeq
    val rowNum = rowPairs.map(p => p._1 * p._2).sum
    val rowWant = math.rint((BigDecimal(rowNum) / BigDecimal(den)).toDouble * 1e6) / 1e6
    assert(rowWant != want, "fixture too tame: row lag agrees by luck")
  }

  test("calendarLagAutocorr: decimal128 agrees bit-exactly with int64 in the safe range") {
    val rnd = new scala.util.Random(177)
    val counts = (for (k <- Seq("a", "b", "c"); day <- 1 to 40;
                       if rnd.nextInt(5) > 0)
      yield (k, day.toLong, (rnd.nextInt(5000) + 1).toLong)).toDF("k", "d", "c")
    def run(use128: Boolean) = graft.ext.SeriesStats
      .calendarLagAutocorr(counts, "k", "d", "c", 7, use128)
      .select($"k", $"n_points".cast("long"), $"n_pairs".cast("long"),
        $"lag7_autocorr")
      .collect().map(_.toString).sorted.toSeq
    assert(run(false) == run(true))
  }

  test("calendarLagAutocorr: int64 overflow is loud; decimal128 matches BigInt past 2^63") {
    val cs = (1 to 14).map(d => ("k", d.toLong,
      if (d % 2 == 0) 2000000000L else 0L))
    val counts = cs.toDF("k", "d", "c")
    val thrown = intercept[Throwable] {
      graft.ext.SeriesStats
        .calendarLagAutocorr(counts, "k", "d", "c", 7).collect()
    }
    assert(isLoudOverflow(thrown), causes(thrown).map(_.getClass.getName))
    val got = graft.ext.SeriesStats
      .calendarLagAutocorr(counts, "k", "d", "c", 7, use128 = true)
      .select($"n_pairs".cast("long"), $"lag7_autocorr")
      .as[(Long, Double)].collect().head
    val vals = cs.map(c => BigInt(c._3))
    val n = BigInt(vals.size); val s = vals.sum
    val dev = vals.map(n * _ - s)
    val num = dev.drop(7).zip(dev).map { case (a, b) => a * b }.sum
    val den = dev.map(d => d * d).sum
    val want = math.rint((BigDecimal(num) / BigDecimal(den)).toDouble * 1e6) / 1e6
    assert(got._1 == 7L)
    assert(got._2 == want, s"${got._2} vs $want")
  }

  test("contingency lift (q174 form): int64 overflow is loud; decimal128 matches BigInt") {
    // the q174 scaladoc names the per-cell decimal(38,0) swap for
    // corpora past ~3e9 docs (o·t > 2⁶³); encode the contract on
    // planted counts rather than leaving it prose (the q136 lesson)
    import org.apache.spark.sql.expressions.Window
    val cells = Seq(("s1", "en", 4000000000L), ("s1", "de", 1000000000L),
      ("s2", "en", 3000000000L)).toDF("source", "lang", "n_docs")
    def lift(use128: Boolean) = {
      val base = if (use128)
        cells.withColumn("n_docs", $"n_docs".cast("decimal(38,0)"))
      else cells
      base
        .withColumn("r", sum($"n_docs").over(Window.partitionBy($"source")))
        .withColumn("c", sum($"n_docs").over(Window.partitionBy($"lang")))
        .withColumn("t", sum($"n_docs").over(Window.partitionBy()))
        .select($"source", $"lang",
          ($"n_docs" * $"t" - $"r" * $"c").cast("string").as("excess"),
          round(($"n_docs" * $"t").cast("double") /
            ($"r" * $"c").cast("double"), 6).as("lift"))
    }
    val thrown = intercept[Throwable] { lift(use128 = false).collect() }
    assert(isLoudOverflow(thrown), causes(thrown).map(_.getClass.getName))
    val got = lift(use128 = true)
      .as[(String, String, String, Double)].collect()
      .map(r => (r._1, r._2) -> ((BigInt(r._3), r._4))).toMap
    // BigInt reference
    val raw = Seq(("s1", "en", BigInt(4000000000L)),
      ("s1", "de", BigInt(1000000000L)), ("s2", "en", BigInt(3000000000L)))
    val r = raw.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val c = raw.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val t = raw.map(_._3).sum
    raw.foreach { case (src, lg, o) =>
      val excess = o * t - r(src) * c(lg)
      val want = math.rint((BigDecimal(o * t) / BigDecimal(r(src) * c(lg)))
        .toDouble * 1e6) / 1e6
      val g = got((src, lg))
      assert(g._1 == excess, s"($src,$lg) excess ${g._1} vs $excess")
      assert(math.abs(g._2 - want) < 1e-9, s"($src,$lg) lift ${g._2} vs $want")
    }
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
