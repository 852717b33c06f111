package graft

import graft.operators.Quantiles
import graft.sources.Rates
import org.apache.spark.sql.functions._

/** Exact vs approximate quantile paths: the approx sketch must land
  * within its documented rank-error bound of the exact value at fixture
  * scale, and the rate-inference operator must produce identical rates
  * through either path on quantized deltas. */
class QuantilesSpec extends SparkSpec {

  import spark.implicits._

  test("approx quantile within rank-error tolerance of exact (skewed doubles)") {
    // log-normal-ish skewed fixture, 20k distinct doubles
    val rnd = new scala.util.Random(11)
    val vals = Seq.fill(20000)(math.exp(rnd.nextGaussian() * 2) * 100.0)
    val df = vals.toDF("v")
    for (p <- Seq(0.5, 0.9, 0.99)) {
      val Row2 = df.agg(
        Quantiles.quantile($"v", p, approx = false).as("exact"),
        Quantiles.quantile($"v", p, approx = true).as("approx"))
        .as[(Double, Double)].collect().head
      val (exact, approx) = Row2
      // approx_percentile guarantees a RANK error <= n/accuracy; convert
      // to a value tolerance by comparing against the exact quantiles one
      // rank-tolerance step away
      val sorted = vals.sorted
      val n = sorted.length
      val tol = math.max(1, n / Quantiles.DefaultAccuracy + 1)
      val loIdx = math.max(0, (p * (n - 1)).toInt - tol)
      val hiIdx = math.min(n - 1, (p * (n - 1)).toInt + tol + 1)
      assert(approx >= sorted(loIdx) && approx <= sorted(hiIdx),
        s"p=$p approx=$approx outside [${sorted(loIdx)}, ${sorted(hiIdx)}] around exact=$exact")
    }
  }

  test("rate inference identical via exact and approx paths on quantized deltas") {
    // two channels at 8 s and 30 s cadence with duplicate timestamps
    val rows = (0 until 500).map(i =>
      ("ch8", java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1600000000L + 8L * i)), 1.0)) ++
      (0 until 500).map(i =>
        ("ch30", java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1600000000L + 30L * i)), 1.0)) ++
      Seq(("ch8", java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1600000000L)), 2.0))
    val df = rows.toDF("ch", "ts", "v")
    def rates(approx: Boolean) =
      Rates.inferPerKey(df, Seq($"ch"), $"ts", approx)
        .select($"ch", $"rate_s").as[(String, Long)].collect().toMap
    val exact = rates(approx = false)
    assert(exact == Map("ch8" -> 8L, "ch30" -> 30L))
    assert(rates(approx = true) == exact)
  }

  test("assertExactFeasible: loud failure replaces the silent exact-path OOM") {
    // round-8 verdict #8: the exact-percentile buffer caveat lived
    // only in a comment; the guard turns a skewed group into a thrown
    // bound violation instead of an executor OOM
    val df = ((1 to 100).map(i => ("skewed", i.toDouble)) ++
      (1 to 5).map(i => ("small", i.toDouble))).toDF("g", "v")
    val e = intercept[IllegalStateException] {
      Quantiles.assertExactFeasible(df, Seq($"g"), $"v", maxPerGroup = 50)
    }
    assert(e.getMessage.contains("100"))
    // at the bound: feasible, no throw
    Quantiles.assertExactFeasible(df, Seq($"g"), $"v", maxPerGroup = 100)
    // global aggregate form (empty groupCols)
    intercept[IllegalStateException] {
      Quantiles.assertExactFeasible(df, Seq(), $"v", maxPerGroup = 50)
    }
    Quantiles.assertExactFeasible(df, Seq(), $"v", maxPerGroup = 105)
    // nulls don't count against the bound (percentile skips them)
    val withNulls = df.withColumn("v",
      when($"v" > 2, $"v").otherwise(lit(null).cast("double")))
    Quantiles.assertExactFeasible(withNulls, Seq($"g"), $"v", maxPerGroup = 98)
  }
}
