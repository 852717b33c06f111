package graft

import graft.ext.BloomPrune
import org.apache.spark.sql.functions._

/** graft_bloom / graft_bloom_contains + the BloomPrune exact anti-join:
  * the union of the two branches must be INDISTINGUISHABLE from a plain
  * `left_anti`, including when the bloom is deliberately tiny (forcing
  * false positives through the exact-join branch) and when partial
  * aggregation merges per-partition filters. */
class BloomPruneSpec extends SparkSpec {

  import spark.implicits._

  private def bigDf = (0L until 300L)
    .map(i => (i, s"key_${i % 150}")).toDF("id", "k")

  // blocklist: every third key plus repeats across partitions
  private def smallDf = (0L until 150L by 3L)
    .flatMap(i => Seq(s"key_$i", s"key_$i")).toDF("bk")
    .repartition(7)

  test("bloom anti-join equals the plain left_anti (normal sizing)") {
    val got = BloomPrune
      .antiJoin(bigDf, $"k", smallDf, $"bk", expectedItems = 1000L)
      .select($"id").as[Long].collect().sorted
    val want = bigDf
      .join(smallDf.select($"bk"), $"k" === $"bk", "left_anti")
      .select($"id").as[Long].collect().sorted
    assert(got.sameElements(want) && want.nonEmpty)
  }

  test("bloom anti-join stays exact when the filter is saturated with false positives") {
    // 5-item capacity for a 50-key blocklist at fpp 0.5: nearly every
    // probe says "maybe" — exactness must come from the verify join
    val got = BloomPrune
      .antiJoin(bigDf, $"k", smallDf, $"bk", expectedItems = 5L, fpp = 0.5)
      .select($"id").as[Long].collect().sorted
    val want = bigDf
      .join(smallDf.select($"bk"), $"k" === $"bk", "left_anti")
      .select($"id").as[Long].collect().sorted
    assert(got.sameElements(want))
  }

  test("no false negatives after partition-merge: every blocklisted key probes true") {
    graft.plans.GraftExtensions.register(spark)
    val blob = smallDf
      .select(call_function("graft_bloom", $"bk", lit(1000L), lit(0.01)).as("b"))
      .head().getAs[Array[Byte]](0)
    val misses = smallDf.distinct()
      .filter(!call_function("graft_bloom_contains", lit(blob), $"bk"))
      .count()
    assert(misses == 0L)
  }

  test("null big-side keys never match and are kept (anti-join null semantics)") {
    val big = Seq((1L, Some("key_0")), (2L, None), (3L, Some("key_1")))
      .toDF("id", "k")
    val got = BloomPrune
      .antiJoin(big, $"k", smallDf, $"bk", expectedItems = 100L)
      .select($"id").as[Long].collect().sorted
    // key_0 is blocklisted; null and key_1 survive
    assert(got.toSeq == Seq(2L, 3L))
  }

  test("graft_bloom_contains rejects a non-foldable bloom blob") {
    graft.plans.GraftExtensions.register(spark)
    val df = Seq(("a".getBytes, "a")).toDF("b", "s")
    val e = intercept[Exception] {
      df.select(call_function("graft_bloom_contains", $"b", $"s")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("foldable") ||
      e.getMessage.toLowerCase.contains("literal"))
  }
}
