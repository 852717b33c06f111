package graft

import graft.ext.Sampling
import org.apache.spark.sql.functions._

/** Deterministic sampling + token-budget selection semantics. */
class SamplingSpec extends SparkSpec {

  import spark.implicits._

  test("deterministicSample: reproducible, repartition-stable, ~fraction") {
    val df = (1L to 2000L).toDF("id")
    val a = Sampling.deterministicSample(df, $"id", 0.3, "s")
      .as[Long].collect().toSet
    val b = Sampling.deterministicSample(df.repartition(7), $"id", 0.3, "s")
      .as[Long].collect().toSet
    assert(a == b, "sample must not depend on partitioning")
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05, s"got ${a.size}")
    // different salt → different (but equally sized-ish) sample
    val c = Sampling.deterministicSample(df, $"id", 0.3, "other")
      .as[Long].collect().toSet
    assert(c != a)
  }

  test("stratified: per-stratum fractions with default") {
    val df = (1L to 3000L).toDF("id")
      .withColumn("g", when($"id" % 3 === 0, "keep").otherwise("rare"))
    val out = Sampling.stratified(df, $"g", $"id",
        Map("keep" -> 0.9), default = 0.1, salt = "x")
      .groupBy($"g").count().as[(String, Long)].collect().toMap
    assert(math.abs(out("keep") / 1000.0 - 0.9) < 0.08)
    assert(math.abs(out("rare") / 2000.0 - 0.1) < 0.08)
  }

  test("tokenBudget: greedy per-group prefix within budget") {
    val df = Seq(
      ("a", 1L, 40L), ("a", 2L, 50L), ("a", 3L, 20L), ("a", 4L, 5L),
      ("b", 1L, 200L))
      .toDF("src", "ord", "tok")
    val out = Sampling.tokenBudget(df, Seq($"src"), Seq($"ord"), $"tok", 100L)
      .select($"src", $"ord", $"cum_tokens")
      .as[(String, Long, Long)].collect().toSet
    // a: 40, 90 kept; 110 crosses → 3 and 4 dropped (monotone cum).
    // b: first row alone exceeds the budget → dropped.
    assert(out == Set(("a", 1L, 40L), ("a", 2L, 90L)))
  }

  test("groupSplit: whole groups land in one split, ~weights, stable") {
    val df = (0 until 5000).map(i => (i.toLong, s"g${i % 500}"))
      .toDF("id", "g")
    def splits() = df.select($"id", $"g",
        Sampling.groupSplit($"g",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "s1").as("sp"))
      .as[(Long, String, String)].collect()
    val a = splits()
    // leakage safety: a group never straddles splits
    assert(a.groupBy(_._2).forall(_._2.map(_._3).distinct.size == 1))
    // deterministic + repartition-stable
    assert(splits().toSeq == a.toSeq)
    val fr = a.groupBy(_._3).view.mapValues(_.size / 5000.0).toMap
    assert(math.abs(fr("train") - 0.8) < 0.08 &&
      math.abs(fr("val") - 0.1) < 0.05 && math.abs(fr("test") - 0.1) < 0.05,
      fr.toString)
    // unnormalized weights assign identically to their normalized form
    val b = df.select(Sampling.groupSplit($"g",
        Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0), "s1").as("sp"))
      .as[String].collect()
    assert(b.toSeq == a.map(_._3).toSeq)
  }
}
