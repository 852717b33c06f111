package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Misra–Gries heavy-hitters aggregate: exact regime, error bounds
  * under merges, and deterministic ordering. */
class NativeAggSpec extends SparkSpec {

  import spark.implicits._

  private def hh(items: Seq[String], cap: Int, partitions: Int) = {
    val df = items.toDF("item").repartition(partitions)
    df.agg(expr(s"graft_heavy_hitters(item, $cap)").as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item", $"e.count")
      .as[(String, Long)].collect().toSeq
  }

  test("exact when distinct items fit the capacity, sorted (count desc, item)") {
    val items = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++
      Seq.fill(1)("d")
    val out = hh(scala.util.Random.shuffle(items), cap = 10, partitions = 3)
    assert(out == Seq(("a", 5L), ("b", 3L), ("c", 3L), ("d", 1L)))
  }

  test("property: MG guarantees hold under partial-merge at any capacity") {
    val gen = for {
      n <- Gen.choose(30, 120)
      items <- Gen.listOfN(n, Gen.frequency(
        5 -> Gen.const("hot"), 3 -> Gen.const("warm"),
        2 -> Gen.oneOf((1 to 20).map(i => s"cold$i"))))
      cap <- Gen.choose(2, 6)
      parts <- Gen.choose(1, 4)
    } yield (items, cap, parts)
    val prop = Prop.forAll(gen) { case (items, cap, parts) =>
      val n = items.size
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val out = hh(items, cap, parts).toMap
      // the Mergeable Summaries theorem: merging preserves the EXACT
      // n/(k+1) bound — no extra slack, so an off-by-one in the re-cap
      // merge cannot hide behind a loosened assertion
      val bound = n.toLong / (cap + 1)
      val mustKeep = truth.filter { case (_, c) => c > bound }.keySet
      mustKeep.subsetOf(out.keySet) &&
        out.forall { case (i, c) =>
          val t = truth(i); c <= t && t - c <= bound
        }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("nulls are skipped") {
    val out = Seq(Some("x"), None, Some("x"), None).toDF("item")
      .agg(expr("graft_heavy_hitters(item, 4)").as("hh"))
      .select(explode($"hh").as("e")).select($"e.item", $"e.count")
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("x", 2L)))
  }
}
