package graft

import graft.ext.FuzzyJoin
import org.apache.spark.sql.functions._

import scala.util.Random

/** Deletion-neighborhood edit-distance join: the FastSS blocking must
  * find EXACTLY the Levenshtein-distance-≤-1 pairs — completeness is
  * checked against an independent driver-side O(n²) dynamic-programming
  * join on a randomly mutated corpus, soundness by the same comparison
  * (no extra pairs survive the verify filter). */
class FuzzyJoinSpec extends SparkSpec {

  import spark.implicits._

  /** Textbook DP Levenshtein — the independent reference. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def bruteForce(strs: Seq[(Long, String)]): Set[(Long, Long)] =
    (for {
      (ia, sa) <- strs; (ib, sb) <- strs
      if ia < ib && lev(sa, sb) <= 1
    } yield (ia, ib)).toSet

  test("ed1Pairs equals the brute-force DP join on a mutated random corpus") {
    val rnd = new Random(42)
    val alphabet = "abcd" // small alphabet → natural collisions too
    val base = (0L until 60L).map { i =>
      (i, (0 until (1 + rnd.nextInt(8))).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    // plant mutants of all three edit kinds against random base strings
    val mutants = (0 until 40).map { j =>
      val (_, s) = base(rnd.nextInt(base.size))
      val p = rnd.nextInt(s.length)
      val m = rnd.nextInt(3) match {
        case 0 => s.take(p) + s.drop(p + 1) // deletion
        case 1 => s.take(p) + alphabet(rnd.nextInt(4)) + s.drop(p) // insertion
        case _ => s.take(p) + alphabet(rnd.nextInt(4)) + s.drop(p + 1) // substitution
      }
      (1000L + j, m)
    }
    val corpus = base ++ mutants
    val got = FuzzyJoin.ed1Pairs(corpus.toDF("id", "s"), "id", "s")
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val want = bruteForce(corpus)
    assert(want.nonEmpty, "degenerate fixture: no qualifying pairs")
    assert(got == want,
      s"missed=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("edge cases: empty string, single char, exact duplicates") {
    val corpus = Seq((1L, ""), (2L, "a"), (3L, "a"), (4L, "ab"), (5L, "xy"))
    val got = FuzzyJoin.ed1Pairs(corpus.toDF("id", "s"), "id", "s")
      .select($"a_id", $"b_id", $"ed").as[(Long, Long, Long)]
      .collect().toSet
    // ""~"a" (1), "a"="a" (0), "a"~"ab" (1), both copies of "a" pair
    // with "" and "ab"; "xy" is ≥2 from everything
    assert(got == Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 0L),
      (2L, 4L, 1L), (3L, 4L, 1L)), got)
  }

  test("pairs are unique and ordered a_id < b_id") {
    val corpus = Seq((10L, "aaaa"), (20L, "aaa"), (30L, "aaab"))
    val rows = FuzzyJoin.ed1Pairs(corpus.toDF("id", "s"), "id", "s")
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSeq
    assert(rows.size == rows.toSet.size, "duplicate candidate pairs leaked")
    assert(rows.forall { case (a, b) => a < b })
  }
}
