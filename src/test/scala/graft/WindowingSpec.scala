package graft

import graft.operators.Windowing
import org.apache.spark.sql.functions._

/** W4/W5 — window counts (⌊(n−L)/step⌋+1), content, overlap semantics
  * (fraction vs rows, channel_utils.py:187-188), truncate-to-min. */
class WindowingSpec extends SparkSpec {

  import spark.implicits._

  private def series(key: Long, n: Int) =
    (0 until n).map { i =>
      (key, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1600000000L + 8L * i)), i.toDouble)
    }.toDF("key", "ts", "value")

  test("stepOf: fractional overlap is a share of seqLen; int is rows") {
    assert(Windowing.stepOf(512, 0.5, fractional = true) == 256)
    assert(Windowing.stepOf(512, 0, fractional = false) == 512)
    assert(Windowing.stepOf(512, 128, fractional = false) == 384)
    assert(Windowing.stepOf(4, 4, fractional = false) == 1) // min 1 guard
  }

  test("window count matches ⌊(n−L)/step⌋+1 (ConvertToTensor.py:60)") {
    // the FIXTURES.md §6 case: n=1300, L=512 → 2 windows at overlap 0
    for ((n, l, step, expect) <- Seq((1300, 512, 512, 2), (1300, 512, 256, 4),
        (20, 16, 8, 1), (24, 16, 8, 2), (15, 16, 8, 0), (16, 16, 8, 1))) {
      val out = Windowing.collect(series(1, n), Seq($"key"), Seq($"ts"),
        $"value", l, step)
      assert(out.count() == expect, s"n=$n L=$l step=$step")
    }
  }

  test("window content is the ordered slice [w*step, w*step+L)") {
    val out = Windowing.collect(series(1, 24), Seq($"key"), Seq($"ts"),
        $"value", 16, 8)
      .orderBy("window_id")
      .select("window_id", "window")
      .as[(Long, Seq[Float])].collect().toSeq
    assert(out.size == 2)
    assert(out(0)._2 == (0 until 16).map(_.toFloat))
    assert(out(1)._2 == (8 until 24).map(_.toFloat))
    assert(out.forall(_._2.size == 16)) // no partial tails
  }

  test("emit copies each row into at most ceil(L/step) windows") {
    val em = Windowing.emit(series(1, 32), Seq($"key"), Seq($"ts"), 16, 8)
    val copies = em.groupBy("idx").count().agg(max("count")).as[Long].head()
    assert(copies <= 2) // ceil(16/8)
  }

  test("truncateToMin drops rows beyond the shortest series (W5)") {
    val df = series(1, 10).unionByName(series(2, 6))
    val out = Windowing.truncateToMin(df, Seq(lit(1).as("g")), Seq($"key"),
      Seq($"ts"))
    val counts = out.groupBy("key").count().orderBy("key")
      .as[(Long, Long)].collect().toSeq
    assert(counts == Seq((1L, 6L), (2L, 6L)))
  }
}
