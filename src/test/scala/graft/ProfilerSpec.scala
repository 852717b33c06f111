package graft

import graft.operators.Profiler

/** One-pass column profiler: exact stats and the approx-distinct switch. */
class ProfilerSpec extends SparkSpec {

  import spark.implicits._

  private val df = Seq(
    (Some(1.0), Some(10.0)), (Some(2.0), None), (Some(2.0), Some(30.0)),
    (None, Some(30.0)))
    .toDF("a", "b")

  test("profiles nulls, distincts, range, mean per column in one pass") {
    val rows = Profiler.numericProfile(df, Seq("a", "b"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(rows == Seq(
      ("a", 3L, 1L, 2L, 1.0, 2.0, 5.0 / 3),
      ("b", 3L, 1L, 2L, 10.0, 30.0, 70.0 / 3)))
  }

  test("approx distinct stays within HLL error at fixture scale") {
    val wide = (1 to 2000).map(i => i.toDouble).toDF("a")
    val exact = Profiler.numericProfile(wide, Seq("a"))
      .select("n_distinct").as[Long].head()
    val approx = Profiler.numericProfile(wide, Seq("a"), approxDistinct = true)
      .select("n_distinct").as[Long].head()
    assert(exact == 2000L)
    assert(math.abs(approx - 2000L) <= 100L) // default rsd 5%
  }
}
