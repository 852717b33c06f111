package graft

import graft.operators.Funnel
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Funnel (operators/Funnel.scala): ordered-progression semantics on
  * hand-built event streams — order violations, horizon cutoffs, the
  * strict-inequality boundary, multi-step chains — plus a brute-force
  * cross-check on random streams. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(d: Int, h: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
  private val day = 86400L

  private def run(rows: Seq[(Long, Timestamp, String)],
                  steps: Seq[String] = Seq("a", "b", "c"),
                  horizon: Long = 7 * day) =
    Funnel.funnel(rows.toDF("u", "t", "e"), "u", "t", "e", steps, horizon)
      .collect().map(r => r.getLong(0) ->
        ((1 to steps.size).map(i => Option(r.getTimestamp(i))),
          r.getLong(steps.size + 1))).toMap

  test("stages progress only in event-time order") {
    val got = run(Seq(
      (1L, ts(1), "a"), (1L, ts(2), "b"), (1L, ts(3), "c"), // full funnel
      (2L, ts(2), "b"), (2L, ts(3), "a"), // b before a: stuck at stage 1
      (3L, ts(1), "a"), (3L, ts(4), "c"), // skipped b: c can't count
      (4L, ts(5), "b"), (4L, ts(6), "c"))) // never did a: absent
    assert(got(1L) == ((Seq(Some(ts(1)), Some(ts(2)), Some(ts(3))), 3L)))
    assert(got(2L) == ((Seq(Some(ts(3)), None, None), 1L)))
    assert(got(3L) == ((Seq(Some(ts(1)), None, None), 1L)))
    assert(!got.contains(4L))
  }

  test("horizon bounds every later step relative to step 1") {
    val got = run(Seq(
      (1L, ts(1), "a"), (1L, ts(7), "b"), (1L, ts(9), "c"), // c past day 8
      (2L, ts(1), "a"), (2L, ts(9), "b"))) // b past horizon entirely
    assert(got(1L) == ((Seq(Some(ts(1)), Some(ts(7)), None), 2L)))
    assert(got(2L) == ((Seq(Some(ts(1)), None, None), 1L)))
  }

  test("same-timestamp events are not ordered progression (strict >)") {
    val got = run(Seq((1L, ts(1), "a"), (1L, ts(1), "b"), (1L, ts(2), "b")))
    assert(got(1L)._1(1) == Some(ts(2)), "the co-timestamped b must not count")
  }

  test("earliest qualifying event wins each stage") {
    val got = run(Seq(
      (1L, ts(2), "a"), (1L, ts(1), "b"), // b before first a ignored
      (1L, ts(3), "b"), (1L, ts(4), "b"))) // earliest post-a b wins
    assert(got(1L)._1 == Seq(Some(ts(2)), Some(ts(3)), None))
  }

  test("brute-force cross-check on random event streams") {
    val rnd = new scala.util.Random(11)
    val types = Vector("a", "b", "c", "x")
    val rows = for (u <- 0L until 80L; _ <- 0 until rnd.nextInt(12)) yield
      (u, new Timestamp(ts(1).getTime + rnd.nextInt(12 * day.toInt) * 1000L),
        types(rnd.nextInt(types.size)))
    val horizon = 5 * day
    val got = run(rows, Seq("a", "b", "c"), horizon)
    // reference: per-user sorted scan
    val ref = rows.groupBy(_._1).flatMap { case (u, evs) =>
      val sorted = evs.sortBy(_._2.getTime)
      val t1 = sorted.collectFirst { case (_, t, "a") => t }
      t1.map { t1v =>
        val dl = t1v.getTime + horizon * 1000L
        val t2 = sorted.collectFirst { case (_, t, "b")
          if t.getTime > t1v.getTime && t.getTime <= dl => t }
        val t3 = t2.flatMap(t2v => sorted.collectFirst { case (_, t, "c")
          if t.getTime > t2v.getTime && t.getTime <= dl => t })
        u -> ((Seq(Some(t1v), t2, t3),
          if (t3.isDefined) 3L else if (t2.isDefined) 2L else 1L))
      }
    }
    assert(got == ref)
  }
}
