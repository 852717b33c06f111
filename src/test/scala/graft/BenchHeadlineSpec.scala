package graft

import org.scalatest.funsuite.AnyFunSuite

/** The final bench stdout line is the driver's only per-round perf
  * signal and lives or dies by a 2000-char keep-the-tail capture
  * window (r18 shipped "parsed": null when the old headline outgrew
  * it at 194 queries). Pin the budget contract of
  * [[Bench.buildHeadline]] at pack sizes past any plausible growth,
  * pure-JVM — no SparkSession. */
class BenchHeadlineSpec extends AnyFunSuite {

  private val frag =
    """"baseline":{"mode":"interleaved","round":"r18","n":194,""" +
      """"median_ratio":0.99,"worst":"q124:1.36","over2x_n":2,""" +
      """"OVER_2X":["q1:2.10(1.00/0.48)","q2:2.05(0.82/0.40)"]}"""
  private val telemetry =
    """"loadavg_before":[0.12,1.05,1.61],"loadavg_after":[6.28,3.89,2.95],""" +
      """"wall_sec":1180.421"""

  private def parse(line: String) =
    org.json4s.jackson.JsonMethods.parse(line)

  test("194-query headline keeps med_cs, parses, fits the budget") {
    val meds = (1 to 194).map(i => (i % 40) / 10.0 + 0.11)
    val line = Bench.buildHeadline(130.5, 194, 5, meds, Some(frag),
      telemetry, "/root/testdata/sf0.1")
    assert(line.length <= 1800, line.length)
    val jv = parse(line)
    import org.json4s._
    assert((jv \ "metric") == JString("total"))
    assert((jv \ "n") == JInt(194))
    val JArray(cs) = (jv \ "med_cs"): @unchecked
    assert(cs.length == 194)
    assert((jv \ "baseline" \ "OVER_2X") != JNothing)
  }

  test("500-query pack drops med_cs FIRST but never the summary") {
    val meds = (1 to 500).map(_ => 123.456) // 5-digit centiseconds each
    val line = Bench.buildHeadline(600.0, 500, 5, meds, Some(frag),
      telemetry, "/root/testdata/sf0.1")
    assert(line.length <= 1800, line.length)
    val jv = parse(line)
    import org.json4s._
    assert((jv \ "med_cs") == JNothing) // dropped for budget
    assert((jv \ "baseline" \ "median_ratio") != JNothing) // kept
    assert((jv \ "value") == JDouble(600.0))
  }

  test("failed query encodes -1; no-baseline runs still parse") {
    val line = Bench.buildHeadline(10.0, 3, 5, Seq(1.0, -1.0, 0.5),
      None, telemetry, "/x")
    val jv = parse(line)
    import org.json4s._
    val JArray(cs) = (jv \ "med_cs"): @unchecked
    assert(cs == List(JInt(100), JInt(-1), JInt(50)))
    assert((jv \ "baseline") == JNothing)
  }
}
