package graft

import org.apache.spark.sql.functions._

/** The r12-r14 masking bug class, as a named red test (round-15 verdict,
  * missing #4): for three rounds a query that failed at PLAN time wrote
  * no output dir, the compare step iterated only produced dirs, and the
  * round looked green with fewer queries. `Verify.runQuery` now
  * guarantees every declared query produces an output dir — a real
  * result, or a zero-row `_verify_error` marker that reds out under both
  * compare modes. This spec drives the exact failure shapes and asserts
  * the declared count survives with a red row.
  */
class VerifyMarkerSpec extends SparkSpec {

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("graft_verify").toString

  test("a throwing query still produces an output dir — the error marker") {
    val out = freshDir()
    // plan-time failure (the r12-r14 shape: analysis error on a drifted
    // schema), not just execution-time
    Verify.runQuery(spark, out, "q_boom",
      (s, _) => s.range(1).select(col("no_such_column")), "/nonexistent")
    Verify.runQuery(spark, out, "q_ok",
      (s, _) => s.range(3).select(col("id").as("n")), "/nonexistent")

    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs == Set("q_boom", "q_ok"),
      s"declared 2 queries, produced dirs: $dirs — the set SHRANK")

    // the marker is red under both compare modes: 0 rows (rows-only
    // fallback) and a column no oracle can match (hash/schema compare)
    val marker = spark.read.parquet(s"$out/q_boom")
    assert(marker.count() == 0)
    assert(marker.schema.fieldNames.toSeq == Seq("_verify_error"))

    val ok = spark.read.parquet(s"$out/q_ok")
    assert(ok.count() == 3)
  }

  test("a query that leaks a cache is replaced by the marker") {
    val out = freshDir()
    Verify.runQuery(spark, out, "q_leak", (s, _) => {
      val df = s.range(5).select(col("id").as("n"))
      df.persist() // deliberately OUTSIDE graft.Caching.persisted
      df
    }, "/nonexistent")
    val res = spark.read.parquet(s"$out/q_leak")
    assert(res.schema.fieldNames.toSeq == Seq("_verify_error"),
      "leaked persist must fail the query's gate, not pass silently")
    assert(spark.sharedState.cacheManager.isEmpty,
      "leak gate must clearCache so later queries stay cold")
  }

  test("a throwing query that leaked a cache still leaves the session cold") {
    val out = freshDir()
    Verify.runQuery(spark, out, "q_leak_throw", (s, _) => {
      s.range(5).select(col("id").as("n")).persist()
      s.range(1).select(col("missing"))
    }, "/nonexistent")
    assert(spark.sharedState.cacheManager.isEmpty,
      "catch branch must clearCache (ADVICE r15): a leaked persist would " +
        "silently warm every subsequent query in the run")
    assert(spark.read.parquet(s"$out/q_leak_throw").count() == 0)
  }
}
