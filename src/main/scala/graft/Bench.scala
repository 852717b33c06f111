package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric","value","unit","queries","sf"}.
  *
  * Methodology (round-1 verdict "What's wrong #3"): one untimed warm-up
  * pass over every query first (JIT + code cache + parquet footer cache),
  * then >= 5 timed cache-cold iterations per query; reported number is
  * the median, with per-query [min, max] spread alongside so regressions
  * are distinguishable from sampling noise. The
  * sink is `collect()` — it materializes the full result on the driver,
  * so terminal sorts and all projected columns are actually paid for
  * (a `count()` sink lets Catalyst drop both). Result sets are small
  * relative to the input (aggregated/top-k), so collect is safe here.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // optional comma-separated subset for local iteration; entries
    // match by prefix so both q26 and q26_jaccard_pairs select it
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
    only.filter(_ => names.isEmpty).foreach { o =>
      System.err.println(s"[bench] SPARK_GRAFT_BENCH_ONLY=$o matched no query")
    }
    def runOnce(name: String): Double = {
      // persist()ed intermediates from a previous run would satisfy this
      // run's structurally-equal plans via the CacheManager, silently
      // timing warm-cache cost — every run starts cache-cold
      Caching.release()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).collect() }
      catch {
        // a failing query must be VISIBLE, not a silent -1 in the medians
        case t: Throwable =>
          System.err.println(s"[bench] $name FAILED: $t")
          t.printStackTrace()
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }
    // host-load telemetry: the driver's official runs have repeatedly been
    // inflated by background load on the shared host; recording loadavg
    // before/after lets a reader discount a noisy run without re-running
    def loadavg(): String =
      try {
        scala.util.Using.resource(scala.io.Source.fromFile("/proc/loadavg")) {
          _.getLines().next().split(" ").take(3).mkString(",")
        }
      } catch { case _: Throwable => "" }
    val loadBefore = loadavg()
    val wallT0 = System.nanoTime()
    // warm-up (untimed)
    names.foreach(runOnce)
    // >= 5 timed iterations (round-2 verdict: n=3 made round-over-round
    // ratios untrustworthy); per-query spread is reported so a regression
    // can be told apart from sampling noise
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "5").toInt
    // Interleave mode (A/B methodology): iterate round-robin across the
    // selected queries instead of per-query blocks, so slow host-load
    // drift over the minutes of a run hits every query's samples equally
    // rather than biasing whichever query ran last. Use for within-run
    // comparisons between queries; block mode stays the default so the
    // per-round headline keeps its historical shape.
    val interleave = sys.env.get("SPARK_GRAFT_BENCH_INTERLEAVE").contains("1")
    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def summarize(name: String, times: Seq[Double]) = {
      val r =
        if (times.contains(-1.0)) name -> (-1.0, -1.0, -1.0)
        else {
          val sorted = times.sorted
          name -> (sorted(sorted.length / 2), sorted.head, sorted.last)
        }
      // incremental per-query record: even if the harness truncates the
      // final lines, each median has already been emitted once. Emitted
      // on BOTH streams — the stdout copy is a small self-contained
      // JSONL line, so a keep-the-tail capture window that cannot hold
      // the 82-query headline whole still carries per-query medians
      // (round-9 verdict #4: the judged artifact must parse without
      // reaching into target/)
      val rec =
        s"""{"metric":"query","q":"$name","median":${f(r._2._1)},"min":${f(r._2._2)},"max":${f(r._2._3)}}"""
      println(rec)
      System.err.println(s"[bench] $rec")
      r
    }
    val results =
      if (interleave) {
        // emit each round's samples as they land: block mode's
        // incremental safeguard (a partial run still leaves records)
        // would otherwise not kick in until the full iters×queries
        // matrix finished
        val samples = (1 to iters).map { it =>
          val round = names.map(n => n -> runOnce(n))
          System.err.println(s"""[bench] {"iter":$it,${round.map { case (n, t) =>
            "\"" + n + "\":" + f(t) }.mkString(",")}}""")
          round
        }
        names.map(n => summarize(n, samples.map(_.toMap.apply(n))))
      } else names.map(name => summarize(name, (1 to iters).map(_ => runOnce(name))))
    val qs = results.map { case (k, (med, _, _)) => "\"" + k + "\":" + f(med) }
      .mkString("{", ",", "}")
    val spread = results.map { case (k, (_, mn, mx)) =>
      "\"" + k + "\":[" + f(mn) + "," + f(mx) + "]"
    }.mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    // per-query [min,max] spread is diagnostic only — keep it OFF the
    // headline line (and print it first) so the final JSON line stays
    // small enough to survive harnesses that keep only the last few KB
    // of output (the round-3 headline line was truncated exactly this way)
    val wallSec = (System.nanoTime() - wallT0) / 1e9
    val loadAfter = loadavg()
    val telemetry =
      s""""loadavg_before":[$loadBefore],"loadavg_after":[$loadAfter],"wall_sec":${f(wallSec)}"""
    val headline =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"iters":$iters,$telemetry,"sf":"$sfDir"}"""
    System.err.println(headline)
    System.err.println(s"""{"metric":"spread_min_max","iters":$iters,$telemetry,"queries":$spread}""")
    // ALSO write the headline to a file: a harness that keeps only the
    // tail of stdout truncated the round-6 artifact mid-line (lost q01)
    try {
      val p = java.nio.file.Paths.get("target/bench_last.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p,
        (headline + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case t: Throwable =>
      System.err.println(s"[bench] could not write target/bench_last.json: $t")
    }
    // The headline goes to stdout exactly ONCE, as the very last line.
    // Round 9's artifact lost q01–q08 precisely because the headline
    // was printed twice: two ~2.2 KB copies overflow a ~4 KB
    // keep-the-tail capture window, leaving the FIRST copy headless —
    // and a first-match scan for "metric":"total" then parses the
    // truncated copy (BENCH_r09.json: "parsed": null). A single
    // trailing copy always fits the window whole, and the per-query
    // JSONL lines above it carry every median individually besides.
    println(headline)
    spark.stop()
  }
}
