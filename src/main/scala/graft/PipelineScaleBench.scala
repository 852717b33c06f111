package graft

import org.apache.spark.sql.SparkSession

/** End-to-end DocumentPipeline scale curve (round-10 verdict #5):
  * every stage of the q63 facade is measured in isolation elsewhere —
  * this composes them and measures the COMPOSITION at corpus sizes the
  * fixture tables can't reach, on DedupScaleBench's generated corpus
  * (planted near-dups + hot boilerplate, deterministic in id).
  *
  * Per size n it times the pipeline's cumulative prefixes
  * ([[graft.ext.DocumentPipeline.prepareStaged]] — the real plan, not
  * a re-assembled copy) to a noop sink, so
  * `dedup_sec - redact_score_sec` is the marginal cost of the one wide
  * stage and `full_sec - dedup_sec` the map-only tail, and it counts
  * `Exchange` nodes in the full plan — the single-wide-dependency
  * claim (PlanInvariantsSpec pins it at sf0.001; this checks the SAME
  * plan property on the plan actually built at 3-30 M docs).
  *
  * Prints one JSON line per n:
  *   {"n":…,"redact_score_sec":…,"dedup_sec":…,"full_sec":…,
  *    "exchanges":…,"out_rows":…}
  * Sizes: SPARK_GRAFT_PIPE_N (comma-separated, default
  * "3000000,10000000,30000000").
  */
object PipelineScaleBench {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)

    val sizes = sys.env.getOrElse("SPARK_GRAFT_PIPE_N",
      "3000000,10000000,30000000").split(",").map(_.trim.toLong)

    sizes.foreach { n =>
      val corpus = DedupScaleBench.corpus(spark, n)
      val staged = graft.ext.DocumentPipeline.prepareStaged(
        corpus, "doc_id", "text", minQuality = 0.05,
        sampleFraction = 0.9, nShards = 64, salt = "pipe_bench")
      val walls = staged.map { case (name, df) =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        name -> (System.nanoTime() - t0) / 1e9
      }.toMap
      val full = staged.last._2
      val exchanges = "Exchange hashpartitioning".r
        .findAllIn(full.queryExecution.executedPlan.toString).size
      val outRows = full.count()
      def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
      val line = s"""{"n":$n,"redact_score_sec":${f(walls("redact_score"))},""" +
        s""""dedup_sec":${f(walls("dedup"))},""" +
        s""""full_sec":${f(walls("sample_shard"))},""" +
        s""""exchanges":$exchanges,"out_rows":$outRows}"""
      println(line)
      System.err.println(line)
    }
    spark.stop()
  }
}
