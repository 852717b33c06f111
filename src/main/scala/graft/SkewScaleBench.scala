package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Planted-hot-key skew measurement (round-15 verdict, missing #2):
  * `LineDedup`'s first-occurrence selection is a `groupBy(hash).agg(min
  * (struct))` *because* the struct-min is map-side-combinable and
  * therefore skew-immune, where the equivalent `row_number() OVER
  * (PARTITION BY hash)` window shuffles every occurrence of the hot key
  * raw into ONE task's sort. That design argument lived only in prose —
  * this bench plants the pathology (ONE line = 50 % of all line
  * occurrences, the "boilerplate header on half the corpus" shape) and
  * measures both forms on identical input, plus `Skew.saltedSum` vs a
  * plain groupBy-sum on the same 50 %-hot key (the scaladoc's
  * "measure first: built-in partial aggregation usually suffices" claim).
  *
  * Corpus (deterministic in id, no RNG): 30 words/doc, chunkWords=5 →
  * 6 lines/doc. Even doc_ids are pure boilerplate — the SAME 5-word
  * phrase 6 times — so a single md5 key owns 3n of the 6n occurrences.
  * Odd doc_ids draw hash-spread words (no accidental dups).
  *
  * Prints one JSON line per n:
  *   {"n":…,"occurrences":…,"hot_key_rows":…,"structmin_sec":…,
  *    "window_sec":…,"window_wgl_nodes":…,"window_raw_sec":…,
  *    "full_dedup_sec":…,"plain_sum_sec":…,"salted_sum_sec":…,
  *    "distinct_lines":…}
  * Sizes: SPARK_GRAFT_SKEW_N (default "3000000,10000000,30000000");
  * the window leg runs only for n ≤ SPARK_GRAFT_SKEW_MAX_WINDOW
  * (default 30000000); the WGL-excluded raw-window leg (the real
  * single-task-sort cliff) only for n ≤ SPARK_GRAFT_SKEW_MAX_RAW
  * (default 10000000). -1 marks a skipped leg.
  */
object SkewScaleBench {

  /** n docs; even ids are 6 copies of one fixed 5-word line (the hot
    * key), odd ids are 30 hash-spread words. */
  def skewedCorpus(spark: SparkSession, n: Long): DataFrame = {
    val hot = Seq.fill(6)("the quick brown fox jumps").mkString(" ")
    val cold = concat_ws(" ", (0 until 30).map(j =>
      concat(lit("w"), pmod(xxhash64(col("id") * 37 + j), lit(50000L)))): _*)
    spark.range(n).select(
      col("id").as("doc_id"),
      when(pmod(col("id"), lit(2)) === 0, lit(hot)).otherwise(cold).as("text"))
  }

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
    import spark.implicits._

    val sizes = sys.env.getOrElse("SPARK_GRAFT_SKEW_N",
      "3000000,10000000,30000000").split(",").map(_.trim.toLong)
    val maxWindow =
      sys.env.getOrElse("SPARK_GRAFT_SKEW_MAX_WINDOW", "30000000").toLong
    def f(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    // two timed iterations, keep the min — leg ORDER must not decide the
    // A/B (the first leg otherwise pays whole-pipeline JIT/codegen
    // warm-up; seen as a 2× phantom on the 200k smoke run)
    def time(body: => Unit): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min

    sizes.foreach { n =>
      val docs = skewedCorpus(spark, n)
      val occ = docs.select(
        $"doc_id",
        posexplode(graft.ext.LineDedup.lines($"text", 5))
          .as(Seq("__pos", "__line")))
        .withColumn("__h", md5($"__line"))

      // untimed warm-up: JIT the generate+hash pipeline every leg shares
      occ.count()

      // ---- q86 core, struct-min form (the shipped shape) ----
      val distinctLines = occ.groupBy($"__h")
        .agg(min(struct($"doc_id", $"__pos", $"__line")).as("__first"))
        .count()
      val structSec = time {
        occ.groupBy($"__h")
          .agg(min(struct($"doc_id", $"__pos", $"__line")).as("__first"))
          .count(): Unit
      }

      // ---- q86 core, row_number-window form ----
      // NOTE (measured round 16): in Spark 4 this is NOT the naive cliff
      // — InferWindowGroupLimit rewrites filter(rn=1) into a map-side
      // top-1 (WindowGroupLimit), collapsing the hot key per map task
      // exactly like the struct-min agg. `window_wgl_nodes` proves the
      // rewrite fired; `window_raw_sec` measures the same query with the
      // rule excluded — the shape every non-rank-filter window query
      // (and pre-3.5 Spark) actually runs, where the hot key's rows all
      // sort in ONE task.
      def windowForm = {
        val w = Window.partitionBy($"__h").orderBy($"doc_id", $"__pos")
        occ.withColumn("__rn", row_number().over(w)).filter($"__rn" === 1)
      }
      val windowWglNodes =
        if (n > maxWindow) -1
        else "WindowGroupLimit".r.findAllIn(
          windowForm.queryExecution.executedPlan.toString).size
      val windowSec =
        if (n > maxWindow) -1.0
        else time { windowForm.count(): Unit }
      val maxRaw =
        sys.env.getOrElse("SPARK_GRAFT_SKEW_MAX_RAW", "10000000").toLong
      val windowRawSec =
        if (n > maxRaw) -1.0
        else {
          spark.conf.set("spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferWindowGroupLimit")
          // single iteration: this leg demonstrates a cliff, not a median
          val t0 = System.nanoTime()
          windowForm.count()
          val t = (System.nanoTime() - t0) / 1e9
          spark.conf.unset("spark.sql.optimizer.excludedRules")
          t
        }

      // ---- full q86 operator end-to-end (includes reassembly) ----
      val fullSec = time {
        graft.ext.LineDedup.dedupLines(docs, "doc_id", "text")
          .write.mode("overwrite").format("noop").save()
      }

      // ---- 50%-hot-key aggregation: plain vs salted ----
      val plainSec = time {
        occ.groupBy($"__h").agg(sum($"__pos").as("s")).count(): Unit
      }
      val saltedSec = time {
        graft.operators.Skew
          .saltedSum(occ, Seq($"__h"), $"__pos", "s").count(): Unit
      }

      // even docs = (n+1)/2, each contributing 6 occurrences of THE key
      val line = s"""{"n":$n,"occurrences":${6 * n},""" +
        s""""hot_key_rows":${6 * ((n + 1) / 2)},""" +
        s""""structmin_sec":${f(structSec)},"window_sec":${f(windowSec)},""" +
        s""""window_wgl_nodes":$windowWglNodes,"window_raw_sec":${f(windowRawSec)},""" +
        s""""full_dedup_sec":${f(fullSec)},"plain_sum_sec":${f(plainSec)},""" +
        s""""salted_sum_sec":${f(saltedSec)},"distinct_lines":$distinctLines}"""
      println(line)
      System.err.println(line)
    }
    spark.stop()
  }
}
