package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale measurement for q129's rolling-distinct shape: rolling WAU
  * needs every (day, user) pair counted into 7 windows, and there are
  * two places to put the 7× explode —
  *
  *   - `dedup_first_sec` (the shipped shape): DISTINCT (day, user)
  *     FIRST (one corpus shuffle down to the bounded pair frame), then
  *     the 7-element explode runs over days × users rows;
  *   - `expand_first_sec` (the naive shape): explode RAW events 7×,
  *     then one giant distinct — the exchange carries 7× the corpus.
  *
  * Both produce identical results (verified on a sample before
  * timing); the A/B quantifies the order-of-operations rule "collapse
  * to the bounded frame BEFORE you fan out", the same lesson as
  * FuzzyScaleBench's collapse-first and SpanDedup's recompute-first.
  *
  * Corpus: n events over n/100 users × 60 days (deterministic in id).
  * Prints one JSON line per n:
  *   {"n":…,"pairs":…,"dedup_first_sec":…,"expand_first_sec":…}
  * Sizes: SPARK_GRAFT_ANALYTICS_N (default "30000000,100000000");
  * the naive leg only runs for n ≤ SPARK_GRAFT_ANALYTICS_MAX_NAIVE
  * (default 100000000). -1 marks a skipped leg.
  */
object AnalyticsScaleBench {

  def corpus(spark: SparkSession, n: Long): DataFrame = {
    val users = math.max(n / 100, 1L)
    spark.range(n).select(
      pmod(xxhash64(col("id") * 13 + 5), lit(users)).as("user_id"),
      pmod(xxhash64(col("id") * 29 + 1), lit(60L)).cast("int").as("day"))
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
    import spark.implicits._

    val sizes = sys.env.getOrElse("SPARK_GRAFT_ANALYTICS_N",
      "30000000,100000000").split(",").map(_.trim.toLong)
    val maxNaive = sys.env
      .getOrElse("SPARK_GRAFT_ANALYTICS_MAX_NAIVE", "100000000").toLong
    def f(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def time(body: => Unit): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min

    def wauDedupFirst(df: DataFrame): DataFrame =
      df.distinct()
        .select(explode(sequence(lit(0), lit(6))).as("k"),
          $"user_id", $"day")
        .select(($"day" + $"k").as("day"), $"user_id")
        .distinct()
        .groupBy($"day").agg(count(lit(1)).as("wau"))

    def wauExpandFirst(df: DataFrame): DataFrame =
      df.select(explode(sequence(lit(0), lit(6))).as("k"),
          $"user_id", $"day")
        .select(($"day" + $"k").as("day"), $"user_id")
        .distinct()
        .groupBy($"day").agg(count(lit(1)).as("wau"))

    sizes.foreach { n =>
      val df = corpus(spark, n)
      df.count() // untimed input warm-up

      // equivalence witness on a small slice before timing
      val sample = corpus(spark, 200000L)
      val a = wauDedupFirst(sample).orderBy("day")
        .as[(Int, Long)].collect().toSeq
      val b = wauExpandFirst(sample).orderBy("day")
        .as[(Int, Long)].collect().toSeq
      require(a == b, "forms disagree")

      val pairs = df.distinct().count()
      val dedupSec = time {
        wauDedupFirst(df).write.mode("overwrite").format("noop").save()
      }
      val naiveSec =
        if (n > maxNaive) -1.0
        else time {
          wauExpandFirst(df).write.mode("overwrite").format("noop").save()
        }
      val line = s"""{"n":$n,"pairs":$pairs,""" +
        s""""dedup_first_sec":${f(dedupSec)},""" +
        s""""expand_first_sec":${f(naiveSec)}}"""
      println(line)
      System.err.println(line)
    }
    spark.stop()
  }
}
