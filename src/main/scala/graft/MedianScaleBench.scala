package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The SURVEY §7.3 deferral, decided with data (round-15 verdict #7):
  * W7's sliding median ships as a window composition — lag/lead for
  * k ≤ 8, `array_sort(collect_list).over(rowsBetween(-k,k))` beyond —
  * with a custom aggregate "if the built-in composition is too slow".
  * q20 (k=2, sf0.1) is fine, but the fallback is O(k·log k) per ROW
  * with a fresh 2k+1 buffer allocation per row, so the question only
  * bites at large windows: a 40 s median over 1 Hz data is k=20; over
  * 10 Hz data k=200. This bench measures, per (rows, k):
  *
  *   - `window_sec` — the shipped collect_list composition;
  *   - `heap_sec` — [[graft.operators.Postprocess.slidingMedianPartitioned]],
  *     the dual-heap sorted-pass form (O(log k) per row, same single
  *     shuffle on the key);
  *   - `laglead_sec` (k ≤ 8 only, -1 otherwise) — the small-k branch,
  *     to confirm the k ≤ 8 crossover stands.
  *
  * Input: n rows over `n/100000` keys (100 k rows per key — fine-grained
  * sensor channels, the P3 partitioning story), value = hash-spread
  * double, verified equal row counts + equal medians on a 1 k-row
  * sample between forms before timing.
  *
  * Prints one JSON line per (n, k):
  *   {"n":…,"k":…,"window_sec":…,"heap_sec":…,"laglead_sec":…}
  * Config: SPARK_GRAFT_MEDIAN_N (default "10000000,30000000"),
  * SPARK_GRAFT_MEDIAN_K (default "2,50").
  */
object MedianScaleBench {

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

    val sizes = sys.env.getOrElse("SPARK_GRAFT_MEDIAN_N",
      "10000000,30000000").split(",").map(_.trim.toLong)
    val ks = sys.env.getOrElse("SPARK_GRAFT_MEDIAN_K", "2,50")
      .split(",").map(_.trim.toInt)
    def f(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    sizes.foreach { n =>
      val keys = math.max(1L, n / 100000L)
      val df = spark.range(n).select(
        pmod($"id", lit(keys)).as("key"),
        ($"id" / lit(keys)).cast("long").as("ts"),
        (pmod(xxhash64($"id"), lit(100000L)) / 100.0).as("value"))

      // untimed warm-up: JIT the range+hash input pipeline all legs share
      df.count()

      ks.foreach { k =>
        // correctness cross-check on one key before timing anything
        val sample = df.filter($"key" === 0).limit(1000)
        val a = graft.operators.Postprocess
          .slidingMedian(sample, $"key", Seq($"ts"), $"value", k)
          .orderBy("ts").select("median_value").as[Double].collect().toSeq
        val b = graft.operators.Postprocess
          .slidingMedianPartitioned(sample, Seq("key"), Seq("ts"), "value", k)
          .orderBy("ts").select("median_value").as[Double].collect().toSeq
        require(a == b, s"forms disagree at k=$k: ${a.take(5)} vs ${b.take(5)}")

        // force the collect_list branch regardless of k so window_sec is
        // the composition under test even at the k=2 baseline point
        val wsec = time {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy($"key").orderBy($"ts").rowsBetween(-k, k)
          val arr = array_sort(collect_list($"value").over(w))
          val nn = size(arr)
          val mid = ((nn + lit(1)) / lit(2)).cast("int")
          val lo = (nn / lit(2)).cast("int")
          val med = when(nn % 2 === 1, element_at(arr, mid))
            .when(nn > 0,
              (element_at(arr, lo) + element_at(arr, lo + lit(1))) / 2.0)
            .otherwise(lit(null))
          df.withColumn("median_value", med)
            .write.mode("overwrite").format("noop").save()
        }
        val hsec = time {
          graft.operators.Postprocess
            .slidingMedianPartitioned(df, Seq("key"), Seq("ts"), "value", k)
            .write.mode("overwrite").format("noop").save()
        }
        val lsec =
          if (k > 8) -1.0
          else time {
            graft.operators.Postprocess
              .slidingMedian(df, $"key", Seq($"ts"), $"value", k)
              .write.mode("overwrite").format("noop").save()
          }
        val line = s"""{"n":$n,"k":$k,"window_sec":${f(wsec)},""" +
          s""""heap_sec":${f(hsec)},"laglead_sec":${f(lsec)}}"""
        println(line)
        System.err.println(line)
      }
    }
    spark.stop()
  }
}
