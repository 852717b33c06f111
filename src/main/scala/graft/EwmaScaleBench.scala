package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Decides Postprocess.ewma's form with data (the same
  * measure-don't-guess protocol as MedianScaleBench for W7): the
  * shipped implementation buffers the trailing frame with
  * `collect_list.over(rowsBetween)` and folds weights per row — an
  * O(span) array allocation per row. The candidate alternative for
  * small spans is a LAG COMPOSITION: `Σ (1−α)^j·lag(v,j)` over span
  * codegen'd lag columns (no per-row buffer, same single key shuffle)
  * — the exact analogue of slidingMedian's k ≤ 8 lag/lead branch.
  *
  * Both forms are cross-checked value-equal (1e-9, association order
  * differs) on a 1 k-row key before timing. The lag leg only runs for
  * span ≤ SPARK_GRAFT_EWMA_MAX_LAG (default 32; a 100-column lag
  * projection stresses codegen for no production reason). Both forms
  * are INLINED here rather than routed through Postprocess.ewma: the
  * operator now dispatches span ≤ 16 to the lag branch this bench
  * motivated, so calling it would time lag-vs-lag at small spans.
  *
  * Prints one JSON line per (n, span):
  *   {"n":…,"span":…,"fold_sec":…,"lag_sec":…}
  * Config: SPARK_GRAFT_EWMA_N (default "10000000,30000000"),
  * SPARK_GRAFT_EWMA_SPAN (default "10,100").
  */
object EwmaScaleBench {

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

    val alpha = 0.3
    val sizes = sys.env.getOrElse("SPARK_GRAFT_EWMA_N",
      "10000000,30000000").split(",").map(_.trim.toLong)
    val spans = sys.env.getOrElse("SPARK_GRAFT_EWMA_SPAN", "10,100")
      .split(",").map(_.trim.toInt)
    val maxLag = sys.env.getOrElse("SPARK_GRAFT_EWMA_MAX_LAG", "32").toInt
    def f(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    /** lag-composition form: null lags contribute 0 to num and den. */
    def lagEwma(df: org.apache.spark.sql.DataFrame, span: Int) = {
      val w = Window.partitionBy($"key").orderBy($"ts")
      val num = (0 until span).map { j =>
        coalesce(lag($"value", j).over(w) * math.pow(1 - alpha, j), lit(0.0))
      }.reduce(_ + _)
      val den = (0 until span).map { j =>
        when(lag($"value", j).over(w).isNotNull,
          lit(math.pow(1 - alpha, j))).otherwise(lit(0.0))
      }.reduce(_ + _)
      df.withColumn("ewma", num / den)
    }

    /** collect_list fold form, INLINED (not via Postprocess.ewma): the
      * operator now dispatches span ≤ 16 to the lag branch this bench
      * motivated, so calling it would time lag-vs-lag at span 10 and
      * silently invalidate the A/B. */
    def foldEwma(df: org.apache.spark.sql.DataFrame, span: Int) = {
      val w = Window.partitionBy($"key").orderBy($"ts")
        .rowsBetween(-(span - 1), 0)
      val vals = collect_list($"value").over(w)
      val n = size(vals)
      def fold(weighted: org.apache.spark.sql.Column) =
        aggregate(weighted, lit(0.0), (acc, x) => acc + x)
      val num = fold(zip_with(vals, sequence(lit(1), n),
        (x, i) => x * pow(lit(1 - alpha), (n - i).cast("double"))))
      val den = fold(transform(sequence(lit(1), n),
        i => pow(lit(1 - alpha), (n - i).cast("double"))))
      df.withColumn("ewma", num / den)
    }

    sizes.foreach { n =>
      val keys = math.max(1L, n / 100000L)
      val df = spark.range(n).select(
        pmod($"id", lit(keys)).as("key"),
        ($"id" / lit(keys)).cast("long").as("ts"),
        (pmod(xxhash64($"id"), lit(100000L)) / 100.0).as("value"))
      df.count() // untimed input-pipeline warm-up

      spans.foreach { span =>
        val sample = df.filter($"key" === 0).limit(1000)
        val a = foldEwma(sample, span)
          .orderBy("ts").select("ewma").as[Double].collect().toSeq
        val b = lagEwma(sample, span)
          .orderBy("ts").select("ewma").as[Double].collect().toSeq
        require(a.size == b.size &&
          a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-9 },
          s"forms disagree at span=$span")

        val foldSec = time {
          foldEwma(df, span)
            .write.mode("overwrite").format("noop").save()
        }
        val lagSec =
          if (span > maxLag) -1.0
          else time {
            lagEwma(df, span).write.mode("overwrite").format("noop").save()
          }
        val line = s"""{"n":$n,"span":$span,"fold_sec":${f(foldSec)},""" +
          s""""lag_sec":${f(lagSec)}}"""
        println(line)
        System.err.println(line)
      }
    }
    spark.stop()
  }
}
