package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed-rank A/B (round 19: the q167 rewrite's receipt). The
  * r18 verdict's one scale-unsafe plan was three
  * `row_number().over(Window.partitionBy())` sorts of the per-user
  * frame — collapsed, but |users|-cardinality, i.e. a single task
  * sorting tens of GB at the 100 TB target. The replacement chains
  * three [[graft.operators.Ids.stableIds]] passes (range partition +
  * per-partition row_number + broadcast prefix offsets). This bench
  * measures both forms on the SAME three-axis frame and verifies both
  * produce the identical rank sums (Σ over 3 axes of 1..n =
  * 3·n(n+1)/2 — a wrong offset or a dropped row cannot hide).
  *
  * Prints one JSON line per n:
  *   {"n":…,"stableids_sec":…,"window_sec":…,"checksum_ok":…}
  * Sizes: SPARK_GRAFT_RANK_N (default "2000000,8000000,32000000");
  * the single-partition window leg runs only for
  * n ≤ SPARK_GRAFT_RANK_MAX_WINDOW (default 8000000) — past that the
  * point is made and the single task is just a space heater. -1 marks
  * a skipped leg.
  */
object RankScaleBench {

  /** n rows, three independent hash-scrambled axes (unique w.h.p. —
    * ties would make the two forms' tie placement incomparable). */
  def frame(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      xxhash64(col("id")).as("a"),
      xxhash64(col("id") + 1L).as("b"),
      xxhash64(col("id") + 2L).as("c"))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sizes = sys.env.getOrElse("SPARK_GRAFT_RANK_N",
      "2000000,8000000,32000000").split(",").map(_.trim.toLong)
    val maxWindow = sys.env.getOrElse("SPARK_GRAFT_RANK_MAX_WINDOW",
      "8000000").toLong

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val v = f
      ((System.nanoTime() - t0) / 1e9, v)
    }

    sizes.foreach { n =>
      val expect = 3L * n * (n + 1) / 2
      val df = frame(spark, n)
      // chained stableIds (the q167 shape): each pass re-ranges the
      // previous output, earlier rank columns ride along
      // cache teardown runs OUTSIDE both timed blocks (advisor r19
      // low #3: release/clearCache inside only the stableIds leg
      // charged teardown cost to the side the A/B vindicates) — each
      // leg times the agg action alone
      val (sSec, sSum) = time {
        import graft.operators.Ids
        val ranked = Ids.stableIds(
          Ids.stableIds(
            Ids.stableIds(df, Seq(col("a")), "ra"),
            Seq(col("b")), "rb"),
          Seq(col("c")), "rc")
        ranked
          .agg(sum(col("ra") + col("rb") + col("rc") + 3L)).head().getLong(0)
      }
      Caching.release(); spark.catalog.clearCache()
      // the pre-fix form: three unpartitioned rank windows (ONE task
      // sorts all n rows, three times)
      val (wSec, wSum) =
        if (n <= maxWindow) time {
          val wg = Window.partitionBy()
          df
            .withColumn("ra", row_number().over(wg.orderBy(col("a"))))
            .withColumn("rb", row_number().over(wg.orderBy(col("b"))))
            .withColumn("rc", row_number().over(wg.orderBy(col("c"))))
            .agg(sum(col("ra").cast("long") + col("rb") + col("rc")))
            .head().getLong(0)
        } else (-1.0, expect)
      spark.catalog.clearCache()
      val ok = sSum == expect && wSum == expect
      println(s"""{"n":$n,"stableids_sec":${"%.3f".formatLocal(
        java.util.Locale.ROOT, sSec)},"window_sec":${"%.3f".formatLocal(
        java.util.Locale.ROOT, wSec)},"checksum_ok":$ok}""")
      require(ok, s"rank checksum mismatch at n=$n: " +
        s"stableIds=$sSum window=$wSum expect=$expect")
    }
    spark.stop()
  }
}
