package graft

import graft.operators.Layout
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The COST side of the Z-order trade. ZOrderSpec measures the read
  * benefit (every clustered column bounded, conjunctive boxes pruned
  * multiplicatively); this bench measures what the writer pays for it,
  * per row count:
  *
  *   - `fit_sec`    — Layout.cutPoints: ONE approxQuantile pass over
  *                    both dimensions (the bounded driver collect);
  *   - `linear_sec` — baseline clustered write: repartitionByRange +
  *                    sortWithinPartitions on ONE column (the classic
  *                    time-series ingest shape, Container's layout);
  *   - `zorder_sec` — Layout.zorderWrite: same range + sort machinery
  *                    on the interleaved key (adds the key projection
  *                    and the curve's different sort order, nothing
  *                    else — shuffle count identical).
  *
  * Both writes produce the same file count from identical input; the
  * delta is the whole price of multi-column prunability. Parquet
  * timestamp/stats behavior is irrelevant here (int columns), so this
  * isolates compute: key evaluation + sort. Output: one JSON line per
  * n — {"n":…,"fit_sec":…,"linear_sec":…,"zorder_sec":…}.
  * Config: SPARK_GRAFT_LAYOUT_N (default "3000000,10000000"),
  * SPARK_GRAFT_LAYOUT_FILES (default 32).
  */
object LayoutBench {

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
    graft.plans.GraftExtensions.register(spark)

    val sizes = sys.env.getOrElse("SPARK_GRAFT_LAYOUT_N",
      "3000000,10000000").split(",").map(_.trim.toLong)
    val numFiles = sys.env.getOrElse("SPARK_GRAFT_LAYOUT_FILES", "32").toInt
    def f(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    sizes.foreach { n =>
      val base = java.nio.file.Files
        .createTempDirectory(s"graft_layout_$n").toString
      val rows = spark.range(n).select(
        $"id".as("event_id"),
        pmod($"id", lit(100000)).cast("int").as("x"),
        pmod(hash($"id"), lit(100000)).cast("int").as("y"))
      rows.write.parquet(s"$base/src") // materialize once, cold for both legs
      val src = spark.read.parquet(s"$base/src")

      // untimed warm-up of the write path (JIT, committers)
      src.limit(10000).write.mode("overwrite").parquet(s"$base/warm")

      val fitSec = time {
        Layout.cutPoints(src, Seq("x", "y"), buckets = 64)
      }
      val cuts = Layout.cutPoints(src, Seq("x", "y"), buckets = 64)

      val linearSec = time {
        src.repartitionByRange(numFiles, col("x"))
          .sortWithinPartitions(col("x"), col("y"))
          .write.mode("overwrite").parquet(s"$base/linear")
      }
      val zorderSec = time {
        Layout.zorderWrite(src,
          Seq(col("x") -> cuts("x"), col("y") -> cuts("y")),
          numFiles = numFiles, path = s"$base/zorder")
      }
      // same rows in both layouts
      val a = spark.read.parquet(s"$base/linear").count()
      val b = spark.read.parquet(s"$base/zorder").count()
      require(a == n && b == n, s"row loss: linear=$a zorder=$b n=$n")

      println(s"""{"n":$n,"fit_sec":${f(fitSec)},"linear_sec":${f(linearSec)},"zorder_sec":${f(zorderSec)}}""")

      // clean up the temp tree (tens of GB at the large sizes)
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles()).foreach(_.foreach(rm)); p.delete()
      }
      rm(new java.io.File(base))
    }
    spark.stop()
  }
}
