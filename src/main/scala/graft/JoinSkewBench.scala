package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Planted-hot-key SKEW-JOIN measurement — the join-side complement of
  * SkewScaleBench. Aggregations survive a 50 %-hot key because partial
  * aggregation collapses it map-side (measured, SCALE.md round 16); a
  * sort-merge JOIN has no such algebra — every hot-key row shuffles raw
  * into ONE task's sort, and the only rescue is AQE's
  * OptimizeSkewedJoin splitting the oversized partition at runtime
  * (duplicating the matching build-side partition). This bench plants
  * the pathology (key 0 owns 50 % of the probe side), forces SMJ (the
  * build side is "beyond broadcast" as it would be at 100 TB), and
  * times the SAME join with AQE skew-join on vs off.
  *
  * Thresholds: the defaults trigger at 256 MB partitions — real at
  * 100 TB, unreachable in a local bench — so the bench scales them
  * down (16 MB skew threshold / 8 MB advisory) exactly as a 100 TB
  * deployment leaves them at defaults. The skew-off leg is the same
  * conf minus the skew-join rule, so the A/B isolates the one
  * mechanism.
  *
  * Prints one JSON line per n:
  *   {"n":…,"hot_rows":…,"skew_on_sec":…,"skew_off_sec":…,
  *    "skew_handled":true/false}
  * Sizes: SPARK_GRAFT_JOINSKEW_N (default "10000000,30000000").
  */
object JoinSkewBench {
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

    val sizes = sys.env.getOrElse("SPARK_GRAFT_JOINSKEW_N",
      "10000000,30000000").split(",").map(_.trim.toLong)
    def f(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)

    // the probe side carries a ~96-byte INCOMPRESSIBLE payload (hex of
    // three md5s): shuffle blocks are lz4'd, and a padded constant
    // payload compresses so well the hot partition never crosses the
    // skew byte threshold (measured: "coalesced", never "skewed")
    def probe(n: Long) = spark.range(n).select(
      when(pmod($"id", lit(2)) === 0, lit(0L))
        .otherwise(pmod($"id", lit(100000L)) + 1).as("k"),
      concat(md5($"id".cast("string")), md5(($"id" + 1).cast("string")),
        md5(($"id" + 2).cast("string"))).as("payload"))
    // build side: every key once — small, but FORCED non-broadcast
    // (at 100 TB the build side does not broadcast either)
    def build = spark.range(100001L).select($"id".as("k"),
      pmod($"id" * 31, lit(1000L)).as("w"))

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")

    // materialize the probe side once per n: at 30M the payload
    // generation (90M md5s) dominates both legs and masks the join
    // delta — the A/B must time the JOIN, as a real pipeline joining
    // already-landed data would
    def materialize(n: Long): String = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_joinskew_$n").toString
      probe(n).write.mode("overwrite").parquet(dir)
      dir
    }
    def deleteRec(p: java.io.File): Unit = {
      Option(p.listFiles()).foreach(_.foreach(deleteRec))
      p.delete(): Unit
    }

    def run(skewOn: Boolean, dir: String): (Double, Boolean) = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn)
      val df = spark.read.parquet(dir).join(build, Seq("k"))
        .select(sum(length($"payload") + $"w").as("s"))
      val t0 = System.nanoTime()
      df.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val planStr = df.queryExecution.executedPlan.toString
      val handled = planStr.contains("skew=true") || planStr.contains("skewed")
      if (sys.env.contains("SPARK_GRAFT_JOINSKEW_DEBUG"))
        System.err.println(planStr.split("== Initial Plan ==")(0))
      (sec, handled)
    }

    sizes.foreach { n =>
      val dir = materialize(n)
      try {
        // warm-up (JIT + codegen), untimed
        run(skewOn = true, dir)
        val (onSec, handled) = run(skewOn = true, dir)
        val (offSec, _) = run(skewOn = false, dir)
        val line = s"""{"n":$n,"hot_rows":${n / 2},""" +
          s""""skew_on_sec":${f(onSec)},"skew_off_sec":${f(offSec)},""" +
          s""""skew_handled":$handled}"""
        println(line)
        System.err.println(line)
      } finally deleteRec(new java.io.File(dir)) // multi-GB, incompressible
    }
    spark.stop()
  }
}
