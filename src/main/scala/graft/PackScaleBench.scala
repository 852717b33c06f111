package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Size-vs-time curves for the five most composed pack queries
  * (r19 verdict #2): q99 (DSIR importance weights), q175 (containment
  * pairs), q49 (tensor windows), q86 (line dedup), q101 (gap fill) —
  * the queries whose scale stories had plan arguments but no measured
  * exponent. q167 got this treatment in round 19 (RankScaleBench);
  * this bench covers the rest by replicating the sf0.1 tables ×4/×16
  * with DISTINCT keys and timing the EXACT production entry points
  * (`SparkEntry.queries`) against each scaled directory.
  *
  * Replication (the DedupScaleBench planted-key discipline — scale the
  * data, not the duplicate structure):
  *   - DOCUMENT keys offset per copy (doc_id +r·10⁷) so nothing
  *     collides across copies; EVENTS replicate along TIME instead:
  *     copy r appends the same span of activity one span later for the
  *     SAME users (user_id unchanged — ×r the rows per user series,
  *     the axis that stresses q101/q49's per-key operators; a key
  *     offset would leave those workloads at ×1), with only event_id
  *     offset (+r·10⁹) to stay a unique key;
  *   - document TEXT is word-wise salted per copy (`c<r><word>`) —
  *     a bijective token map per copy, so within-copy duplicate lines
  *     (q86), shingle dfs (q175's anchor df ∈ [2,10] cap) and n-gram
  *     profiles (q99) keep their per-copy structure while nothing is
  *     content-equal ACROSS copies. A naive text-identical replication
  *     would multiply every shingle df by the factor and silently
  *     change the q175 workload (df-capped anchors vanish) — the curve
  *     would measure a different query per point.
  *
  * Prints one JSON line per (query, scale) and a final exponents line:
  * e = least-squares slope of ln t vs ln scale — e ≈ 1 linear,
  * > ~1.3 superlinear (investigate), < 1 fixed-cost-dominated.
  * Sizes: SPARK_GRAFT_PACK_SCALES (default "1,4,16");
  * SPARK_GRAFT_PACK_ONLY filters queries by prefix;
  * SPARK_GRAFT_PACK_ITERS timed iterations (default 3, median).
  */
object PackScaleBench {

  private val Queries = Seq("q99_dsir_weights", "q175_containment_pairs",
    "q49_tensor_windows", "q86_line_dedup", "q101_gap_fill")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def f(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)

    val scales = sys.env.getOrElse("SPARK_GRAFT_PACK_SCALES", "1,4,16")
      .split(",").map(_.trim.toInt)
    val iters = sys.env.getOrElse("SPARK_GRAFT_PACK_ITERS", "3").toInt
    val only = sys.env.get("SPARK_GRAFT_PACK_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val queries = Queries.filter(q => only.forall(_.exists(q.startsWith)))

    val out = java.nio.file.Files.createTempDirectory("graft_pack").toString
    val dirs: Map[Int, String] = scales.map { r =>
      r -> (if (r == 1) sfDir else buildScaled(spark, sfDir, r, s"$out/x$r"))
    }.toMap

    def runOnce(name: String, dir: String): (Double, Long) = {
      Caching.release(); spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).collect().length.toLong
      ((System.nanoTime() - t0) / 1e9, n)
    }

    val times = scala.collection.mutable.Map[(String, Int), Double]()
    queries.foreach { q =>
      scales.foreach { r =>
        runOnce(q, dirs(r)) // warm-up (JIT + file listing), untimed
        val samples = (1 to iters).map(_ => runOnce(q, dirs(r)))
        val med = samples.map(_._1).sorted.apply(iters / 2)
        times((q, r)) = med
        println(s"""{"metric":"pack_scale","q":"$q","scale":$r,""" +
          s""""rows":${samples.head._2},"sec":${f(med)},""" +
          s""""spread":[${f(samples.map(_._1).min)},${f(samples.map(_._1).max)}]}""")
      }
    }
    // least-squares slope of ln t over ln scale
    val exps = queries.map { q =>
      val pts = scales.map(r => (math.log(r.toDouble), math.log(times((q, r)))))
      val n = pts.length
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val e = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      s""""$q":${f(e)}"""
    }
    println(s"""{"metric":"pack_scale_exponents","scales":[${scales.mkString(",")}],${exps.mkString(",")}}""")
    spark.stop()
  }

  /** Replicate documents + events ×r into `out` (other tables symlink
    * to the flat copy — the five queries only read these two). */
  def buildScaled(spark: SparkSession, sfDir: String, r: Int,
                  out: String): String = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    val reps = explode(sequence(lit(0L), lit(r - 1L))).as("__r")
    val docs = Tables.documents(spark, sfDir)
    docs.select(reps, col("*"))
      .select((col("doc_id") + col("__r") * 10000000L).as("doc_id"),
        when(col("__r") === 0, col("text")).otherwise(
          concat_ws(" ", transform(split(col("text"), "\\s+"),
            w => concat(lit("c"), col("__r").cast("string"), w)))).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    // events replicate along TIME, not keys: copy r appends the same
    // month of activity one span later for the SAME users — ×r the
    // rows per user series, which is the axis that actually stresses
    // the per-key series operators under test (q101's user<50 slice
    // and q49's per-channel windows grow ×r; a key-offset replication
    // would leave both workloads at ×1 and the curve would measure
    // nothing). event_id still offsets (stays a unique key).
    val events = Tables.events(spark, sfDir)
    val spanUs = events.agg((max(unix_micros(col("ts"))) -
      min(unix_micros(col("ts"))) + 3600L * 1000000L)).head().getLong(0)
    events.select(reps, col("*"))
      .select((col("event_id") + col("__r") * 1000000000L).as("event_id"),
        timestamp_micros(unix_micros(col("ts")) + col("__r") * spanUs)
          .as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    Seq("embeddings", "lineitem", "orders", "customer", "part",
      "supplier", "nation", "region").foreach { name =>
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(s"$out/$name.parquet"),
        java.nio.file.Paths.get(s"$sfDir/$name.parquet"))
    }
    out
  }
}
