package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale measurement for the FastSS edit-distance-1 join
  * (`ext/FuzzyJoin.ed1Pairs`): the operator's cost is variant-key-local
  * (Σ(L+1) keys, never all-pairs), so wall time should grow linearly in
  * the DISTINCT-string count — and the scaladoc's hot-variant caveat
  * ("collapse exact duplicates first") should be visible as a
  * super-linear raw-corpus leg.
  *
  * Corpus (deterministic in id, no RNG): n rows drawn from a pool of
  * n/20 distinct ~12-char strings (≈20 copies each — the "product
  * catalog with repeated names" shape); every 10th row is a single-char
  * deletion mutant of its string, so qualifying ED-1 pairs exist at
  * every scale.
  *
  * Legs per n:
  *   - `collapsed_sec`: collapse to distinct strings (min-id rep),
  *     then ed1Pairs — the recommended composition (q106's shape).
  *   - `raw_sec`: ed1Pairs straight on the duplicated corpus — the m²
  *     hot-variant blow-up; only run for n ≤ SPARK_GRAFT_FUZZY_MAX_RAW
  *     (default 1000000). -1 marks a skipped leg.
  *
  * Prints one JSON line per n:
  *   {"n":…,"distinct_strs":…,"collapsed_sec":…,"pairs":…,
  *    "raw_sec":…,"raw_pairs":…}
  * Sizes: SPARK_GRAFT_FUZZY_N (default "1000000,3000000,10000000").
  */
object FuzzyScaleBench {

  /** n rows over an n/20-value pool; every 10th row mutates (deletes
    * one char keyed on id). */
  def corpus(spark: SparkSession, n: Long): DataFrame = {
    val pool = math.max(n / 20, 1L)
    val v = pmod(xxhash64(col("id") * 31 + 7), lit(pool))
    val base = concat(lit("w"), lpad(v.cast("string"), 7, "0"),
      lit("x"), lpad(pmod(v * 13, lit(9973)).cast("string"), 4, "0"))
    val pos = (pmod(col("id"), length(base) - 1) + 1).cast("int")
    spark.range(n).select(
      col("id"),
      when(pmod(col("id"), lit(10)) === 0,
        concat(base.substr(lit(1), pos - 1),
          base.substr(pos + 1, length(base) - pos)))
        .otherwise(base).as("s"))
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

    val sizes = sys.env.getOrElse("SPARK_GRAFT_FUZZY_N",
      "1000000,3000000,10000000").split(",").map(_.trim.toLong)
    val maxRaw =
      sys.env.getOrElse("SPARK_GRAFT_FUZZY_MAX_RAW", "1000000").toLong
    def f(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def time(body: => Unit): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min

    sizes.foreach { n =>
      val c = corpus(spark, n)
      c.count() // warm the generate pipeline untimed

      val rep = c.groupBy($"s").agg(min($"id").as("id"))
      val distinctStrs = rep.count()
      var pairs = -1L
      val collapsedSec = time {
        pairs = graft.ext.FuzzyJoin.ed1Pairs(rep, "id", "s").count()
      }

      var rawPairs = -1L
      val rawSec =
        if (n > maxRaw) -1.0
        else time {
          rawPairs = graft.ext.FuzzyJoin.ed1Pairs(c, "id", "s").count()
        }

      println(s"""{"n":$n,"distinct_strs":$distinctStrs,""" +
        s""""collapsed_sec":${f(collapsedSec)},"pairs":$pairs,""" +
        s""""raw_sec":${f(rawSec)},"raw_pairs":$rawPairs}""")
    }
    spark.stop()
  }
}
