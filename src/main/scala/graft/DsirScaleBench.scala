package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** DSIR importance-weighting scale curve (ext/Dsir.scala): the q99
  * operator on DedupScaleBench's generated corpus at sizes the fixture
  * tables can't reach. Two claims to verify with numbers, not plan
  * reading:
  *   1. the model pass cost (gram stream → B-row bucket model) and the
  *      full scoring pass both scale linearly — no knee from the
  *      doc-keyed shuffle, no corpus-sized persist anywhere;
  *   2. the wide footprint stays fixed as n grows: ONE raw-sized
  *      doc-keyed exchange in the scoring pass + the B-row model agg,
  *      regardless of corpus size (exchange count read off the plan
  *      actually built at each n).
  * Target slice: doc_id % 10 == 0 (10% "curated"), matching DSIR's
  * small-target/large-raw regime.
  *
  * Prints one JSON line per n:
  *   {"n":…,"model_sec":…,"full_sec":…,"exchanges":…,"out_rows":…}
  * Sizes: SPARK_GRAFT_DSIR_N (comma-separated, default
  * "3000000,10000000,30000000").
  */
object DsirScaleBench {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sizes = sys.env.getOrElse("SPARK_GRAFT_DSIR_N",
      "3000000,10000000,30000000").split(",").map(_.trim.toLong)
    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)

    sizes.foreach { n =>
      val docs = DedupScaleBench.corpus(spark, n)
      val isTarget = col("doc_id") % 10 === 0
      // model pass alone: feature explode → B-row agg (the frame the
      // scoring pass broadcasts)
      var t0 = System.nanoTime()
      graft.ext.Dsir.featureRows(docs, "doc_id", "text", isTarget, 1024)
        .groupBy(col("__bucket"))
        .agg(sum(when(col("__tgt"), 1L).otherwise(0L)).as("ct"),
          sum(when(col("__tgt"), 0L).otherwise(1L)).as("cr"))
        .write.mode("overwrite").format("noop").save()
      val modelSec = (System.nanoTime() - t0) / 1e9
      // full operator: model + broadcast + doc-keyed scoring
      val weights = graft.ext.Dsir.importanceWeights(docs, "doc_id",
        "text", isTarget, buckets = 1024, salt = "bench")
      t0 = System.nanoTime()
      weights.write.mode("overwrite").format("noop").save()
      val fullSec = (System.nanoTime() - t0) / 1e9
      val exchanges = "Exchange hashpartitioning".r
        .findAllIn(weights.queryExecution.executedPlan.toString).size
      val outRows = weights.count()
      val line = s"""{"n":$n,"model_sec":${f(modelSec)},""" +
        s""""full_sec":${f(fullSec)},"exchanges":$exchanges,""" +
        s""""out_rows":$outRows}"""
      println(line)
      System.err.println(line)
    }
    spark.stop()
  }
}
