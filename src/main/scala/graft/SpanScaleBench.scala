package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale curve for the ExactSubstr rewrite ([[graft.ext.SpanDedup]])
  * on [[DedupScaleBench]]'s planted corpus — the deliberately hostile
  * input for this operator: every doc OPENS with one of 20 three-word
  * boilerplate runs (each opening gram has df ≈ n/20, so the covered
  * set is hit on every document), and the last 10% of docs are
  * near-copies whose grams are almost all duplicated (dense per-doc
  * covered sets). What the numbers must show at 100 TB:
  *
  *   - wall time linear in n (no knee): every stage is a keyed agg or
  *     semi-join — if a doc×doc pairing or corpus window snuck in, the
  *     near-dup tail's dense gram sharing would bend the curve;
  *   - the hot gram (500 k occurrences at n=10 M) costs a big
  *     reducer-side SEMI-JOIN partition but no fanout — occurrence
  *     rows pass through once, pairs are never formed;
  *   - removed fraction stable across n (the planted structure is
  *     size-invariant), confirming the rewrite itself is scale-blind.
  *
  * Prints one JSON line per n:
  *   {"n":…,"span_sec":…,"exchanges":…,"removed_frac":…,"out_rows":…}
  * Sizes: SPARK_GRAFT_SPAN_N (default "1000000,3000000,10000000");
  * SPARK_GRAFT_SPAN_PERSIST=0 switches to the recompute-per-branch
  * form (no occurrence cache — see the SpanDedup scaladoc for why
  * that is the memory-constrained/100 TB configuration);
  * SPARK_GRAFT_SPAN_HOT=1 plants ONE mega-boilerplate on 50% of docs
  * (the "cookie-notice on a third of the web" case): the occ→dup
  * semi-join is keyed by gram, so every occurrence of the hot gram
  * lands in one reducer partition — this leg measures whether AQE's
  * skew-split (or the sheer pass-through cheapness of a semi probe)
  * absorbs it or the operator needs a salted variant.
  */
object SpanScaleBench {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sizes = sys.env.getOrElse("SPARK_GRAFT_SPAN_N",
      "1000000,3000000,10000000").split(",").map(_.trim.toLong)
    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)

    val persistOcc = sys.env.getOrElse("SPARK_GRAFT_SPAN_PERSIST", "1") != "0"
    val hot = sys.env.getOrElse("SPARK_GRAFT_SPAN_HOT", "0") == "1"

    sizes.foreach { n =>
      val corpus = if (hot) hotCorpus(spark, n) else DedupScaleBench.corpus(spark, n)
      val out = graft.ext.SpanDedup
        .removeDuplicatedSpans(corpus, "doc_id", "text",
          persistOcc = persistOcc)
      val t0 = System.nanoTime()
      out.write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val exchanges = "Exchange hashpartitioning".r
        .findAllIn(out.queryExecution.executedPlan.toString).size
      // second action is cheap: the occurrence frame is cached
      val stats = out.agg(
        sum(col("n_removed")).cast("double").as("rm"),
        sum(col("n_tokens")).cast("double").as("tot"),
        count(lit(1)).as("rows")).head()
      Caching.release()
      spark.catalog.clearCache()
      println(s"""{"n":$n,"span_sec":${f(sec)},"exchanges":$exchanges,""" +
        s""""removed_frac":${f(stats.getDouble(0) / stats.getDouble(1))},""" +
        s""""out_rows":${stats.getLong(2)}}""")
    }
    spark.stop()
  }

  /** [[DedupScaleBench.corpus]]'s shape (30 words, 3-word boilerplate
    * opening, hash-spread tail) but HALF the corpus opens with the SAME
    * boilerplate run — the planted hot key. Deterministic in id. */
  private def hotCorpus(spark: SparkSession,
                        n: Long): org.apache.spark.sql.DataFrame = {
    val b = org.apache.spark.sql.functions.when(
      col("id") % 2 === 0, lit(0))
      .otherwise(pmod(col("id"), lit(19)) + 1)
    val words = (0 until 30).map { j =>
      if (j < 3) concat(lit("hot"), b, lit("_"), lit(j))
      else concat(lit("w"),
        pmod(xxhash64(col("id") * 37 + j), lit(50000L)))
    }
    spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", words: _*).as("text"))
  }
}
