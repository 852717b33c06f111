package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup-family scale datapoints (round-8 verdict #4): synthesizes an
  * n-doc corpus with PLANTED near-duplicates and boilerplate, then
  * measures CANDIDATE-PAIR counts — the quantity whose growth decides
  * 100 TB viability — and wall time for the three near-dup shapes:
  *
  *   - banded MinHash candidates (the q24 shape: native signature,
  *     band explode, bucket self-join);
  *   - PPJoin prefix-filtered Jaccard candidates (the q26 shape);
  *   - connected-components cluster assignment over the candidate
  *     graph (the q53 shape), FORCED onto the distributed
  *     large/small-star path so the contraction rounds are what's
  *     being timed.
  *
  * The corpus is deterministic in `id` (no RNG — repeatable counts):
  * 30 words/doc; the last 10% of docs copy a partner doc with one
  * word substituted (planted high-jaccard pairs, ~n/10 of them);
  * every doc OPENS with one of 20 three-word boilerplate runs, so
  * each opening shingle has df ≈ n/20 — the candidate-growth
  * stressor the PPJoin prefix filter must keep out of prefixes;
  * remaining words hash-spread over a 50k vocabulary.
  *
  * Prints one JSON line per n:
  *   {"n":…,"all_pairs":…,"minhash_cands":…,"minhash_sec":…,
  *    "jaccard_cands":…,"jaccard_sec":…,"cc_clusters":…,"cc_sec":…}
  * Sizes: SPARK_GRAFT_DEDUP_N (comma-separated, default
  * "30000,100000,300000,1000000"); the PPJoin leg runs only for
  * n ≤ SPARK_GRAFT_DEDUP_MAX_JACC (default 1000000) — its shingle
  * window is the expensive part at local scale.
  */
object DedupScaleBench {

  /** 30 deterministic words for doc `id` of an n-doc corpus. */
  private def textExpr(n: Long) = {
    val dupStart = n - n / 10 // last 10% are near-dups of earlier docs
    val base = when(col("id") >= dupStart, col("id") - (n / 2))
      .otherwise(col("id"))
    val words = (0 until 30).map { j =>
      val drawn =
        if (j < 3) // 3-word boilerplate run: opening shingle df ≈ n/20
          concat(lit("hot"), pmod(base, lit(20)), lit("_"), lit(j))
        else
          concat(lit("w"), pmod(xxhash64(base * 37 + j), lit(50000L)))
      // the near-dup mutation: one substituted word keeps jaccard high
      if (j == 13) when(col("id") >= dupStart, concat(lit("mut"), col("id")))
        .otherwise(drawn)
      else drawn
    }
    concat_ws(" ", words: _*)
  }

  /** Public: the sublinear-candidates spec reuses the same generator. */
  def corpus(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("doc_id"), textExpr(n).as("text"))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)
    import spark.implicits._

    val sizes = sys.env.getOrElse("SPARK_GRAFT_DEDUP_N",
      "30000,100000,300000,1000000").split(",").map(_.trim.toLong)
    val maxJacc = sys.env.getOrElse("SPARK_GRAFT_DEDUP_MAX_JACC", "1000000").toLong
    def f(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)

    sizes.foreach { n =>
      val docs = corpus(spark, n)

      // ---- q24 shape: banded MinHash candidates ----
      var t0 = System.nanoTime()
      val sig = graft.Caching.persisted(docs
        .select($"doc_id", expr("graft_minhash_sig(text)").as("__s"))
        .filter($"__s".isNotNull)
        .select($"doc_id" +:
          (0 until graft.ext.TextOps.NumHashes)
            .map(j => $"__s.m"(j).as(s"m$j")): _*)
        .repartition($"doc_id"))
      val bands = sig
        .select($"doc_id", explode(graft.ext.TextOps.bandStructs).as("band"))
        .select($"doc_id", $"band.bi".as("bi"), $"band.bk".as("bk"))
      val minhashCands = bands.as("a")
        .join(bands.as("b"),
          col("a.bi") === col("b.bi") && col("a.bk") === col("b.bk") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .distinct()
      val pairs = graft.Caching.persisted(minhashCands)
      val nMinhash = pairs.count()
      val tMinhash = (System.nanoTime() - t0) / 1e9

      // ---- q53 shape: cluster assignment, distributed star path ----
      t0 = System.nanoTime()
      val nClusters = graft.ext.DedupClusters
        .connectedComponents(docs, "doc_id", pairs, driverMaxEdges = 0)
        .select(countDistinct(col("cluster_rep"))).as[Long].head()
      val tCc = (System.nanoTime() - t0) / 1e9

      // ---- q26 shape: PPJoin prefix candidates ----
      val (nJacc, tJacc) =
        if (n <= maxJacc) {
          t0 = System.nanoTime()
          val sets = graft.ext.TextOps.shingleSets(docs, "doc_id", "text",
            graft.ext.TextOps.ShingleK)
          val c = graft.ext.TextOps.prefixCandidates(sets, "doc_id", 8, 10, None)
            .count()
          (c, (System.nanoTime() - t0) / 1e9)
        } else (-1L, -1.0)

      graft.Caching.release()
      spark.catalog.clearCache()
      val line =
        s"""{"n":$n,"all_pairs":${n * (n - 1) / 2},""" +
          s""""minhash_cands":$nMinhash,"minhash_sec":${f(tMinhash)},""" +
          s""""jaccard_cands":$nJacc,"jaccard_sec":${f(tJacc)},""" +
          s""""cc_clusters":$nClusters,"cc_sec":${f(tCc)}}"""
      println(line)
      System.err.println(line)
    }
    spark.stop()
  }
}
