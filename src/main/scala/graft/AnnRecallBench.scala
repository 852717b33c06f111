package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN quality datapoints: recall@k of the approximate similarity-search
  * paths against the brute-force ground truth, on the REAL embeddings
  * table — the number a user choosing between q27/q28/q82/q50 actually
  * needs (correctness oracles pin that each path computes what it
  * promises; this measures how much of the true neighborhood the
  * approximations keep, and at what candidate volume):
  *
  *   - LSH, exact bucket (the q28 shape);
  *   - LSH, multi-probe Hamming-1 (the q82 shape — the recall lever);
  *   - IVF with fitted centroids at nprobe = 1, 2, 4 (the q50 shape).
  *
  * For each method: recall@k averaged over the query set, plus the
  * scanned-candidate fraction (scored pairs / brute-force pairs) — the
  * recall-vs-cost trade that decides ANN viability at 100 TB, where
  * the fraction IS the cost. Prints one JSON line.
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  * SPARK_GRAFT_ANN_K (default 10), SPARK_GRAFT_ANN_QUERIES (default
  * 50), SPARK_GRAFT_ANN_CELLS (default 16; 0 skips the IVF leg),
  * SPARK_GRAFT_ANN_PLANES (default 4 — the LSH bucket-granularity
  * knob), SPARK_GRAFT_ANN_TABLES (comma list of OR-construction table
  * counts to sweep, e.g. "1,2,4"; empty skips the leg — all counts
  * slice ONE shared Lmax bucketing pass), SPARK_GRAFT_ANN_N (> 0
  * swaps the embeddings table for a synthetic clustered corpus of
  * that many vectors — the ≥1M-vector operating-point measurements —
  * with SPARK_GRAFT_ANN_DIM / _CENTERS / _NOISE shaping it),
  * SPARK_GRAFT_ANN_SQ8=1 (adds the int8 asymmetric-distance full-rank
  * leg — recall loss from quantization alone, ext/Quantize; combined
  * with SPARK_GRAFT_ANN_TABLES it also measures the FULL stack:
  * SQ8-decoded corpus ranked inside the composed Lmax-table ×
  * margin-T index).
  */
object AnnRecallBench {

  /** Deterministic clustered corpus: `n` vectors of `dim` dims in
    * `nCenters` clusters — vector = its center + `noise` × jitter,
    * every coordinate a pure xxhash64 expression in (cluster | vec)
    * id, so the corpus is repeatable, generated fully distributed
    * (spark.range → per-row map; no driver data, no joins) and has
    * REAL neighbor structure: same-cluster vectors are near, recall
    * against brute force is a meaningful number (an i.i.d.-uniform
    * corpus has no neighbors to find at any index granularity). */
  def syntheticEmbeddings(spark: SparkSession, n: Long, dim: Int,
                          nCenters: Int, noise: Double): DataFrame = {
    def u(cols: Column*): Column = // pseudo-uniform in [-1, 1]
      pmod(xxhash64(cols: _*), lit(2000001L)).cast("double") / 1e6 - 1.0
    val center = pmod(xxhash64(lit("assign"), col("id")), lit(nCenters.toLong))
    spark.range(n).select(
      col("id").as("vec_id"),
      array((0 until dim).map(i =>
        u(lit("c"), center, lit(i)) + lit(noise) * u(lit("v"), col("id"), lit(i))): _*)
        .as("emb"))
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
    graft.plans.GraftExtensions.register(spark)
    import spark.implicits._
    import graft.ext.TextOps.{topKPerGroup, withLshBucketMargins,
      lshProbeBuckets, lshProbeBucketsByMargin, cosine, l2norm}

    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = sys.env.getOrElse("SPARK_GRAFT_ANN_K", "10").toInt
    val nQ = sys.env.getOrElse("SPARK_GRAFT_ANN_QUERIES", "50").toLong
    val kCells = sys.env.getOrElse("SPARK_GRAFT_ANN_CELLS", "16").toInt
    val planes = sys.env.getOrElse("SPARK_GRAFT_ANN_PLANES",
      graft.ext.TextOps.LshPlanes.toString).toInt
    val tablesList = sys.env.getOrElse("SPARK_GRAFT_ANN_TABLES", "")
      .split(",").filter(_.nonEmpty).map(_.toInt).toSeq.distinct.sorted
    val nSyn = sys.env.getOrElse("SPARK_GRAFT_ANN_N", "0").toLong

    val base =
      if (nSyn > 0) syntheticEmbeddings(spark, nSyn,
        dim = sys.env.getOrElse("SPARK_GRAFT_ANN_DIM", "32").toInt,
        nCenters = sys.env.getOrElse("SPARK_GRAFT_ANN_CENTERS",
          math.max(nSyn / 500, 2L).toString).toInt,
        noise = sys.env.getOrElse("SPARK_GRAFT_ANN_NOISE", "0.35").toDouble)
      else Tables.embeddings(spark, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("emb"))

    // margins ride along the same grouped sums (no extra pass); only
    // the query side reads them — for the margin-ordered probe rows
    val e = Caching.persisted(withLshBucketMargins(
      base.withColumn("nrm", l2norm($"emb")),
      "vec_id", "emb", planes = planes))
    val n = e.count()
    val qvec = e.filter($"vec_id" < nQ)
      .select($"vec_id".as("query_id"), $"emb".as("qemb"),
        $"nrm".as("qnrm"), $"bucket".as("qbucket"), $"margins".as("qmargins"))

    /** (recall@k vs `truth`, scanned-pair fraction) of a scored frame
      * with columns (query_id, neighbor_id, cos). Persisted: the frame
      * is acted on twice (count + top-k), and the join behind it would
      * otherwise recompute every cosine both times. */
    def measure(scoredIn: DataFrame,
                truth: Map[Long, Set[Long]]): (Double, Double) = {
      val scored = Caching.persisted(scoredIn)
      val cands = scored.count()
      val top = topKPerGroup(scored.distinct(), Seq("query_id"),
          col("cos"), col("neighbor_id"), k)
        .select($"query_id", $"id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
      val recall = truth.map { case (q, t) =>
        top.getOrElse(q, Set.empty[Long]).count(t).toDouble / t.size
      }.sum / truth.size
      (recall, cands.toDouble / (nQ * (n - 1)))
    }

    // ground truth: brute force (the q27 shape at k)
    val bruteScored = e.join(broadcast(qvec.drop("qbucket", "qmargins")),
        $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        cosine($"emb", $"qemb", $"nrm", $"qnrm").as("cos"))
    val truth = topKPerGroup(bruteScored, Seq("query_id"),
        col("cos"), col("neighbor_id"), k)
      .select($"query_id", $"id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }

    // LSH, exact bucket (q28)
    val (rLsh, fLsh) = measure(
      e.join(broadcast(qvec),
          $"bucket" === $"qbucket" && $"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id".as("neighbor_id"),
          cosine($"emb", $"qemb", $"nrm", $"qnrm").as("cos")),
      truth)

    // LSH, multi-probe Hamming-1 (q82): the full ball, planes+1 probes
    val probesQ = qvec.select($"query_id", $"qemb", $"qnrm",
      explode(lshProbeBuckets($"qbucket", planes)).as("pbucket"))
    val (rMp, fMp) = measure(
      e.join(broadcast(probesQ),
          $"bucket" === $"pbucket" && $"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id".as("neighbor_id"),
          cosine($"emb", $"qemb", $"nrm", $"qnrm").as("cos")),
      truth)

    // LSH, margin-ORDERED multi-probe (Lv et al. probe sequence): only
    // the T most doubtful planes flip — the curve that matters at
    // 20-30 planes, where the full ball is 21-31 probes
    val tProbes = Seq(1, planes / 2, planes)
      .filter(_ >= 1).distinct.sorted
    val mpMargin = tProbes.map { t =>
      val pq = qvec.select($"query_id", $"qemb", $"qnrm",
        explode(lshProbeBucketsByMargin($"qbucket", $"qmargins", t))
          .as("pbucket"))
      val (r, f) = measure(
        e.join(broadcast(pq),
            $"bucket" === $"pbucket" && $"vec_id" =!= $"query_id")
          .select($"query_id", $"vec_id".as("neighbor_id"),
            cosine($"emb", $"qemb", $"nrm", $"qnrm").as("cos")),
        truth)
      (t, r, f)
    }

    // OR-construction multi-table LSH (the q84 shape): ONE bucketing
    // pass at Lmax tables; each smaller L measures on a slice of the
    // same buckets array (table seeds are per-table, so L's tables are
    // exactly the first L of Lmax's — no re-bucketing per point)
    val etOpt = if (tablesList.isEmpty) None
    else Some(Caching.persisted(graft.ext.TextOps.withLshBucketTables(
      base.withColumn("nrm", l2norm($"emb")),
      "vec_id", "emb", planes = planes, tables = tablesList.max,
      marginsCol = Some("tmargins"))))
    val (multi, multiMargin) = if (etOpt.isEmpty) (Nil, Nil) else {
      val lMax = tablesList.max
      val et = etOpt.get
      def run(l: Int, probeQ: DataFrame): (Double, Double) = {
        val corpus = et.select($"vec_id", $"emb", $"nrm",
          explode(slice($"buckets", 1, l)).as("bucket"))
        measure(
          corpus.join(broadcast(probeQ),
              $"bucket" === $"qbucket" && $"vec_id" =!= $"query_id")
            .select($"query_id", $"vec_id".as("neighbor_id"),
              cosine($"emb", $"qemb", $"nrm", $"qnrm").as("cos")),
          truth)
      }
      val exact = tablesList.map { l =>
        val (r, f) = run(l, et.filter($"vec_id" < nQ)
          .select($"vec_id".as("query_id"), $"emb".as("qemb"),
            $"nrm".as("qnrm"), explode(slice($"buckets", 1, l)).as("qbucket")))
        (l, r, f)
      }
      // the two levers COMPOSED: within each of the L tables, probe the
      // T = planes/2 most doubtful margin-ordered flips — query-side
      // fan-out L × (T + 1) keys, corpus unchanged
      val tHalf = math.max(planes / 2, 1)
      val composed = tablesList.map { l =>
        val (r, f) = run(l, et.filter($"vec_id" < nQ)
          .select($"vec_id".as("query_id"), $"emb".as("qemb"),
            $"nrm".as("qnrm"),
            explode(graft.ext.TextOps.lshProbeTablesByMargin(
              slice($"buckets", 1, l), slice($"tmargins", 1, l), tHalf))
              .as("qbucket")))
        (l, tHalf, r, f)
      }
      (exact, composed)
    }

    // IVF (q50 shape) through the library API knob
    // (VectorKMeans.ivfCandidates, round 10): fitted cells, probe
    // nprobe nearest cells. The corpus-wide cell assignment is
    // computed ONCE and shared across the sweep (ivfAssign's contract);
    // nprobe clamps to the cell count so a small SPARK_GRAFT_ANN_CELLS
    // degrades to exact search instead of tripping the API validation
    val ivf = if (kCells <= 0) Nil else {
      val model = graft.ext.VectorKMeans.fit(e.select($"vec_id", $"emb"),
        "vec_id", "emb", k = kCells, iters = 2)
      val cells = Caching.persisted(graft.ext.VectorKMeans.ivfAssign(
        e, "vec_id", "emb", "nrm", model))
      Seq(1, 2, 4).map(p => math.min(p, kCells)).distinct.map { p =>
        val (r, f) = measure(
          graft.ext.VectorKMeans.ivfCandidates(e, "vec_id", "emb", "nrm",
            model, $"vec_id" < nQ, nprobe = p, cells = Some(cells)),
          truth)
        (p, r, f)
      }
    }

    // SQ8 asymmetric-distance ranking (ext/Quantize, the q87 shape):
    // rank the WHOLE corpus by float-query x decoded-int8-corpus
    // cosine, so the recall gap vs `truth` is purely the quantization
    // error (cand_frac reads 1.0 by construction). The number that
    // justifies the 4x index-memory saving at the 100 TB operating
    // point — and SQ8 composes with any bucketing leg above.
    val sq8 = if (!sys.env.get("SPARK_GRAFT_ANN_SQ8").contains("1")) None
    else {
      val encoded = graft.ext.Quantize.sq8Encode(
        e.select($"vec_id", $"emb"), "emb")
      val rec = encoded.select($"vec_id",
          graft.ext.Quantize.sq8Decode($"qcode", $"qmin", $"qmax").as("remb"))
        .withColumn("rnrm", l2norm($"remb"))
      val (r, f) = measure(
        rec.join(broadcast(qvec.drop("qbucket", "qmargins")),
            $"vec_id" =!= $"query_id")
          .select($"query_id", $"vec_id".as("neighbor_id"),
            cosine($"remb", $"qemb", $"rnrm", $"qnrm").as("cos")),
        truth)
      Some((r, f))
    }

    // The FULL production stack: SQ8-decoded corpus vectors ranked
    // inside the composed Lmax-table × margin-T index — total recall
    // loss of all three levers at once (bucketing miss ∪ quantization
    // rank error), vs the float brute-force truth. Index keys stay
    // float-derived (buckets are computed at ingest, before
    // quantization); queries stay float (asymmetric distance, the ADC
    // contract). Gated on BOTH env knobs.
    val sq8Stack = etOpt.filter(_ => sq8.nonEmpty).map { et =>
      val l = tablesList.max
      val tHalf = math.max(planes / 2, 1)
      val rec = graft.ext.Quantize.sq8Encode(e.select($"vec_id", $"emb"), "emb")
        .select($"vec_id",
          graft.ext.Quantize.sq8Decode($"qcode", $"qmin", $"qmax").as("remb"))
        .withColumn("rnrm", l2norm($"remb"))
      val corpus = et.select($"vec_id",
          explode(slice($"buckets", 1, l)).as("bucket"))
        .join(rec, "vec_id")
      val probeQ = et.filter($"vec_id" < nQ)
        .select($"vec_id".as("query_id"), $"emb".as("qemb"),
          $"nrm".as("qnrm"),
          explode(graft.ext.TextOps.lshProbeTablesByMargin(
            slice($"buckets", 1, l), slice($"tmargins", 1, l), tHalf))
            .as("qbucket"))
      val (r, f) = measure(
        corpus.join(broadcast(probeQ),
            $"bucket" === $"qbucket" && $"vec_id" =!= $"query_id")
          .select($"query_id", $"vec_id".as("neighbor_id"),
            cosine($"remb", $"qemb", $"rnrm", $"qnrm").as("cos")),
        truth)
      (l, tHalf, r, f)
    }

    Caching.release()
    def f6(v: Double) = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    // candidate fractions sit at 1e-4..1e-7 at the 16-24-plane / 1M
    // operating point — 4 decimals would print them all as 0.0000
    def f8(v: Double) = "%.8f".formatLocal(java.util.Locale.ROOT, v)
    val marginJson = mpMargin.map { case (t, r, f) =>
      s""""lsh_mp_margin_t$t":{"recall":${f6(r)},"cand_frac":${f8(f)}}"""
    }.mkString(",")
    val multiJson = multi.map { case (l, r, f) =>
      s""""lsh_tables_l$l":{"recall":${f6(r)},"cand_frac":${f8(f)}}"""
    } ++ multiMargin.map { case (l, t, r, f) =>
      s""""lsh_tables_l${l}_margin_t$t":{"recall":${f6(r)},"cand_frac":${f8(f)}}"""
    }
    val ivfJson = ivf.map { case (p, r, f) =>
      s""""ivf_p$p":{"recall":${f6(r)},"cand_frac":${f8(f)}}"""
    } ++ sq8.map { case (r, f) =>
      s""""sq8_adc":{"recall":${f6(r)},"cand_frac":${f8(f)}}"""
    } ++ sq8Stack.map { case (l, t, r, f) =>
      s""""sq8_tables_l${l}_margin_t$t":{"recall":${f6(r)},"cand_frac":${f8(f)}}"""
    }
    val line = s"""{"n":$n,"k":$k,"queries":$nQ,"cells":$kCells,""" +
      s""""planes":$planes,""" +
      s""""lsh_exact":{"recall":${f6(rLsh)},"cand_frac":${f8(fLsh)}},""" +
      s""""lsh_multiprobe":{"recall":${f6(rMp)},"cand_frac":${f8(fMp)}},""" +
      (marginJson +: (multiJson ++ ivfJson)).mkString(",") + "}"
    println(line)
    System.err.println(line)
    spark.stop()
  }
}
