package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** Correlation-driven device clustering — the engine form of the
  * reference's insights analysis
  * (ola_dataset/insights_oladatasets.ipynb cell 3): 1-minute-resampled
  * per-device power, zeros→NaN, pairwise Pearson correlation
  * (min_periods=1, fillna 0, clip [-1,1]) → distance 1−corr (clip ≥0)
  * → AVERAGE-LINKAGE agglomerative clustering cut at a distance
  * threshold (`fcluster(..., criterion='distance')`), yielding one
  * cluster label per device plus the cluster-ordered matrix the
  * notebook heatmaps.
  *
  * Scale split: Spark computes the k×k correlation matrix in ONE
  * aggregate pass over the minute-binned frame (k = device count —
  * k(k−1)/2 corr aggregates, all map-side combinable; the binned frame
  * is bounded by minutes×1, never raw-sample-sized). The linkage then
  * runs DRIVER-side on the k×k matrix — k is device-vocabulary-sized
  * (dozens), the same driver-discipline as [[VectorKMeans.init]]'s
  * k-row collect. No per-reading data ever reaches the driver.
  *
  * Determinism contract (the oracle replicates this exactly): cluster
  * distances are the mean pairwise member distance ROUNDED to 9
  * decimals (so engine-vs-oracle float-sum-order differences cannot
  * flip a comparison), merges pick the candidate minimizing
  * (distance, label₁, label₂) where a cluster's label is its
  * lexicographically-smallest member, and merging proceeds while the
  * best candidate distance ≤ threshold. Average linkage is reducible,
  * so greedy merge heights are non-decreasing and the early stop
  * equals cutting the full dendrogram at the threshold (property-
  * tested against a full-linkage reference in CorrClusterSpec). Tie
  * order between equal-distance candidates is pinned by label —
  * scipy's choice on exact ties is implementation-defined; real
  * correlation data does not tie.
  */
object CorrCluster {

  /** Average-linkage agglomerative clustering with a distance-threshold
    * cut. `dist(a)(b)` must be symmetric with zero diagonal, indexed
    * like `labels`. Returns each label's 1-based cluster id, where ids
    * are the dense rank of the cluster's smallest member label —
    * deterministic and engine-reproducible (scipy's 1..n numbering is
    * traversal-order-dependent; the PARTITION is what matches).
    */
  def averageLinkage(labels: IndexedSeq[String], dist: Array[Array[Double]],
                     threshold: Double): Seq[(String, Int)] = {
    val k = labels.size
    require(dist.length == k && dist.forall(_.length == k),
      s"distance matrix must be ${k}x$k")
    // cluster label -> member indices; label = lexicographically
    // smallest member (maintained by always merging into the smaller)
    val clusters = scala.collection.mutable.SortedMap[String, Vector[Int]]() ++
      labels.zipWithIndex.map { case (l, i) => l -> Vector(i) }
    var done = false
    while (!done && clusters.size > 1) {
      val cs = clusters.toIndexedSeq
      val candidates = for {
        i <- cs.indices; j <- (i + 1) until cs.size
      } yield {
        val (l1, m1) = cs(i)
        val (l2, m2) = cs(j)
        val sum = (for (a <- m1; b <- m2) yield dist(a)(b)).sum
        (round9(sum / (m1.size * m2.size)), l1, l2)
      }
      val best = candidates.min
      if (best._1 <= threshold) {
        clusters(best._2) = clusters(best._2) ++ clusters(best._3)
        clusters.remove(best._3)
      } else done = true
    }
    val rank = clusters.keys.toSeq.sorted.zipWithIndex.toMap
    (for {
      (label, members) <- clusters.toSeq
      m <- members
    } yield labels(m) -> (rank(label) + 1))
      .sortBy { case (d, c) => (c, d) }
  }

  /** Round half-up to 9 decimals — the same rounding the oracle SQL
    * applies to cluster distances (`round(avg(d), 9)`), so both sides
    * compare bit-identical values against the threshold. */
  private def round9(v: Double): Double =
    BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The notebook's preprocessing: minute-binned per-device means with
    * zeros nulled (`resample("1min").mean().replace(0, nan)`), as one
    * grouped aggregate. `deviceValue(t)` must be the raw value column
    * WHEN the row belongs to device `t` (null otherwise). */
  def minuteBinned(df: DataFrame, ts: Column,
                   devices: Seq[String], deviceValue: String => Column): DataFrame = {
    val binAggs = devices.map { t =>
      val m = avg(deviceValue(t))
      when(m =!= 0, m).as(t) // zeros→null (and null stays null)
    }
    df.groupBy(date_trunc("minute", ts).as("minute"))
      .agg(binAggs.head, binAggs.tail: _*)
  }

  /** Pairwise Pearson matrix over [[minuteBinned]] columns in ONE
    * aggregate pass (no per-pair rescans), as the upper triangle:
    * corr undefined (fewer than 2 complete pairs / zero variance) → 0,
    * rounded to 4 decimals, clipped to [-1, 1] — the notebook's
    * `corr(min_periods=1).fillna(0)` + `clip`. Returns the single-row
    * DataFrame with one `a__b` column per pair. */
  def corrUpper(binned: DataFrame, devices: Seq[String]): DataFrame = {
    val pairs = for {
      i <- devices.indices; j <- (i + 1) until devices.size
    } yield (devices(i), devices(j))
    val aggs = pairs.map { case (a, b) =>
      least(greatest(round(coalesce(nanvl(corr(col(a), col(b)),
        lit(null).cast(DoubleType)), lit(0.0)), 4), lit(-1.0)), lit(1.0))
        .as(s"${a}__$b")
    }
    binned.agg(aggs.head, aggs.tail: _*)
  }

  /** Shared driver step for [[deviceClusters]] / [[deviceOrderedMatrix]]:
    * ONE collect of the k(k−1)/2 corr aggregates → (sorted devices,
    * upper-triangle corr map, cluster assignment). */
  private def clusteredCorr(df: DataFrame, ts: Column, devices: Seq[String],
                            deviceValue: String => Column, threshold: Double)
      : (IndexedSeq[String], Map[(String, String), Double], Seq[(String, Int)]) = {
    val sorted = devices.sorted.toIndexedSeq
    val corrRow = corrUpper(minuteBinned(df, ts, sorted, deviceValue), sorted)
      .collect()(0) // ONE row of k(k-1)/2 doubles — driver-discipline
    val k = sorted.size
    val dist = Array.ofDim[Double](k, k)
    val corrMap = Map.newBuilder[(String, String), Double]
    var idx = 0
    for (i <- 0 until k; j <- (i + 1) until k) {
      val c = if (corrRow.isNullAt(idx)) 0.0 else corrRow.getDouble(idx)
      corrMap += (sorted(i), sorted(j)) -> c
      val d = math.max(1.0 - c, 0.0)
      dist(i)(j) = d
      dist(j)(i) = d
      idx += 1
    }
    (sorted, corrMap.result(), averageLinkage(sorted, dist, threshold))
  }

  /** End-to-end device clustering over an events-shaped frame: binned
    * corr (Spark) → distance 1−corr clipped ≥0 → driver-side average
    * linkage → (device, cluster_id) rows, ordered (cluster_id, device).
    */
  def deviceClusters(spark: SparkSession, df: DataFrame, ts: Column,
                     devices: Seq[String], deviceValue: String => Column,
                     threshold: Double): DataFrame = {
    val (_, _, clusters) = clusteredCorr(df, ts, devices, deviceValue, threshold)
    val out = clusters.map { case (dev, c) => Row(dev, c.toLong) }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(out.asJava,
      StructType(Seq(StructField("device", StringType, nullable = false),
        StructField("cluster_id", LongType, nullable = false))))
  }

  /** End-to-end [[orderedMatrix]] over an events-shaped frame (q81):
    * the notebook's cluster-ordered heatmap, long-form, with explicit
    * axis positions so the block ordering itself is oracle-checkable
    * (a row-set compare would accept ANY permutation). One k×k grid —
    * heatmap-sized by construction, same driver-discipline as
    * [[deviceClusters]]. */
  def deviceOrderedMatrix(spark: SparkSession, df: DataFrame, ts: Column,
                          devices: Seq[String], deviceValue: String => Column,
                          threshold: Double): DataFrame = {
    val (_, corrMap, clusters) = clusteredCorr(df, ts, devices, deviceValue, threshold)
    // positions come from the SAME order the matrix rows are emitted in
    // (clusterOrder) — a second independent sort here could silently
    // diverge from the row blocks if one tie-break ever changed
    val pos = clusterOrder(clusters)
      .zipWithIndex.map { case (d, i) => d -> (i + 1L) }.toMap
    val out = orderedMatrix(clusters, corrMap).map { case (a, b, c) =>
      Row(pos(a), pos(b), a, b, c)
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(out.asJava,
      StructType(Seq(
        StructField("pos_a", LongType, nullable = false),
        StructField("pos_b", LongType, nullable = false),
        StructField("device_a", StringType, nullable = false),
        StructField("device_b", StringType, nullable = false),
        StructField("corr_val", DoubleType, nullable = false))))
  }

  /** The notebook's cluster-ordered correlation matrix (the heatmap
    * frame): long-form (device_a, device_b, corr_val) for every ordered
    * pair, where devices sort by (cluster_id, device) — cluster blocks
    * are contiguous on both axes. Diagonal = 1. */
  def orderedMatrix(clusters: Seq[(String, Int)],
                    corr: Map[(String, String), Double]): Seq[(String, String, Double)] = {
    val order = clusterOrder(clusters)
    def c(a: String, b: String): Double =
      if (a == b) 1.0 else corr.getOrElse((a, b), corr((b, a)))
    for (a <- order; b <- order) yield (a, b, c(a, b))
  }

  /** The single definition of the heatmap axis order — (cluster_id,
    * device) ascending, cluster blocks contiguous. Both the emitted
    * matrix rows and the axis positions derive from this one sort. */
  def clusterOrder(clusters: Seq[(String, Int)]): Seq[String] =
    clusters.sortBy { case (d, c) => (c, d) }.map(_._1)
}
