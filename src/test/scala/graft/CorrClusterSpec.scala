package graft

import graft.ext.CorrCluster
import org.apache.spark.sql.functions._

/** Average-linkage clustering (insights_oladatasets.ipynb cell 3
  * semantics): hand-traced golden, equivalence of the early-stopping
  * greedy to the full-dendrogram threshold cut (the fcluster
  * 'distance' criterion), and the Spark end-to-end shape. */
class CorrClusterSpec extends SparkSpec {

  import spark.implicits._

  private def mat(k: Int)(f: (Int, Int) => Double): Array[Array[Double]] =
    Array.tabulate(k, k)((i, j) => if (i == j) 0.0 else f(math.min(i, j), math.max(i, j)))

  test("hand-traced golden: two tight pairs, far apart") {
    // D(A,B)=0.2, D(C,D)=0.3, all cross distances 0.9; threshold 0.8.
    // Average linkage merges (A,B)@0.2 then (C,D)@0.3; the next
    // candidate {A,B}x{C,D} has avg distance 0.9 > 0.8 -> stop. This
    // is exactly scipy linkage(method='average') + fcluster(t=0.8,
    // criterion='distance'): merge heights 0.2, 0.3 pass the cut, the
    // 0.9 merge does not.
    val labels = IndexedSeq("a", "b", "c", "d")
    val d = Array(
      Array(0.0, 0.2, 0.9, 0.9),
      Array(0.2, 0.0, 0.9, 0.9),
      Array(0.9, 0.9, 0.0, 0.3),
      Array(0.9, 0.9, 0.3, 0.0))
    assert(CorrCluster.averageLinkage(labels, d, 0.8) ==
      Seq("a" -> 1, "b" -> 1, "c" -> 2, "d" -> 2))
    // threshold below every distance: all singletons, ranked by label
    assert(CorrCluster.averageLinkage(labels, d, 0.1) ==
      Seq("a" -> 1, "b" -> 2, "c" -> 3, "d" -> 4))
    // threshold at the top: one cluster (cut is INCLUSIVE: <= t).
    // Chained merge heights: 0.2, 0.3, then avg of the 4 cross
    // distances = 0.9 <= 0.9 merges everything.
    assert(CorrCluster.averageLinkage(labels, d, 0.9).forall(_._2 == 1))
  }

  test("average linkage: the chaining counter-example stays split") {
    // B sits between A and C: D(A,B)=0.4, D(B,C)=0.4, D(A,C)=1.6.
    // Single linkage would chain all three at 0.4; AVERAGE linkage
    // merges (A,B)@0.4 and then {A,B}x{C} at avg(1.6,0.4)=1.0 > 0.8.
    val labels = IndexedSeq("a", "b", "c")
    val d = mat(3)((i, j) => if ((i, j) == (0, 2)) 1.6 else 0.4)
    assert(CorrCluster.averageLinkage(labels, d, 0.8) ==
      Seq("a" -> 1, "b" -> 1, "c" -> 2))
  }

  /** Independent reference: FULL greedy average linkage (no early
    * stop, same tie rules) down to one cluster, then the fcluster
    * 'distance' cut — connected components of the cophenetic-
    * distance-<=-t graph, where cophenetic(a,b) is the height of the
    * merge that first united a and b. */
  private def fclusterRef(labels: IndexedSeq[String],
                          dist: Array[Array[Double]],
                          t: Double): Set[Set[String]] = {
    val k = labels.size
    var clusters = labels.indices.map(i => Set(i)).toVector
    val coph = Array.ofDim[Double](k, k)
    val heights = scala.collection.mutable.ArrayBuffer[Double]()
    def label(c: Set[Int]) = c.map(labels).min
    def avgDist(a: Set[Int], b: Set[Int]) = {
      val s = (for (x <- a.toSeq; y <- b.toSeq) yield dist(x)(y)).sum
      BigDecimal(s / (a.size * b.size))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    while (clusters.size > 1) {
      val cand = for {
        i <- clusters.indices; j <- (i + 1) until clusters.size
      } yield (avgDist(clusters(i), clusters(j)),
        label(clusters(i)), label(clusters(j)), i, j)
      val best = cand.minBy(c => (c._1, c._2, c._3))
      heights += best._1
      for (x <- clusters(best._4); y <- clusters(best._5)) {
        coph(x)(y) = best._1; coph(y)(x) = best._1
      }
      clusters = clusters.updated(best._4, clusters(best._4) ++ clusters(best._5))
        .patch(best._5, Nil, 1)
    }
    // reducibility: average-linkage merge heights never decrease —
    // the property that makes the early stop equal the dendrogram cut
    assert(heights.zip(heights.tail).forall { case (a, b) => a <= b },
      s"merge heights not monotone: $heights")
    // components of the cophenetic <= t graph
    val adj = (0 until k).map(i =>
      (0 until k).filter(j => j != i && coph(i)(j) <= t).toSet)
    val seen = scala.collection.mutable.Set[Int]()
    val comps = scala.collection.mutable.ArrayBuffer[Set[Int]]()
    for (s0 <- 0 until k if !seen(s0)) {
      var comp = Set(s0)
      var frontier = Set(s0)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(adj).diff(comp)
        comp ++= frontier
      }
      seen ++= comp
      comps += comp
    }
    comps.map(_.map(labels)).toSet
  }

  test("property: greedy threshold stop equals the full-dendrogram cut") {
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 60) {
      val k = 2 + rnd.nextInt(7)
      val labels = (0 until k).map(i => s"d$i")
      // coarse 2-decimal grid manufactures exact ties regularly, so
      // the pinned (distance, label, label) tie order is exercised
      val d = mat(k)((_, _) => rnd.nextInt(200) / 100.0)
      for (i <- 0 until k; j <- 0 until i) d(i)(j) = d(j)(i)
      for (t <- Seq(0.25, 0.8, 1.3)) {
        val got = CorrCluster.averageLinkage(labels, d, t)
          .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
        val want = fclusterRef(labels, d, t)
        assert(got == want, s"trial $trial k=$k t=$t dist=${d.map(_.toSeq).toSeq}")
      }
    }
  }

  test("cluster ids are the dense rank of each cluster's smallest member") {
    val labels = IndexedSeq("w", "x", "y", "z")
    val d = Array(
      Array(0.0, 0.9, 0.9, 0.1), // w-z tight
      Array(0.9, 0.0, 0.1, 0.9), // x-y tight
      Array(0.9, 0.1, 0.0, 0.9),
      Array(0.1, 0.9, 0.9, 0.0))
    // clusters {w,z} and {x,y}: labels "w" < "x" -> ids 1 and 2,
    // rows ordered (cluster_id, device)
    assert(CorrCluster.averageLinkage(labels, d, 0.5) ==
      Seq("w" -> 1, "z" -> 1, "x" -> 2, "y" -> 2))
  }

  test("minuteBinned: per-minute device means, zeros nulled") {
    val df = Seq(
      ("2024-01-01 00:00:05", "a", 10.0),
      ("2024-01-01 00:00:55", "a", 20.0), // same minute -> mean 15
      ("2024-01-01 00:00:30", "b", 0.0),  // all-zero bin -> null
      ("2024-01-01 00:01:10", "a", 7.0))
      .toDF("ts_s", "dev", "v")
      .withColumn("ts", to_timestamp($"ts_s"))
    val out = CorrCluster.minuteBinned(df, $"ts", Seq("a", "b"),
        t => when($"dev" === t, $"v"))
      .orderBy($"minute")
      .select($"a", $"b")
      .as[(Option[Double], Option[Double])].collect().toSeq
    assert(out == Seq((Some(15.0), None), (Some(7.0), None)))
  }

  test("end-to-end deviceClusters: engineered correlations cluster as built") {
    // two devices move together (corr ~ 1 -> distance ~ 0), one moves
    // inversely (corr ~ -1 -> distance ~ 2), over 120 minutes
    val rows = for {
      m <- 0 until 120
      (dev, v) <- Seq(
        ("a", math.sin(m / 7.0) + 2.0),
        ("b", 2 * math.sin(m / 7.0) + 5.0),
        ("c", -math.sin(m / 7.0) + 3.0))
    } yield (java.sql.Timestamp.valueOf(f"2024-01-01 00:00:00").toInstant
      .plusSeconds(m * 60L), dev, v)
    val df = rows.toDF("ts", "dev", "v")
    val out = CorrCluster.deviceClusters(spark, df, $"ts",
        Seq("a", "b", "c"), t => when($"dev" === t, $"v"), threshold = 0.8)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("a", 1L), ("b", 1L), ("c", 2L)))
  }

  test("orderedMatrix: cluster blocks contiguous, diagonal 1") {
    val clusters = Seq("a" -> 2, "b" -> 1, "c" -> 1)
    val corr = Map(("a", "b") -> 0.1, ("a", "c") -> 0.2, ("b", "c") -> 0.9)
    val m = CorrCluster.orderedMatrix(clusters, corr)
    val order = m.map(_._1).distinct
    assert(order == Seq("b", "c", "a")) // cluster 1 block first
    assert(m.filter(r => r._1 == r._2).forall(_._3 == 1.0))
    assert(m.find(r => (r._1, r._2) == (("c", "b"))).get._3 == 0.9)
  }
}
