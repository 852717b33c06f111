package graft

import graft.ext.VectorKMeans
import org.apache.spark.sql.functions._

/** Lloyd's k-means: separable blobs resolve to their true clusters,
  * cost is non-increasing over iterations, init is deterministic. */
class VectorKMeansSpec extends SparkSpec {

  import spark.implicits._

  // 3 well-separated 4-d blobs, 10 points each, deterministic jitter
  private def blobs = {
    val rnd = new scala.util.Random(5)
    val centers = Seq(
      Array(0.0, 0.0, 0.0, 0.0),
      Array(10.0, 10.0, 10.0, 10.0),
      Array(-10.0, 5.0, -5.0, 10.0))
    val rows = for {
      (c, b) <- centers.zipWithIndex
      i <- 0 until 10
    } yield (b * 10 + i.toLong, b,
      c.map(v => v + rnd.nextGaussian() * 0.3).toSeq)
    rows.toDF("vec_id", "blob", "emb")
  }

  test("separable blobs: every blob maps to exactly one cluster") {
    val df = blobs
    val model = VectorKMeans.fit(df, "vec_id", "emb", k = 3, iters = 4)
    val groups = model.assign(df, "emb")
      .groupBy($"blob")
      .agg(countDistinct($"cluster").as("nc"), first($"cluster").as("c"))
      .select($"nc", $"c").as[(Long, Int)].collect().toSeq
    assert(groups.forall(_._1 == 1L), "each blob entirely in one cluster")
    assert(groups.map(_._2).distinct.size == 3, "three distinct clusters")
  }

  test("fitted centroids approach the true blob means; cost non-increasing") {
    val df = blobs
    val init = VectorKMeans.init(df, "vec_id", "emb", 3)
    val fitted = VectorKMeans.fit(df, "vec_id", "emb", k = 3, iters = 4)
    val c0 = VectorKMeans.cost(init, df, "emb")
    val c1 = VectorKMeans.cost(fitted, df, "emb")
    assert(c1 <= c0, s"cost must not increase: $c0 -> $c1")
    // every fitted centroid sits within 1.0 of one true center
    val centers = Seq(
      Array(0.0, 0.0, 0.0, 0.0),
      Array(10.0, 10.0, 10.0, 10.0),
      Array(-10.0, 5.0, -5.0, 10.0))
    fitted.centroids.foreach { case (_, c) =>
      val nearest = centers.map(t =>
        math.sqrt(t.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)).min
      assert(nearest < 1.0, s"centroid ${c.toSeq} far from every true center")
    }
  }

  test("init is deterministic") {
    val a = VectorKMeans.init(blobs, "vec_id", "emb", 3)
    val b = VectorKMeans.init(blobs, "vec_id", "emb", 3)
    assert(a.centroids.map(_._2.toSeq).toSeq == b.centroids.map(_._2.toSeq).toSeq)
  }
}
