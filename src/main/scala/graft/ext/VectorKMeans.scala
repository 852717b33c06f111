package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an `array<double>` embedding column
  * — the production centroid source for IVF-style ANN
  * (`DocumentQueries` q50 uses a deterministic first-k selection so the
  * DuckDB oracle can replicate it bit-for-bit; real corpora want
  * data-dependent centroids, which float-summation order makes
  * non-oracle-reproducible — hence a library operator with its own
  * spec rather than an oracle query).
  *
  * Scale shape per iteration:
  *   - assignment: centroids are a k×dim broadcast (k ~ sqrt(n) stays
  *     dimension-sized); each vector computes its nearest centroid in
  *     one codegen'd pass — no shuffle;
  *   - update: posexplode to (cluster, dim_pos, value) and one
  *     map-side-combinable groupBy average — a single shuffle of
  *     n×dim skinny rows per iteration.
  *
  * Initialization is deterministic: the k vectors with the smallest
  * `md5(id)` — a reproducible pseudo-random spread (the k-means||
  * oversampling refinement would drop in here; for IVF cell quality a
  * hash-spread init + a few Lloyd rounds is the standard trade).
  * Empty clusters keep their previous centroid. */
object VectorKMeans {

  /** One fitted model: centroids indexed 0..k-1. */
  final case class Model(centroids: Array[(Int, Array[Double])]) {
    def k: Int = centroids.length

    /** The centroid matrix as ONE plan literal (array<array<double>>)
      * for the native expression — not k×dim unrolled nodes. */
    private def centroidLit: Column =
      typedlit(centroids.map(_._2.toSeq).toSeq)

    /** `struct<cluster:int, dist2:double>` of the nearest centroid —
      * one native codegen'd expression
      * ([[graft.functions.NearestCentroid]]); the old unrolled
      * `element_at(emb,i) - lit(v)` chain was O(k·dim) plan nodes and
      * fell out of codegen past the 64 KB method limit at IVF-realistic
      * k (round-7 verdict). Caller must have run
      * [[graft.plans.GraftExtensions.register]] on the session
      * ([[assign]] / [[cost]] do it for you). */
    def nearestExpr(emb: Column): Column = {
      // native expr indexes centroids by POSITION; translate to the
      // model's cid only when they differ (init/fit build cid == index)
      val near = call_function("graft_nearest_centroid", emb, centroidLit)
      if (centroids.zipWithIndex.forall { case ((cid, _), i) => cid == i }) near
      else struct(
        element_at(typedlit(centroids.map(_._1).toSeq), near("cluster") + 1)
          .as("cluster"),
        near("dist2").as("dist2"))
    }

    /** Nearest-centroid id for each row (see [[nearestExpr]]). */
    def assignExpr(emb: Column): Column = nearestExpr(emb)("cluster")

    /** Adds `cluster` to `df`. */
    def assign(df: DataFrame, embCol: String): DataFrame = {
      graft.plans.GraftExtensions.register(df.sparkSession)
      df.withColumn("cluster", assignExpr(col(embCol)))
    }
  }

  /** Deterministic init: k distinct vectors with smallest md5(id). */
  def init(df: DataFrame, idCol: String, embCol: String, k: Int): Model = {
    val rows = df
      .select(col(idCol), col(embCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(k)
      .collect()
    Model(rows.zipWithIndex.map { case (r, i) =>
      i -> r.getSeq[Any](1).map(_.toString.toDouble).toArray
    })
  }

  /** `iters` Lloyd rounds from the deterministic init.
    *
    * `quantize`: round every updated centroid component half-up to
    * that many decimals after each round. Distributed double sums
    * merge in shuffle-arrival order, so unquantized means carry
    * run-to-run ulp-level noise; quantizing after every round pins
    * the whole iteration trajectory, making fitted centroids
    * REPRODUCIBLE across runs — the property that lets q50's oracle
    * mirror them as literals. At 1e-6 on unit-scale embeddings the
    * quantization is far below any cell-quality effect. */
  def fit(df: DataFrame, idCol: String, embCol: String, k: Int,
          iters: Int, quantize: Option[Int] = None): Model = {
    def q(v: Double): Double = quantize match {
      case Some(s) =>
        BigDecimal(v).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
      case None => v
    }
    var model = init(df, idCol, embCol, k)
    for (_ <- 0 until iters) {
      val assigned = model.assign(df, embCol)
      // element-wise mean per cluster: skinny explode + one shuffle
      val means = assigned
        .select(col("cluster"), posexplode(col(embCol)).as(Seq("__p", "__v")))
        .groupBy(col("cluster"), col("__p"))
        .agg(avg(col("__v")).as("__m"))
        .groupBy(col("cluster"))
        .agg(transform(array_sort(collect_list(struct(col("__p"), col("__m")))),
          e => e("__m")).as("centroid"))
        .collect()
        .map(r => r.getInt(0) ->
          r.getSeq[Double](1).map(q).toArray)
        .toMap
      model = Model(model.centroids.map { case (cid, prev) =>
        cid -> means.getOrElse(cid, prev) // empty cluster keeps centroid
      })
    }
    model
  }

  /** Within-cluster sum of squared distances (convergence metric) —
    * the `dist2` half of the same one-pass native expression
    * [[Model.nearestExpr]] uses for assignment. */
  def cost(model: Model, df: DataFrame, embCol: String): Double = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    df.select(model.nearestExpr(col(embCol))("dist2").as("d"))
      .agg(sum(col("d"))).collect()(0).getDouble(0)
  }
}
