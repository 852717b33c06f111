package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster assignment: connected components over a near-dup
  * pair graph, labeling every document with the minimum doc id of its
  * component — the step a training-data pipeline runs AFTER candidate
  * near-dup detection (MinHash q24 / embedding q45) to keep exactly one
  * representative per duplicate cluster.
  *
  * Algorithm: iterative min-label propagation to fixpoint — each round
  * every node takes the min of its own label and its neighbors' labels
  * (one join + one map-side-combinable min aggregation per round);
  * convergence in O(component diameter) rounds. Near-dup components
  * are small and shallow by construction (they are clusters of copies),
  * so the loop is a handful of rounds; for adversarially long chains
  * the standard large-star/small-star contraction (Kiveris et al.)
  * would replace the propagation — same per-round shape.
  *
  * The fixpoint is exactly min(component) independent of iteration
  * order, so the DuckDB oracle can verify it through a completely
  * different computation (recursive-CTE transitive closure). */
object DedupClusters {

  /** One row per document: (idCol, cluster_rep). Documents absent from
    * `pairs` are their own representative.
    *
    * Hybrid execution, chosen by the measured edge count (the same
    * adaptive reasoning as broadcast-vs-shuffle joins): a near-dup
    * graph is normally a sliver of the corpus, so when it fits a
    * driver buffer (≤ `driverMaxEdges`, long ids) a driver union-find
    * computes the labels in O(E α(E)) and ships them back as one
    * broadcast-joinable mapping — three Spark jobs total. Graphs past
    * the threshold (or with non-long ids) run the distributed
    * min-label propagation loop instead: one join + one min
    * aggregation + one convergence count per round, O(diameter)
    * rounds, all frames graph-sized (the full corpus only appears in
    * the final left join). Both paths reach the identical fixpoint —
    * min id per component.
    *
    * Frames persisted here register with [[graft.Caching]]; callers
    * release after their terminal action. */
  def connectedComponents(allDocs: DataFrame, idCol: String,
                          pairs: DataFrame, aCol: String = "a_id",
                          bCol: String = "b_id",
                          maxIters: Int = 50,
                          driverMaxEdges: Int = 1000000): DataFrame = {
    val spark = allDocs.sparkSession
    val longIds = allDocs.schema(idCol).dataType ==
      org.apache.spark.sql.types.LongType
    // pay the (possibly expensive) pair-detection pipeline ONCE: persist
    // the plain pair frame, then probe it with a single bounded collect
    // — if everything fits the driver buffer, union-find locally; the
    // sentinel row past the limit proves the graph is too big and the
    // distributed loop re-reads the same cached frame instead of
    // recomputing the pipeline
    val p = graft.Caching.persisted(
      pairs.select(col(aCol).as("src"), col(bCol).as("dst")))
    val collected =
      if (longIds)
        Some(p.select(col("src").cast("long"), col("dst").cast("long"))
          .limit(driverMaxEdges + 1)
          .collect())
        .filter(_.length <= driverMaxEdges)
      else None
    val labels = collected match {
      case Some(rows) =>
        val mapping = unionFind(rows.map(r => (r.getLong(0), r.getLong(1))))
        import spark.implicits._
        mapping.toSeq.toDF("node", "rep")
      case None =>
        val edges = p.union(
          p.select(col("dst").as("src"), col("src").as("dst")))
        propagateLabels(edges, maxIters)
    }
    allDocs.select(col(idCol))
      .join(labels.withColumnRenamed("node", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("rep"), col(idCol)).as("cluster_rep"))
  }

  /** Driver path: union-find with min-id roots and path compression
    * over an undirected pair list. Returns node → component-min. */
  private def unionFind(es: Array[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) {
        val n = parent.getOrElse(c, c); parent(c) = r; c = n
      }
      r
    }
    es.foreach { case (x, y) =>
      val (a, b) = (find(x), find(y))
      if (a != b) { // min id becomes the root
        if (a < b) parent(b) = a else parent(a) = b
      } else parent.getOrElseUpdate(a, a)
    }
    parent.keys.map(n => (n, find(n))).toMap
  }

  /** Distributed path: iterative min-label propagation to fixpoint
    * over the graph's nodes only. */
  private def propagateLabels(edges: DataFrame, maxIters: Int): DataFrame = {
    var labels = graft.Caching.persisted(
      edges.select(col("src").as("node")).distinct()
        .withColumn("rep", col("node")))
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      val msgs = edges.join(labels, col("src") === col("node"))
        .select(col("dst").as("node"), col("rep"))
      val next = graft.Caching.persisted(
        labels.union(msgs).groupBy(col("node")).agg(min(col("rep")).as("rep")))
      changed = next.join(labels.withColumnRenamed("rep", "__old"), "node")
        .filter(col("rep") =!= col("__old")).count()
      labels = next
      it += 1
    }
    labels
  }
}
