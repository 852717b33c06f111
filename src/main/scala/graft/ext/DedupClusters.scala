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
    * `pairs` are their own representative. The driver-side loop runs
    * one Spark action per round (the convergence check) — the same
    * barrier any iterative algorithm (k-means, page-rank) pays.
    *
    * Frames persisted per round register with [[graft.Caching]];
    * callers release after their terminal action. */
  def connectedComponents(allDocs: DataFrame, idCol: String,
                          pairs: DataFrame, aCol: String = "a_id",
                          bCol: String = "b_id",
                          maxIters: Int = 50): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
    var labels = graft.Caching.persisted(
      allDocs.select(col(idCol).as("node"), col(idCol).as("rep")))
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
    labels.select(col("node").as(idCol), col("rep").as("cluster_rep"))
  }
}
