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
                          driverMaxEdges: Long = 1000000L): DataFrame = {
    // persisted: the edge list is re-read every propagation round (or
    // twice for count+collect on the driver path) — without this the
    // possibly-expensive pair-detection subplan would re-execute
    val edges = graft.Caching.persisted(
      pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
        .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst"))))
    val longIds = allDocs.schema(idCol).dataType ==
      org.apache.spark.sql.types.LongType
    val labels =
      if (longIds && edges.count() <= driverMaxEdges)
        unionFindLabels(allDocs.sparkSession, edges)
      else propagateLabels(edges, maxIters)
    allDocs.select(col(idCol))
      .join(labels.withColumnRenamed("node", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("rep"), col(idCol)).as("cluster_rep"))
  }

  /** Driver path: collect the (small) edge list, union-find with
    * min-id roots, return the node→rep mapping as a frame. */
  private def unionFindLabels(spark: org.apache.spark.sql.SparkSession,
                              edges: DataFrame): DataFrame = {
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
    edges.select(col("src").cast("long"), col("dst").cast("long"))
      .collect().foreach { r =>
        val (a, b) = (find(r.getLong(0)), find(r.getLong(1)))
        if (a != b) { // min id becomes the root
          if (a < b) parent(b) = a else parent(a) = b
        } else parent.getOrElseUpdate(a, a)
      }
    val mapping = parent.keys.map(n => (n, find(n))).toSeq
    import spark.implicits._
    mapping.toDF("node", "rep")
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
