package graft

import graft.ext.DedupClusters
import org.apache.spark.sql.functions._

/** Connected-components cluster labeling: chains collapse to min id,
  * components stay separate, isolated docs self-represent. */
class DedupClustersSpec extends SparkSpec {

  import spark.implicits._

  test("chains, separate components, and isolated nodes") {
    val docs = (1L to 8L).toDF("doc_id")
    // component {1,2,3,4} as a chain (diameter 3 — needs propagation
    // rounds, not just one hop), component {6,7}, isolated {5, 8}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 7L))
      .toDF("a_id", "b_id")
    val got = DedupClusters.connectedComponents(docs, "doc_id", pairs)
      .orderBy("doc_id")
      .as[(Long, Long)].collect().toSeq
    Caching.release()
    assert(got == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 6L, 7L -> 6L, 8L -> 8L))
  }

  test("distributed propagation path agrees with driver union-find") {
    val docs = (1L to 8L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 7L))
      .toDF("a_id", "b_id")
    // driverMaxEdges = 0 forces the min-label propagation loop
    val dist = DedupClusters.connectedComponents(docs, "doc_id", pairs,
        driverMaxEdges = 0)
      .as[(Long, Long)].collect().toMap
    val drv = DedupClusters.connectedComponents(docs, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    Caching.release()
    assert(dist == drv)
    assert(dist == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 6L, 7L -> 6L, 8L -> 8L))
  }

  test("label order independence: reversed pair direction, same fixpoint") {
    val docs = (1L to 4L).toDF("doc_id")
    val pairs = Seq((3L, 4L), (2L, 3L), (1L, 2L)).toDF("a_id", "b_id")
    val got = DedupClusters.connectedComponents(docs, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    Caching.release()
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }
}
