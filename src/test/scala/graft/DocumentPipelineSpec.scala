package graft

import graft.ext.DocumentPipeline

/** Composed prepare pipeline: stage semantics and determinism. */
class DocumentPipelineSpec extends SparkSpec {

  import spark.implicits._

  // "the of and to in is it" is stopword-dense → quality well above the
  // threshold even at tiny length; row 4 is a low-quality word soup
  private val docs = Seq(
    (1L, "the of and to in is it the of and"),
    (2L, "the of and to in is it the of and"), // exact dup of 1
    (3L, "the of and to in is it the of and extra"),
    (4L, "zz yy xx ww vv uu tt ss"), // no stopwords → filtered
    (5L, null.asInstanceOf[String])) // null text → filtered
    .toDF("doc_id", "text")

  test("filters low quality, dedups to min id, assigns shards") {
    val out = DocumentPipeline.prepare(docs, "doc_id", "text",
        minQuality = 0.2, sampleFraction = 1.0, nShards = 4, salt = "t")
      .select("doc_id").as[Long].collect().toSeq.sorted
    // 4 (quality) and 5 (null) drop; 2 dedups onto 1 (min id kept)
    assert(out == Seq(1L, 3L))
  }

  test("dedup keeps the minimum id regardless of input order") {
    val reversed = docs.orderBy($"doc_id".desc).repartition(3)
    val out = DocumentPipeline.prepare(reversed, "doc_id", "text",
        minQuality = 0.2, sampleFraction = 1.0, nShards = 4, salt = "t")
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(out == Seq(1L, 3L))
  }

  test("sampling and shard assignment are salt-deterministic") {
    def run(salt: String) = DocumentPipeline.prepare(docs, "doc_id", "text",
        minQuality = 0.0, sampleFraction = 0.5, nShards = 4, salt = salt)
      .select("doc_id", "shard_id").as[(Long, Long)].collect().toSet
    assert(run("a") == run("a"))
    // survivors of fraction=0.5 are a strict, salt-dependent subset of
    // the deduped set {1,3,4}
    assert(run("a").map(_._1).subsetOf(Set(1L, 3L, 4L)))
  }
}
