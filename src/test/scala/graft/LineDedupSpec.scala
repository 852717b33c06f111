package graft

import graft.ext.LineDedup
import org.apache.spark.sql.functions._

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  test("lines: fixed-width word chunks, short tail, empty text") {
    val got = Seq("a b c d e f g", "a b", "")
      .toDF("text")
      .select(LineDedup.lines($"text", 3).as("l"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "d e f", "g"))
    assert(got(1) == Seq("a b"))
    // splitting "" yields one empty word -> one empty line, so every
    // document owns >= 1 line and survives the pipeline's left join
    assert(got(2) == Seq(""))
  }

  test("dedupLines: corpus-wide keep-first by (doc_id, pos)") {
    // line vocabulary (3-word chunks): doc 1 = [A, B], doc 2 = [B, A],
    // doc 3 = [C, B], doc 4 = [A] — first occurrences: A@(1,0),
    // B@(1,1), C@(3,0); everything else drops
    val docs = Seq(
      (1L, "a1 a2 a3 b1 b2 b3"),
      (2L, "b1 b2 b3 a1 a2 a3"),
      (3L, "c1 c2 c3 b1 b2 b3"),
      (4L, "a1 a2 a3")
    ).toDF("doc_id", "text")
    val got = LineDedup.dedupLines(docs, "doc_id", "text", chunkWords = 3)
      .orderBy($"doc_id")
      .as[(Long, String, Long, Long)].collect()
    assert(got(0) == ((1L, "a1 a2 a3 b1 b2 b3", 2L, 0L)))
    assert(got(1) == ((2L, "", 0L, 2L)))
    assert(got(2) == ((3L, "c1 c2 c3", 1L, 1L)))
    assert(got(3) == ((4L, "", 0L, 1L)))
  }

  test("dedupLines: within-doc duplicate lines collapse to the first") {
    val docs = Seq((7L, "x y z x y z w w w")).toDF("doc_id", "text")
    val got = LineDedup.dedupLines(docs, "doc_id", "text", chunkWords = 3)
      .as[(Long, String, Long, Long)].collect()
    assert(got.toSeq == Seq((7L, "x y z w w w", 2L, 1L)))
  }

  test("dedupLines: result is repartition-stable") {
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "d e f a b c"), (3L, "g h i a b c")
    ).toDF("doc_id", "text")
    val base = LineDedup.dedupLines(docs, "doc_id", "text", chunkWords = 3)
      .orderBy($"doc_id").collect().toSeq
    val reparted = LineDedup.dedupLines(
        docs.repartition(7, $"text"), "doc_id", "text", chunkWords = 3)
      .orderBy($"doc_id").collect().toSeq
    assert(base == reparted)
  }

  test("dedupLines plan: map-side-combinable agg, no window sort on occurrences") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val p = LineDedup.dedupLines(docs, "doc_id", "text", chunkWords = 3)
      .queryExecution.executedPlan.toString
    // first-occurrence selection must be the partial-aggregate form
    // (skew-safe), not a row_number window over raw occurrences
    assert(!p.contains("RunningWindowFunction") && !p.contains("Window"), p)
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
  }
}
