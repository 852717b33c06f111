package graft

import graft.ext.{Relevance, Sampling}
import graft.functions.CharEntropy
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Relevance scoring (TF-IDF / BM25 / unigram NLL), sequence packing,
  * and the native char-entropy expression, each checked against
  * hand-computed values on a corpus small enough to verify on paper. */
class RelevanceSpec extends SparkSpec {

  import spark.implicits._

  // d1: a b a   d2: b c   d3: c c c
  private def corpus = Seq(
    (1L, "a b a"), (2L, "b c"), (3L, "c c c")).toDF("doc_id", "text")

  test("tfidfTopK matches hand-computed smoothed tf-idf with term tie-break") {
    val out = Relevance.tfidfTopK(corpus, "doc_id", "text", k = 2)
      .orderBy($"doc_id", $"rank")
      .as[(Long, String, Long, Double)].collect().toSeq
    def idf(df: Long) = math.log(4.0 / (df + 1)) + 1
    val want = Seq(
      (1L, "a", 1L, 2 * idf(1)), (1L, "b", 2L, 1 * idf(2)),
      (2L, "b", 1L, 1 * idf(2)), (2L, "c", 2L, 1 * idf(2)),
      (3L, "c", 1L, 3 * idf(2)))
    assert(out.size == want.size)
    out.zip(want).foreach { case ((d, t, r, s), (wd, wt, wr, ws)) =>
      assert((d, t, r) == ((wd, wt, wr)))
      assert(math.abs(s - ws) < 1e-12, s"tfidf($d,$t)")
    }
    // d2: b and c tie at identical scores — rank must break toward the
    // lexicographically smaller term (b before c)
    assert(out(2)._2 == "b" && out(3)._2 == "c")
  }

  test("bm25 matches the hand-derived Okapi formula") {
    val out = Relevance.bm25(corpus, "doc_id", "text", query = Seq("a", "c"))
      .orderBy($"doc_id")
      .select($"doc_id", $"n_hit_terms", $"score")
      .as[(Long, Long, Double)].collect().toSeq
    val avgdl = 8.0 / 3
    def idf(df: Double) = math.log(1 + (3 - df + 0.5) / (df + 0.5))
    def contrib(tf: Double, df: Double, dl: Double) =
      idf(df) * tf * 2.2 / (tf + 1.2 * (dl / avgdl * 0.75 + 0.25))
    val want = Seq(
      (1L, 1L, contrib(2, 1, 3)),            // only 'a'
      (2L, 1L, contrib(1, 2, 2)),            // only 'c'
      (3L, 1L, contrib(3, 2, 3)))            // only 'c'
    assert(out.map(r => (r._1, r._2)) == want.map(w => (w._1, w._2)))
    out.zip(want).foreach { case ((d, _, s), (_, _, ws)) =>
      assert(math.abs(s - ws) < 1e-12, s"bm25($d)") }
  }

  test("bm25 N convention: null-text docs count toward N and avgdl") {
    // standard BM25: N = corpus size, a null-text doc has dl = 0 — the
    // round-6 one-scan form silently derived N from tokenized docs only
    val withNull = Seq((1L, Some("a a b")), (2L, Some("b c")),
        (3L, Some("c b c")), (4L, None: Option[String]))
      .toDF("doc_id", "text")
    val out = Relevance.bm25(withNull, "doc_id", "text", query = Seq("a", "c"))
      .orderBy($"doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    // N = 4 (the null doc counts), avgdl = (3+2+3+0)/4 = 2
    val avgdl = 2.0
    def idf(df: Double) = math.log(1 + (4 - df + 0.5) / (df + 0.5))
    def contrib(tf: Double, df: Double, dl: Double) =
      idf(df) * tf * 2.2 / (tf + 1.2 * (dl / avgdl * 0.75 + 0.25))
    val want = Seq(
      (1L, 1L, contrib(2, 1, 3)),
      (2L, 1L, contrib(1, 2, 2)),
      (3L, 1L, contrib(2, 2, 3))) // "c b c": tf(c) = 2
    assert(out.map(r => (r._1, r._2)) == want.map(w => (w._1, w._2)))
    out.zip(want).foreach { case ((d, _, s), (_, _, ws)) =>
      assert(math.abs(s - ws) < 1e-12, s"bm25 null-text N($d)") }
  }

  test("unigramNll yields exact bits for a power-of-two model") {
    // ctf: a=2 b=2 c=4 over 8 tokens → p = 1/4, 1/4, 1/2
    val out = Relevance.unigramNll(corpus, "doc_id", "text")
      .orderBy($"doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    val want = Seq((1L, 3L, 2.0), (2L, 2L, 1.5), (3L, 3L, 1.0))
    out.zip(want).foreach { case ((d, n, v), (wd, wn, wv)) =>
      assert((d, n) == ((wd, wn)))
      assert(math.abs(v - wv) < 1e-12, s"nll($d)")
    }
  }

  test("packSequences assigns each doc to the sequence where it starts") {
    val df = Seq(("s", 1L, 3L), ("s", 2L, 2L), ("s", 3L, 4L), ("s", 4L, 1L))
      .toDF("src", "id", "tok")
    val out = Sampling.packSequences(df, Seq($"src"), Seq($"id"), $"tok", 4L)
      .orderBy($"id")
      .select($"id", $"cum_tokens", $"seq_id")
      .as[(Long, Long, Long)].collect().toSeq
    // cums 3,5,9,10 → starts at 0,3,5,9 → seqs 0,0,1,2
    assert(out == Seq((1L, 3L, 0L), (2L, 5L, 0L), (3L, 9L, 1L), (4L, 10L, 2L)))
  }

  test("graft_char_entropy: known values, empty, null, non-ASCII") {
    val out = Seq(Some("aabb"), Some("abcd"), Some("aaaa"), Some(""),
        None: Option[String], Some("αα"), Some("αβ"))
      .toDF("t")
      .select(call_function("graft_char_entropy", $"t").as("e"))
      .as[Option[Double]].collect().toSeq
    assert(out(0).contains(1.0))                 // two symbols, equal
    assert(out(1).contains(2.0))                 // four symbols, equal
    assert(out(2).contains(0.0))                 // one symbol
    assert(out(3).contains(0.0))                 // empty string: 0 by convention
    assert(out(4).isEmpty)                       // null propagates
    assert(out(5).contains(0.0))                 // non-ASCII single symbol
    assert(out(6).contains(1.0))                 // non-ASCII two symbols
  }

  test("nbLogOdds matches the hand-computed multinomial NB log-odds") {
    // pos (doc 1, 2): "a b a", "b c"  →  T_pos = 5
    // neg (doc 3):    "c c c"         →  T_neg = 3; V = 3 (a, b, c)
    val out = Relevance.nbLogOdds(corpus, "doc_id", "text",
        isPositive = $"doc_id" <= 2)
      .orderBy($"doc_id")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    val prior = math.log(2.0 / 1.0)
    def llr(cp: Long, cn: Long) =
      math.log((cp + 1) / 8.0) - math.log((cn + 1) / 6.0)
    val a = llr(2, 0); val b = llr(2, 0); val c = llr(1, 3)
    val want = Seq(
      (1L, 3L, prior + 2 * a + b), (2L, 2L, prior + b + c),
      (3L, 3L, prior + 3 * c))
    assert(out.map(r => (r._1, r._2)) == want.map(w => (w._1, w._2)))
    out.zip(want).foreach { case ((d, _, lo, pred), (_, _, wlo)) =>
      // returned log_odds is 6dp-grid-rounded (determinism contract),
      // so compare against the rounded expectation exactly and the raw
      // one within half a grid step
      assert(lo == math.rint(wlo * 1e6) / 1e6, s"log_odds(doc $d)")
      assert(math.abs(lo - wlo) <= 5e-7, s"log_odds grid(doc $d)")
      assert(pred == (wlo > 0), s"pred_positive(doc $d)")
    }
    // sanity: all-positive-vocab doc scores positive, the all-"c"
    // negative doc scores negative
    assert(out(0)._4 && !out(2)._4)
  }

  test("graft_char_entropy: codegen equals interpreted eval on random text") {
    val rnd = new scala.util.Random(11)
    val strs = Seq.tabulate(50)(_ =>
      Seq.fill(rnd.nextInt(80))(
        "abcdef é世"(rnd.nextInt(9))).mkString)
    val viaCodegen = strs.toDF("t")
      .select($"t", call_function("graft_char_entropy", $"t").as("e"))
      .as[(String, Double)].collect().toMap
    strs.foreach { s =>
      val interp = CharEntropy.compute(UTF8String.fromString(s))
      assert(java.lang.Double.compare(viaCodegen(s), interp) == 0, s"'$s'")
    }
  }
}
