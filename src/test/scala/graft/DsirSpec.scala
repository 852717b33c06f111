package graft

import graft.ext.Dsir
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance weighting (ext/Dsir.scala): weights cross-checked
  * against a from-scratch in-memory recomputation (own md5, own gram
  * builder, own smoothing arithmetic — not the Column expressions under
  * test), plus determinism/shape properties. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the cat sat on the mat", true),
    (1L, "the dog sat", true),
    (2L, "a dog ate the cat", false),
    (3L, "quantum flux capacitors hum", false),
    (4L, "the", false),   // single token: no bigrams
    (5L, "", true)        // empty text: one empty-string unigram
  ).toDF("doc_id", "text", "tgt")

  private val B = 32

  /** Independent recomputation: JDK MessageDigest md5, Scala string ops. */
  private def refWeights(): Map[Long, (Long, Double)] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket(g: String): Long =
      java.lang.Long.parseLong(md5hex(g).take(8), 16) % B
    val rows = Seq(
      (0L, "the cat sat on the mat", true),
      (1L, "the dog sat", true),
      (2L, "a dog ate the cat", false),
      (3L, "quantum flux capacitors hum", false),
      (4L, "the", false),
      (5L, "", true))
    def grams(t: String): Seq[String] = {
      val ws = t.split("\\s+").toSeq
      ws ++ ws.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
    }
    val feats = rows.flatMap { case (id, t, tgt) =>
      grams(t).map(g => (id, tgt, bucket(g))) }
    val ct = feats.filter(_._2).groupBy(_._3).map { case (b, x) => b -> x.size.toLong }
    val cr = feats.filterNot(_._2).groupBy(_._3).map { case (b, x) => b -> x.size.toLong }
    val tt = ct.values.sum.toDouble
    val tr = cr.values.sum.toDouble
    def lr(b: Long): Double =
      math.log((ct.getOrElse(b, 0L) + 1.0) / (tt + 1.0 * B)) -
        math.log((cr.getOrElse(b, 0L) + 1.0) / (tr + 1.0 * B))
    rows.map { case (id, t, _) =>
      val gs = grams(t)
      id -> (gs.size.toLong,
        feats.filter(_._1 == id).map(f => lr(f._3)).sum)
    }.toMap
  }

  test("importance weights match a from-scratch recomputation") {
    val got = Dsir.importanceWeights(docs, "doc_id", "text", $"tgt",
        buckets = B, alpha = 1.0, salt = "t")
      .select($"doc_id", $"n_feats", $"log_w").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    Caching.release()
    val want = refWeights()
    assert(got.keySet == want.keySet)
    for ((id, (nf, lw)) <- want) {
      assert(got(id)._1 == nf, s"n_feats doc $id")
      assert(math.abs(got(id)._2 - lw) < 1e-9, s"log_w doc $id")
    }
  }

  test("target-only grams score positive, raw-only grams negative") {
    val w = Dsir.importanceWeights(docs, "doc_id", "text", $"tgt",
        buckets = 1024, alpha = 1.0, salt = "t")
      .select($"doc_id", $"log_w").as[(Long, Double)].collect().toMap
    Caching.release()
    // doc 3 is pure raw-pool vocabulary (no bucket collisions with
    // target grams at B=1024 for this fixture) → negative weight;
    // doc 0's grams are mostly target-side → positive
    assert(w(3L) < 0, s"raw-only doc got ${w(3L)}")
    assert(w(0L) > 0, s"target-heavy doc got ${w(0L)}")
  }

  test("sel_key is deterministic and salt-sensitive") {
    def keys(salt: String) = {
      val m = Dsir.importanceWeights(docs, "doc_id", "text", $"tgt",
          buckets = B, salt = salt)
        .select($"doc_id", $"sel_key").as[(Long, Double)].collect().toMap
      Caching.release()
      m
    }
    val a = keys("s1"); val b = keys("s1"); val c = keys("s2")
    assert(a == b, "same salt must reproduce identical keys")
    assert(a != c, "different salt must draw different Gumbel noise")
    // Gumbel shift never changes with repartitioning either
    val rep = Dsir.importanceWeights(docs.repartition(7), "doc_id", "text",
        $"tgt", buckets = B, salt = "s1")
      .select($"doc_id", $"sel_key").as[(Long, Double)].collect().toMap
    Caching.release()
    assert(rep == a, "keys must be partitioning-invariant")
  }

  test("single-token and empty docs contribute exactly their unigrams") {
    val nf = Dsir.importanceWeights(docs, "doc_id", "text", $"tgt",
        buckets = B, salt = "t")
      .select($"doc_id", $"n_feats").as[(Long, Long)].collect().toMap
    Caching.release()
    assert(nf(4L) == 1L, "one token → one unigram, zero bigrams")
    assert(nf(5L) == 1L, "empty text → the single empty-string token")
  }
}
