package graft

import graft.ext.Sketches
import org.apache.spark.sql.functions._

/** Correctness evidence for the mergeable HLL distinct-count module
  * (ext/Sketches) — the op is deliberately NOT a SparkEntry query
  * because DuckDB's HLL is a different sketch implementation (see the
  * module scaladoc), so the whole gate lives here:
  *
  *   1. shard-then-merge tracks single-pass within the sketch's own
  *      error (NOT exactly: sub-threshold sketches hold exact coupon
  *      lists and their union promotes to the dense estimator — a
  *      genuine DataSketches property this spec documents, ~1 %
  *      measured drift at lgK=12);
  *   2. merge hierarchy doesn't matter beyond that same band (shard →
  *      super-shard → global vs flat union);
  *   3. the computation is DETERMINISTIC for fixed input and shard
  *      topology (set-valued state, merge-order independent) — exact
  *      equality across independent recomputations;
  *   4. the estimate tracks EXACT distinct within the published HLL
  *      error (lgK=12 → RSE ≈ 1.6 %; we allow 3σ ≈ 5 %);
  *   5. sketch rows are small (the "bytes, not data" premise).
  *
  * Everything above checks the estimator against ITS OWN declared
  * bands and this library's exact recomputation. The independent
  * third route — the same shingle streams fed to DuckDB's OWN HLL and
  * exact SQL, with the estimation regimes FORCED (HLL lgK=7, theta
  * lgK=9, both well below the stream cardinality) — is
  * `graft.tools.SketchDump` + `tools/sketch_check.py` (885 band checks
  * green at sf0.01, recorded in SCALE.md round 17): a consistently
  * mis-parameterized estimator that stayed inside a self-declared band
  * here would be caught there by an implementation that doesn't share
  * its code.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = {
    // synthetic corpus with a known token structure: 3 sources with
    // overlapping vocabularies; ~200 docs, ~2.4k distinct tokens
    val rnd = new scala.util.Random(7)
    (0 until 200).map { i =>
      val src = s"s${i % 3}"
      val toks = Seq.fill(40)(s"tok_${src}_${rnd.nextInt(1200)}") ++
        Seq.fill(10)(s"shared_${rnd.nextInt(400)}")
      (i.toLong, toks.mkString(" "), src)
    }.toDF("doc_id", "text", "source")
  }

  private lazy val tok = Sketches.tokens(docs)

  test("sharded union tracks single-pass within the sketch error band") {
    val direct = Sketches.distinctSketch(tok, Seq("source"), "tok")
      .as[(String, Long)].collect().toMap
    val merged = Sketches.mergeSketches(
        Sketches.shardSketches(tok, Seq("source"), "tok",
          pmod($"doc_id", lit(16))),
        Seq("source"))
      .as[(String, Long)].collect().toMap
    assert(direct.keySet == Set("s0", "s1", "s2"))
    direct.foreach { case (src, d) =>
      val m = merged(src)
      val rel = math.abs(m - d).toDouble / d
      assert(rel <= 0.02,
        s"$src: shard-then-merge $m vs single-pass $d (rel $rel) — " +
          "beyond the coupon-promotion band")
    }
  }

  test("merge hierarchy stays in the same band: two-level vs flat union") {
    val shards = Sketches.shardSketches(tok, Seq("source"), "tok",
      pmod($"doc_id", lit(16)))
    val flat = Sketches.mergeSketches(shards, Seq("source"))
      .as[(String, Long)].collect().toMap
    // two-level rollup: 16 shards → 4 super-shards (keep sketches) →
    // per-source estimate
    val twoLevel = Sketches.mergeSketches(
        Sketches.unionSketches(
          shards.withColumn("super", pmod($"shard", lit(4))),
          Seq("source", "super")),
        Seq("source"))
      .as[(String, Long)].collect().toMap
    flat.foreach { case (src, f) =>
      val t = twoLevel(src)
      assert(math.abs(t - f).toDouble / f <= 0.02,
        s"$src: hierarchical $t vs flat $f")
    }
  }

  test("deterministic: independent recomputations agree exactly") {
    def run() = Sketches.mergeSketches(
        Sketches.shardSketches(tok, Seq("source"), "tok",
          pmod($"doc_id", lit(16))),
        Seq("source"))
      .as[(String, Long)].collect().toMap
    assert(run() == run(),
      "merged estimate varied across identical recomputations")
  }

  test("estimate within 3-sigma HLL error of exact distinct (lgK=12)") {
    val exact = tok.groupBy($"source")
      .agg(countDistinct($"tok").as("n")).as[(String, Long)]
      .collect().toMap
    val est = Sketches.distinctSketch(tok, Seq("source"), "tok")
      .as[(String, Long)].collect().toMap
    exact.foreach { case (src, n) =>
      val e = est(src)
      val rel = math.abs(e - n).toDouble / n
      assert(rel <= 0.05, s"$src: est $e vs exact $n (rel err $rel)")
    }
  }

  test("persisted sketch rows are KB-sized, not data-sized") {
    val sizes = Sketches.shardSketches(tok, Seq("source"), "tok",
        pmod($"doc_id", lit(16)))
      .select(length($"sketch").cast("long")).as[Long].collect()
    assert(sizes.nonEmpty)
    // lgK=12 → at most 2^12 registers; serialized HLL_4 ≈ 2 KB + header
    assert(sizes.forall(_ <= 8 * 1024),
      s"sketch unexpectedly large: ${sizes.max} bytes")
  }
}
