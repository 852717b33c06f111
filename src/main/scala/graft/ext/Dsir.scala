package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR) — hashed-n-gram
  * importance weighting for pretraining-data selection (Xie et al.,
  * "Data Selection for Language Models via Importance Resampling",
  * NeurIPS 2023, public method). Given a corpus where a (small) subset
  * is marked as the TARGET distribution (e.g. curated/wiki-like text)
  * and the rest is the RAW pool, score every document by how much more
  * likely its hashed n-gram features are under the target's bag-of-
  * n-grams model than under the raw pool's:
  *
  *   log w(doc) = Σ_{gram g in doc} [ log p̂_target(bucket(g))
  *                                   − log p̂_raw(bucket(g)) ]
  *
  * with add-α smoothed bucket probabilities p̂(b) = (count_b + α) /
  * (total + α·B). Selection then samples ∝ w via the Gumbel-max trick:
  * key(doc) = log w(doc) + g(doc) where g = −ln(−ln(u)) and u is a
  * DETERMINISTIC md5-derived uniform (the [[Sampling]] coin —
  * reproducible across retries and repartitioning, unlike `rand()`),
  * so "take the top-K keys" is an exact weighted sample without
  * replacement that any two runs (and the DuckDB oracle) agree on.
  *
  * ==Features==
  * Whitespace unigrams + bigrams (the published recipe), hashed into
  * `buckets` buckets via md5 — the same cross-engine-reproducible hash
  * arithmetic as [[Sampling]]/q24 (first 8 md5 hex chars as an int,
  * mod B), so the oracle recomputes identical bucket ids.
  *
  * ==Scale shape (100 TB)==
  * Two passes over the map-only tokenize+explode stream. By default the
  * stream is persisted (MEMORY_AND_DISK, graft.Caching contract) so the
  * two passes share one tokenize+explode+hash computation; when memory
  * is tight `SPARK_GRAFT_DSIR_PERSIST=0` drops the cache and recomputes
  * the map-only pass per branch — the SpanDedup 8g-heap measurement
  * (SCALE.md round 16) showed recompute beats caching a
  * corpus-token-sized frame exactly when memory is tight:
  *   1. model pass: groupBy(bucket) over the gram stream → 2·B partial
  *      rows per task (map-side combine), ONE tiny shuffle to B rows;
  *      totals are a 1-row agg over that, joined back broadcast.
  *   2. scoring pass: each gram occurrence joins the B-row log-ratio
  *      table BROADCAST (map-only), then ONE doc-keyed shuffle with
  *      map-side partial aggregation carries one (count, Σ lr) pair
  *      per (task, doc) — the single corpus-sized wide dependency.
  * Nothing is all-pairs, nothing collects to the driver, and the
  * model is O(B) rows regardless of corpus size.
  */
object Dsir {

  /** Deterministic bucket id in [0, buckets) for a gram string —
    * md5-based so DuckDB reproduces it bit-for-bit. */
  def bucketOf(gram: Column, buckets: Int): Column =
    conv(substring(md5(gram), 1, 8), 16, 10).cast("long") % buckets

  /** One row per unigram/bigram occurrence: (idCol, __tgt, __bucket).
    * Map-only (tokenize + explode + hash); `sequence` is guarded so a
    * 1-token doc contributes no descending [0,-1] bigram range. */
  def featureRows(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, buckets: Int): DataFrame = {
    val ws = TextOps.words(coalesce(col(textCol), lit("")))
    val bigrams = when(size(col("__ws")) < 2,
        array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(col("__ws")) - 2),
        i => concat(element_at(col("__ws"), i + 1), lit(" "),
          element_at(col("__ws"), i + 2))))
    docs.select(col(idCol), isTarget.as("__tgt"), ws.as("__ws"))
      .select(col(idCol), col("__tgt"),
        explode(concat(col("__ws"), bigrams)).as("__gram"))
      .select(col(idCol), col("__tgt"),
        bucketOf(col("__gram"), buckets).as("__bucket"))
  }

  /** Opt-out for the corpus-token-sized feature-stream persist in
    * [[importanceWeights]] (`SPARK_GRAFT_DSIR_PERSIST=0`): the
    * MEMORY_AND_DISK cache of the gram stream competes with the wide
    * aggregations for unified memory exactly like SpanDedup's
    * `persistOcc` (SCALE.md round 16 — the 8 GB-heap leg died with the
    * cache on and completed with it off), so a tight-memory 100 TB run
    * flips this off and recomputes the map-only pass per branch. */
  private def persistFeats: Boolean =
    !sys.env.get("SPARK_GRAFT_DSIR_PERSIST").contains("0")

  /** Per-document importance weights + deterministic Gumbel selection
    * keys: (idCol, n_feats, log_w, sel_key). `saltedKey` controls the
    * Gumbel coin so different selection rounds draw fresh noise. */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column, buckets: Int = 1024,
                        alpha: Double = 1.0,
                        salt: String = "dsir"): DataFrame = {
    // The gram stream feeds the model pass AND the scoring pass, and
    // the B-row model feeds the totals AND the ratio table — unpersisted
    // they are four full tokenize+explode+md5 passes over the corpus
    // (r22 plan audit: three parquet scans with Generate). Persist the
    // narrow (id, tgt, bucket) stream once via the graft.Caching
    // contract (guide §5: reuse beats recompute while memory allows;
    // callers release after their terminal action) — opt-out above for
    // the tight-heap recompute story. The model persist is B rows
    // (bucket count, never corpus-sized) and unconditionally safe.
    val featsRaw = featureRows(docs, idCol, textCol, isTarget, buckets)
    val feats =
      if (persistFeats) graft.Caching.persisted(featsRaw) else featsRaw
    // model pass: B rows; map-side combine makes the shuffle ~2B rows/task
    val model = graft.Caching.persisted(feats.groupBy(col("__bucket"))
      .agg(sum(when(col("__tgt"), 1L).otherwise(0L)).as("__ct"),
        sum(when(col("__tgt"), 0L).otherwise(1L)).as("__cr")))
    val totals = model.agg(sum(col("__ct")).cast("double").as("__tt"),
      sum(col("__cr")).cast("double").as("__tr"))
    val b = lit(buckets.toDouble)
    val a = lit(alpha)
    val lr = model.join(broadcast(totals))
      .select(col("__bucket"),
        (log((col("__ct") + a) / (col("__tt") + a * b)) -
          log((col("__cr") + a) / (col("__tr") + a * b))).as("__lr"))
    // scoring pass: broadcast the B-row ratio table onto the gram
    // stream; ONE doc-keyed shuffle with partial aggregation
    val u = (bucketCoin(col(idCol), salt) + lit(0.5)) / lit(65536.0)
    feats.join(broadcast(lr), "__bucket")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("__lr")).as("log_w"))
      .withColumn("sel_key", col("log_w") - log(-log(u)))
  }

  /** The [[Sampling]] md5 coin: uniform integer in [0, 65536). */
  private def bucketCoin(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 4),
      16, 10).cast("long")
}
