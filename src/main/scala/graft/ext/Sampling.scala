package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-data selection operators (builder brief: the operations a
  * large-scale training pipeline needs beyond the reference surface):
  * deterministic sampling and token-budget mixture assembly.
  *
  * Sampling uses md5-derived hash buckets, NOT `rand()`: the decision
  * for a row is a pure function of (salt, id), so samples are
  * reproducible across runs/engines, stable under repartitioning and
  * retries (a failed task resampling different rows is a classic
  * silent-corruption bug at scale), and exactly replicable by the
  * DuckDB oracle. All per-row map work — no shuffle. */
object Sampling {

  /** 16-bit hash bucket (0..65535) of (salt, id) — the sampling coin. */
  def hashBucket(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 4), 16, 10)
      .cast("long")

  /** Keep ~`fraction` of rows, deterministically by id hash. */
  def deterministicSample(df: DataFrame, id: Column, fraction: Double,
                          salt: String): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction")
    df.filter(hashBucket(id, salt) < math.floor(fraction * 65536).toLong)
  }

  /** Stratified variant: per-stratum keep fractions (e.g. down-weight
    * over-represented languages/sources), `default` for strata not in
    * the map. One codegen'd CASE — no shuffle, no per-stratum pass. */
  def stratified(df: DataFrame, strata: Column, id: Column,
                 fractions: Map[String, Double], default: Double,
                 salt: String): DataFrame = {
    val threshold = fractions.foldLeft(lit(math.floor(default * 65536))) {
      case (acc, (value, f)) =>
        when(strata === value, lit(math.floor(f * 65536))).otherwise(acc)
    }
    df.filter(hashBucket(id, salt) < threshold)
  }

  /** Leakage-safe split assignment: every row of a GROUP (source,
    * domain, repository…) lands in the same split, so near-duplicates
    * and templated siblings — which cluster within a group — can never
    * straddle train/validation and leak. Row-hash splits look unbiased
    * but systematically overstate eval: the validation twin of a
    * training doc is the easiest possible held-out example. `splits`
    * are (name, weight) pairs (weights need not sum to 1 — they are
    * normalized); assignment is the md5 coin on the GROUP key, so it is
    * deterministic, repartition/retry-stable, and oracle-replicable.
    * Pure per-row map work — the group never shuffles. */
  def groupSplit(group: Column, splits: Seq[(String, Double)],
                 salt: String): Column = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), s"bad splits $splits")
    val total = splits.map(_._2).sum
    val coin = hashBucket(group, salt)
    val bounds = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w }
      .tail.map(c => math.floor(c / total * 65536).toLong)
    // last bound is 65536 → the otherwise-branch never fires, but keep
    // the final name as the fallback for exact-boundary safety
    splits.init.zip(bounds.init).foldRight(lit(splits.last._1)) {
      case (((name, _), bound), acc) => when(coin < bound, name).otherwise(acc)
    }
  }

  /** Greedy token-budget selection (data-mixture assembly): within each
    * group, rows in `ord` order are kept while the RUNNING token total
    * stays within `budget` (the row that crosses the budget is
    * dropped, as are all later rows with any ordering — the running sum
    * is monotone only for non-negative token counts, which token
    * counters guarantee). Adds `cum_tokens`. One window shuffle keyed
    * by the group — the same shape as any per-source ordered scan. */
  def tokenBudget(df: DataFrame, group: Seq[Column], ord: Seq[Column],
                  tokens: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(group: _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(tokens).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Concat-and-split sequence packing (the GPT-style pretraining
    * batcher): documents are laid out in `ord` order within each
    * group, the token stream is cut every `seqTokens` tokens, and each
    * document is assigned to the sequence in which it STARTS —
    * `seq_id = floor(tokens_before_this_doc / seqTokens)`. A document
    * that straddles a cut belongs to the sequence holding its head
    * (its tail spills into the next cut), so per-sequence token totals
    * may exceed `seqTokens` by at most one document's tail — exactly
    * the layout a fixed-length training loader consumes.
    *
    * Adds `seq_id` and `cum_tokens` (running total INCLUDING the
    * current document). Same single keyed-window shuffle as
    * [[tokenBudget]]; the running sum is a streaming frame, O(1)
    * state per group. */
  def packSequences(df: DataFrame, group: Seq[Column], ord: Seq[Column],
                    tokens: Column, seqTokens: Long): DataFrame = {
    require(seqTokens > 0, s"seqTokens $seqTokens")
    val w = Window.partitionBy(group: _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(tokens).over(w))
      .withColumn("seq_id",
        floor((col("cum_tokens") - tokens).cast("double") / seqTokens).cast("long"))
  }
}
