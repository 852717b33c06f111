package graft.ext

import graft.plans.GraftExtensions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-prefiltered EXACT anti-join — "remove every row whose key is in
  * a blocklist" at fact scale (decontamination against a banned-content
  * set, retraction lists, already-trained-on ids).
  *
  * A plain `left_anti` shuffles the entire big side on the key. Here the
  * blocklist folds into a bloom filter (one small-side aggregate, a
  * few MB even for 10^9 keys), and the big side splits into two map-only
  * branches:
  *   - `might_contain = false` (the overwhelming majority when the
  *     blocklist is a small fraction of the corpus): definitely not
  *     blocked — emitted directly, never reaches an exchange;
  *   - `might_contain = true` (true matches + the fpp sliver): routed
  *     through the exact anti-join, which now shuffles only candidates.
  *
  * The union is EXACTLY the anti-join result: bloom filters have no
  * false negatives, and the false positives are re-checked by the exact
  * join. The big side is scanned twice (both branches), which at scale
  * is the right trade — scans are parallel map work, the exchange is
  * the bottleneck being avoided. Null big-side keys never match (SQL
  * anti-join semantics): the probe returns false for nulls, so they
  * surface through the direct branch.
  */
object BloomPrune {

  /** `big` rows whose `bigKey` equals no `smallKey` value.
    * `expectedItems` sizes the filter — pass the blocklist's
    * approximate distinct count; `fpp` trades blob size for how much
    * of the big side takes the exact-join detour. */
  def antiJoin(big: DataFrame, bigKey: Column, small: DataFrame,
               smallKey: Column, expectedItems: Long,
               fpp: Double = 0.01): DataFrame = {
    GraftExtensions.register(big.sparkSession)
    // one global aggregate over the small side; the blob is driver-size
    // (O(bits)), injected as a literal so the probe deserializes once
    val blob = small
      .select(call_function("graft_bloom", smallKey, lit(expectedItems),
        lit(fpp)).as("b"))
      .head().getAs[Array[Byte]](0)
    val might = call_function("graft_bloom_contains", lit(blob), bigKey)
    val direct = big.filter(!might)
    val candidates = big
      .filter(might)
      .join(small.select(smallKey.as("__bloom_key")).distinct(),
        bigKey === col("__bloom_key"), "left_anti")
    direct.unionByName(candidates)
  }
}
