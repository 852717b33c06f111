package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact edit-distance-1 similarity self-join via deletion
  * neighborhoods (FastSS / SymSpell blocking) — the entity-resolution
  * sibling of the token-set joins ([[TextOps.jaccardPairs]] for
  * Jaccard, MinHash/SimHash for near-dup): short-string keys (names,
  * titles, product labels) where "similar" means CHARACTER edits, not
  * shared tokens.
  *
  * Blocking property (exact, not approximate): for strings `a`, `b`
  * with Levenshtein distance ≤ 1, the deletion neighborhoods
  * `D(s) = {s} ∪ {s minus one char}` intersect — a substitution at
  * position i means deleting position i from both sides collides, an
  * insertion/deletion means the shorter string itself appears in the
  * longer one's neighborhood. So grouping on neighborhood variants
  * finds EVERY qualifying pair; a final `levenshtein ≤ 1` check
  * discards the false candidates (e.g. two strings one deletion apart
  * from a common third but distance 2 from each other). No distance-
  * qualifying pair can be missed — spec-pinned against the brute-force
  * O(n²) join on random mutated strings.
  *
  * Scale shape: a string of length L emits L+1 variant keys (map-side
  * explode), candidates come from ONE variant-keyed self-join — never
  * an all-pairs comparison; verification is a per-candidate-pair
  * `levenshtein` (codegen'd built-in). Work is Σ(L+1) keys and the
  * join is key-local, so a 10^10-row key table shuffles ~L× its size
  * once. Caveat the scaladoc owes the 100 TB caller: a value
  * duplicated m times yields m²-ish candidates within its variant
  * keys — collapse exact duplicates first (q23's hash-groupBy) when
  * the key column is not near-unique.
  */
object FuzzyJoin {

  /** All pairs (a_id < b_id) from `strs` at Levenshtein distance ≤ 1.
    * Output: (a_id, b_id, a_str, b_str, ed). Identical strings under
    * distinct ids surface with ed = 0 (exact dups are edit-distance-0
    * near-dups; pre-collapse them when that is noise). Input columns:
    * `idCol` (unique id), `strCol` (non-null string). */
  def ed1Pairs(strs: DataFrame, idCol: String, strCol: String): DataFrame = {
    val base = strs.select(col(idCol).as("id"), col(strCol).as("s"))
    // i = 0 keeps the string itself; i in 1..len deletes 1-based char i
    val keys = base
      .select(col("id"), col("s"),
        explode(sequence(lit(0), length(col("s")))).as("i"))
      .select(col("id"), col("s"),
        when(col("i") === 0, col("s"))
          .otherwise(concat(
            col("s").substr(lit(1), col("i") - 1),
            col("s").substr(col("i") + 1, length(col("s")) - col("i"))))
          .as("variant"))
    val a = keys.select(col("id").as("a_id"), col("s").as("a_str"),
      col("variant"))
    val b = keys.select(col("id").as("b_id"), col("s").as("b_str"),
      col("variant"))
    a.join(b, Seq("variant"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_str"), col("b_str"))
      .distinct()
      .withColumn("ed", levenshtein(col("a_str"), col("b_str")).cast("long"))
      .filter(col("ed") <= 1)
  }
}
