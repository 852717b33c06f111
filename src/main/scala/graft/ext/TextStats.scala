package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives: token counting, quality scoring, and a
  * stopword-profile language-ID heuristic — per-row expressions over the
  * `documents` table (builder brief "text analysis"). The NILM reference
  * has no text plane; these extend the engine for LLM-data pipelines.
  *
  * Constants are mirrored verbatim into the DuckDB oracle by
  * [[graft.queries.DocumentQueries]].
  *
  * Scale note: [[stopwordHits]] / [[meanWordLen]] / [[predictLang]] are
  * array higher-order functions — interpreted, and convenient for
  * ad-hoc per-row use. Fact-scale scans should use the explode +
  * conditional-sum formulation instead (see q30 in DocumentQueries:
  * one codegen'd map-side-combinable aggregation, ~40% faster at sf0.1
  * and the gap widens with document length).
  */
object TextStats {

  /** Small per-language stopword profiles for the n-gram/stopword
    * language-ID heuristic. Order matters: argmax ties resolve in this
    * sequence (en first). */
  val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "dans", "les"))

  /** BPE-ish tokenizer regex: letter runs, digit runs, single symbols.
    * Kept to a portable subset (same semantics in Java regex & RE2). */
  val BpeishPattern = "[a-z0-9]+|[^a-z0-9\\s]"

  def whitespaceTokenCount(text: Column): Column =
    size(TextOps.words(text)).cast("long")

  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0))).cast("long")

  /** Count of tokens present in a stopword list. */
  def stopwordHits(w: Column, stop: Seq[String]): Column =
    size(filter(w, x => x.isin(stop.map(s => s: Any): _*))).cast("long")

  def meanWordLen(w: Column): Column =
    aggregate(w, lit(0L), (a, x) => a + length(x)).cast("double") / size(w)

  /** Language with the highest stopword-hit count; ties go to the first
    * profile in [[StopwordProfiles]] order ("unk" when nothing hits). */
  def predictLang(w: Column): Column = {
    val scores = StopwordProfiles.map { case (l, stop) => l -> stopwordHits(w, stop) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("unk"): Column) { case ((l, sc), els) =>
      when(sc > 0 && sc === best, lit(l)).otherwise(els)
    }
  }

  /** Composite doc-quality score in [0,1]: stopword density plus a
    * saturating length credit (200 tokens → full credit). */
  def qualityScore(nTokens: Column, stopRatio: Column): Column =
    round(lit(0.5) * stopRatio + lit(0.5) * least(nTokens / lit(200.0), lit(1.0)), 4)
}
