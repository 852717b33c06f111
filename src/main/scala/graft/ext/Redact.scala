package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training text: regex redaction of emails, URLs,
  * and phone numbers (the pre-training cleanup step every public-web
  * corpus pipeline runs). Pure per-row codegen'd expressions — no UDF,
  * no shuffle; a full-corpus redaction pass is a map-only scan.
  *
  * Patterns are kept to the portable subset that means the same thing
  * in Java regex (Spark) and RE2 (DuckDB/Go tooling), so redaction is
  * auditable by an independent engine. Redaction order is URL → email
  * → phone: a URL may carry userinfo (`https://a@b.c`) that the email
  * pattern would otherwise half-match; nothing in an email or phone
  * matches the URL pattern.
  */
object Redact {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^\\s]+"
  val PhonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Non-overlapping match count of one pattern. */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Text with URLs, then emails, then phones replaced by tokens. */
  def redact(text: Column): Column = {
    val noUrl = regexp_replace(text, UrlPattern, "<URL>")
    val noEmail = regexp_replace(noUrl, EmailPattern, "<EMAIL>")
    regexp_replace(noEmail, PhonePattern, "<PHONE>")
  }
}
