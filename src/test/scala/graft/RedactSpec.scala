package graft

import graft.ext.Redact
import org.apache.spark.sql.functions._

/** PII redaction patterns and replacement order. */
class RedactSpec extends SparkSpec {

  import spark.implicits._

  private def one(text: String): String =
    Seq(text).toDF("t").select(Redact.redact($"t")).as[String].head()

  test("redacts emails, urls, phones with their tokens") {
    assert(one("mail a.b+c@ex-1.org now") == "mail <EMAIL> now")
    assert(one("go https://a.b/c?d=1#e x") == "go <URL> x")
    assert(one("call 555-123-4567.") == "call <PHONE>.")
  }

  test("url userinfo is swallowed by the URL pass, not half-redacted") {
    assert(one("see http://user@host.com/p") == "see <URL>")
  }

  test("phone boundaries: 4-3-4 digit runs do not match") {
    assert(one("id 5555-123-4567 x") == "id 5555-123-4567 x")
    assert(one("v1.2 stays, 12-34-56 stays") == "v1.2 stays, 12-34-56 stays")
  }

  test("matchCount counts non-overlapping hits") {
    val df = Seq("a@b.co and c@d.io plus https://e.f").toDF("t")
    val (e, u, p) = df.select(
      Redact.matchCount($"t", Redact.EmailPattern),
      Redact.matchCount($"t", Redact.UrlPattern),
      Redact.matchCount($"t", Redact.PhonePattern))
      .as[(Long, Long, Long)].head()
    assert((e, u, p) == (2L, 1L, 0L))
  }
}
