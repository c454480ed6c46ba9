package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TestSpark

/** Redaction behavior of the t_pii_scrub expression over injected PII
  * fixtures (the registered corpus is PII-free, so its oracle only pins
  * the wiring — the patterns are pinned here). */
class PiiScrubSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def scrub(text: String): (String, Long) = {
    import spark.implicits._
    val row = Seq(text).toDF("text")
      .selectExpr(TextAnalysis.sparkScrub("text") + " AS scrubbed",
        TextAnalysis.sparkRedactionCount("text") + " AS n")
      .head()
    (row.getString(0), row.getLong(1))
  }

  test("emails, URLs, phones and IPs are redacted with typed placeholders") {
    assert(scrub("contact jane.doe+spam@example.co.uk for details") ==
      ("contact <EMAIL> for details", 1L))
    assert(scrub("see https://example.com/a?b=c#d and http://t.co/x") ==
      ("see <URL> and <URL>", 2L))
    assert(scrub("call +1 (555) 123-4567 or 555-987-6543 today") ==
      ("call <PHONE> or <PHONE> today", 2L))
    assert(scrub("server at 192.168.0.1 timed out") ==
      ("server at <IP> timed out", 1L))
  }

  test("an email inside a URL is redacted as the URL, counted once each") {
    val (s, n) = scrub("login via https://example.com/reset?user=a@b.com now")
    assert(s == "login via <URL> now")
    // counts run per-pattern over the RAW text: the URL match and the
    // email-inside-URL both count (documented semantics)
    assert(n == 2L)
  }

  test("clean text passes through untouched with zero redactions") {
    val (s, n) = scrub("the quick brown fox jumps over the lazy dog")
    assert(s == "the quick brown fox jumps over the lazy dog")
    assert(n == 0L)
  }
}
