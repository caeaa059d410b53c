package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ScrubSpec extends SparkSuite {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): String =
    Seq(text).toDF("t").select(c.as("r")).head().getString(0)

  test("piiScrub redacts emails, SSNs, phones, and IPs with typed markers") {
    val in = "mail a.user+tag@sub.example.co.uk, ssn 123-45-6789, " +
      "call 555-867-5309 or 555.867.5309, host 192.168.1.254 end"
    val out = one(in, Scrub.piiScrub(col("t")))
    assert(out === "mail <EMAIL>, ssn <SSN>, call <PHONE> or <PHONE>, host <IP> end")
  }

  test("piiScrub leaves clean text untouched; counts are exact") {
    val clean = "no personal data here, just words and the number 42"
    assert(one(clean, Scrub.piiScrub(col("t"))) === clean)
    val in = "a@b.co c@d.org 123-45-6789 10.0.0.1"
    val counts = Seq(in).toDF("t").select(
      Scrub.emailCount(col("t")).as("e"), Scrub.ssnCount(col("t")).as("s"),
      Scrub.phoneCount(col("t")).as("p"), Scrub.ipCount(col("t")).as("i")).head()
    assert((counts.getInt(0), counts.getInt(1), counts.getInt(2), counts.getInt(3))
      === ((2, 1, 0, 1)))
  }

  test("ssn is redacted as SSN, never half-matched as a phone") {
    assert(one("123-45-6789", Scrub.piiScrub(col("t"))) === "<SSN>")
  }

  test("normalizeText strips tags, decodes entities, collapses whitespace, lowercases") {
    val in = "<div class=\"x\"><p>Hello&nbsp;BIG   World</p> &amp; more &lt;ok&gt;</div>\r\n"
    assert(one(in, Scrub.normalizeText(col("t"))) === "hello big world & more <ok>")
  }

  test("normalizeText decodes entities only after tag stripping") {
    // &lt;b&gt; decodes to <b> — it must survive as text, not be
    // stripped as a tag
    assert(one("x &lt;b&gt; y", Scrub.normalizeText(col("t"))) === "x <b> y")
  }

  test("normalizeText decodes &amp; last — escaped entities do not double-decode") {
    // an author writing the literal text "&lt;" escapes it as &amp;lt;
    // — normalization must yield the text "&lt;", never decode it a
    // second time into "<"
    assert(one("show &amp;lt; here", Scrub.normalizeText(col("t"))) === "show &lt; here")
  }
}
