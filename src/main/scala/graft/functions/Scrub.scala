package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing and text normalization for pre-training corpora
  * ([EXT] — the cleaning surface a 100 TB pipeline runs before
  * anything else; complements [[graft.operators.Anonymize]]'s keyed
  * hashing, reference: src/helpers/preprocessing_data.py:64-83).
  *
  * All pure built-in `regexp_replace`/`replace` chains — codegen'd,
  * scan-parallel, no UDFs. Patterns stick to the regex subset shared
  * by Java and RE2 (no lookarounds), so the DuckDB oracles run the
  * IDENTICAL expressions.
  */
object Scrub {

  /** PII patterns (ordered: more-specific first, so the SSN never
    * half-matches as a phone). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnPattern = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val PhonePattern = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val Ipv4Pattern = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"

  def emailCount(c: Column): Column = regexp_count(c, lit(EmailPattern))
  def ssnCount(c: Column): Column = regexp_count(c, lit(SsnPattern))
  def phoneCount(c: Column): Column = regexp_count(c, lit(PhonePattern))
  def ipCount(c: Column): Column = regexp_count(c, lit(Ipv4Pattern))

  /** Replace every PII hit with a typed redaction marker. Order is
    * load-bearing and mirrored in the oracle SQL: email, SSN, phone,
    * IP — the markers themselves contain no digits, so later passes
    * never re-match earlier redactions. */
  def piiScrub(c: Column): Column = {
    val e = regexp_replace(c, EmailPattern, "<EMAIL>")
    val s = regexp_replace(e, SsnPattern, "<SSN>")
    val p = regexp_replace(s, PhonePattern, "<PHONE>")
    regexp_replace(p, Ipv4Pattern, "<IP>")
  }

  /** Web-text normalization: strip markup tags, decode the common
    * HTML entities, collapse whitespace, lowercase. Two orderings are
    * load-bearing (and mirrored exactly in the oracle SQL): tag-strip
    * runs BEFORE entity decode (a decoded `&lt;` must not create a new
    * "tag"), and `&amp;` decodes LAST — decoding it first would
    * double-decode escaped entities (`&amp;lt;`, an author writing the
    * literal text "&lt;", must become `&lt;`, not `<`). */
  def normalizeText(c: Column): Column = {
    val untagged = regexp_replace(c, "<[^>]*>", " ")
    val decoded = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&amp;" -> "&")
      .foldLeft(untagged) { case (acc, (from, to)) => regexp_replace(acc, from, to) }
    lower(trim(regexp_replace(decoded, "\\s+", " ")))
  }
}
