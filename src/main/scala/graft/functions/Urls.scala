package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL surface for web-crawl corpora ([EXT]) — the first thing a
  * common-crawl-shaped pipeline does with a row is decide its host,
  * registrable domain, and canonical (tracking-free) URL: dedup keys,
  * politeness partitions, and per-domain quality stats all hang off
  * these. All pure codegen'd built-ins (`parse_url`, `regexp_replace`)
  * in the Java/RE2-shared regex subset, so DuckDB oracles replay the
  * normalization verbatim; the parse itself is certified by stating
  * expected parts FROM the table on synthesized URLs (the
  * builder ∘ parser == identity scheme the multimodal headers use).
  */
object Urls {

  def host(c: Column): Column = lower(parse_url(c, lit("HOST")))
  def path(c: Column): Column = parse_url(c, lit("PATH"))
  def queryParam(c: Column, key: String): Column =
    parse_url(c, lit("QUERY"), lit(key))

  /** Registrable-domain approximation: the last two host labels.
    * Correct for generic TLDs; multi-label public suffixes
    * (co.uk, com.au) need a public-suffix list — a lookup TABLE
    * joined by suffix in production, not a code change. */
  def domain(c: Column): Column =
    regexp_extract(host(c), "([^.]+\\.[^.]+)$", 1)

  /** Canonical URL: strip tracking parameters (utm_*, gclid, fbclid)
    * and tidy the separators they leave behind. The param name is
    * ANCHORED to its separator — `([?&])` must immediately precede it
    * and is kept via `$1` — so a legitimate param whose name merely
    * contains a tracking name survives (`?xgclid=1`, `?my_utm_test=2`
    * were previously mangled to `?x` / `?my_`; canonical URLs serve
    * as dedup keys, where that silently merges distinct URLs). Order
    * is load-bearing and mirrored in the oracle: anchored pair
    * removal, '&' collapse, '?&' repair, trailing-separator trim. */
  def stripTracking(c: Column): Column = {
    val noPairs = regexp_replace(c, "([?&])(utm_[a-z]+|gclid|fbclid)=[^&#]*", "$1")
    val collapsed = regexp_replace(noPairs, "&+", "&")
    val fixedHead = regexp_replace(collapsed, "\\?&", "?")
    regexp_replace(fixedHead, "[?&]+$", "")
  }
}
