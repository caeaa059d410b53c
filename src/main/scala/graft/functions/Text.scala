package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar surface for the LLM-data-pipeline extensions
  * (SURVEY.md §2.2 [EXT]): tokenization, fingerprinting, quality
  * scoring, language ID. All pure built-in `functions._` — codegen'd,
  * no UDFs, so they stay inside whole-stage codegen on a 100 TB scan.
  */
object Text {

  /** Whitespace tokenization. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Case/whitespace-normalized text (shared by fingerprint + dedup). */
  def normalized(c: Column): Column = trim(regexp_replace(lower(c), "\\s+", " "))

  /** Document fingerprint: sha256 of normalized text — the exact-dup
    * key for dedup at scale. */
  def fingerprint(c: Column): Column = sha2(normalized(c), 256)

  /** Quality metrics (length / punctuation / digit / whitespace
    * ratios) — standard pre-training corpus filters. */
  def nonSpaceChars(c: Column): Column = length(regexp_replace(c, "\\s", ""))
  def digitCount(c: Column): Column = length(c) - length(regexp_replace(c, "[0-9]", ""))
  def punctCount(c: Column): Column = length(c) - length(regexp_replace(c, "[^\\p{L}\\p{N}\\s]", ""))

  def avgTokenLen(c: Column): Column =
    nonSpaceChars(c).cast("double") / tokenCount(c)

  def digitRatio(c: Column): Column =
    digitCount(c).cast("double") / length(c)

  /** Stopword-hit counts per language; language ID = first language
    * (alphabetical) achieving the max count. Deterministic, SQL-
    * expressible, no model dependency. */
  val stopwordPatterns: Seq[(String, String)] = Seq(
    "de" -> "\\b(der|die|das|und|ist|ein|nicht)\\b",
    "en" -> "\\b(the|and|of|to|in|is|a)\\b",
    "es" -> "\\b(el|los|de|que|y|es|una)\\b",
    "fr" -> "\\b(le|les|et|des|un|dans|est)\\b",
    "zh" -> "[\\u4e00-\\u9fff]")

  def stopwordHits(c: Column, pattern: String): Column =
    regexp_count(lower(c), lit(pattern))

  def langId(c: Column): Column = {
    val hits = stopwordPatterns.map { case (l, p) => l -> stopwordHits(c, p) }
    val best = greatest(hits.map(_._2): _*)
    // first (alphabetical) language reaching the max — same CASE chain
    // as the oracle SQL, so ties break identically. Zero hits in every
    // language means we know nothing: "unknown", not the first branch.
    val chain = hits.init.foldRight(lit(hits.last._1): Column) { case ((l, h), rest) =>
      when(h === best, lit(l)).otherwise(rest)
    }
    when(best === 0, lit("unknown")).otherwise(chain)
  }
}
