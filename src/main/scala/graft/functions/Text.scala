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

  /** BPE-ish subword proxy: word pieces + standalone non-space
    * symbols, the usual pre-tokenizer shape (letters-or-digits runs,
    * else single symbols). A much closer LLM-token estimate than
    * whitespace counting on punctuation-heavy text. */
  val bpeTokenPattern = "[\\p{L}\\p{N}]+|[^\\p{L}\\p{N}\\s]"

  def bpeTokenCount(c: Column): Column = regexp_count(c, lit(bpeTokenPattern))

  /** Flesch reading-ease ([EXT]) — the classic readability feature a
    * corpus-quality stack reports next to the Gopher rules: 206.835 −
    * 1.015·(words/sentences) − 84.6·(syllables/words), with the
    * standard automated approximations (sentences = terminal-punct
    * runs, floored at 1; syllables = vowel-group runs — both shared
    * Java/RE2 regex, so the oracle replays them verbatim). One IEEE
    * chain over the three counts, rounded; wordless docs null. */
  def sentenceCount(c: Column): Column =
    greatest(regexp_count(c, lit("[.!?]+")), lit(1L))

  def syllableCount(c: Column): Column =
    regexp_count(lower(c), lit("[aeiouy]+"))

  def fleschScore(c: Column): Column = {
    val words = tokenCount(c).cast("double")
    val sents = sentenceCount(c).cast("double")
    val syll = syllableCount(c).cast("double")
    when(tokenCount(c) > 0,
      round(lit(206.835) - lit(1.015) * (words / sents)
        - lit(84.6) * (syll / words), 6))
  }

  /** Polynomial rolling hash over the character codepoints
    * (base 31 mod 2^31-1) — an order-sensitive fingerprint that is
    * cheap to compute incrementally and reproducible in any engine
    * with a left fold, unlike a cryptographic hash it can also be
    * windowed. Accumulator stays < 2^36, safe under ANSI. */
  def rollingHash(c: Column): Column =
    aggregate(
      transform(split(c, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31 + x) % 2147483647L)

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

  /** Stopword hits per whitespace token — the classic fluency signal
    * (natural prose ~0.2-0.5; keyword-stuffed/generated text near 0).
    * Complements [[isQuality]]'s structural gates. */
  def stopwordRatio(c: Column, lang: String = "en"): Column =
    stopwordHits(c, stopwordPatterns.toMap.apply(lang)).cast("double") / tokenCount(c)

  /** Composite quality heuristic for corpus filtering (the standard
    * pre-training gates): enough tokens, plausible mean token length,
    * text not dominated by digits or punctuation. Boolean column;
    * thresholds follow common public-corpus filter settings. */
  def isQuality(c: Column, minTokens: Int = 5, maxAvgTokenLen: Double = 15.0,
                maxDigitRatio: Double = 0.3, maxPunctRatio: Double = 0.3): Column =
    (tokenCount(c) >= minTokens) &&
      (avgTokenLen(c) <= maxAvgTokenLen) &&
      (digitRatio(c) <= maxDigitRatio) &&
      (punctCount(c).cast("double") / length(c) <= maxPunctRatio)

  def langId(c: Column): Column = {
    val hits = stopwordPatterns.map { case (l, p) => l -> stopwordHits(c, p) }
    val best = greatest(hits.map(_._2): _*)
    // first (alphabetical) language reaching the max — same CASE chain
    // as the oracle SQL, so ties break identically. Zero hits in every
    // language means we know nothing: "unknown", not the first branch.
    val chain = hits.init.foldRight(lit(hits.last._1): Column) { case ((l, h), rest) =>
      when(h === best, lit(l)).otherwise(rest)
    }
    // null text -> null (the bare fold would fall through every null
    // comparison into the last branch and answer 'zh')
    when(c.isNull, lit(null)).when(best === 0, lit("unknown")).otherwise(chain)
  }

  // ---- character-class profile ([EXT]) ----
  // Per-document composition ratios — the structural mojibake/binary-
  // junk gate: crawl pages that decoded under the wrong charset show
  // U+FFFD replacement chars; binary spills show high "other"; tables
  // and ASCII art show punctuation spikes. All pure length-difference
  // expressions (the punctCount idiom) — no explode, no shuffle.
  def alphaCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "\\p{L}", ""))
  def whitespaceCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "\\s", ""))
  def replacementCharCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "�", ""))
  // the four classes partition every char: alpha + digit + whitespace
  // + punct (non-alnum-non-space, which contains the replacement
  // char) = length; the profile query asserts this identity row-wise
}
