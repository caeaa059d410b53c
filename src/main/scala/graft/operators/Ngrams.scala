package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Word-n-gram operators for training-data hygiene ([EXT]):
  * benchmark decontamination and fixed-budget chunking.
  *
  * Scale notes:
  *  - n-grams are built per-row with array higher-order functions (no
  *    explode until the op genuinely needs one row per gram), so the
  *    fan-out stays inside the scan task;
  *  - decontamination joins the corpus against the benchmark set on
  *    the gram — the benchmark side (thousands of docs) is tiny next
  *    to a 100 TB corpus, so it broadcasts and the corpus never
  *    shuffles;
  *  - chunking is embarrassingly parallel (each doc chunks alone).
  */
object Ngrams {

  /** Word n-grams of whitespace-lowered tokens, as strings. Shorter
    * docs yield an empty array (the `when` guard matters: Spark's
    * `sequence(1, size-n+1)` DESCENDS when size < n and would emit
    * phantom grams).
    *
    * PERF CONTRACT: pass a BOUND token column (project
    * `Text.tokens(lower(text))` to a named column first), not an
    * inline tokenization expression. Higher-order-function lambdas
    * re-evaluate every non-lambda subexpression per element — an
    * inline `split` inside the `slice` makes the gram build O(len²)
    * per document (measured 4.7x wall-clock on the corpus gram pass).
    * An attribute reference just reads the row value. */
  def wordNgramsOfTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** [[wordNgramsOfTokens]] over raw text — convenience for one-off
    * expressions; operators should bind the tokens first (see the
    * perf contract above). */
  def wordNgrams(c: Column, n: Int): Column =
    wordNgramsOfTokens(Text.tokens(lower(c)), n)

  /** Benchmark decontamination: for every training document, the
    * number of distinct word n-grams it shares with ANY benchmark
    * document, and a contamination flag. The standard pre-training
    * hygiene gate (a doc sharing a long n-gram with an eval benchmark
    * leaks the benchmark into training).
    *
    * Shape: the "distinct grams per doc" the count needs is computed
    * PER ROW (`array_distinct` before the explode) — a global
    * `.distinct()` would shuffle every corpus gram for a result the
    * row already determines locally. The benchmark gram set broadcasts
    * (eval suites are small by construction), so the corpus side is
    * never shuffled at all until the tiny post-join hit counts. */
  def decontaminate(train: DataFrame, benchmark: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text",
                    n: Int = 8): DataFrame = {
    val trainGrams = train
      .select(col(idCol).as("doc_id"),
        Text.tokens(lower(col(textCol))).as("__toks"))
      .select(col("doc_id"),
        explode(array_distinct(wordNgramsOfTokens(col("__toks"), n))).as("ng"))
    val benchGrams = benchmark
      .select(Text.tokens(lower(col(textCol))).as("__toks"))
      .select(explode(wordNgramsOfTokens(col("__toks"), n)).as("ng"))
      .distinct()
    val hits = trainGrams.join(broadcast(benchGrams), Seq("ng"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
    train.select(col(idCol).as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared_ngrams"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** NEAR decontamination ([EXT]) — flag training docs whose minhash
    * signature nearly matches ANY benchmark doc, the fuzzy complement
    * of [[decontaminate]]'s exact-n-gram test: a benchmark item that
    * was lightly paraphrased, re-punctuated, or partially quoted into
    * a crawl page shares few exact 8-grams but most of its shingles,
    * and leaks evaluation data all the same (the GPT-3/PaLM-style
    * 13-gram screens miss exactly this class). Same signature family
    * as the dedup path, so thresholds are comparable corpus-wide.
    *
    * Shape: both sides sign once (explode + k min-aggs); candidates
    * come from the banded equi-join (never all-pairs) and verify by
    * signature agreement ≥ `minMatches`/k — the
    * [[Dedup.newNearBySignatures]] machinery verbatim, with the
    * benchmark as "history". The benchmark is tiny next to a 100 TB
    * corpus, so its band and signature sides broadcast. */
  def decontaminateNear(train: DataFrame, benchmark: DataFrame,
                        idCol: String = "doc_id", textCol: String = "text",
                        k: Int = 16, bands: Int = 4,
                        minMatches: Int = 8): DataFrame = {
    val trainSigs = Dedup.minhashSignatures(train, idCol, textCol, k)
      .localCheckpoint() // consumed by the probe AND the final anti-join
    val clean = Dedup.newNearBySignatures(trainSigs,
      Dedup.minhashSignatures(benchmark, idCol, textCol, k),
      k, bands, minMatches)
    train.select(col(idCol).as("doc_id"))
      .join(clean.select(col("doc_id"), lit(true).as("__clean")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("__clean").isNull.as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** Graded benchmark contamination ([EXT]) — [[decontaminate]]'s
    * binary flag fires on a single shared n-gram, which over-drops
    * long documents that quote one benchmark line; the RATE (shared
    * distinct grams / the doc's distinct grams) distinguishes "quotes
    * a sentence" from "IS the benchmark". Pipelines threshold the
    * rate (drop), keep the raw columns (audit), or route mid-rate
    * docs to span-level surgery ([[dupSpans]]).
    *
    * Same scale shape as [[decontaminate]]: per-ROW gram dedup (never
    * a global distinct over corpus grams), benchmark gram set
    * broadcast, corpus unshuffled until the tiny post-join hit
    * counts. Docs shorter than n grams have no grams: rate NULL,
    * never flagged (nothing to leak). The rate divides two exact
    * integers — engine-reproducible to the 6-dp render. */
  def contaminationRate(train: DataFrame, benchmark: DataFrame,
                        idCol: String = "doc_id", textCol: String = "text",
                        n: Int = 8, threshold: Double = 0.05): DataFrame = {
    val grams = train
      .select(col(idCol).as("doc_id"),
        Text.tokens(lower(col(textCol))).as("__toks"))
      .select(col("doc_id"),
        array_distinct(wordNgramsOfTokens(col("__toks"), n)).as("__g"))
    val benchGrams = benchmark
      .select(Text.tokens(lower(col(textCol))).as("__toks"))
      .select(explode(wordNgramsOfTokens(col("__toks"), n)).as("ng"))
      .distinct()
    // ONE pass over the expensive gram build: an earlier draft read
    // `grams` twice (explode branch for hits, size branch for the
    // denominator), and Spark re-evaluates the whole tokenize+n-gram
    // subtree per branch — measured 2x wall-clock at probe scale.
    // explode_outer keeps gram-less docs (count over its NULL row is
    // 0, matching the oracle's COALESCE), the broadcast left join
    // marks benchmark grams, and one doc-keyed aggregate recovers
    // both counts — map-side partials collapse the exploded rows to
    // ~one row per doc before the shuffle.
    grams.select(col("doc_id"), explode_outer(col("__g")).as("ng"))
      .join(broadcast(benchGrams.withColumn("__hit", lit(1))), Seq("ng"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("ng")).as("n_grams"), count(col("__hit")).as("n_shared"))
      .select(col("doc_id"), col("n_grams"), col("n_shared"),
        when(col("n_grams") > 0,
          round(col("n_shared").cast("double") /
            col("n_grams").cast("double"), 6)).as("contamination"),
        when(col("n_grams") > 0,
          col("n_shared").cast("double") /
            col("n_grams").cast("double") >= threshold)
          .otherwise(lit(false)).as("flagged"))
      .orderBy(col("doc_id"))
  }

  /** Inter-source n-gram overlap matrix: for every pair of sources,
    * the number of distinct word n-grams both contain — the corpus
    * AUDIT counterpart of [[decontaminate]]: which crawl sources are
    * republishing each other (mirror sites, syndication, scraped
    * aggregators), and so where near-dup pressure will come from.
    *
    * Shape: (source, gram) pairs dedup per row before the explode
    * (same rationale as decontaminate), one distinct shuffle builds
    * the gram → sources inverted index, and pair expansion happens
    * bucket-locally ([[Dedup.pairsOf]] — never a gram self-join,
    * which would recompute the explode subtree on both sides). A gram
    * appearing in many sources expands quadratically in the SOURCE
    * count only (sources number in the hundreds, not billions);
    * `maxSourcesPerGram` caps even that for stop-gram-heavy corpora
    * (a gram in every source says nothing about pairwise overlap). */
  def sourceOverlap(docs: DataFrame, sourceCol: String = "source",
                    textCol: String = "text", n: Int = 8,
                    maxSourcesPerGram: Int = 0): DataFrame = {
    // grams travel as 60-bit md5-prefix fingerprints, not strings: the
    // distinct shuffle carries 8 bytes/gram instead of the gram text
    // (~2x wall-clock at sf0.1), the hash is engine-portable (same
    // trick as Dedup.shingleHash), and 60 bits keeps the collision
    // expectation ~1e-6 at billions of distinct grams (15 hex digits,
    // not 16 — a 16-digit value can exceed signed-long range in
    // engines that parse the hex literal as signed)
    val gramHash = graft.functions.Portable.fp60(col("ng"))
    val grams = docs.select(col(sourceCol).as("source"),
        Text.tokens(lower(col(textCol))).as("__toks"))
      .select(col("source"),
        explode(array_distinct(wordNgramsOfTokens(col("__toks"), n))).as("ng"))
      .select(col("source"), gramHash.as("ng"))
      .distinct()
    val inverted = grams.groupBy(col("ng"))
      .agg(sort_array(collect_set(col("source"))).as("sources"))
      .where(size(col("sources")) > 1)
    val kept =
      if (maxSourcesPerGram > 0) inverted.where(size(col("sources")) <= maxSourcesPerGram)
      else inverted
    kept.select(explode(Dedup.pairsOf(col("sources"))).as("p"))
      .groupBy(col("p._1").as("source_a"), col("p._2").as("source_b"))
      .agg(count(lit(1)).as("n_shared_grams"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Duplicate-span detection: per-document counts of word n-gram
    * spans that also appear in OTHER documents — the substring-level
    * dedup signal (a là "Deduplicating Training Data Makes Language
    * Models Better": exact repeated spans across a crawl are the
    * strongest memorization risk, and they survive document-level
    * near-dup dedup whenever the surrounding text differs). A doc
    * with a high `dup_span_frac` is mostly boilerplate shared with the
    * rest of the corpus even when no whole-document duplicate exists.
    *
    * Output per input document: `n_spans` (distinct n-gram spans),
    * `n_dup_spans` (spans whose fingerprint occurs in >= 2 documents),
    * `max_span_df` (document frequency of its most-shared span), and
    * `dup_span_frac` (= n_dup_spans / n_spans; NULL when the doc is
    * shorter than n tokens).
    *
    * Shape: per-row distinct BEFORE the explode (a span repeated
    * inside one doc is self-repetition — [[CorpusStats
    * .repetitionSignals]]'s job — not cross-doc sharing), spans travel
    * as 60-bit md5-prefix fingerprints (8 B vs the span text, same
    * trick as [[sourceOverlap]]), document frequency as a window ON
    * the exploded rows (a groupBy+join spelling would recompute the
    * explode subtree — [[CorpusStats.tfIdf]]'s rationale), then one
    * map-side-combinable per-doc aggregate. One shuffle total (by span
    * fingerprint), carrying (fp, doc_id) pairs — the standard
    * inverted-index shuffle, linear in corpus token count. */
  def dupSpans(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
               n: Int = 8): DataFrame = {
    val grams = docs
      .select(col(idCol).as("doc_id"),
        Text.tokens(lower(col(textCol))).as("__toks"))
      .select(col("doc_id"),
        explode(array_distinct(wordNgramsOfTokens(col("__toks"), n))).as("ng"))
      .select(col("doc_id"),
        graft.functions.Portable.fp60(col("ng")).as("fp"))
    val byFp = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    val perDoc = grams
      .withColumn("df", count(lit(1)).over(byFp))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_dup_spans"),
        max(col("df")).as("max_span_df"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("max_span_df"), lit(0L)).as("max_span_df"),
        (col("n_dup_spans").cast("double") / col("n_spans")).as("dup_span_frac"))
      .orderBy(col("doc_id"))
  }

  /** Winnowing document fingerprints ([EXT]) — the rolling-hash
    * fingerprint selection of Schleimer/Wilkerson/Aiken's MOSS
    * (SIGMOD'03 "Winnowing: Local Algorithms for Document
    * Fingerprinting"): hash every word n-gram, slide a window of `w`
    * consecutive gram hashes, and keep each window's MINIMUM hash.
    * The guarantee that makes this the standard substring-overlap
    * sketch: any shared run of >= w + n - 1 tokens between two
    * documents is certain to contribute at least one shared selected
    * fingerprint, while the stored set shrinks to ~2/(w+1) of the
    * grams. [[dupSpans]] keeps EVERY gram (exact span accounting);
    * winnowing is its bounded-size complement for overlap detection
    * at corpus scale.
    *
    * Output: one row per distinct (doc, fingerprint) — the selected
    * fingerprint SET. Tie positions inside a window don't affect the
    * set (ties share the hash value), so the output is deterministic
    * without the paper's rightmost-tie rule. Docs shorter than the
    * window contribute their global minimum (one fingerprint); docs
    * shorter than n tokens have no grams and are absent.
    *
    * Shape: grams never leave their scan task (per-row HOF build,
    * [[wordNgramsOfTokens]]'s bound-tokens contract); the only
    * shuffle is the per-doc window (partitions bounded by document
    * length, the same discipline as [[dupSpans]]'s df window);
    * fingerprints travel as 60-bit md5 prefixes ([[sourceOverlap]]'s
    * portable-hash trick). */
  def winnowFingerprints(docs: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text",
                         n: Int = 3, w: Int = 4): DataFrame = {
    require(n > 0 && w > 0, s"gram size and window must be positive: n=$n w=$w")
    val grams = docs
      .select(col(idCol).as("doc_id"),
        Text.tokens(lower(col(textCol))).as("__toks"))
      .select(col("doc_id"),
        posexplode(wordNgramsOfTokens(col("__toks"), n)).as(Seq("pos", "ng")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        graft.functions.Portable.fp60(col("ng")).as("fp"))
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val tail = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      .orderBy(col("pos")).rowsBetween(0, w - 1)
    grams
      .withColumn("__m", count(lit(1)).over(byDoc))
      .withColumn("__wmin", min(col("fp")).over(tail))
      // window STARTS only: pos <= m - w (trailing partial windows
      // would select extra fingerprints the algorithm doesn't); a doc
      // with fewer grams than the window keeps pos 0, whose partial
      // window is exactly the whole-doc minimum
      .where(col("pos") <= greatest(col("__m") - w, lit(0L)))
      .select(col("doc_id"), col("__wmin").as("fp"))
      .distinct()
      .orderBy(col("doc_id"), col("fp"))
  }

  /** Winnowed-overlap join ([EXT]): document pairs sharing at least
    * `minShared` selected fingerprints — MOSS's plagiarism-candidate
    * report, and here the substring-level complement of the minhash
    * document near-dup join (minhash scores WHOLE-document Jaccard;
    * winnowing overlap fires on a single long shared passage inside
    * otherwise-unrelated documents).
    *
    * Shape: inverted index on the fingerprint, pair expansion
    * bucket-locally via [[Dedup.pairsOf]] (never a self-join — same
    * rationale as [[sourceOverlap]]); `maxDocsPerFp` caps hot
    * fingerprints (ubiquitous boilerplate says nothing pairwise, and
    * the cap bounds the quadratic expansion exactly like the LSH
    * bucket caps). */
  def winnowOverlap(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", n: Int = 3, w: Int = 4,
                    minShared: Int = 2, maxDocsPerFp: Int = 0): DataFrame = {
    val inverted = winnowFingerprints(docs, idCol, textCol, n, w)
      .groupBy(col("fp"))
      .agg(sort_array(collect_set(col("doc_id"))).as("docs"))
      .where(size(col("docs")) > 1)
    val kept =
      if (maxDocsPerFp > 0) inverted.where(size(col("docs")) <= maxDocsPerFp)
      else inverted
    kept.select(explode(Dedup.pairsOf(col("docs"))).as("p"))
      .groupBy(col("p._1").as("doc_a"), col("p._2").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_fps"))
      .where(col("n_shared_fps") >= minShared)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Fixed-token-budget chunking: each document split into consecutive
    * `chunkSize`-token windows (last chunk ragged) — the layout step
    * before embedding or packing a long-document corpus. Tokens keep
    * their original case/order; one output row per (doc, chunk). */
  def chunk(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
            chunkSize: Int = 16): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive: $chunkSize")
    val toks = Text.tokens(col(textCol))
    val lastIdx = floor((size(toks) - lit(1)) / lit(chunkSize)).cast("int")
    docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), toks.as("__t"),
        explode(sequence(lit(0), lastIdx)).as("chunk_idx"))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        size(slice(col("__t"), col("chunk_idx") * chunkSize + lit(1), lit(chunkSize)))
          .cast("long").as("n_chunk_tokens"),
        concat_ws(" ",
          slice(col("__t"), col("chunk_idx") * chunkSize + lit(1), lit(chunkSize)))
          .as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }
}
