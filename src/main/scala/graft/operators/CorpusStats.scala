package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Corpus-level text statistics ([EXT]): TF-IDF term weighting and
  * repetition (degenerate-text) signals — the scoring layer of a
  * training-data quality pipeline, next to [[graft.functions.Text]]'s
  * per-document structural gates.
  */
object CorpusStats {

  /** Per-(document, term) TF-IDF over whitespace-lowered tokens:
    * `tf * ln((N+1)/(df+1))` with add-one smoothing, `minTf` pruning
    * low-signal rows.
    *
    * Shape: one explode + one hash aggregate to (doc, term) counts
    * (map-side partials absorb the token fan-out), then doc frequency
    * as `count over (partition by term)` ON the tf rows — a
    * `tf.groupBy(term)` + join spelling would recompute the whole
    * explode+aggregate subtree a second time (self-joins don't reuse
    * the build side's exchange), the dominant cost at corpus scale.
    * The 1-row corpus count broadcasts back. The rounded weight keeps
    * the value comparable across engines (ln is the one non-rational
    * step). */
  def tfIdf(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
            minTf: Int = 2): DataFrame = {
    val terms = docs.select(col(idCol).as("doc_id"),
      explode(Text.tokens(lower(col(textCol)))).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val byTerm = org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    tf.withColumn("df", count(lit(1)).over(byTerm))
      .crossJoin(broadcast(total))
      .where(col("tf") >= minTf)
      .select(
        col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("tf").cast("double") *
          log((col("n_docs") + lit(1)).cast("double") / (col("df") + lit(1))), 6)
          .as("tfidf"))
      .orderBy(col("doc_id"), col("term"))
  }

  /** Unigram language-model document score (perplexity proxy, [EXT]):
    * each doc's total log-probability under the corpus's OWN unigram
    * distribution, `sum over tokens of ln(count(term)/N)`. Low
    * per-token logprob = rare-token soup (OCR noise, gibberish,
    * wrong-language shards); implausibly high = boilerplate. The
    * cheap member of the model-based quality-filter family — same
    * output contract a real LM scorer would have, no model needed.
    *
    * Shape mirrors [[tfIdf]]: one explode + one (doc,term) aggregate,
    * corpus term counts as a window ON those rows (a groupBy+join
    * would recompute the explode subtree), and the corpus token total
    * N from a separate no-explode scan (`sum(size(tokens))`) that
    * broadcast-joins back. Per-term contributions are rounded then
    * decimal-cast BEFORE the final sum so the result is order-
    * independent (double sums aren't associative; decimal sums are). */
  def unigramLogprob(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val terms = docs.select(col(idCol).as("doc_id"),
      explode(Text.tokens(lower(col(textCol)))).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val byTerm = org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
    val total = docs.agg(
      sum(size(Text.tokens(lower(col(textCol))))).cast("long").as("n_tok"))
    tf.withColumn("cnt", sum(col("tf")).over(byTerm))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("tf"),
        round(col("tf") * log(col("cnt").cast("double") / col("n_tok").cast("double")), 6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("contrib"))
      .groupBy(col("doc_id"))
      // decimal sum (exact, order-independent) RENDERED as double —
      // the repo-wide `dsum` convention: raw DECIMAL output hashes
      // differently across engines (scale/trailing-zero repr), double
      // is canonical. The cast happens AFTER the sum, so exactness of
      // the aggregation is unaffected.
      .agg(sum(col("tf")).cast("long").as("n_tokens"),
        sum(col("contrib")).cast("double").as("logprob"))
      .orderBy(col("doc_id"))
  }

  /** Per-document token-distribution Shannon entropy ([EXT]) — the
    * standard model-free diversity signal in corpus quality gates:
    * `H = ln(n) - (sum over terms of c·ln c)/n` for token counts c
    * summing to n. Near-zero entropy = one token repeated (boilerplate,
    * keyword stuffing); entropy near ln(n_distinct) = maximally mixed.
    * Complements [[repetitionSignals]] (which looks at ADJACENT
    * structure) and [[unigramLogprob]] (which scores against the
    * CORPUS distribution — entropy is the doc's own).
    *
    * Shape: one explode + one (doc, term) aggregate + one per-doc
    * aggregate — no window, no join, no second scan (the identity
    * above needs only per-term counts, never per-term probabilities,
    * so nothing global is consulted). The c·ln c contributions are
    * rounded then DECIMAL-summed (order-independent, the repo's dsum
    * convention); the final entropy is one double expression on
    * exact inputs. */
  def tokenEntropy(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val terms = docs.select(col(idCol).as("doc_id"),
      explode(Text.tokens(lower(col(textCol)))).as("term"))
    terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .select(col("doc_id"), col("tf"),
        round(col("tf") * log(col("tf").cast("double")), 6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("contrib"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("n_distinct"),
        sum(col("contrib")).as("__s"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        round(log(col("n_tokens").cast("double")) -
          col("__s").cast("double") / col("n_tokens").cast("double"), 6)
          .as("entropy"))
      .orderBy(col("doc_id"))
  }

  /** Per-source "dataset card" rollup — the summary table a
    * training-data pipeline publishes with a corpus release: document
    * and token volumes, length spread, language mix, and the share of
    * documents passing the quality gate, one row per source.
    *
    * One map-side-combined aggregate over one scan; all per-document
    * inputs ([[Text.bpeTokenCount]], [[Text.isQuality]], language)
    * ride the scan as projections. Token sums are BIGINT (a 100 TB
    * corpus overflows int32 token totals ~immediately); the quality
    * share is an integer ratio computed at the end (order-independent,
    * engine-exact). */
  def corpusCard(docs: DataFrame, sourceCol: String = "source",
                 textCol: String = "text", langCol: String = "lang"): DataFrame =
    docs
      .select(col(sourceCol).as("source"),
        Text.bpeTokenCount(col(textCol)).cast("long").as("__tok"),
        when(Text.isQuality(col(textCol)), 1L).otherwise(0L).as("__q"),
        col(langCol).as("__lang"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__tok")).as("n_tokens"),
        min(col("__tok")).as("min_tokens"),
        max(col("__tok")).as("max_tokens"),
        countDistinct(col("__lang")).as("n_langs"),
        sum(col("__q")).as("n_quality"))
      // basis points via INTEGER division (`div`, not `/`): `/` is
      // double division whose truncation can land one off the exact
      // integer quotient — the oracle's `//` never can
      .withColumn("quality_pct", expr("n_quality * 10000 DIV n_docs"))
      .orderBy(col("source"))

  /** Vocabulary-coverage report: build the top-`vocabSize` token
    * vocabulary by corpus frequency, then score every document by how
    * much of it the vocabulary covers — the go/no-go check before
    * committing a tokenizer/vocab to a corpus (a high OOV fraction
    * means the vocab fragments that document into bytes/unks).
    *
    * Output per document: `n_tokens`, `n_in_vocab` (token OCCURRENCES
    * covered, not distinct types — coverage weights frequent tokens),
    * `oov_frac` (NULL for empty/null docs). Vocabulary selection is
    * total-ordered (count desc, then token) so the boundary is
    * deterministic across engines.
    *
    * Shape: token counts are one map-side-combined aggregate; the
    * top-V cut is a TakeOrderedAndProject (parallel partial top-V per
    * partition, never a global sort materialization — the V-row result
    * is a driver-bounded query artifact by construction); the corpus
    * then LEFT-joins the V-row vocab BROADCAST, so the only corpus
    * shuffle is the final per-doc aggregate, map-side combined. */
  def vocabCoverage(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", vocabSize: Int = 1000): DataFrame = {
    val terms = docs.select(col(idCol).as("doc_id"),
      explode(Text.tokens(lower(col(textCol)))).as("term"))
    val vocab = terms.groupBy(col("term")).agg(count(lit(1)).as("__cnt"))
      .orderBy(col("__cnt").desc, col("term"))
      .limit(vocabSize)
      .select(col("term"), lit(1L).as("__in"))
    val perDoc = terms.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("__in"), lit(0L))).as("n_in_vocab"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_in_vocab"), lit(0L)).as("n_in_vocab"),
        (lit(1.0) - col("n_in_vocab").cast("double") / col("n_tokens")).as("oov_frac"))
      .orderBy(col("doc_id"))
  }

  /** Adjacent-symbol pair counts over the word-frequency table — the
    * statistic behind one BPE merge selection (tokenizer induction):
    * the highest-count pair is the next merge a byte-pair encoder
    * would learn. Counts are occurrence-weighted (pair count × word
    * frequency), and the output is total-ordered (count desc, pair)
    * so the merge choice — including ties — is deterministic.
    *
    * Only the FIRST merge iteration is expressible as one declarative
    * query (later iterations re-segment words under the learned
    * merges — an inherently sequential driver loop, like Lloyd's in
    * [[Clustering]]); this op is that iteration, which is also the
    * profiling surface ("what would a tokenizer learn first from this
    * corpus?").
    *
    * Shape: the corpus collapses to the distinct-word frequency table
    * first (one map-side-combined aggregate — BPE's standard trick:
    * work scales with |vocab|, not corpus tokens), then each word
    * fans out to its ≤len-1 adjacent 2-char pairs and one more hash
    * aggregate sums the weighted counts. */
  def bpePairCounts(docs: DataFrame, textCol: String = "text",
                    topN: Int = 50): DataFrame = {
    val words = docs
      .select(explode(Text.tokens(lower(col(textCol)))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    words
      // guard: sequence(1, 0) DESCENDS for 1-char words
      .where(length(col("word")) >= 2)
      .select(col("cnt"),
        explode(transform(sequence(lit(1), length(col("word")) - 1),
          i => col("word").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("cnt")).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("pair"))
      .limit(topN)
  }

  // `toks` must be a BOUND column (the lambda re-evaluates non-lambda
  // subexpressions per element — an inline split would be O(len²));
  // `when` guard: sequence(1, 0) would DESCEND for 1-token docs
  private def bigramsOf(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - lit(1)),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + lit(1)))))
      .otherwise(array().cast("array<string>"))

  /** Per-document repetition signals (the Gopher-style degenerate-text
    * filters): token/distinct-token counts, the most-frequent token's
    * share, and the duplicate-bigram fraction. High values flag
    * boilerplate, keyword stuffing, and decoding loops.
    *
    * Shape: pure per-row array expressions — no explode, no shuffle;
    * the whole computation rides the scan. The top-token count is the
    * longest equal-run of the SORTED token array (one fold over it) —
    * O(n log n) per doc, so a pathological million-token row costs a
    * sort, not the O(v·n) distinct×filter rescans of the naive
    * spelling (v = distinct tokens; ~n²/2 comparisons on degenerate
    * crawl junk, exactly what a 100 TB corpus contains). */
  def repetitionSignals(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    // bind tokens (and bigrams) to columns once per row: the measures
    // below reference them many times, and the bigram lambda would
    // otherwise re-tokenize per element (O(len²))
    val toks = col("__toks")
    val distinctToks = array_distinct(toks)
    // longest run in sorted order == max token frequency. The fold
    // state is (previous token, current run, best run); split() never
    // yields null tokens, so `prev === t` is null only at the first
    // element (initial null prev), where `otherwise(1)` starts run 1.
    val topCnt = aggregate(
      array_sort(toks),
      struct(lit(null).cast("string").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, t) => {
        val run = when(acc("prev") === t, acc("run") + lit(1)).otherwise(lit(1))
        struct(t.as("prev"), run.as("run"), greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))
    val bigrams = col("__bigrams")
    docs
      .select(col(idCol).as("doc_id"),
        Text.tokens(lower(col(textCol))).as("__toks"))
      .select(col("doc_id"), toks, bigramsOf(toks).as("__bigrams"))
      .select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(distinctToks).cast("long").as("n_distinct_tokens"),
        (topCnt.cast("double") / size(toks)).as("top_token_frac"),
        when(size(bigrams) > 0,
          lit(1.0) - size(array_distinct(bigrams)).cast("double") / size(bigrams))
          .as("dup_bigram_frac"))
      .orderBy(col("doc_id"))
  }

  /** BM25 top-k retrieval ([EXT]) for a fixed query-term set — the
    * standard relevance scorer behind corpus search, retrieval-based
    * quality scoring, and hard-negative text mining:
    * `sum over q of idf(q) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))`
    * with `idf = ln((N−df+0.5)/(df+0.5)+1)` (the Lucene/ATIRE
    * non-negative variant).
    *
    * Shape: the query-term `isin` filter lands BEFORE the (doc,term)
    * aggregate, so the shuffle carries only query-term hits — never
    * the corpus vocabulary. Doc lengths ride the same tokenize scan;
    * corpus stats (N, Σ|d|) are a 1-row broadcast; df is a window ON
    * the tf rows (a groupBy+join would recompute the explode subtree
    * — the [[tfIdf]] discipline). Per-term contributions are rounded
    * then DECIMAL-summed (dsum convention: order-independent,
    * engine-exact) and the top-k resolves as TakeOrderedAndProject.
    * k1/b literals reach both engines as the same decimal text, so
    * the IEEE arithmetic agrees bit-for-bit. */
  def bm25(docs: DataFrame, queryTerms: Seq[String], k: Int = 20,
           k1: Double = 1.2, b: Double = 0.75,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val toks = docs.select(col(idCol).as("doc_id"),
      Text.tokens(lower(col(textCol))).as("__toks"))
    val lens = toks.select(col("doc_id"), size(col("__toks")).cast("long").as("dl"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = toks.select(col("doc_id"), explode(col("__toks")).as("term"))
      .where(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val byTerm = org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
    // avgdl spelled as an explicit double division (not avg()) so the
    // oracle can reproduce the exact IEEE operation sequence
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5)) + lit(1.0))
    tf.withColumn("df", count(lit(1)).over(byTerm))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        round(idf * (col("tf").cast("double") * lit(k1 + 1)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1 - b) + lit(b) * (col("dl").cast("double") / avgdl))), 6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("contrib"))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).cast("double").as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** PMI collocations ([EXT]) — pointwise mutual information of
    * adjacent token pairs, `ln(p(ab) / (p(a)·p(b)))` over corpus
    * bigram/unigram distributions: the classic collocation detector
    * (multi-word expressions, named entities, templated boilerplate
    * phrases) and a tokenizer-merge signal next to [[bpePairCounts]]
    * (which counts within-WORD symbol pairs; this is across words).
    *
    * Shape: one explode to vocab-sized unigram counts, one bigram
    * explode to (pair, count) with map-side partials, `minCount`
    * pruning BEFORE the two unigram joins (the surviving collocation
    * table is tiny; the joins are vocab-bounded, never corpus-bounded).
    * Totals broadcast as one row. The PMI is one double expression on
    * exact integer counts, rounded once — engine-reproducible; top-k
    * by (pmi, bigram) is a total order. */
  def pmiCollocations(docs: DataFrame, minCount: Long = 5, topK: Int = 100,
                      textCol: String = "text"): DataFrame = {
    val toks = docs.select(Text.tokens(lower(col(textCol))).as("__toks"))
    val uni = toks.select(explode(col("__toks")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val bi = toks.select(explode(bigramsOf(col("__toks"))).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= minCount)
    val totals = toks.agg(
      sum(size(col("__toks"))).cast("long").as("t_uni"),
      sum(greatest(size(col("__toks")) - 1, lit(0))).cast("long").as("t_bi"))
    bi.select(col("bigram"), col("c_ab"),
        split(col("bigram"), " ").getItem(0).as("w1"),
        split(col("bigram"), " ").getItem(1).as("w2"))
      .join(uni.select(col("term").as("w1"), col("c").as("c_a")), Seq("w1"))
      .join(uni.select(col("term").as("w2"), col("c").as("c_b")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("bigram"), col("c_ab"), col("c_a"), col("c_b"),
        round(log((col("c_ab").cast("double") / col("t_bi").cast("double")) /
          ((col("c_a").cast("double") / col("t_uni").cast("double")) *
            (col("c_b").cast("double") / col("t_uni").cast("double")))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(topK)
  }

  /** Shared-prefix boilerplate detection ([EXT]) — per source, the
    * first-`k`-token prefixes shared by many documents: site headers,
    * licence banners, navigation chrome, templated intros — the
    * C4-style boilerplate a crawl pipeline strips BEFORE dedup (a
    * shared header makes distinct pages look like near-dups) and
    * before training (the model memorizes it). A prefix is flagged
    * when ≥ 2 docs share it and its share of the source reaches
    * `minShare`.
    *
    * Shape: prefix extraction rides the scan (one `slice` per row —
    * no explode); ONE (source, prefix) hash aggregate with map-side
    * partials; per-source totals as a window ON the aggregate rows
    * (a groupBy+join spelling would recompute the scan+aggregate
    * subtree — the tfIdf discipline). The share is an exact-integer
    * IEEE division, shipped UNROUNDED (bit-equal across engines). */
  def boilerplatePrefixes(docs: DataFrame, k: Int = 5, minShare: Double = 0.2,
                          sourceCol: String = "source",
                          textCol: String = "text"): DataFrame = {
    require(k > 0, "boilerplatePrefixes needs k > 0")
    val pref = docs.select(col(sourceCol).as("source"),
      concat_ws(" ", slice(Text.tokens(lower(col(textCol))), 1, k)).as("prefix"))
    val bySource = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
    val share = col("n_docs").cast("double") / col("source_docs").cast("double")
    pref.groupBy(col("source"), col("prefix")).agg(count(lit(1)).as("n_docs"))
      .withColumn("source_docs", sum(col("n_docs")).over(bySource))
      .select(col("source"), col("prefix"), col("n_docs"), col("source_docs"),
        share.as("share"),
        (col("n_docs") >= 2 && share >= minShare).as("flagged"))
      .orderBy(col("source"), col("prefix"))
  }

  /** One shard of a MERGEABLE document-frequency table ([EXT]):
    * (term, df) over this slice of the corpus. df is additive across
    * disjoint doc sets, so corpus-wide term statistics can be
    * maintained incrementally — a streaming ingest batch contributes
    * its shard and [[dfMerge]] folds it into the persisted table
    * without ever rescanning corpus text, the same
    * write-partial/merge-later contract as the HLL sketch shards
    * ([[Profile.sketchShards]]) but exact. The downstream idf/logprob
    * consumers read ONE compact (term, df) table whatever the ingest
    * history looked like.
    *
    * Shape: per-doc distinct rides the scan as an array op; one
    * explode + one term hash aggregate (map-side partials absorb the
    * fan-out) — vocabulary-sized output, corpus-sized input. */
  def dfShard(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame =
    docs.select(
        explode(array_distinct(Text.tokens(lower(col(textCol))))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).cast("long").as("df"))

  /** Fold document-frequency shards (from [[dfShard]], over DISJOINT
    * doc sets) into one table: union + re-aggregate — one shuffle of
    * vocabulary-sized inputs. Merging a batch shard into a persisted
    * history table is this same expression with the history read as a
    * shard. */
  def dfMerge(shards: DataFrame*): DataFrame = {
    require(shards.nonEmpty, "dfMerge needs at least one shard")
    shards.reduce(_ unionByName _)
      .groupBy(col("term")).agg(sum(col("df")).cast("long").as("df"))
      .orderBy(col("term"))
  }

  /** Bigram language-model document score ([EXT]) — each doc's total
    * log-probability under the corpus's own Laplace-smoothed bigram
    * model, `sum over bigram positions of ln((c(w1w2)+1)/(c(w1·)+V))`
    * with `c(w1·)` the corpus count of bigrams starting at w1 and V
    * the corpus vocabulary size. The context-aware upgrade of
    * [[unigramLogprob]]: rare-WORD soup and rare-TRANSITION soup
    * (shuffled real words — scrambled-text spam, bad OCR segment
    * order) score low here while the unigram score misses the latter
    * entirely. Docs with fewer than two tokens have no bigrams and
    * are absent, like every bigram measure.
    *
    * Shape: one explode + one (doc, bigram) hash aggregate (map-side
    * partials absorb the fan-out), then the corpus bigram count AND
    * the history count as windows ON those aggregate rows (partition
    * by bigram / by w1 — the [[tfIdf]] no-recompute discipline, paid
    * as two exchanges of the compact aggregate, never a re-explode);
    * V comes from a separate no-explode distinct-count that
    * broadcast-joins back. Contributions are rounded then
    * DECIMAL-summed (dsum convention — order-independent). */
  def bigramLogprob(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    bigramLogprobDec(docs, idCol, textCol)
      .select(col("doc_id"), col("n_bigrams"),
        col("__lp").cast("double").as("logprob"))
      .orderBy(col("doc_id"))

  /** [[bigramLogprob]] with the per-doc score still in EXACT decimal
    * form — what [[lmQualityFilter]] needs: its average must stay in
    * integer arithmetic (a rounded double average hit a half-ULP
    * round() divergence at sf0.1). */
  private[operators] def bigramLogprobDec(docs: DataFrame, idCol: String,
                                          textCol: String): DataFrame = {
    // bind the token array BEFORE the bigram lambda (the wordNgrams
    // PERF CONTRACT): an inline split re-evaluates per element —
    // O(len²)/doc, measured 6.6s → sub-second at sf0.1
    val bg = docs
      .select(col(idCol).as("doc_id"), Text.tokens(lower(col(textCol))).as("__t"))
      .select(col("doc_id"), explode(bigramsOf(col("__t"))).as("bigram"))
    val tf = bg.groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("tf"))
    val byBigram = org.apache.spark.sql.expressions.Window.partitionBy(col("bigram"))
    val byW1 = org.apache.spark.sql.expressions.Window.partitionBy(col("__w1"))
    // distributed two-phase distinct count (partial dedup map-side);
    // a collect_list spelling would gather every token array into one
    // aggregate row — the exact kind of single-row bottleneck this
    // file avoids
    val vocab = docs
      .select(explode(Text.tokens(lower(col(textCol)))).as("__term"))
      .agg(count_distinct(col("__term")).cast("long").as("__v"))
    tf.withColumn("c12", sum(col("tf")).over(byBigram))
      .withColumn("__w1", split(col("bigram"), " ").getItem(0))
      .withColumn("c1", sum(col("tf")).over(byW1))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("tf"),
        round(col("tf") * log((col("c12") + lit(1)).cast("double") /
          (col("c1") + col("__v")).cast("double")), 6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("contrib"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast("long").as("n_bigrams"),
        sum(col("contrib")).as("__lp"))
  }

  /** Perplexity-style quality gate ([EXT]) — keep documents whose
    * per-bigram average log-probability under the corpus's own
    * Laplace bigram LM ([[bigramLogprob]]) clears `minAvgLogprob`:
    * the standard LM-based filter (CCNet/Wenzek et al. shape, with
    * the corpus itself as the reference model) that drops scrambled
    * text, OCR soup, and template spam which length/ratio heuristics
    * ([[graft.functions.Text.isQuality]]) pass. The AVERAGE (not the
    * sum) is the score, so long documents aren't penalized for
    * length. Documents with < 2 tokens have no bigrams and are
    * dropped — a 0/1-token doc carries no trainable signal.
    *
    * Determinism: the average stays in EXACT INTEGER arithmetic —
    * the decimal score scaled to micro-nats, divided by the bigram
    * count with truncation on the POSITIVE magnitude (both engines
    * truncate positive integer division identically; a rounded
    * double average hit a half-ULP round() divergence at sf0.1), and
    * the threshold compares that integer. The kept SET is engine-
    * exact by integer comparison, not by rounding luck. */
  def lmQualityFilter(docs: DataFrame, minAvgLogprob: Double,
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val thresholdMicro = math.round(minAvgLogprob * 1000000.0)
    bigramLogprobDec(docs, idCol, textCol)
      .withColumn("__lp_micro", (col("__lp") * 1000000).cast("long"))
      // scores are <= 0, so -((-x) div n) is the same truncation rule
      // in Spark and DuckDB
      .withColumn("avg_logprob_micro",
        -expr("(-__lp_micro) div n_bigrams"))
      .where(col("avg_logprob_micro") >= thresholdMicro)
      .select(col("doc_id"), col("n_bigrams"), col("avg_logprob_micro"))
      .orderBy(col("doc_id"))
  }

  /** Token-blocklist scrub ([EXT]) — rewrite each document with every
    * blocklisted token removed (stopword stripping before index
    * builds, profanity/markup token scrubs before training). The
    * blocklist ships as a LITERAL array inside the expression — it
    * rides the scan with zero joins and zero shuffles; a 10⁵-entry
    * list would instead broadcast-anti-join on an exploded view, but
    * curated blocklists are hundreds of entries. Tokenization is the
    * corpus-wide [[graft.functions.Text.tokens]] convention, bound
    * ONCE per row before the two array passes (the wordNgrams perf
    * contract). Matching is exact on lowercased tokens. */
  def removeBlockedTokens(docs: DataFrame, blocklist: Seq[String],
                          idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    require(blocklist.nonEmpty, "removeBlockedTokens needs a non-empty blocklist")
    val blocked = lit(blocklist.toArray)
    docs
      .select(col(idCol).as("doc_id"),
        graft.functions.Text.tokens(lower(col(textCol))).as("__t"))
      .select(col("doc_id"), col("__t"),
        filter(col("__t"), t => !array_contains(blocked, t)).as("__kept"))
      .select(col("doc_id"),
        array_join(col("__kept"), " ").as("text_clean"),
        (size(col("__t")) - size(col("__kept"))).cast("long").as("n_removed"))
      .orderBy(col("doc_id"))
  }

  /** Per-document keyword extraction ([EXT]) — each document's top
    * `k` terms by tf-idf: the zero-model document tagger (faceted
    * browse, dedup-cluster naming, quick topic labels). One rank
    * window over the [[tfIdf]] rows, partitioned by doc — millions
    * of independent partitions; ordering is (rounded tfidf desc,
    * term) — a total order, so the selected SET is engine-exact. */
  def keywords(docs: DataFrame, k: Int = 3, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    require(k >= 1, s"keywords needs k >= 1: $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    tfIdf(docs, idCol, textCol)
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select(col("doc_id"), col("rk"), col("term"), col("tfidf"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** Log-odds-ratio term comparison with an informative Dirichlet
    * prior ([EXT]) — Monroe/Colaresi/Quinn 2008 ("Fightin' Words"):
    * which terms distinguish source A's language from source B's,
    * z-scored so rare-term noise doesn't dominate (the failure mode
    * of raw ratio rankings). The prior is the standard corpus-wide
    * one: `a_w = a0 · (y_Aw + y_Bw) / (n_A + n_B)`.
    *
    *   δ_w = ln[(y_Aw + a_w)/(n_A + a0 − y_Aw − a_w)]
    *       − ln[(y_Bw + a_w)/(n_B + a0 − y_Bw − a_w)]
    *   z_w = δ_w / sqrt(1/(y_Aw + a_w) + 1/(y_Bw + a_w))
    *
    * Everything derives from exact integer counts (one (term, side)
    * aggregate, side totals as a broadcast 1-row aggregate); δ and z
    * are single IEEE chains rounded to 6dp. Top `k` each way by |z|
    * with the term as tiebreak. */
  def logOddsTerms(docs: DataFrame, sourceA: String, sourceB: String,
                   a0: Double = 10.0, topK: Int = 50,
                   sourceCol: String = "source",
                   textCol: String = "text"): DataFrame = {
    require(sourceA != sourceB, "logOddsTerms needs two distinct sources")
    val terms = docs
      .where(col(sourceCol).isin(sourceA, sourceB))
      .select(col(sourceCol).as("__src"),
        explode(Text.tokens(lower(col(textCol)))).as("term"))
    val counts = terms.groupBy(col("term")).agg(
      sum(when(col("__src") === sourceA, 1L).otherwise(0L)).as("ya"),
      sum(when(col("__src") === sourceB, 1L).otherwise(0L)).as("yb"))
    val totals = counts.agg(sum(col("ya")).as("na"), sum(col("yb")).as("nb"))
    def d(c: Column) = c.cast("double")
    val withTotals = counts.crossJoin(broadcast(totals))
    val aw = lit(a0) * d(col("ya") + col("yb")) / d(col("na") + col("nb"))
    val delta =
      log((d(col("ya")) + aw) / (d(col("na")) + lit(a0) - d(col("ya")) - aw)) -
        log((d(col("yb")) + aw) / (d(col("nb")) + lit(a0) - d(col("yb")) - aw))
    val z = delta / sqrt(lit(1.0) / (d(col("ya")) + aw) +
      lit(1.0) / (d(col("yb")) + aw))
    withTotals
      .select(col("term"), col("ya"), col("yb"),
        round(delta, 6).as("delta"), round(z, 6).as("z"))
      .orderBy(abs(col("z")).desc, col("term"))
      .limit(topK)
  }

  /** Gopher-style quality rule battery ([EXT]) — the published
    * pre-training filter set (Rae et al. 2021, "Scaling Language
    * Models: ... Gopher", §A1.1), the NAMED standard [[graft.functions.Text.isQuality]]
    * approximates: token-count range, mean-word-length range,
    * symbol-to-token ratio ('#' and '...'), alphabetic-word ratio,
    * and a minimum stopword-hit count. Line-based rules (bullet /
    * ellipsis line starts) need newline structure the flat test
    * corpus lacks and are deliberately out of scope here.
    *
    * Per doc: each metric, each rule's verdict, and the conjunction.
    * Every metric is a scalar expression riding the scan (the
    * punctCount no-explode idiom except the alpha-word filter, a
    * bound-once array pass); ratios are single IEEE divisions rounded
    * to 6dp, and every RULE compares the ROUNDED value — the kept set
    * is engine-exact, not just the scores. */
  def gopherQuality(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text",
                    minTokens: Int = 50, maxTokens: Int = 100000,
                    minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                    maxSymbolRatio: Double = 0.1,
                    minAlphaWordRatio: Double = 0.8,
                    minStopwordHits: Int = 2): DataFrame = {
    val toks = Text.tokens(lower(col(textCol)))
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("__text"),
      toks.as("__t"))
    val nTok = size(col("__t")).cast("long")
    val meanLen = round(Text.nonSpaceChars(col("__text")).cast("double") /
      nTok.cast("double"), 6)
    val symRatio = round(regexp_count(col("__text"), lit("#|\\.\\.\\."))
      .cast("double") / nTok.cast("double"), 6)
    val alphaRatio = round(
      size(filter(col("__t"), t => t.rlike("\\p{L}"))).cast("double") /
        nTok.cast("double"), 6)
    val stopHits = Text.stopwordHits(col("__text"),
      Text.stopwordPatterns.toMap.apply("en")).cast("long")
    base.select(col("doc_id"), nTok.as("n_tokens"), meanLen.as("mean_word_len"),
        symRatio.as("symbol_ratio"), alphaRatio.as("alpha_word_ratio"),
        stopHits.as("stopword_hits"))
      .withColumn("ok_tokens",
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .withColumn("ok_word_len",
        col("mean_word_len") >= minMeanWordLen &&
          col("mean_word_len") <= maxMeanWordLen)
      .withColumn("ok_symbols", col("symbol_ratio") <= maxSymbolRatio)
      .withColumn("ok_alpha", col("alpha_word_ratio") >= minAlphaWordRatio)
      .withColumn("ok_stopwords", col("stopword_hits") >= minStopwordHits)
      .withColumn("pass",
        col("ok_tokens") && col("ok_word_len") && col("ok_symbols") &&
          col("ok_alpha") && col("ok_stopwords"))
      .orderBy(col("doc_id"))
  }

  /** Feature hashing ([EXT]) — the hashing-trick vectorizer
    * (Weinberger et al. 2009): each token maps to a bucket in
    * [0, dim) by a PORTABLE hash, with a second hash bit choosing ±1
    * so colliding tokens cancel in expectation instead of
    * accumulating bias. The vocabulary-free featurizer: no vocab
    * build pass, no dictionary broadcast, fixed output width at any
    * corpus size — what you feed a linear model when the vocabulary
    * is unbounded (URLs, user agents, misspellings).
    *
    * Output is the harness-friendly sparse triple form
    * `(doc_id, pos, value)` with value an EXACT long (signed tf sum)
    * — hash-certifiable with no float anywhere. Explicit zero rows
    * can appear when same-bucket tokens cancel; they are part of the
    * contract (the bucket was TOUCHED). The md5-prefix hash is the
    * engine-portable convention every sampler here uses. */
  def hashFeatures(docs: DataFrame, dim: Int = 32, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    require(dim >= 2, s"hashFeatures needs dim >= 2: $dim")
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(Text.tokens(lower(col(textCol)))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val pos = conv(substring(md5(col("term")), 1, 8), 16, 10)
      .cast("long") % dim
    val sign = when(conv(substring(md5(col("term")), 9, 1), 16, 10)
      .cast("long") % 2 === 0, lit(1L)).otherwise(lit(-1L))
    tf.select(col("doc_id"), pos.as("pos"), (sign * col("tf")).as("sv"))
      .groupBy(col("doc_id"), col("pos"))
      .agg(sum(col("sv")).cast("long").as("value"))
      .orderBy(col("doc_id"), col("pos"))
  }

  /** Per-source n-gram diversity ([EXT]) — corpus-level type/token
    * ratios: distinct and total unigrams and bigrams per source, with
    * their ratios. The release-card diversity row: a source whose
    * bigram ratio collapses toward zero is templated or machine-
    * generated (few transition patterns reused many times), however
    * clean each individual document looks — a CORPUS signal the
    * per-doc [[repetitionSignals]] cannot see.
    *
    * Shape: one explode per gram order + one (source, gram) partial
    * aggregate, then a per-source count/count-distinct rollup — the
    * distinct sets never materialize on the driver. At 100 TB the
    * per-source distinct count is the shuffle-heavy half; swap in
    * [[Profile.sketchShards]] HLLs when approximate is acceptable. */
  def ngramDiversity(docs: DataFrame, sourceCol: String = "source",
                     textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(sourceCol).as("source"),
      Text.tokens(lower(col(textCol))).as("__t"))
    def level(grams: Column, name: String) =
      toks.select(col("source"), explode(grams).as("g"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as(s"n_$name"),
          count_distinct(col("g")).as(s"n_distinct_$name"))
    level(col("__t"), "unigrams")
      .join(level(bigramsOf(col("__t")), "bigrams"), Seq("source"), "left")
      .select(col("source"),
        col("n_unigrams"), col("n_distinct_unigrams"),
        round(col("n_distinct_unigrams").cast("double") /
          col("n_unigrams").cast("double"), 6).as("unigram_ttr"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_distinct_bigrams"), lit(0L)).as("n_distinct_bigrams"),
        when(col("n_bigrams").isNotNull && col("n_bigrams") > 0,
          round(col("n_distinct_bigrams").cast("double") /
            col("n_bigrams").cast("double"), 6)).as("bigram_ttr"))
      .orderBy(col("source"))
  }
}
