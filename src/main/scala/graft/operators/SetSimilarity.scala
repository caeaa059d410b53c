package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** EXACT set-similarity joins via prefix filtering ([EXT]) — the
  * deterministic complement to the MinHash/LSH family in [[Dedup]].
  *
  * MinHash+LSH ([[Dedup.lshBands]]) finds near-duplicate pairs
  * PROBABILISTICALLY: a pair above the Jaccard threshold is found
  * only if some band collides, so recall < 1 by construction. This
  * operator returns EVERY pair with exact Jaccard >= t — the shape a
  * contract-grade dedup audit or an LSH-recall evaluation needs —
  * without the all-pairs O(n²) join, using the prefix-filtering
  * principle (Chaudhuri et al. ICDE'06; Bayardo et al. WWW'07;
  * Vernica et al. SIGMOD'10 for the MapReduce formulation):
  *
  *   order every doc's gram set by GLOBAL rarity (document frequency
  *   asc); if J(A,B) >= t then |A∩B| >= ceil(t·|A|), so the first
  *   |A| - ceil(t·|A|) + 1 grams of A (its "prefix") must contain a
  *   common gram — and symmetrically for B. Only docs whose PREFIXES
  *   share a gram can be candidates.
  *
  * Sets are WORD n-gram sets (default n = 3), hashed to 60-bit
  * md5-prefix fingerprints (the [[Ngrams.sourceOverlap]] trick:
  * 8 B/gram through every shuffle, engine-portable so the DuckDB
  * oracle can mirror it). Word n-grams are the unit deliberately:
  * prefix filtering lives or dies by gram selectivity, and character
  * shingles collapse on template-heavy text — measured on the sf0.1
  * corpus, char-5-grams yield only ~2k distinct values (median df
  * 291, Σ C(df,2) ≈ 7.7e8) and HALF of all doc pairs survive the
  * filters, while word trigrams give 27k distinct values (median df
  * 9, pair mass 1.3e6) — a ~600x candidate-mass reduction for the
  * same corpus. The minhash family is immune to that collapse (it
  * joins on banded signatures, never on shingles), which is why it
  * keeps char shingles and this operator does not. Docs shorter than
  * n tokens have no grams and are absent from the output (nothing to
  * compare).
  *
  * Two further exact prunes shrink candidates before verification:
  * the length filter (J >= t ⇒ min(|A|,|B|) >= t·max(|A|,|B|)) and
  * the PPJoin positional filter (a true pair's FIRST common gram in
  * global order has every other common gram after it on both sides,
  * so 1 + min(|A|-ra, |B|-rb) >= the pair's overlap lower bound must
  * hold for at least one match). Neither prune changes the result
  * set (SetSimilaritySpec proves both against an all-pairs brute
  * force); they only bound the verify join, and the positional
  * filter is specifically what kills matches on a common gram deep
  * in both suffixes.
  *
  * Scale shape (the reference has no analogue; its dedup is pandas
  * `drop_duplicates`, /root/reference/src/data_clean.py):
  *  - the gram build rides the scan (array HOFs on a bound token
  *    column — the Ngrams perf contract), exploding only into the
  *    keyed aggregates;
  *  - every stage is a keyed shuffle (doc, gram-fp, pair) with
  *    map-side partials on the aggregates — nothing driver-side;
  *  - the verify join touches only surviving candidate pairs, each
  *    verified from the (doc, fp) rows — document text is read once.
  *
  * Inherent contract note: under heavy replication the OUTPUT itself
  * is quadratic in the duplicate-cluster size (every replica pair IS
  * a true pair) — an exact join cannot cap that; the capped minhash
  * family ([[Dedup.minhashCandidates]] with `maxBucket`) is the
  * scale path when duplicate clusters are pathological. */
object SetSimilarity {

  /** 60-bit engine-portable gram fingerprint (15 hex digits — 16
    * could exceed signed-long range in engines parsing signed hex). */
  private def gramFp(c: org.apache.spark.sql.Column) =
    graft.functions.Portable.fp60(c)

  /** Distinct (doc_id, fp) word-n-gram set rows plus per-doc set
    * size `n`, global-rarity rank `r` (df asc, fp asc — a total
    * order: fp is unique within a doc after the dedup), and `df`.
    * The two windows cost one Exchange each (fp, then doc_id); set
    * size and rank come from the SAME doc_id window.
    *
    * THIS is the table to persist at scale: the joins consume it
    * FOUR times (both prefix sides + both verify sides), and
    * broadcast shapes defeat exchange reuse, so the inline operators
    * re-derive it from text 4x (fine at audit scale, wrong at
    * 100 TB — plan-verified in PLANS.md). Materialize it once
    * (parquet next to the minhash signature table — same lifecycle,
    * rebuilt when the corpus version changes) and call the
    * `...OfSets` variants, which read the small set table instead of
    * re-tokenizing the corpus — the [[Dedup.newNearDocs]]
    * persisted-index pattern. */
  def rankedGramSets(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", ngram: Int = 3): DataFrame = {
    val tok = docs
      // spread the gram fan-out before exploding (a doc table often
      // arrives in one input split); explicit count — AQE would
      // coalesce the small pre-explode rows back together.
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol).as("doc_id"),
        Text.tokens(lower(col(textCol))).as("__toks"))
      .select(col("doc_id"),
        explode(array_distinct(Ngrams.wordNgramsOfTokens(col("__toks"), ngram)))
          .as("ng"))
      .select(col("doc_id"), gramFp(col("ng")).as("fp"))
      // 60-bit collisions within a doc are ~impossible but the rank
      // below NEEDS fp unique per doc, so keep the contract explicit
      .distinct()
    val byFp = Window.partitionBy(col("fp"))
    val byDoc = Window.partitionBy(col("doc_id"))
    tok.withColumn("df", count(lit(1)).over(byFp))
      .withColumn("n", count(lit(1)).over(byDoc))
      .withColumn("r", row_number().over(byDoc.orderBy(col("df"), col("fp"))))
  }

  /** All pairs (doc_a < doc_b) with exact Jaccard >= `threshold` over
    * word-`ngram` sets: `(doc_a, doc_b, inter, jaccard)`. The jaccard
    * ships UNROUNDED — BIGINT casts and one IEEE divide are exactly
    * specified, so the double is bit-equal across engines (the
    * exact-IEEE-render family, PLANS.md). */
  def jaccardJoin(docs: DataFrame, threshold: Double = 0.5,
                  idCol: String = "doc_id", textCol: String = "text",
                  ngram: Int = 3): DataFrame =
    jaccardJoinOfSets(rankedGramSets(docs, idCol, textCol, ngram), threshold)

  /** [[jaccardJoin]] over a pre-built (ideally PERSISTED) ranked set
    * table — the at-scale entry point; see [[rankedGramSets]]. */
  def jaccardJoinOfSets(ranked: DataFrame, threshold: Double = 0.5): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1]: $threshold")
    val t = lit(threshold)
    val pref = ranked.filter(col("r") <= col("n") - ceil(t * col("n")) + lit(1))
    val a = pref.select(col("doc_id").as("doc_a"), col("fp"),
      col("n").as("na"), col("r").as("ra"))
    val b = pref.select(col("doc_id").as("doc_b"), col("fp"),
      col("n").as("nb"), col("r").as("rb"))
    // alpha = minimum overlap a true pair must reach, from
    // J = i/(na+nb-i) >= t  ⇒  i >= t/(1+t)·(na+nb)
    val alpha = ceil(lit(threshold / (1 + threshold)) * (col("na") + col("nb")))
    val cand = a.join(b, Seq("fp"))
      .filter(col("doc_a") < col("doc_b"))
      // length filter: J >= t ⇒ min >= t·max
      .filter(least(col("na"), col("nb")) >= t * greatest(col("na"), col("nb")))
      // positional filter: overlap ≤ 1 + min(remaining suffix), and a
      // true pair's FIRST prefix match always passes (bound >= i >= alpha)
      .filter(lit(1) + least(col("na") - col("ra"), col("nb") - col("rb")) >= alpha)
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .distinct()
    verifyPairs(cand, ranked, col("inter") >= t * (col("na") + col("nb") - col("inter")))
      .select(col("doc_a"), col("doc_b"), col("inter"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** All ORDERED pairs (doc_id != container_id) where `threshold` of
    * doc's gram set is contained in container's: `|A∩B|/|A| >= t` —
    * the quote-inclusion / subsumption detector (a near-total
    * containment with a much larger container is "B quotes A", which
    * symmetric Jaccard misses because the union is dominated by the
    * container). One-sided prefix filter: only the CONTAINED side can
    * be pruned (i >= ceil(t·|A|) forces a common gram into A's
    * prefix); the container side joins its full set rows, with the
    * positional filter (bound >= ceil(t·|A|)) pruning matches on
    * common grams deep in the container's suffix — without it the
    * hot-gram tail dominates candidates. Length filter: |B| >= t·|A|
    * (a container can't be much smaller than what it contains). */
  def containmentJoin(docs: DataFrame, threshold: Double = 0.8,
                      idCol: String = "doc_id", textCol: String = "text",
                      ngram: Int = 3): DataFrame =
    containmentJoinOfSets(rankedGramSets(docs, idCol, textCol, ngram), threshold)

  /** [[containmentJoin]] over a pre-built (ideally PERSISTED) ranked
    * set table — the at-scale entry point; see [[rankedGramSets]]. */
  def containmentJoinOfSets(ranked: DataFrame, threshold: Double = 0.8): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1]: $threshold")
    val t = lit(threshold)
    val pref = ranked.filter(col("r") <= col("n") - ceil(t * col("n")) + lit(1))
    val a = pref.select(col("doc_id").as("doc_a"), col("fp"),
      col("n").as("na"), col("r").as("ra"))
    val b = ranked.select(col("doc_id").as("doc_b"), col("fp"),
      col("n").as("nb"), col("r").as("rb"))
    val cand = a.join(b, Seq("fp"))
      .filter(col("doc_a") =!= col("doc_b"))
      .filter(col("nb") >= t * col("na"))
      // positional filter (exact, first-common-gram argument):
      // i <= 1 + min(na-ra, nb-rb) must reach ceil(t·na)
      .filter(lit(1) + least(col("na") - col("ra"), col("nb") - col("rb")) >=
        ceil(t * col("na")))
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .distinct()
    verifyPairs(cand, ranked, col("inter") >= t * col("na"))
      .select(col("doc_a").as("doc_id"), col("doc_b").as("container_id"),
        col("inter"),
        (col("inter").cast("double") / col("na")).as("containment"))
      .orderBy(col("doc_id"), col("container_id"))
  }

  /** MinHash signatures over the SAME word-n-gram fingerprint rows
    * the exact joins use — `(a_i·(fp mod P) + b_i) mod P` with
    * [[Dedup]]'s permutation coefficients (fp is 60-bit, so it is
    * reduced mod P BEFORE the multiply to stay inside 2^62 under
    * ANSI arithmetic; [[Dedup.minhashSignatures]]'s 32-bit shingle
    * hashes don't need the reduction). One k-column row per doc,
    * map-side min partials. */
  private def minhashOfSets(setRows: DataFrame, k: Int): DataFrame = {
    val p = Dedup.MinhashP
    val aggs = (0 until k).map(i =>
      min(((col("fp") % p) * Dedup.aCoef(i) + Dedup.bCoef(i)) % p).as(s"m$i"))
    setRows.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH recall audit ([EXT]): measures, ON ONE SIMILARITY SPACE,
    * what the probabilistic candidate generator actually catches.
    * For each band count b (more bands = shorter bands = higher
    * collision rate = higher recall AND more candidates), bands the
    * k-hash minhash signature of every doc's word-n-gram set, takes
    * banded candidate pairs, and scores them against the EXACT
    * Jaccard-threshold pairs from [[jaccardJoin]]'s algebra:
    * `(bands, n_candidates, n_true_pairs, n_hit, recall)`.
    *
    * This is the audit a pipeline runs before trusting LSH dedup at
    * 100 TB — the S-curve recall of banding is a theorem about
    * UNIFORM hash behavior, not about your corpus; the empirical
    * recall against exact ground truth (computable on a sample) is
    * the number that belongs in a runbook. Exact pairs and
    * signatures share one gram-set build; each band count adds one
    * bounded bucket aggregate over the banded signature rows
    * (buckets of size >= 2 expand pairs locally, the
    * [[Dedup.minhashCandidates]] shape). Recall is an unrounded IEEE
    * divide of two exact counts. */
  def lshRecallAudit(docs: DataFrame, threshold: Double = 0.5,
                     k: Int = 16, bandCounts: Seq[Int] = Seq(2, 4, 8),
                     idCol: String = "doc_id", textCol: String = "text",
                     ngram: Int = 3, pinGramSets: Boolean = false): DataFrame = {
    require(bandCounts.nonEmpty && bandCounts.forall(b => b > 0 && k % b == 0),
      s"every band count must divide k=$k: $bandCounts")
    // NOT localCheckpointed by default: the shared subtrees (`exact`,
    // `sig`, each band's `cand`) deduplicate through Spark's
    // ReuseExchange in the single final plan — eager materialization
    // was MEASURED slower (8.9s vs 7.7s at sf0.1) because it breaks
    // whole-stage codegen spans and pays three materializations for
    // reuse the optimizer already provides. `pinGramSets` flips the
    // trade for SMALL inputs (the sampled runbook flavor): a
    // sample-sized gram table materializes in milliseconds and the
    // ~15 consumer subtrees then read it instead of replaying the
    // explode+windows per consumer.
    val ranked0 = rankedGramSets(docs, idCol, textCol, ngram)
    // (pinning MORE than `ranked` was measured counterproductive on
    // the sampled path — 8.4 s ranked-only vs 9.5 s all-stages-pinned
    // at sf0.1: the extra eager checkpoint jobs cost about what the
    // replays of the already-tiny downstream tables save)
    val ranked = if (pinGramSets) ranked0.localCheckpoint() else ranked0
    val exact0 = jaccardJoinOfSets(ranked, threshold)
      .select(col("doc_a"), col("doc_b"))
    val exact = if (pinGramSets) exact0.localCheckpoint() else exact0
    val sig = minhashOfSets(ranked.select(col("doc_id"), col("fp")), k)
    val perBand = bandCounts.map { b =>
      val cand = Dedup.bandsOfSignatures(sig, k, b)
        .groupBy(col("band"), col("band_hash"))
        .agg(collect_list(col("doc_id")).as("ids"))
        .where(size(col("ids")) > 1)
        .select(explode(Dedup.pairsOf(array_sort(col("ids")))).as("p"))
        .select(col("p._1").as("doc_a"), col("p._2").as("doc_b"))
        .distinct()
      val hit = cand.join(exact, Seq("doc_a", "doc_b"), "left_semi")
      // broadcast(1-row agg): the repo-wide crossJoin convention —
      // AQE would rescue an unhinted spelling, but the plan shouldn't
      // need rescuing
      cand.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(broadcast(exact.agg(count(lit(1)).as("n_true_pairs"))))
        .crossJoin(broadcast(hit.agg(count(lit(1)).as("n_hit"))))
        .select(lit(b).as("bands"), col("n_candidates"), col("n_true_pairs"),
          col("n_hit"),
          (col("n_hit").cast("double") / col("n_true_pairs")).as("recall"))
    }
    perBand.reduce(_.unionByName(_)).orderBy(col("bands"))
  }

  /** The runbook form of [[lshRecallAudit]] — the audit over a
    * DETERMINISTIC FIXED-SIZE sample, which is how it actually runs at
    * corpus scale: the full audit's exact side tracks true-pair
    * density (the ×10 decade probe measured it at 444 s on an
    * adversarially duplicate-dense sf1-equivalent corpus — by design,
    * but not a number to pay continuously), while a fixed `sampleSize`
    * bounds the audit's cost ABSOLUTELY regardless of corpus growth:
    * one scan + a TakeOrdered(k) + the audit on k docs.
    *
    * The sample is the `sampleSize` docs with the smallest portable
    * fp60(id) — pseudo-random w.r.t. any corpus ordering, yet
    * bit-reproducible across engines and runs (the [[Sampling]]
    * convention), so the whole sampled audit remains oracle-
    * replayable: recall measured here is an unbiased estimate of
    * corpus recall under the banding theorem's uniform-hash premise,
    * and the SAMPLE's exact ground truth is computed exactly. */
  def lshRecallAuditSampled(docs: DataFrame, sampleSize: Int,
                            threshold: Double = 0.5,
                            k: Int = 16, bandCounts: Seq[Int] = Seq(2, 4, 8),
                            idCol: String = "doc_id", textCol: String = "text",
                            ngram: Int = 3): DataFrame = {
    require(sampleSize > 0, s"sampleSize must be positive: $sampleSize")
    // localCheckpoint the sample: the audit feeds its input into many
    // subtrees (exact chain, signatures, per-band candidates) counting
    // on ReuseExchange — which reuses the EXCHANGE, not this
    // TakeOrdered-over-the-corpus subtree; unpinned, the full-corpus
    // scan+sort replays per consumer (measured: 16.1 s -> 2.9 s at
    // sf0.1, and the pin is what makes the fixed-size bound real —
    // sampleSize rows materialize, the corpus is scanned ONCE;
    // the residual ~8 s at sf0.1 is fixed Spark machinery — ~20 tiny
    // 32-partition shuffles across the exact/sig/band stages — which
    // is the FLAT term the fixed-size sample buys: measured 8.4 s at
    // x1 and 8.2 s at x10, vs the full audit's 21.7 s -> 444.6 s).
    val sample = docs
      .orderBy(graft.functions.Portable.fp60(col(idCol)), col(idCol))
      .limit(sampleSize)
      .localCheckpoint()
    lshRecallAudit(sample, threshold, k, bandCounts, idCol, textCol, ngram,
      pinGramSets = true)
  }

  /** Exact intersection sizes for candidate pairs: join each side's
    * set rows and count matches per pair (map-side partial combine),
    * then keep pairs passing `keep`. Only candidates pay this. */
  private def verifyPairs(cand: DataFrame, ranked: DataFrame,
                          keep: org.apache.spark.sql.Column): DataFrame = {
    val ta = ranked.select(col("doc_id").as("doc_a"), col("fp"))
    val tb = ranked.select(col("doc_id").as("doc_b"), col("fp"))
    cand.join(ta, Seq("doc_a"))
      .join(tb, Seq("doc_b", "fp"))
      .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .filter(keep)
  }

  /** Sparse TF-IDF cosine similarity join ([EXT]) — all doc pairs
    * with cosine >= `threshold` over word-`ngram` tf-idf vectors, via
    * the classic df-capped inverted index: pairs are generated ONLY
    * through shared grams with df <= `maxDf`, so the fan-out per
    * gram is C(df,2) <= C(maxDf,2) and the total join volume is
    * bounded by gram rarity — never doc × doc. The WEIGHTED
    * complement of [[jaccardJoin]] (set overlap treats a rare shared
    * phrase and a boilerplate phrase alike; idf weighting makes rare
    * shared content dominate the score).
    *
    * Semantics note: the cap is part of the SCORE's definition — this
    * is cosine in the df<=maxDf gram subspace (norms computed over
    * the same capped weights), not an approximation of uncapped
    * cosine. That keeps the operator exactly replayable AND is what
    * you want at scale: grams above the cap are boilerplate with
    * idf ≈ 0 that would cost quadratic fan-out for near-zero score
    * contribution.
    *
    * Determinism: weights are rounded to 6dp; dot products and
    * squared norms are rounded-then-DECIMAL-summed (order-free);
    * each final score is one IEEE chain over those exact sums,
    * rounded to 6dp, and the threshold compares the rounded score. */
  def sparseCosineJoin(docs: DataFrame, threshold: Double = 0.3,
                       maxDf: Long = 64, idCol: String = "doc_id",
                       textCol: String = "text", ngram: Int = 3): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val grams = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol).as("doc_id"),
        Text.tokens(lower(col(textCol))).as("__toks"))
      .select(col("doc_id"),
        explode(Ngrams.wordNgramsOfTokens(col("__toks"), ngram)).as("ng"))
      .select(col("doc_id"), gramFp(col("ng")).as("fp"))
    val tf = grams.groupBy(col("doc_id"), col("fp")).agg(count(lit(1)).as("tf"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val w = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("fp"))))
      .where(col("df") <= maxDf)
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("fp"),
        round(col("tf").cast("double") *
          log((col("n_docs") + lit(1)).cast("double") /
            (col("df") + lit(1)).cast("double")), 6).as("w"))
    val norms = w
      .select(col("doc_id"),
        round(col("w") * col("w"), 6).cast(DecimalType(18, 6)).as("w2"))
      .groupBy(col("doc_id")).agg(sum(col("w2")).as("n2"))
      .select(col("doc_id"), sqrt(col("n2").cast("double")).as("norm"))
    val dots = w.select(col("fp"), col("doc_id").as("doc_a"), col("w").as("wa"))
      .join(w.select(col("fp"), col("doc_id").as("doc_b"), col("w").as("wb")),
        Seq("fp"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(col("wa") * col("wb"), 6).cast(DecimalType(18, 6)).as("p"))
      .groupBy(col("doc_a"), col("doc_b")).agg(sum(col("p")).as("dot"))
    dots
      .join(norms.select(col("doc_id").as("doc_a"), col("norm").as("norm_a")),
        Seq("doc_a"))
      .join(norms.select(col("doc_id").as("doc_b"), col("norm").as("norm_b")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(col("dot").cast("double") / (col("norm_a") * col("norm_b")), 6)
          .as("cosine"))
      .where(col("cosine") >= threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
