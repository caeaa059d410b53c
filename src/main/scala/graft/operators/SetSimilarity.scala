package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions

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
  *   order every doc's shingle set by GLOBAL rarity (document
  *   frequency asc); if J(A,B) >= t then |A∩B| >= ceil(t·|A|), so
  *   the first |A| - ceil(t·|A|) + 1 shingles of A (its "prefix")
  *   must contain a common shingle — and symmetrically for B. Only
  *   docs whose PREFIXES share a shingle can be candidates.
  *
  * Because prefixes hold each doc's RAREST shingles, the candidate
  * join fans out by the document frequency of rare shingles, not of
  * stopword shingles — the same reason tf-idf prefixes work. Two
  * further exact prunes shrink candidates before verification:
  * the length filter (J >= t ⇒ min(|A|,|B|) >= t·max(|A|,|B|)) and
  * the PPJoin positional filter (at a prefix match at ranks
  * (ra, rb), the overlap can never exceed 1 + min(|A|-ra, |B|-rb),
  * so it must reach ceil(t/(1+t)·(|A|+|B|)) to survive). Neither
  * prune changes the result set (SetSimilaritySpec proves both
  * against a brute-force oracle); they only bound the verify join.
  *
  * Scale shape (the reference has no analogue; its dedup is
  * pandas `drop_duplicates`, /root/reference/src/data_clean.py):
  *  - shingle fan-out happens inside the scan task (array HOF, no
  *    explode before the repartition spread);
  *  - every stage is a keyed shuffle (doc, shingle-hash, pair) with
  *    map-side partials on the aggregates — nothing driver-side;
  *  - the verify join touches only surviving candidate pairs, each
  *    verified from the (doc, h) rows — document text is read once.
  *
  * Shingles are the family's char-5-grams hashed to 32 bits via
  * [[Dedup.shingleHash]] (md5-prefix — reproducible in any engine,
  * which is what makes the DuckDB oracle possible). Jaccard is
  * computed over the hashed-shingle SETS (`(doc, h)` deduplicated),
  * so a 32-bit collision merges two shingles identically on both
  * engines.
  */
object SetSimilarity {

  /** Distinct (doc_id, h) shingle-hash set rows plus per-doc set
    * size `n`, global-rarity rank `r` (df asc, h asc — a total order:
    * h is unique within a doc after the dedup), and `df` itself. The
    * two windows share one Exchange each (h, then doc_id); set size
    * and rank come from the SAME doc_id window. */
  private def rankedShingleSets(docs: DataFrame, idCol: String,
                                textCol: String, shingleLen: Int): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val tok = docs
      // spread the ~|text| shingle fan-out before exploding (a doc
      // table often arrives in one input split); explicit count —
      // AQE would coalesce the small pre-explode rows back together.
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol).as("doc_id"),
        explode(GraftFunctions.distinctShingles(col(textCol), shingleLen)).as("sh"))
      .select(col("doc_id"), Dedup.shingleHash(col("sh")).as("h"))
      // 32-bit collisions can duplicate (doc, h); the rank below
      // needs h unique per doc or row_number ties are nondeterministic
      .distinct()
    val byH = Window.partitionBy(col("h"))
    val byDoc = Window.partitionBy(col("doc_id"))
    tok.withColumn("df", count(lit(1)).over(byH))
      .withColumn("n", count(lit(1)).over(byDoc))
      .withColumn("r", row_number().over(byDoc.orderBy(col("df"), col("h"))))
  }

  /** All pairs (doc_a < doc_b) with exact Jaccard >= `threshold` over
    * char-`shingleLen`-gram shingle-hash sets:
    * `(doc_a, doc_b, inter, jaccard)`. The jaccard ships UNROUNDED —
    * BIGINT casts and one IEEE divide are exactly specified, so the
    * double is bit-equal across engines (the exact-IEEE-render
    * family, PLANS.md). */
  def jaccardJoin(docs: DataFrame, threshold: Double = 0.5,
                  idCol: String = "doc_id", textCol: String = "text",
                  shingleLen: Int = 5): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1]: $threshold")
    val t = lit(threshold)
    val ranked = rankedShingleSets(docs, idCol, textCol, shingleLen)
    val pref = ranked.filter(col("r") <= col("n") - ceil(t * col("n")) + lit(1))
    val a = pref.select(col("doc_id").as("doc_a"), col("h"),
      col("n").as("na"), col("r").as("ra"))
    val b = pref.select(col("doc_id").as("doc_b"), col("h"),
      col("n").as("nb"), col("r").as("rb"))
    // alpha = minimum overlap a true pair must reach, from
    // J = i/(na+nb-i) >= t  ⇒  i >= t/(1+t)·(na+nb)
    val alpha = ceil(lit(threshold / (1 + threshold)) * (col("na") + col("nb")))
    val cand = a.join(b, Seq("h"))
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
    * doc's shingle-hash set is contained in container's:
    * `|A∩B|/|A| >= t` — the quote-inclusion / subsumption detector
    * (a near-total containment with a much larger container is "B
    * quotes A", which symmetric Jaccard misses because the union is
    * dominated by the container). One-sided prefix filter: only the
    * CONTAINED side can be pruned (i >= ceil(t·|A|) forces a common
    * shingle into A's prefix); the container side joins its full set
    * rows, so candidate fan-out is bounded by the df of A's rarest
    * shingles. Length filter: |B| >= t·|A| (a container can't be much
    * smaller than what it contains). */
  def containmentJoin(docs: DataFrame, threshold: Double = 0.8,
                      idCol: String = "doc_id", textCol: String = "text",
                      shingleLen: Int = 5): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1]: $threshold")
    val t = lit(threshold)
    val ranked = rankedShingleSets(docs, idCol, textCol, shingleLen)
    val pref = ranked.filter(col("r") <= col("n") - ceil(t * col("n")) + lit(1))
    val a = pref.select(col("doc_id").as("doc_a"), col("h"), col("n").as("na"))
    val b = ranked.select(col("doc_id").as("doc_b"), col("h"), col("n").as("nb"))
    val cand = a.join(b, Seq("h"))
      .filter(col("doc_a") =!= col("doc_b"))
      .filter(col("nb") >= t * col("na"))
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .distinct()
    verifyPairs(cand, ranked, col("inter") >= t * col("na"))
      .select(col("doc_a").as("doc_id"), col("doc_b").as("container_id"),
        col("inter"),
        (col("inter").cast("double") / col("na")).as("containment"))
      .orderBy(col("doc_id"), col("container_id"))
  }

  /** Exact intersection sizes for candidate pairs: join each side's
    * set rows and count matches per pair (map-side partial combine),
    * then keep pairs passing `keep`. Only candidates pay this. */
  private def verifyPairs(cand: DataFrame, ranked: DataFrame,
                          keep: org.apache.spark.sql.Column): DataFrame = {
    val ta = ranked.select(col("doc_id").as("doc_a"), col("h"))
    val tb = ranked.select(col("doc_id").as("doc_b"), col("h"))
    cand.join(ta, Seq("doc_a"))
      .join(tb, Seq("doc_b", "h"))
      .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .filter(keep)
  }
}
