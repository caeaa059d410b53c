package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{Json, Scrub, Text}
import graft.multimodal.Multimodal
import graft.operators.{Anonymize, AsOf, Clustering, CorpusStats, Dedup, Fuzzy, Graph, Layout, Ngrams, Pack, Profile, Quality, Reports, Reshape, Sampling, SetSimilarity, Similarity, Skew, TopK, Windows}
import graft.sources.{Bucketing, Lake, Tables}
import graft.streaming.Sessions

/** Query registrations, part B: text analysis, corpus hygiene,
  * document dedup, similarity search, multimodal (SURVEY §2.2-2.3,
  * §2.7, §2.13 [EXT]). Mechanical split of [[SparkEntry.queries]]. */
private[graft] object RegistryQueriesB {
  import Reg._

  /** Part names plus a deterministic 40-name hot block ("zzhot
    * variant <k>") — the adversarial input behind q_jaro_capped /
    * q_dropped_blocks: natural first-token blocks are a uniform 8
    * names, so the cap needs a planted bomb to demonstrably defuse.
    * Mirrored verbatim in the oracle SQL. */
  private def hotBlockNames(part: DataFrame): DataFrame =
    part.select(col("p_name"))
      .unionByName(part.where(col("p_partkey") <= 40)
        .select(concat(lit("zzhot variant "), col("p_partkey")).as("p_name")))

  /** The persisted bucketed two-level index shared by
    * q_two_level_persisted and q_two_level_knn_multi: trained once per
    * scale dir (k1=4, k2=4, 16 buckets), stamped by the source row
    * count so an in-place testdata regeneration rebuilds instead of
    * silently probing a dead corpus, re-opened through the external
    * CREATE TABLE path every invocation. */
  private def tlPersistedIndex(s: SparkSession, d: String, emb: DataFrame)
      : (DataFrame, Array[(Long, Array[Double])]) = {
    val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
    val root = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_tl_idx_$sfx").toString
    val table = s"tl_idx_$sfx"
    Lake.buildOnce(s"$root/index",
      "embeddings:" + Lake.fingerprintCached(emb, s"$d/embeddings")) {
      val (index, cbs) = graft.operators.Clustering.twoLevelIndex(emb,
        k1 = 4, k2 = 4)
      graft.operators.Clustering.twoLevelWriteIndex(index, cbs, table, root,
        nBuckets = 16)
    }
    graft.operators.Clustering.twoLevelOpenIndex(s, table, root, nBuckets = 16)
  }

  /** The persisted PQ index shared by q_pq_persisted and
    * q_pq_knn_multi — the [[tlPersistedIndex]] discipline for the PQ
    * family: trained once per scale dir (m=4, k=8), source-fingerprint
    * stamped, codes/codebooks (and the build-time stats baseline) read
    * back from parquet every invocation. */
  private def pqPersistedIndex(s: SparkSession, d: String, emb: DataFrame)
      : (DataFrame, DataFrame) = {
    val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
    val root = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_pq_idx_$sfx").toString
    Lake.buildOnce(s"$root/codes",
      "embeddings:" + Lake.fingerprintCached(emb, s"$d/embeddings")) {
      val (codes, cbs) = graft.operators.Clustering.pqTrainEncode(
        emb, m = 4, k = 8, iters = 2, dim = 64)
      graft.operators.Clustering.pqWriteIndex(codes, cbs, root)
    }
    graft.operators.Clustering.pqReadIndex(s, root)
  }

  /** The persisted IVF-PQ index shared by q_ivfpq_persisted — the
    * [[tlPersistedIndex]] discipline for the composed family: trained
    * once per scale dir (k1=4, k2=4, m=4, k=8), source-fingerprint
    * stamped, codes bucketed+sorted by cell, both codebook parameter
    * tables read back from parquet every invocation. */
  private def ivfPqPersistedIndex(s: SparkSession, d: String, emb: DataFrame)
      : (DataFrame, Array[(Long, Array[Double])], DataFrame) = {
    val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
    val root = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_ivfpq_idx_$sfx").toString
    val table = s"ivfpq_idx_$sfx"
    Lake.buildOnce(s"$root/codes",
      "embeddings:" + Lake.fingerprintCached(emb, s"$d/embeddings")) {
      val (codes, coarse, pqCbs) = graft.operators.Clustering.ivfPqTrainEncode(
        emb, k1 = 4, k2 = 4, m = 4, k = 8, dim = 64)
      graft.operators.Clustering.ivfPqWriteIndex(codes, coarse, pqCbs, table,
        root, nBuckets = 16)
    }
    graft.operators.Clustering.ivfPqOpenIndex(s, table, root, nBuckets = 16)
  }

  /** Input files for the COMPOSED versioned-streaming rows
    * (q_stream_index_versioned / q_stream_pq_versioned): three
    * deterministic micro-batches (pinned modification times order the
    * delivery) — bootstrap b0 and same-distribution b1 unscaled, b2
    * scaled 3× out-of-distribution so the drift trigger MUST fire
    * (the measured ≈9× anchor; scale rides double arithmetic cast
    * back to REAL, matching the float column and the oracle replay).
    * Returns the input schema for the readStream. */
  private def writeVersionedStreamBatches(s: SparkSession, emb: DataFrame,
                                          root: String)
      : org.apache.spark.sql.types.StructType = {
    (0 until 3).foreach { b =>
      val part = emb.where(pmod(col("vec_id"), lit(3)) === b)
      val batch =
        if (b == 2) part.withColumn("embedding", transform(col("embedding"),
          x => (x.cast("double") * lit(3.0)).cast("float")))
        else part
      batch.coalesce(1).write.mode("overwrite").parquet(s"$root/in/f$b")
      new java.io.File(s"$root/in/f$b").listFiles()
        .foreach(f => { f.setLastModified(1600000000000L + b * 60000L); () })
    }
    s.read.parquet(s"$root/in/f0").schema
  }

  /** The 3×-scaled query vector for the composed rows — a member of
    * the drifted third (vec_id % 3 = 2), so the probe must find rows
    * the bootstrap never saw through the RETRAINED generation. */
  private def scaledQueryVec(emb: DataFrame, id: Long): Seq[Double] =
    Similarity.vectorOf(emb.where(col("vec_id") === id)
      .withColumn("embedding", transform(col("embedding"),
        x => (x.cast("double") * lit(3.0)).cast("float"))), id)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- text analysis (SURVEY §2.2 [EXT]) ----
    // Flesch reading-ease ([EXT]): words/sentences/vowel-group
    // syllables, one rounded IEEE chain — the classic readability
    // feature beside the Gopher battery
    "q_readability" -> ((s, d) => {
      val c = col("text")
      t(s, d, "documents").select(col("doc_id"),
          Text.tokenCount(c).cast("long").as("n_words"),
          Text.sentenceCount(c).cast("long").as("n_sentences"),
          Text.syllableCount(c).cast("long").as("n_syllables"),
          Text.fleschScore(c).as("flesch"))
        .orderBy(col("doc_id"))
    }),
    "q_doc_stats" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      val c = col("text")
      t(s, d, "documents").select(
        col("doc_id"),
        Text.tokenCount(c).cast("long").as("n_tokens"),
        Text.bpeTokenCount(c).cast("long").as("n_bpe_tokens"),
        graft.expressions.GraftFunctions.rollingHash(c).as("rolling_hash"),
        Text.nonSpaceChars(c).cast("long").as("n_nonspace"),
        Text.digitCount(c).cast("long").as("n_digits"),
        Text.punctCount(c).cast("long").as("n_punct"),
        Text.avgTokenLen(c).as("avg_token_len"),
        Text.digitRatio(c).as("digit_ratio"),
        Text.stopwordRatio(c).as("stopword_ratio"),
        Text.fingerprint(c).as("fingerprint")).orderBy(col("doc_id"))
    }),
    "q_lang_id" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"), Text.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))),
    "q_quality_filter" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), Text.isQuality(col("text")).as("keep"))
        .orderBy(col("doc_id"))),
    // ---- corpus hygiene ([EXT]): PII scrub, web-text normalization,
    // repetition signals, benchmark decontamination, chunking, tf-idf.
    // The PII/markup fixtures are appended deterministically to the
    // documents text (the synthetic corpus has none), IDENTICALLY in
    // the oracle SQL — so the redaction/normalization genuinely fires.
    // URL surface ([EXT]): synthesized crawl URLs parsed back through
    // parse_url + canonicalized (tracking params stripped) — every
    // part certified against table-stated expectations
    "q_url_meta" -> ((s, d) => {
      val url = concat(lit("https://"), col("source"), lit(".Example.com/docs/"),
        col("doc_id"), lit("?utm_source=feed&lang="), col("lang"), lit("&fbclid=x1"))
      t(s, d, "documents").select(col("doc_id"), url.as("__u"))
        .select(col("doc_id"),
          graft.functions.Urls.host(col("__u")).as("host"),
          graft.functions.Urls.domain(col("__u")).as("domain"),
          graft.functions.Urls.path(col("__u")).as("path"),
          graft.functions.Urls.queryParam(col("__u"), "lang").as("q_lang"),
          graft.functions.Urls.stripTracking(col("__u")).as("canonical_url"))
        .orderBy(col("doc_id"))
    }),
    "q_pii_scrub" -> ((s, d) => {
      val aug = concat(col("text"), lit(" reach user"), col("doc_id"),
        lit("@mail.example.com or 555-867-5309 ssn 123-45-6789 host 10.0.0."),
        col("doc_id") % 250)
      t(s, d, "documents").select(
        col("doc_id"),
        Scrub.emailCount(aug).cast("long").as("n_emails"),
        Scrub.ssnCount(aug).cast("long").as("n_ssns"),
        Scrub.phoneCount(aug).cast("long").as("n_phones"),
        Scrub.ipCount(aug).cast("long").as("n_ips"),
        Scrub.piiScrub(aug).as("scrubbed")).orderBy(col("doc_id"))
    }),
    "q_normalize" -> ((s, d) => {
      val aug = concat(lit("<div class=\"doc\"> "), col("text"),
        lit(" &amp; more&nbsp;text <br/> </div>"))
      t(s, d, "documents")
        .select(col("doc_id"), Scrub.normalizeText(aug).as("normalized"))
        .orderBy(col("doc_id"))
    }),
    // Unicode NFC canonicalization ([EXT]): the codepoint-level
    // normalization Scrub.normalizeText doesn't do — a deterministic
    // decomposed suffix (e + combining acute) is appended so the
    // compare proves real composition (norm_len == raw_len - 1), via
    // the native graft_unicode_normalize codegen Expression against
    // DuckDB's independent nfc_normalize implementation
    "q_nfc_normalize" -> ((s, d) => {
      val aug = concat(col("text"), lit("e" + '\u0301'))
      val norm = graft.expressions.GraftFunctions.unicodeNormalize(aug, "NFC")
      t(s, d, "documents")
        .select(col("doc_id"), norm.as("norm_text"),
          length(norm).as("norm_len"), length(aug).as("raw_len"))
        .orderBy(col("doc_id"))
    }),
    "q_repetition" -> ((s, d) => CorpusStats.repetitionSignals(t(s, d, "documents"))),
    // benchmark set = every 41st doc; the rest is the training corpus
    "q_decontaminate" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Ngrams.decontaminate(
        docs.where(col("doc_id") % 41 =!= 0),
        docs.where(col("doc_id") % 41 === 0))
    }),
    // graded contamination: rate over the doc's own distinct grams,
    // same 41-modulus benchmark split as q_decontaminate
    "q_contamination_rate" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Ngrams.contaminationRate(
        docs.where(col("doc_id") % 41 =!= 0),
        docs.where(col("doc_id") % 41 === 0))
    }),
    // fuzzy benchmark leakage ([EXT]): minhash near-match against the
    // same 41-modulus benchmark split — catches paraphrased/partially
    // quoted eval items the exact 8-gram screen misses
    "q_decontaminate_near" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Ngrams.decontaminateNear(
        docs.where(col("doc_id") % 41 =!= 0),
        docs.where(col("doc_id") % 41 === 0))
    }),
    "q_chunk" -> ((s, d) => Ngrams.chunk(t(s, d, "documents"))),
    // substring-level dedup signal ([EXT]): spans shared across docs —
    // trigrams so the synthetic corpus yields shared spans; production
    // uses ~50-gram spans per the substring-dedup literature
    "q_dup_spans" -> ((s, d) => Ngrams.dupSpans(t(s, d, "documents"), n = 3)),
    // inter-source overlap matrix ([EXT]): which sources republish
    // each other — trigrams so the synthetic corpus yields a dense
    // matrix; production uses longer grams
    "q_source_overlap" -> ((s, d) =>
      Ngrams.sourceOverlap(t(s, d, "documents"), n = 3)),
    // winnowing fingerprints ([EXT]): MOSS window-min selection over
    // rolling gram hashes — trigrams/w=4 so the synthetic corpus
    // selects densely; production uses ~5-grams with w~50
    "q_winnow" -> ((s, d) =>
      Ngrams.winnowFingerprints(t(s, d, "documents"), n = 3, w = 4)),
    // winnowed passage-overlap pairs ([EXT]): substring-level
    // complement of the minhash whole-document near-dup join
    "q_winnow_overlap" -> ((s, d) =>
      Ngrams.winnowOverlap(t(s, d, "documents"), n = 3, w = 4, minShared = 5)),
    "q_tfidf" -> ((s, d) => CorpusStats.tfIdf(t(s, d, "documents"))),
    // BM25 top-k retrieval ([EXT]): the query-term filter lands before
    // any shuffle — the aggregate never sees the corpus vocabulary
    "q_bm25" -> ((s, d) =>
      CorpusStats.bm25(t(s, d, "documents"), Seq("join", "hash", "window"))),
    // PMI collocations ([EXT]): adjacent-pair lift over corpus
    // unigram/bigram distributions
    "q_pmi" -> ((s, d) => CorpusStats.pmiCollocations(t(s, d, "documents"))),
    // shared-prefix boilerplate detection ([EXT]): k=3 so the synthetic
    // corpus yields shared prefixes; production uses ~20-50 tokens
    "q_boilerplate" -> ((s, d) =>
      CorpusStats.boilerplatePrefixes(t(s, d, "documents"), k = 3)),
    // PSI drift report ([EXT]): price distribution across an orderkey
    // split; fixed bin edges so runs stay comparable
    "q_psi_drift" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      Profile.psiDrift(li.where(col("l_orderkey") % 2 === 0),
        li.where(col("l_orderkey") % 2 === 1), "l_extendedprice",
        lo = 0.0, hi = 110000.0, nBins = 11)
    }),
    // exact covariance matrix ([EXT]): micro-unit integer moments, the
    // labelCentroids exactness discipline over dimension pairs
    "q_embedding_cov" -> ((s, d) =>
      Similarity.embeddingCovariance(t(s, d, "embeddings"), dim = 64)),
    // vocab coverage ([EXT]): top-20 of the synthetic corpus's 31
    // distinct tokens, so OOV discriminates; production uses 32k-256k
    "q_vocab_coverage" -> ((s, d) =>
      CorpusStats.vocabCoverage(t(s, d, "documents"), vocabSize = 20)),
    // unigram-LM document scoring ([EXT]): perplexity-proxy quality signal
    "q_unigram_logprob" -> ((s, d) => CorpusStats.unigramLogprob(t(s, d, "documents"))),
    // context-aware LM score ([EXT]): Laplace-smoothed bigram model —
    // catches shuffled-real-word spam the unigram score cannot see
    "q_bigram_logprob" -> ((s, d) => CorpusStats.bigramLogprob(t(s, d, "documents"))),
    // LM perplexity gate ([EXT]): keep docs whose per-bigram average
    // logprob clears the bar — the CCNet-style quality filter; the
    // kept SET is engine-exact because the threshold compares the
    // ROUNDED average
    "q_lm_filter" -> ((s, d) =>
      CorpusStats.lmQualityFilter(t(s, d, "documents"), minAvgLogprob = -3.42)),
    // token-blocklist scrub ([EXT]): stopword/markup removal as a
    // literal-array filter riding the scan — zero joins, zero shuffles
    "q_blocklist_scrub" -> ((s, d) =>
      CorpusStats.removeBlockedTokens(t(s, d, "documents"),
        Seq("a", "the", "and", "of", "to", "in"))),
    // per-source type/token diversity ([EXT]): templated/generated
    // sources show collapsed bigram ratios
    "q_ngram_diversity" -> ((s, d) => CorpusStats.ngramDiversity(t(s, d, "documents"))),
    // mergeable document-frequency maintenance ([EXT]): three disjoint
    // pmod shards folded by dfMerge must equal the direct corpus df —
    // the incremental-stats contract a streaming ingest relies on
    "q_df_incremental" -> ((s, d) => {
      val docs = t(s, d, "documents")
      CorpusStats.dfMerge(
        (0 until 3).map(b =>
          CorpusStats.dfShard(docs.where(pmod(col("doc_id"), lit(3)) === b))): _*)
    }),
    // character-class composition ([EXT]): the mojibake/binary-junk
    // structural gate; classes partition the doc's length
    "q_char_classes" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        Text.alphaCount(col("text")).cast("long").as("n_alpha"),
        Text.digitCount(col("text")).cast("long").as("n_digits"),
        Text.whitespaceCount(col("text")).cast("long").as("n_space"),
        Text.punctCount(col("text")).cast("long").as("n_punct"),
        Text.replacementCharCount(col("text")).cast("long").as("n_replacement"))
        .orderBy(col("doc_id"))),
    "q_token_entropy" -> ((s, d) => CorpusStats.tokenEntropy(t(s, d, "documents"))),
    // tokenizer induction ([EXT]): the first BPE merge's pair counts
    "q_bpe_pairs" -> ((s, d) => CorpusStats.bpePairCounts(t(s, d, "documents"))),
    // full BPE training loop ([EXT]): rows-only by design — the
    // iterative driver loop has no SQL oracle (like the ML baseline);
    // BpeSpec verifies against an independent reference implementation
    "q_bpe_train" -> ((s, d) =>
      graft.operators.Bpe.trainAsDataFrame(s, t(s, d, "documents"), nMerges = 12)),
    // the APPLY half of the BPE family under oracle: segmentCounts over
    // the real corpus with a LEARNED 12-merge list derived by the
    // pure-JVM reference trainer from a literal fixture vocabulary
    // (Bpe.fixtureMerges — the q_random_projection seeded-literal
    // discipline), so the greedy mergeFold serving arithmetic gets a
    // hash certificate (DuckDB replays it as a separator-wrapped
    // replace chain — a genuinely independent spelling) while training
    // on live data stays the rows-only q_bpe_train
    "q_bpe_segment" -> ((s, d) =>
      graft.operators.Bpe.segmentCounts(t(s, d, "documents"),
        graft.operators.Bpe.fixtureMerges(12))),
    // per-source dataset card ([EXT]): the release summary table —
    // volumes, length spread, language mix, quality-gate share
    "q_corpus_card" -> ((s, d) => CorpusStats.corpusCard(t(s, d, "documents"))),
    // blocked fuzzy match ([EXT]): the part-name dictionary vs its
    // last-char-dropped corruption (deterministic, mirrored in SQL) —
    // suffix typos survive the first-token blocking by construction
    "q_fuzzy_match" -> ((s, d) => {
      val names = t(s, d, "part").select(col("p_name"))
      val corrupted = names
        .select(expr("substring(p_name, 1, length(p_name) - 1)").as("q_name"))
      Fuzzy.blockedMatch(corrupted, names, "q_name", "p_name", maxDist = 2)
    }),
    // Jaro-Winkler near-name pairs ([EXT]): the codegen Expression
    // scored UNROUNDED against DuckDB's NATIVE jaro_winkler_similarity
    // — two independent implementations agreeing bit-for-bit
    "q_jaro_pairs" -> ((s, d) =>
      Fuzzy.jaroWinklerPairs(t(s, d, "part"), "p_name", minSim = 0.85)),
    // hot-block-capped twin (the q_minhash_capped guard family, now on
    // the linkage side): a synthesized 40-name hot block (natural
    // first-token blocks are a uniform 8, so a cap must be GIVEN a
    // bomb to defuse) dies above the cap while every natural block
    // survives intact — recall trade, never wrong answers; the cap
    // replays cross-engine as a HAVING filter
    "q_jaro_capped" -> ((s, d) =>
      Fuzzy.jaroWinklerPairs(hotBlockNames(t(s, d, "part")), "p_name",
        minSim = 0.85, maxBlock = 30)),
    // the cap's observability surface, oracled: exactly which block a
    // maxBlock of 30 discards on the same input, with its size
    "q_dropped_blocks" -> ((s, d) =>
      Fuzzy.droppedBlocks(hotBlockNames(t(s, d, "part")), "p_name",
        maxBlock = 30)),
    // unified cap-drop audit ([EXT]): ONE table over everything the
    // pair-stage guards discarded — LSH hot buckets (cap 3 on the
    // documents corpus, the q_minhash_capped constant) unioned with
    // fuzzy hot blocks (cap 30 on the planted-bomb dictionary, the
    // q_dropped_blocks constant) — so a production run reads a single
    // quarantine surface instead of per-family reports
    "q_drop_audit" -> ((s, d) =>
      graft.operators.Audit.dropAudit(
        t(s, d, "documents"), maxBucket = 3,
        hotBlockNames(t(s, d, "part")), "p_name", maxBlock = 30,
        semanticEmb = Some(t(s, d, "embeddings")), kCells = 8, maxCell = 50,
        twoLevelEmb = Some(t(s, d, "embeddings")),
        k1 = 4, k2 = 4, maxCellTwoLevel = 40)),
    // exact triangle count ([EXT]): degree-ordered orientation over
    // the co-purchase graph (parts sharing a high-quantity order) —
    // hub wedges charged to low-degree endpoints, O(m^1.5) bound
    "q_triangles" -> ((s, d) => Graph.triangleCount(copurchaseEdges(s, d))),
    // degree distribution ([EXT]): the hub/power-law fingerprint —
    // histogram bounded by max degree, never node count
    "q_degree_dist" -> ((s, d) => Graph.degreeDistribution(copurchaseEdges(s, d))),
    // dedup cluster-size profile ([EXT]): the corpus-duplication
    // fingerprint over the same CC assignment
    "q_cluster_sizes" -> ((s, d) =>
      Dedup.clusterSizeProfile(t(s, d, "documents"), threshold = 0.5)),
    // local clustering coefficient ([EXT]): community cores vs pure
    // hubs per part — the same machinery, per-corner credit
    "q_clustering_coef" -> ((s, d) => Graph.localClustering(copurchaseEdges(s, d))),
    // market-basket association rules ([EXT]): pairwise support /
    // confidence / lift over order baskets, exact counts + one IEEE
    // expression per ratio
    "q_market_basket" -> ((s, d) =>
      Reports.associationRules(t(s, d, "lineitem"), "l_orderkey", "l_partkey",
        minPairCount = 2)),
    // lagged cross-correlation ([EXT]): does view activity predict
    // purchases k days out — daily-aggregate-first, bounded spine join
    "q_lag_corr" -> ((s, d) =>
      Windows.lagCorrelation(t(s, d, "events"), "view", "purchase", maxLag = 7)),
    // TPC-H Q3 shape: unshipped-backlog revenue top-10 — pushed
    // filters, broadcast segment keys, top-k on the EXACT decimal
    // TPC-H Q5 shape: 6-table star join, region filter broadcast down,
    // cross-dimension c_nationkey = s_nationkey on the join keys
    // streaming quantile monitor ([EXT]) in its batch twin: DDSketch
    // ORACLED since round 10 (late): the stateful DDSketch monitor in
    // its certificate form — rank + owning sign/bucket per key for
    // p50/p99 replay bit-exactly in DuckDB (the q_distinct_monitor
    // playbook); the float-estimate twin (quantileMonitor) keeps its
    // stream==batch exactness law in SessionsSpec
    "q_quantile_monitor" -> ((s, d) =>
      Sessions.quantileMonitorCert(graft.functions.TimeCol.instant(t(s, d, "events")))
        .toDF().orderBy(col("event_type"))),
    // streaming distinct monitor ([EXT]) in its batch twin: KMV in
    // keyed state — portable fp60 + the kmvEstimate arithmetic make
    // this streaming monitor ORACLE-certifiable
    "q_distinct_monitor" -> ((s, d) =>
      Sessions.distinctMonitor(t(s, d, "events"))
        .toDF().orderBy(col("event_type"))),
    "q_tpch_q5" -> ((s, d) =>
      Reports.localSupplierVolume(t(s, d, "customer"), t(s, d, "orders"),
        t(s, d, "lineitem"), t(s, d, "supplier"), t(s, d, "nation"),
        t(s, d, "region"), "ASIA", "1996-01-01", "1998-01-01")),
    // one-row NB evaluation summary: accuracy + Cohen's kappa (the
    // chance-corrected agreement a majority-class baseline can't fake)
    "q_nb_summary" -> ((s, d) =>
      graft.ml.NaiveBayes.summary(t(s, d, "documents"))),
    "q_shipping_priority" -> ((s, d) =>
      Reports.shippingPriority(t(s, d, "customer"), t(s, d, "orders"),
        t(s, d, "lineitem"), "BUILDING", "1998-06-01")),
    // rolling median ([EXT]): order-statistic smoothing per key —
    // exact percentile as a WINDOW aggregate, despikes where EWMA can't
    "q_rolling_median" -> ((s, d) => Windows.rollingMedian(t(s, d, "events"))),
    // seasonal-residual anomaly flags ([EXT]): (type, weekday) mean
    // baseline, MAD-scaled residual, |score| > 3 on the ROUNDED score
    "q_ts_anomaly" -> ((s, d) =>
      Windows.seasonalAnomalies(graft.functions.TimeCol.instant(t(s, d, "events")))),
    // Naive Bayes as pure dataflow ([EXT]): train/predict/confusion
    // entirely in aggregates+joins — the oracle replays the whole
    // chain, certifying a TRAINED model cross-engine
    "q_nb_confusion" -> ((s, d) =>
      graft.ml.NaiveBayes.confusion(t(s, d, "documents"))),
    // per-class precision/recall/F1 over the same held-out matrix —
    // the evaluation sheet, engine-exact ratios from exact counts
    "q_nb_metrics" -> ((s, d) =>
      graft.ml.NaiveBayes.metrics(t(s, d, "documents"))),
    // decile gains/lift table ([EXT]): the targeting view of a scorer
    // — positional ntiles, response/capture/lift per tile
    "q_gains" -> ((s, d) =>
      Reports.gainsTable(
        t(s, d, "documents")
          .withColumn("y", when(col("lang") === "en", 1L).otherwise(0L)),
        "n_chars", "y", "doc_id")),
    // gaps-and-islands activity streaks ([EXT]): epoch-day minus
    // row_number labels each contiguous run per type
    "q_streaks" -> ((s, d) =>
      Windows.activityStreaks(graft.functions.TimeCol.instant(t(s, d, "events")))),
    // Mann-Kendall trend test ([EXT]): distribution-free monotonicity
    // — exact integer S over the bounded daily table, guarded z chain
    "q_trend_test" -> ((s, d) =>
      Windows.mannKendall(graft.functions.TimeCol.instant(t(s, d, "events")))),
    // CUSUM control chart ([EXT]): sustained-drift alarms via the
    // prefix-sum unroll, all integer micro-units (frame-order-proof)
    "q_cusum" -> ((s, d) =>
      Windows.cusum(graft.functions.TimeCol.instant(t(s, d, "events")))),
    // session exit rates ([EXT]): share of each event type's
    // occurrences that ended a session — sessionIds composition
    "q_exit_rates" -> ((s, d) => Windows.exitRates(t(s, d, "events"))),
    // new-vs-returning daily split ([EXT]): acquisition vs retention
    // over the distinct (user, day) table
    "q_new_returning" -> ((s, d) =>
      Windows.newVsReturning(graft.functions.TimeCol.instant(t(s, d, "events")))),
    // EXACT Gini coefficient ([EXT]): rank-weighted identity on the
    // prefix-sum skeleton, tie-proof integer moments
    "q_gini" -> ((s, d) => Profile.giniExact(t(s, d, "documents"), "n_chars")),
    // Lorenz curve ([EXT]): the decile view behind the Gini number —
    // positional tiles, exact decimal shares
    "q_lorenz" -> ((s, d) =>
      Profile.lorenzCurve(t(s, d, "documents"), "n_chars", "doc_id")),
    // concentration indices ([EXT]): HHI + effective category count
    // per column — the training-mix diversification check
    "q_concentration" -> ((s, d) =>
      Profile.concentration(t(s, d, "documents"), Seq("source", "lang"))),
    // EXACT two-sample KS drift ([EXT]): sup|ECDF diff| as integer
    // cross-products over the distinct-value table, dual prefix sums
    // on one distributed sort
    "q_ks_drift" -> ((s, d) =>
      Profile.ksDrift(t(s, d, "documents"), "source", "n_chars", "src0", "src1")),
    // EXACT distributed AUC ([EXT]): rank-sum identity on the
    // distinct-score table + the distributed prefix-sum skeleton —
    // never per-pair, never a one-task global rank window
    "q_auc" -> ((s, d) =>
      Profile.aucExact(
        t(s, d, "documents")
          .withColumn("y", when(col("lang") === "en", 1L).otherwise(0L)),
        "n_chars", "y")),
    // sparse tf-idf cosine join ([EXT]): df-capped inverted index —
    // the WEIGHTED near-dup complement of q_jaccard_join
    "q_sparse_cosine" -> ((s, d) =>
      SetSimilarity.sparseCosineJoin(t(s, d, "documents"))),
    // hashing-trick featurizer ([EXT]): vocabulary-free fixed-width
    // features, signed-tf longs — exact, no float anywhere
    "q_hash_features" -> ((s, d) =>
      CorpusStats.hashFeatures(t(s, d, "documents"))),
    // top user paths ([EXT]): the real sequences product analytics
    // reads before hypothesizing a funnel
    "q_user_paths" -> ((s, d) => Reports.userPaths(t(s, d, "events"))),
    // ABC / Pareto classes ([EXT]): global ordered cumsum on the
    // shared prefix-sum skeleton — never a single-task window
    "q_abc_analysis" -> ((s, d) => {
      val rev = t(s, d, "lineitem").groupBy(col("l_partkey"))
        .agg((sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 4))) * 10000).cast("long").as("units"))
      Reports.abcAnalysis(rev, "l_partkey", "units")
    }),
    // RFM quintiles ([EXT]): positional ntile over total orders —
    // monetary buckets on the EXACT decimal, never the double
    "q_rfm" -> ((s, d) => Reports.rfmSegments(t(s, d, "orders"))),
    // Gopher rule battery ([EXT]): the published filter set as one
    // scan pass; every rule compares the ROUNDED metric
    "q_gopher_rules" -> ((s, d) => CorpusStats.gopherQuality(t(s, d, "documents"))),
    // bounded-depth BFS ([EXT]): blast radius — min-hop labels within
    // 2 undirected hops of the seed parts; k bounded frontier stages
    "q_khop" -> ((s, d) =>
      Graph.kHopReachable(copurchaseEdges(s, d), Seq(1L, 2L, 3L), k = 2)),
    // t-closeness ([EXT]): completes the privacy triad — per-group
    // total-variation distance to the global sensitive distribution,
    // absent values folded in algebraically (no spine)
    "q_t_closeness" -> ((s, d) =>
      Anonymize.tCloseness(t(s, d, "documents"), Seq("source"), "lang")),
    // growth curve ([EXT]): users count once, on their first day —
    // never an expanding re-count
    "q_cumulative_users" -> ((s, d) => Reports.cumulativeUsers(t(s, d, "events"))),
    // rolling 7-day actives / WAU ([EXT]): bounded n-literal fan-out
    // instead of a per-day distinct re-count
    "q_rolling_active" -> ((s, d) => Reports.rollingActiveUsers(t(s, d, "events"))),
    // quantile transform ([EXT]): rank-based normalization immune to
    // any monotone distortion — ties share a percent_rank
    "q_quantile_transform" -> ((s, d) =>
      Profile.quantileTransform(
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_extendedprice")),
        "l_returnflag", "l_extendedprice")
        .select(col("l_orderkey"), col("l_linenumber"), col("q"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),
    // mutual information ([EXT]): the dependence chi2 tests but does
    // not quantify — one fact scan, margins on the bounded cell rows
    "q_mutual_info" -> ((s, d) =>
      Profile.mutualInformation(t(s, d, "documents"), "lang", "source")),
    // fightin' words ([EXT]): z-scored log-odds with informative
    // Dirichlet prior — which terms distinguish src0 from src1
    "q_log_odds" -> ((s, d) =>
      CorpusStats.logOddsTerms(t(s, d, "documents"), "src0", "src1")),
    // inter-arrival burstiness ([EXT]): Poisson-vs-bursty CV per user
    "q_interarrival" -> ((s, d) => Windows.interArrival(t(s, d, "events"))),
    // contrastive pair mining ([EXT]): near-dup positives + portable-
    // hash-addressed random negatives over the ordinal index
    "q_contrastive_pairs" -> ((s, d) =>
      Dedup.contrastivePairs(t(s, d, "documents"))),
    // seasonal-naive backtest ([EXT]): the same-weekday-last-week
    // baseline + MAE — the backtest join fancier models drop into
    "q_seasonal_naive" -> ((s, d) =>
      Reports.seasonalNaiveBacktest(t(s, d, "events"))),
    // null-semantics battery ([EXT]): the ANSI traps certified in one
    // row — NOT IN vs NOT EXISTS under nulls, null-safe joins,
    // count(col) vs count(*), trichotomy failure
    "q_null_semantics" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("ns_orders")
      s.sql("""
        WITH o AS (SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
                               ELSE o_orderkey END AS k,
                          CASE WHEN o_orderkey % 53 = 0 THEN NULL
                               ELSE o_totalprice END AS v
                   FROM ns_orders),
             p AS (SELECT CASE WHEN o_orderkey % 91 = 0 THEN NULL
                               ELSE o_orderkey END AS k FROM ns_orders)
        SELECT
          (SELECT count(*) FROM o) AS n_rows,
          (SELECT count(k) FROM o) AS n_k,
          (SELECT count(DISTINCT k) FROM o) AS n_distinct_k,
          (SELECT count(*) FROM o WHERE k IS NULL) AS n_null_k,
          (SELECT count(*) FROM o JOIN p ON o.k = p.k) AS n_join,
          (SELECT count(*) FROM o JOIN p ON o.k <=> p.k) AS n_nullsafe_join,
          (SELECT count(*) FROM o WHERE k NOT IN (SELECT k FROM p)) AS n_not_in,
          (SELECT count(*) FROM o
             WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.k = o.k)) AS n_not_exists,
          (SELECT CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) FROM o) AS sum_v,
          (SELECT count(*) FROM o WHERE v > 0 OR NOT (v > 0)) AS n_trichotomy""")
    }),
    // Kaplan-Meier survival ([EXT]) over SESSION durations: sessions
    // still inside the gap window at corpus end are censored (their
    // true length is unobserved) — the correction a naive duration
    // histogram misses; minutes-granularity event times
    "q_kaplan_meier" -> ((s, d) => {
      val gapUs = 1800000000L
      val sess = Windows.sessionizeBatch(t(s, d, "events"), gapUs)
      val mx = sess.agg(max(col("end_us")).as("__mx"))
      val life = sess.crossJoin(broadcast(mx))
        .select(expr("duration_us div 60000000").as("t"),
          (col("end_us") > col("__mx") - gapUs).as("censored"))
      Reports.kaplanMeierCurve(life)
    }),
    // two-proportion z on a hash split ([EXT]): the experiment
    // primitive, doubling as the A/A calibration check
    "q_ab_test" -> ((s, d) => Reports.abTest(t(s, d, "events"))),
    // Benford first-digit audit ([EXT]): integer-cent leading digits
    // vs log10(1 + 1/d) — the fabrication smell test
    "q_benford" -> ((s, d) => Profile.benfordAudit(t(s, d, "orders"), "o_totalprice")),
    // per-doc keywords ([EXT]): top-3 tf-idf terms, zero-model tagger
    "q_keywords" -> ((s, d) => CorpusStats.keywords(t(s, d, "documents"))),
    // entity resolution capstone ([EXT]): fuzzy edges -> connected
    // components -> lexicographic canonical per cluster
    "q_entity_resolution" -> ((s, d) =>
      Fuzzy.resolveEntities(t(s, d, "part"), "p_name", minSim = 0.88)),
    // Fellegi-Sunter linkage ([EXT]): same-name candidate pairs scored
    // by the data-estimated likelihood ratio over brand/type/size
    // evidence — pure IEEE arithmetic, certified UNROUNDED
    "q_fs_weights" -> ((s, d) =>
      Fuzzy.fsWeights(t(s, d, "part"), "p_partkey", "p_name",
        Seq("p_brand" -> "0.95", "p_type" -> "0.90", "p_size" -> "0.85"),
        block = c => c)),
    // calendar-edge battery ([EXT]): month-end clamping, leap days,
    // ISO weeks — certified on the month-end order slice
    "q_date_edges" -> ((s, d) => {
      val o = t(s, d, "orders")
      o.where(dayofmonth(col("o_orderdate")) >= 29)
        .select(col("o_orderkey"),
          to_date(col("o_orderdate")).as("d"),
          add_months(to_date(col("o_orderdate")), 1).as("plus_month"),
          last_day(to_date(col("o_orderdate"))).as("month_end"),
          quarter(col("o_orderdate")).cast("long").as("q"),
          weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
          dayofyear(col("o_orderdate")).cast("long").as("doy"))
        .orderBy(col("o_orderkey"))
    }),
    // end-to-end corpus pipeline ([EXT] capstone): the hygiene
    // operators COMPOSED the way a training-data run uses them —
    // quality gate -> exact dedup (min-id keeper) -> drop benchmark
    // members and benchmark-contaminated docs -> fixed-budget chunks.
    // Every stage is an existing operator; the oracle chains the same
    // stages as CTEs.
    "q_corpus_pipeline" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val kept = docs.where(Text.isQuality(col("text")))
      val fp = kept.select(col("doc_id"), col("text"),
        Text.fingerprint(col("text")).as("f"))
      // min_by keeps the min-id row (with ITS raw text) in ONE
      // aggregate — the fp⋈fp.groupBy self-join spelling computes the
      // quality+sha256 subtree twice
      val keepers = fp.groupBy(col("f"))
        .agg(min_by(struct(col("doc_id"), col("text")), col("doc_id")).as("r"))
        .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"))
      // train feeds three plan subtrees (decontaminate's gram explode,
      // its passthrough join, and chunk); measured: pinning it with
      // localCheckpoint does NOT help (4.5 s vs 4.4 s at sf0.1) — the
      // recomputed subtree is cheap relative to the gram explode and
      // chunk stages, and the checkpoint job adds its own cost
      val train = keepers.where(col("doc_id") % 41 =!= 0)
      val bench = docs.where(col("doc_id") % 41 === 0)
      // anti-join on the CONTAMINATED ids (few) instead of inner-join
      // on the clean ids (nearly all): same rows, but the broadcast
      // side shrinks to the hits — measured 3.9 s vs 4.4 s at sf0.1
      val dirtyIds = Ngrams.decontaminate(train, bench)
        .where(col("contaminated")).select("doc_id")
      Ngrams.chunk(train.join(dirtyIds, Seq("doc_id"), "left_anti"))
    }),
    // training-mix capstone ([EXT]): the SAMPLING-side counterpart of
    // q_corpus_pipeline — quality gate → exact-dedup keepers → target
    // mixture → train/val/test split → epoch shuffle key, all
    // deterministic, composed purely from existing operators
    "q_training_mix" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val keepers = docs.where(Text.isQuality(col("text")))
        .select(col("doc_id"), col("lang"), Text.fingerprint(col("text")).as("f"))
        .groupBy(col("f"))
        .agg(min_by(struct(col("doc_id"), col("lang")), col("doc_id")).as("r"))
        .select(col("r.doc_id").as("doc_id"), col("r.lang").as("lang"))
      val mixed = Sampling.mixtureSample(keepers, "doc_id", "lang",
        Map("en" -> 0.5, "zh" -> 0.2, "es" -> 0.2, "de" -> 0.1), fraction = 0.5)
      val split = Sampling.assignSplit(mixed, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      Sampling.seededShuffle(split, "doc_id", "epoch0").orderBy(col("doc_id"))
    }),
    // ---- document dedup family (SURVEY §2.7 [EXT]) ----
    "q_exact_docs" -> ((s, d) => Dedup.exactDocs(t(s, d, "documents"))),
    // bloom-guarded incremental dedup ([EXT]): batch = genuinely-new
    // odd docs + re-crawled copies of history docs under fresh ids
    // (the crawler pattern); bloom-negatives skip the verify join,
    // result exact regardless of sketch sizing
    "q_bloom_new_docs" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val history = docs.where(col("doc_id") % 2 === 0)
      val batch = docs.where(col("doc_id") % 2 === 1)
        .unionByName(docs.where(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000))
      val index = Dedup.fingerprintIndex(history)
      Dedup.newDocs(batch, index, Dedup.fingerprintBloom(index))
    }),
    // incremental NEAR-dup ([EXT]): batch signatures banded against a
    // persisted history signature table; verification = MinHash
    // Jaccard estimator (signature agreement), so history text is
    // never re-read. Batch = genuinely-new odd docs + lightly-edited
    // re-crawls of history docs (near- but not exact-dups).
    "q_new_near_docs" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val history = docs.where(col("doc_id") % 2 === 0)
      val batch = docs.where(col("doc_id") % 2 === 1)
        .unionByName(docs.where(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000)
          .withColumn("text", concat(col("text"), lit(" updated rev"))))
      Dedup.newNearDocs(batch, Dedup.minhashSignatures(history, "doc_id", "text"))
    }),
    // hot-bucket-capped twin (same guard family as q_minhash_capped /
    // q_lsh_knn_capped): boilerplate history buckets above the cap
    // contribute no candidates — recall trade, never wrong answers
    "q_new_near_capped" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val history = docs.where(col("doc_id") % 2 === 0)
      val batch = docs.where(col("doc_id") % 2 === 1)
        .unionByName(docs.where(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000)
          .withColumn("text", concat(col("text"), lit(" updated rev"))))
      Dedup.newNearDocs(batch, Dedup.minhashSignatures(history, "doc_id", "text"),
        maxBucket = 3)
    }),
    // the PRODUCTION shape of the incremental near-dup probe: the
    // history signature table is PERSISTED (built once, here lazily
    // per scale dir) and only READ per batch — so this entry's bench
    // time is the true per-batch increment cost, where q_new_near_docs
    // re-signs the whole history in-query (an upper bound). Same
    // result, same oracle.
    "q_new_near_persisted" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val sigDir = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_hist_sigs_" + d.replaceAll("[^A-Za-z0-9.]", "_")).toString
      // stamped by source row count: a testdata dir regenerated in
      // place re-derives the signatures instead of probing a dead corpus
      graft.sources.Lake.buildOnce(sigDir,
        "documents:" + graft.sources.Lake.fingerprint(docs)) {
        Dedup.minhashSignatures(docs.where(col("doc_id") % 2 === 0), "doc_id", "text")
          .write.mode("overwrite").parquet(sigDir)
      }
      val batch = docs.where(col("doc_id") % 2 === 1)
        .unionByName(docs.where(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000)
          .withColumn("text", concat(col("text"), lit(" updated rev"))))
      Dedup.newNearDocs(batch, s.read.parquet(sigDir), materialize = true)
    }),
    "q_minhash_candidates" -> ((s, d) => Dedup.minhashCandidates(t(s, d, "documents"))),
    // hot-bucket guard on: buckets above the cap are dropped before
    // pair expansion (the 100 TB safety valve; cap chosen to actually
    // drop a bucket at the gate's scale)
    "q_minhash_capped" -> ((s, d) =>
      Dedup.minhashCandidates(t(s, d, "documents"), maxBucket = 3)),
    "q_near_dup_pairs" -> ((s, d) => Dedup.nearDupPairs(t(s, d, "documents"), threshold = 0.5)),
    // cross-source duplication matrix ([EXT]): verified near-dup PAIR
    // counts per source pair — the number a curation run acts on
    // (sourceOverlap's gram-mass audit is the cheap early warning)
    "q_cross_source_dups" -> ((s, d) =>
      Dedup.crossSourceDups(t(s, d, "documents"), threshold = 0.5)),
    // EXACT set-similarity join ([EXT]): every pair with true Jaccard
    // >= t via prefix filtering — recall 1 by construction (the
    // contract-grade complement to the probabilistic minhash family,
    // and the recall yardstick for it)
    "q_jaccard_join" -> ((s, d) => SetSimilarity.jaccardJoin(t(s, d, "documents"), threshold = 0.5)),
    // asymmetric containment ([EXT]): |A∩B|/|A| >= t — "B quotes A"
    // detection that symmetric Jaccard misses when the container dwarfs
    // the contained doc
    "q_containment" -> ((s, d) => SetSimilarity.containmentJoin(t(s, d, "documents"), threshold = 0.8)),
    // persisted-set twin ([EXT]): jaccardJoin reading a materialized
    // ranked gram-set table — the production shape (the set build is
    // the reusable artifact; inline variant re-derives it 4x). Same
    // oracle as q_jaccard_join: identical results by construction.
    "q_jaccard_persisted" -> ((s, d) => {
      val setsDir = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_gram_sets_" + d.replaceAll("[^A-Za-z0-9.]", "_")).toString
      val docs = t(s, d, "documents")
      // stamped by source row count (the q_new_near_persisted discipline)
      graft.sources.Lake.buildOnce(setsDir,
        "documents:" + graft.sources.Lake.fingerprint(docs)) {
        SetSimilarity.rankedGramSets(docs)
          .write.mode("overwrite").parquet(setsDir)
      }
      SetSimilarity.jaccardJoinOfSets(s.read.parquet(setsDir), threshold = 0.5)
    }),
    // LSH recall audit ([EXT]): banded minhash candidates scored
    // against the exact Jaccard pairs ON THE SAME gram space — the
    // empirical recall/cost curve a pipeline checks before trusting
    // LSH dedup at scale
    "q_lsh_recall" -> ((s, d) => SetSimilarity.lshRecallAudit(t(s, d, "documents"))),
    // the runbook form: same audit over the deterministic fp60-smallest
    // 2000 docs — absolutely bounded at any corpus size (one scan + a
    // TakeOrdered + the audit on 2000 docs), the way the audit actually
    // runs at 100 TB
    "q_lsh_recall_sampled" -> ((s, d) =>
      SetSimilarity.lshRecallAuditSampled(t(s, d, "documents"), sampleSize = 2000)),
    "q_dedup_docs" -> ((s, d) => Dedup.dedupDocuments(t(s, d, "documents"), threshold = 0.5)),
    // quality-aware keeper re-election ([EXT]): same clusters, but the
    // representative is the longest doc (n_chars desc, id tiebreak) —
    // the "keep the cleanest copy" policy real corpus dedup wants
    "q_dedup_quality" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.keeperByQuality(
        Dedup.dedupDocuments(docs, threshold = 0.5),
        docs.select(col("doc_id"), col("n_chars").as("score")))
    }),
    // transitive-closure keeper policy (connected components of the
    // verified near-dup graph) vs q_dedup_docs' one-hop policy
    "q_dedup_docs_cc" -> ((s, d) => Dedup.dedupDocumentsCC(t(s, d, "documents"), threshold = 0.5)),
    // quality-aware dedup policy ([EXT]): same clusters, best-scoring
    // member kept (longest copy, ties to smaller id) — the LLM-corpus
    // standard keeper rule
    "q_dedup_keep_best" -> ((s, d) =>
      Dedup.dedupKeepBest(t(s, d, "documents"), scoreCol = "n_chars", threshold = 0.5)),
    "q_simhash" -> ((s, d) => Dedup.simhash32(t(s, d, "documents"))),
    // simhash near-dup join ([EXT]): block-LSH candidates (pigeonhole
    // recall 1 within the radius) + exact hamming verify — the
    // one-fingerprint-per-doc member of the near-dup family
    "q_simhash_near" -> ((s, d) =>
      Dedup.simhashNearDup(t(s, d, "documents"), maxDist = 3)),
    // per-source token budgets ([EXT]): the mixture-allocation step —
    // each source keeps its best docs until ITS budget is spent
    "q_budget_per_source" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      Sampling.capTokensPerGroup(
        t(s, d, "documents").select(col("doc_id"), col("source"),
          col("n_chars").cast("double").as("score"),
          Text.tokenCount(col("text")).cast("long").as("n_tokens")),
        "source", "doc_id", "score", "n_tokens", budget = 800L)
    }),
    // token-budget selection ([EXT]): highest-scoring docs until the
    // global budget is spent — the compute-bound data-selection
    // policy; score slot here = n_chars (pluggable)
    "q_budget_select" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      Pack.selectUnderBudget(
        t(s, d, "documents").select(col("doc_id"),
          col("n_chars").cast("double").as("score"),
          Text.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", "score", "n_tokens", budget = 20000L)
    }),
    // systematic sampling ([EXT]): every 100th row of the total order
    // via the distributed global-ordinal primitive — never a
    // single-task row_number window
    "q_systematic_sample" -> ((s, d) =>
      Pack.globalOrdinals(
        t(s, d, "lineitem").select("l_orderkey", "l_linenumber"),
        Seq("l_orderkey", "l_linenumber"))
        .where(col("ordinal") % 100 === 0)
        .orderBy(col("ordinal"))),
    // sequence packing ([EXT]): concat-then-chunk bin assignment via
    // a distributed prefix sum (never a single-task global window)
    "q_pack" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      val sized = t(s, d, "documents")
        .select(col("doc_id"), Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      Pack.contiguousBins(sized, "doc_id", "n_tokens", budget = 512)
        .orderBy(col("doc_id"))
    }),
    // length bucketing ([EXT]): pad-to-boundary batching layout —
    // per-row projection, no shuffle
    "q_length_buckets" -> ((s, d) =>
      Pack.lengthBuckets(
        t(s, d, "documents")
          .select(col("doc_id"), Text.bpeTokenCount(col("text")).cast("long").as("n_tokens")),
        boundaries = Seq(64, 128, 256, 512)).orderBy(col("doc_id"))),
    // ---- similarity search (SURVEY §2.3 [EXT]) ----
    // pairwise-cosine distribution ([EXT]): the embedding-collapse
    // diagnostic — consecutive-id pairs (deterministic, linear in
    // corpus size, no self-join blowup), cosine rounded 6-dp THEN
    // binned so the bucket edges are engine-stable
    "q_cosine_histogram" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      val emb = t(s, d, "embeddings")
      val a = emb.select(col("vec_id").as("ida"), col("embedding").as("ea"))
      val b = emb.select((col("vec_id") - 1).as("ida"), col("embedding").as("eb"))
      val dot = graft.expressions.GraftFunctions.dot _
      a.join(b, Seq("ida"))
        .select(round(
          dot(col("ea"), col("eb")) /
            (sqrt(dot(col("ea"), col("ea"))) * sqrt(dot(col("eb"), col("eb")))), 6)
          .as("c"))
        .select(least(greatest(floor(col("c") * 10), lit(-10.0)), lit(9.0))
          .cast("long").as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as("n"))
        .orderBy(col("bin"))
    }),
    "q_topk_cosine" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.topK(emb, Similarity.vectorOf(emb, 1L), 10)
        .select(col("vec_id"), round(col("cosine_sim"), 6).as("cosine_sim"))
    }),
    // Same top-k, but expressed entirely as SQL text over the
    // extension-injected functions (GraftExtensions) — proves a
    // pure-SQL client reproduces the Column-API results bit-for-bit.
    "q_sql_topk" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      t(s, d, "embeddings").createOrReplaceTempView("graft_sql_embeddings")
      s.sql(
        """WITH q AS (SELECT embedding AS qv FROM graft_sql_embeddings WHERE vec_id = 1),
          |sc AS (SELECT /*+ BROADCAST(q) */ vec_id,
          |  graft_dot(embedding, qv) /
          |    (sqrt(graft_dot(embedding, embedding)) * sqrt(graft_dot(qv, qv))) AS c
          |  FROM graft_sql_embeddings CROSS JOIN q)
          |SELECT vec_id, round(c, 6) AS cosine_sim FROM sc
          |ORDER BY c DESC, vec_id LIMIT 10""".stripMargin)
    }),
    "q_knn_small" -> ((s, d) =>
      Similarity.knnJoin(t(s, d, "embeddings").where(col("vec_id") < 100), 5)
        .select(col("id_a"), col("id_b"), round(col("cosine_sim"), 6).as("cosine_sim"), col("rank"))
        .orderBy(col("id_a"), col("rank"))),
    // hard-negative mining ([EXT]): nearest CROSS-label vectors, the
    // contrastive-training pair source; label filter before ranking
    "q_hard_negatives" -> ((s, d) =>
      Similarity.hardNegatives(t(s, d, "embeddings").where(col("vec_id") < 100), 5)
        .select(col("id_a"), col("label_a"), col("id_b"), col("label_b"),
          round(col("cosine_sim"), 6).as("cosine_sim"), col("rank"))
        .orderBy(col("id_a"), col("rank"))),
    "q_lsh_knn" -> ((s, d) =>
      Similarity.lshKnnJoin(t(s, d, "embeddings"), 5, dim = 64, nBits = 8)
        .select(col("id_a"), col("id_b"), round(col("cosine_sim"), 6).as("cosine_sim"), col("rank"))
        .orderBy(col("id_a"), col("rank"))),
    "q_lsh_knn_capped" -> ((s, d) =>
      Similarity.lshKnnJoin(t(s, d, "embeddings"), 5, dim = 64, nBits = 8, maxBucket = 6)
        .select(col("id_a"), col("id_b"), round(col("cosine_sim"), 6).as("cosine_sim"), col("rank"))
        .orderBy(col("id_a"), col("rank"))),
    // multi-seed LSH: recall dial — pairs bucketed under ANY seed
    "q_lsh_knn_multi" -> ((s, d) =>
      Similarity.lshKnnJoinMultiSeed(t(s, d, "embeddings"), 5, dim = 64, nBits = 8,
        seeds = Seq(42L, 43L))
        .select(col("id_a"), col("id_b"), round(col("cosine_sim"), 6).as("cosine_sim"), col("rank"))
        .orderBy(col("id_a"), col("rank"))),
    // embedding-cosine near-dup keeper map (LSH pairs -> connected
    // components); threshold sized to the synthetic corpus' cosine range
    "q_dedup_embeddings" -> ((s, d) =>
      Similarity.dedupByEmbedding(t(s, d, "embeddings"), threshold = 0.3, dim = 64)),
    // per-label centroid components ([EXT]): class prototypes / IVF
    // cell stats in exact integer-micro form (no float-sum order
    // nondeterminism; division left to the caller — floor-vs-truncate
    // semantics diverge across engines on negatives)
    "q_centroids" -> ((s, d) => Similarity.labelCentroids(t(s, d, "embeddings"))),
    // int8 scalar quantization ([EXT]): 4x-compressed ANN codes with a
    // per-vector reconstruction-error bound. The operator returns the
    // array form; the REGISTERED query posexplodes to scalar rows so
    // the driver's pandas hash-compare (which can't sort array cells)
    // can certify it.
    "q_quantize" -> ((s, d) =>
      Similarity.quantizeEmbeddings(t(s, d, "embeddings"))
        .select(col("vec_id"), posexplode(col("codes")).as(Seq("pos", "code")),
          col("max_abs_err"))
        .select(col("vec_id"), col("pos").cast("long").as("pos"), col("code"),
          col("max_abs_err"))
        .orderBy(col("vec_id"), col("pos"))),
    // deterministic Lloyd k-means ([EXT]): engine-exact seeds/updates/
    // distances, so the full 2-iteration training run is oracled
    "q_kmeans" -> ((s, d) =>
      graft.operators.Clustering.kmeans(t(s, d, "embeddings"), k = 8, iters = 2)),
    // the wide NORM-TRICK path under oracle — the argmin arithmetic
    // every at-scale assignment actually runs (previously law-tested
    // only): k=40 flips assignCells to argmin_c(||c||^2 - 2 v.c) with
    // the exact dist2 recomputed for winners only, and the DuckDB
    // oracle replays THAT spelling (lloydWideCtes), so the hash
    // certification is by construction, not near-tie luck
    "q_kmeans_wide" -> ((s, d) =>
      graft.operators.Clustering.kmeans(t(s, d, "embeddings"), k = 40, iters = 2)),
    // product quantization ([EXT], Jégou et al. 2011): per-subspace
    // deterministic Lloyd codebooks trained + corpus encoded in one
    // grouped pass — the full training run is oracled, like q_kmeans
    "q_pq_encode" -> ((s, d) => {
      val (codes, _) = graft.operators.Clustering.pqTrainEncode(
        t(s, d, "embeddings"), m = 4, k = 8, iters = 2, dim = 64)
      codes.select(col("vec_id"), col("subspace"), col("code"),
        round(col("dist2"), 6).as("dist2"))
        .orderBy(col("vec_id"), col("subspace"))
    }),
    // the pqAssign WIDE norm-trick branch under oracle — completes the
    // wide-certification trio (assignCells: q_kmeans_wide, tlAssign:
    // q_two_level_cells_wide, pqAssign: this row): k=40 codewords per
    // subspace flips pqAssign to argmin_c(||c||^2 - 2 sv.c) with the
    // exact dist2 recomputed for winners only, and the DuckDB oracle
    // (pqWideCtes) replays THAT spelling verbatim
    "q_pq_encode_wide" -> ((s, d) => {
      val (codes, _) = graft.operators.Clustering.pqTrainEncode(
        t(s, d, "embeddings"), m = 4, k = 40, iters = 2, dim = 64)
      codes.select(col("vec_id"), col("subspace"), col("code"),
        round(col("dist2"), 6).as("dist2"))
        .orderBy(col("vec_id"), col("subspace"))
    }),
    // PQ recall audit ([EXT]): ADC top-10 vs the exact L2 top-10 in
    // one certified row — the q_lsh_recall discipline for the PQ
    // index (measured recall, not a hope)
    "q_pq_recall" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = Similarity.vectorOf(emb, 1L)
      val (codes0, cbs) = graft.operators.Clustering.pqTrainEncode(
        emb, m = 16, k = 16, iters = 2, dim = 64)
      // adc/exact each feed a join AND a count — checkpoint so the
      // 2-iteration training DAG and both top-10 pipelines run ONCE,
      // not once per downstream aggregate
      val codes = codes0.localCheckpoint()
      val adc = Clustering.pqTopK(codes, cbs, q, m = 16, k = 10)
        .select(col("vec_id")).localCheckpoint()
      val exact = emb.select(col("vec_id"),
        Clustering.dist2(Similarity.asDouble(col("embedding")),
          array(q.map(lit): _*)).as("d"))
        .orderBy(col("d"), col("vec_id")).limit(10).select(col("vec_id"))
        .localCheckpoint()
      val hits = exact.join(adc, Seq("vec_id"))
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(broadcast(adc.agg(count(lit(1)).as("n_adc"))))
        .crossJoin(broadcast(hits.agg(count(lit(1)).as("n_hit"))))
        .select(col("n_exact"), col("n_adc"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_exact").cast("double")).as("recall"))
    }),
    // ADC search over the PQ index: codes + codebooks only, the base
    // vectors never re-read; per-subspace partials fold in subspace
    // order so the top-10 selection is engine-exact
    "q_pq_adc" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val (codes, cbs) = graft.operators.Clustering.pqTrainEncode(
        emb, m = 4, k = 8, iters = 2, dim = 64)
      Clustering.pqTopK(codes, cbs, Similarity.vectorOf(emb, 1L), m = 4, k = 10)
        // order on the RAW distance (matching the oracle's ORDER BY
        // adc_raw), THEN project the 6-dp render — ordering on the
        // rounded value could diverge from the oracle on near-ties
        .orderBy(col("adc_dist2"), col("vec_id"))
        .select(col("vec_id"), round(col("adc_dist2"), 6).as("adc_dist2"))
    }),
    // the PRODUCTION probe shape: same ADC math, but codes+codebooks
    // round-trip a persisted parquet index first — base vectors and
    // training never touched at query time (the q_jaccard_persisted
    // discipline, so the q_pq_adc oracle certifies this path too)
    "q_pq_persisted" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      // build-once per scale dir (the tlPersistedIndex discipline —
      // previously this row retrained per invocation AND stranded a
      // fresh temp dir each time); probe side reads parquet only
      val (codes2, cbs2) = pqPersistedIndex(s, d, emb)
      Clustering.pqTopK(codes2, cbs2, Similarity.vectorOf(emb, 1L), m = 4, k = 10)
        .orderBy(col("adc_dist2"), col("vec_id"))
        .select(col("vec_id"), round(col("adc_dist2"), 6).as("adc_dist2"))
    }),
    // the ANN SERVING shape for the PQ index (q_two_level_knn_multi's
    // twin): Q=3 query vectors batched into ONE pass over the persisted
    // codes table — per-query rows match Q sequential pqTopK probes by
    // construction (spec-asserted), ranked per query by a
    // query-partitioned window, never a global sort
    "q_pq_knn_multi" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val (codes2, cbs2) = pqPersistedIndex(s, d, emb)
      val qids = Seq(1L, 7L, 13L)
      val qvecs = qids.map(id => id -> Similarity.vectorOf(emb, id))
      Clustering.pqTopKMulti(codes2, cbs2, qvecs, m = 4, k = 10)
    }),
    // the PQ retrain-trigger SIGNAL under oracle (q_two_level_drift's
    // twin): per-(subspace, codeword) build-time reconstruction error
    // vs the odd half frozen-encoded against codebooks trained on the
    // even half — decimal-sum pooled, full-outer joined; the report
    // pqRetrainNeeded decides over
    "q_pq_drift" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val base = emb.where(col("vec_id") % 2 === 0)
      val delta = emb.where(col("vec_id") % 2 === 1)
      val (codes, cbs) = Clustering.pqTrainEncode(base, m = 4, k = 8,
        iters = 2, dim = 64)
      Clustering.pqDrift(codes,
        Clustering.pqEncodeFrozen(delta, cbs, m = 4, k = 8, dim = 64))
    }),
    // the PQ retrain arc end-to-end (q_two_level_retrain's twin, with
    // the family's one structural difference under test: codes are
    // lossy, so the rebuild trains on the CALLER'S current corpus, not
    // rows read back from the index): publish v1 on the even half,
    // append the odd half 3×-scaled, REQUIRE the trigger fires, retrain
    // on base ∪ scaled-delta, ADC-probe the re-opened v2 for the
    // appended scaled query; the oracle replays train-on-union + probe
    "q_pq_retrain" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val base = emb.where(col("vec_id") % 2 === 0)
      val delta = emb.where(col("vec_id") % 2 === 1)
        .withColumn("embedding", transform(col("embedding"),
          x => (x.cast("double") * lit(3.0)).cast("float")))
      val root = tempDir("graft_pq_retrain")
      val (codes, cbs) = Clustering.pqTrainEncode(base, m = 4, k = 8,
        iters = 2, dim = 64)
      Clustering.pqPublishVersion(s, codes, cbs, root)
      val v1 = Clustering.pqOpenVersion(s, root)
      val encoded = Clustering.pqAppend(s, v1.dir, delta, m = 4, k = 8, dim = 64)
      require(Clustering.pqRetrainNeeded(Clustering.pqDriftFromStats(
        Clustering.pqReadStats(s, v1.dir), encoded)),
        "q_pq_retrain: the 3x-scaled batch must trip the trigger")
      Clustering.pqRetrain(s, root, base.unionByName(delta), m = 4, k = 8, dim = 64)
      val v2 = Clustering.pqOpenVersion(s, root)
      Clustering.pqTopK(v2.codes, v2.codebooks, Similarity.vectorOf(delta, 1L),
        m = 4, k = 10)
        .orderBy(col("adc_dist2"), col("vec_id"))
        .select(col("vec_id"), round(col("adc_dist2"), 6).as("adc_dist2"))
    }),
    // incremental maintenance for the PQ family (the q_two_level_append
    // discipline): train+persist on the even half, frozen-encode and
    // APPEND the odd half's codes — codebooks never touched — then ADC
    // probe the full codes table for an APPENDED query vector; the
    // oracle replays train+encode-delta+probe from scratch. Fresh temp
    // dir per invocation (appends are not idempotent).
    "q_pq_append" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val base = emb.where(col("vec_id") % 2 === 0)
      val delta = emb.where(col("vec_id") % 2 === 1)
      val (codes, cbs) = Clustering.pqTrainEncode(base, m = 4, k = 8,
        iters = 2, dim = 64)
      // fresh per invocation (appends are not idempotent) but swept at
      // JVM exit — Reg.tempDir, not a stranded createTempDirectory
      val root = tempDir("graft_pq_append")
      Clustering.pqWriteIndex(codes, cbs, root)
      Clustering.pqAppend(s, root, delta, m = 4, k = 8, dim = 64)
      val (codes2, cbs2) = Clustering.pqReadIndex(s, root)
      Clustering.pqTopK(codes2, cbs2, Similarity.vectorOf(emb, 1L), m = 4, k = 10)
        .orderBy(col("adc_dist2"), col("vec_id"))
        .select(col("vec_id"), round(col("adc_dist2"), 6).as("adc_dist2"))
    }),
    // SemDeDup: within-cell cosine pairs on the same deterministic
    // quantizer; one-hop min-id keeper flag. The REGISTERED row is the
    // deployment form — semanticDedup's default maxCell (1024) caps the
    // within-cell pair join (uncapped measured 52×/decade, PLANS.md);
    // uncapped is an explicit maxCell=0 API opt-in only
    "q_semantic_dedup" -> ((s, d) =>
      graft.operators.Clustering.semanticDedup(t(s, d, "embeddings"),
        k = 8, threshold = 0.35)),
    // the capped twin (fuzzy-family playbook): cells over maxCell
    // contribute NO pairs — conservative keeps, drops visible in
    // q_drop_audit. The ×100 decade probe measured uncapped SemDeDup
    // at 52× growth per data decade (within-cell join is quadratic in
    // cell size at fixed k); this is the 100 TB deployment form.
    // maxCell=60 discriminates at the sf0.01 gate: two cells (52, 53
    // members) keep pairing, six (61-74) drop
    "q_semantic_capped" -> ((s, d) =>
      graft.operators.Clustering.semanticDedup(t(s, d, "embeddings"),
        k = 8, threshold = 0.35, maxCell = 60)),
    // two-level quantizer (coarse Lloyd -> per-coarse-cell fine Lloyd):
    // k1*k2 effective cells at O(n*(k1+k2)*d) assignment — the 100 TB
    // SemDeDup path the flat quantizer's scaladoc names. Deterministic
    // end to end, so the full (cell1, fine, combined cell, dist2)
    // assignment is DuckDB-replayed and hash-certified
    "q_two_level_cells" -> ((s, d) =>
      graft.operators.Clustering.twoLevelAssign(t(s, d, "embeddings"),
        k1 = 4, k2 = 4)
        .select(col("vec_id"), col("cell1"), col("fine"), col("cell"),
          round(col("dist2"), 6).as("dist2"))
        .orderBy(col("vec_id"))),
    // SemDeDup on the two-level cells: same one-hop min-id pair stage,
    // 16 effective cells at sf gate scale; maxCell discriminates at
    // sf0.01 (some fine cells pair, oversized ones conservatively keep)
    "q_semantic_twolevel" -> ((s, d) =>
      graft.operators.Clustering.semanticDedupTwoLevel(t(s, d, "embeddings"),
        k1 = 4, k2 = 4, threshold = 0.35, maxCell = 40)),
    // the DEPLOYMENT rule-as-code form under oracle: both quantizer
    // sides derived from the corpus (k = ceil(n/targetCell) effective
    // cells factored as k1 = k2 = ceil(√k), cap = 4·targetCell) — the
    // DuckDB oracle re-derives side from count(*) via a scalar-subquery
    // LIMIT, so the √(n/t) derivation itself is hash-certified at every
    // gate scale (side = 5 at sf0.01's 500 vectors, 9 at sf0.1's 2000)
    "q_semantic_twolevel_auto" -> ((s, d) =>
      graft.operators.Clustering.semanticDedupTwoLevelAuto(t(s, d, "embeddings"),
        targetCell = 25, threshold = 0.35)),
    // ANN probe over the two-level index: rank the k1*k2 fine centroids
    // by exact query distance (driver-side probe parameters), scan only
    // nprobe combined cells, exact cosine rank — build-once/probe-many
    // at O(n*(k1+k2)) training cost, and (unlike Spark-ML-trained IVF)
    // deterministic end to end, so the probe itself is hash-certified
    "q_two_level_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val (index, cbs) = graft.operators.Clustering.twoLevelIndex(emb,
        k1 = 4, k2 = 4)
      // no outer re-sort: twoLevelTopK already emits rows ordered by
      // the RAW cosine (desc, vec_id) — re-sorting on the 6-dp ROUNDED
      // column could permute near-ties vs the oracle's raw-order sel
      graft.operators.Clustering.twoLevelTopK(index, cbs,
        Similarity.vectorOf(emb, 1L), k = 10, nprobe = 4)
    }),
    // the tlAssign wide norm-trick branch under oracle (the
    // q_kmeans_wide discipline for the FINE level): k2=40 fine
    // centroids per coarse cell, oracle replays the norm-trick argmin
    // (twoLevelWideCtes) — together with q_kmeans_wide, both at-scale
    // assignment spellings now carry per-round hash certificates
    "q_two_level_cells_wide" -> ((s, d) =>
      graft.operators.Clustering.twoLevelAssign(t(s, d, "embeddings"),
        k1 = 2, k2 = 40)
        .select(col("vec_id"), col("cell1"), col("fine"), col("cell"),
          round(col("dist2"), 6).as("dist2"))
        .orderBy(col("vec_id"))),
    // the PRODUCTION probe shape (build-once/probe-many): the two-level
    // index persisted BUCKETED+SORTED by the combined cell
    // (ivfWriteIndex semantics), so the probe's `cell IN (nprobe
    // cells)` prunes to the matching bucket files instead of
    // full-scanning an in-memory index — and training happens once per
    // scale dir (q_new_near_persisted discipline), never at probe
    // time. Same oracle as q_two_level_topk by construction; the
    // bucket-pruned-scan plan gate lives in ClusteringSpec.
    "q_two_level_persisted" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val (index2, cbs2) = tlPersistedIndex(s, d, emb)
      graft.operators.Clustering.twoLevelTopK(index2, cbs2,
        Similarity.vectorOf(emb, 1L), k = 10, nprobe = 4)
    }),
    // the ANN SERVING shape: Q query vectors batched into ONE
    // bucket-pruned scan of the SAME persisted index (the
    // q_lsh_knn_multi precedent for the two-level family) — per-query
    // results match Q sequential twoLevelTopK probes by construction,
    // but the index is read once, not Q times (plan-gated in
    // ClusteringSpec: one scan, SelectedBucketsCount <= the union of
    // the per-query nprobe cell sets)
    "q_two_level_knn_multi" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val (index2, cbs2) = tlPersistedIndex(s, d, emb)
      val qids = Seq(1L, 7L, 13L)
      val qvecs = emb.where(col("vec_id").isin(qids: _*))
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq)
        .sortBy(_._1).toSeq
      graft.operators.Clustering.twoLevelTopKMulti(index2, cbs2, qvecs,
        k = 10, nprobe = 4)
    }),
    // incremental maintenance of the persisted index: build at n (the
    // even half), APPEND Δ (the odd half) against the FROZEN codebooks
    // — no retraining, the bucketed insert keeps probes pruned — then
    // probe through the re-opened table; the DuckDB oracle replays the
    // whole build+append+probe chain from scratch, so the append path
    // (not just the build path) is hash-certified. The query vector
    // (vec_id=1) is itself an APPENDED vector — the probe must find
    // rows the build never saw. Fresh temp dir per invocation (the
    // q_pq_persisted discipline): an append is not idempotent, so this
    // row never reuses an on-disk cache.
    "q_two_level_append" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val base = emb.where(col("vec_id") % 2 === 0)
      val delta = emb.where(col("vec_id") % 2 === 1)
      val root = tempDir("graft_tl_append")
      val table = "tl_append_" + java.lang.Long.toHexString(System.nanoTime())
      val (index, cbs) = Clustering.twoLevelIndex(base, k1 = 4, k2 = 4)
      Clustering.twoLevelWriteIndex(index, cbs, table, root, nBuckets = 16)
      Clustering.twoLevelAppend(s, table, root, nBuckets = 16, delta)
      val (index2, cbs2) = Clustering.twoLevelOpenIndex(s, table, root,
        nBuckets = 16)
      Clustering.twoLevelTopK(index2, cbs2, Similarity.vectorOf(emb, 1L),
        k = 10, nprobe = 4)
    }),
    // COMPACTION under oracle: the q_two_level_append chain with a
    // compactTwoLevelIndex pass between the append and the probe — the
    // oracle is IDENTICAL to q_two_level_append's by construction
    // (compaction rewrites file layout, never content), so a compactor
    // that dropped, duplicated, or re-bucketed anything fails the hash
    // gate cross-engine, not just the in-JVM spec
    "q_two_level_compact" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val base = emb.where(col("vec_id") % 2 === 0)
      val delta = emb.where(col("vec_id") % 2 === 1)
      val root = tempDir("graft_tl_compactq")
      val table = "tl_compactq_" + java.lang.Long.toHexString(System.nanoTime())
      val (index, cbs) = Clustering.twoLevelIndex(base, k1 = 4, k2 = 4)
      Clustering.twoLevelWriteIndex(index, cbs, table, root, nBuckets = 16)
      Clustering.twoLevelAppend(s, table, root, nBuckets = 16, delta)
      Clustering.compactTwoLevelIndex(s, table, root, nBuckets = 16)
      val (index2, cbs2) = Clustering.twoLevelOpenIndex(s, table, root,
        nBuckets = 16)
      Clustering.twoLevelTopK(index2, cbs2, Similarity.vectorOf(emb, 1L),
        k = 10, nprobe = 4)
    }),
    // IVF-PQ (round 16 — the COMPOSITION of the repo's two ANN
    // families, Jégou et al.'s IVFADC): two-level cells give the probe
    // bucket pruning, residual PQ codes give it m bytes/vector; the
    // oracle replays the ENTIRE arc from scratch — two-level training,
    // per-vector residuals against the winning fine centroid, shared
    // residual-codebook PQ training, then the per-cell-residual ADC
    // probe over only the nprobe probed cells
    "q_ivfpq_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val (codes, coarse, pqCbs) = Clustering.ivfPqTrainEncode(emb,
        k1 = 4, k2 = 4, m = 4, k = 8, dim = 64)
      Clustering.ivfPqTopK(codes, coarse, pqCbs, Similarity.vectorOf(emb, 1L),
        m = 4, k = 10, nprobe = 4)
    }),
    // the PRODUCTION IVF-PQ shape: codes persisted BUCKETED+SORTED by
    // cell (built once per scale dir, fingerprint-stamped), so the
    // probe's `cell IN (nprobe cells)` prunes to matching bucket files
    // of an m-bytes-per-vector table — the artifact neither parent
    // ships alone. Same oracle as q_ivfpq_topk by construction (the
    // on-disk layout changes IO, never arithmetic).
    "q_ivfpq_persisted" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val (codes2, coarse2, pqCbs2) = ivfPqPersistedIndex(s, d, emb)
      Clustering.ivfPqTopK(codes2, coarse2, pqCbs2,
        Similarity.vectorOf(emb, 1L), m = 4, k = 10, nprobe = 4)
    }),
    // the ANN SERVING shape for the composed family
    // (q_two_level_knn_multi / q_pq_knn_multi's twin): Q=3 query
    // vectors batched into ONE bucket-pruned pass over the persisted
    // packed codes — per-query rows match Q sequential ivfPqTopK
    // probes by construction (spec-asserted bit-match), ranked per
    // query by a query-partitioned window, never a global sort. The
    // form matters MOST for this family: the ×100 probe measured a
    // single probe's wall as ~all fixed setup, so batching is where
    // the m-bytes/vector scan advantage actually cashes out.
    "q_ivfpq_knn_multi" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val (codes2, coarse2, pqCbs2) = ivfPqPersistedIndex(s, d, emb)
      val qids = Seq(1L, 7L, 13L)
      val qvecs = qids.map(id => id -> Similarity.vectorOf(emb, id))
      Clustering.ivfPqTopKMulti(codes2, coarse2, pqCbs2, qvecs,
        m = 4, k = 10, nprobe = 4)
    }),
    // the SCHEDULER CYCLE end-to-end (round 16): the composed
    // versioned-streaming arc DRIVEN BY THE POLL rather than by the
    // test reading raw signal rows — pendingMaintenance must report
    // the drifted batch's retrain as pending (the round-15 fold fix:
    // the decision survives until ANSWERED), the retrain executes
    // against the loop's own root only because the poll said so, and
    // the re-poll must come back clear through the version protocol
    // with no writeback. Output and oracle are the composed row's by
    // construction — the cycle gates the SAME certified final state.
    "q_maintenance_cycle" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val root = tempDir("graft_maint_cycle")
      val schema = writeVersionedStreamBatches(s, emb, root)
      val pfx = "maintc_" + java.lang.Long.toHexString(System.nanoTime())
      val q = graft.streaming.Sessions.streamIndexAppendVersioned(
        s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(s"$root/in/*"),
        pfx, s"$root/idx", s"$root/ckpt")
      q.awaitTermination(300000)
      val (needRetrain, _) = graft.streaming.Sessions.pendingMaintenance(
        s, s"$root/idx")
      require(needRetrain,
        "q_maintenance_cycle: the drifted batch must leave retrain PENDING")
      Clustering.twoLevelRetrain(s, pfx, s"$root/idx", nBuckets = 16,
        k1 = 4, k2 = 4)
      val (stillPending, _) = graft.streaming.Sessions.pendingMaintenance(
        s, s"$root/idx")
      require(!stillPending,
        "q_maintenance_cycle: the executed retrain must CLEAR the poll " +
          "(the version protocol is the acknowledgement)")
      val v2 = Clustering.twoLevelOpenVersion(s, pfx, s"$root/idx", nBuckets = 16)
      require(v2.version == 2L,
        "q_maintenance_cycle: the retrain must publish generation 2")
      Clustering.twoLevelTopK(v2.index, v2.codebooks, scaledQueryVec(emb, 2L),
        k = 10, nprobe = 4)
    }),
    // the STREAMING maintenance loop end-to-end (the
    // q_stream_ingest_final discipline for the ANN family): three
    // deterministic file-batches — the first BOOTSTRAPS the index
    // (train + bucketed write + stats baseline), the later two
    // frozen-append through the real foreachBatch path — then the
    // probe reads the final table; the oracle replays
    // train-on-batch0 + frozen-assign-the-rest + probe from scratch
    "q_stream_index_final" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val root = tempDir("graft_idx_stream")
      (0 until 3).foreach { b =>
        emb.where(pmod(col("vec_id"), lit(3)) === b).coalesce(1)
          .write.mode("overwrite").parquet(s"$root/in/f$b")
        new java.io.File(s"$root/in/f$b").listFiles()
          .foreach(f => { f.setLastModified(1600000000000L + b * 60000L); () })
      }
      val schema = s.read.parquet(s"$root/in/f0").schema
      val table = "idx_stream_" + java.lang.Long.toHexString(System.nanoTime())
      val q = graft.streaming.Sessions.streamIndexAppend(
        s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(s"$root/in/*"),
        table, s"$root/idx", s"$root/ckpt")
      q.awaitTermination(300000)
      val (index2, cbs2) = Clustering.twoLevelOpenIndex(s, table, s"$root/idx",
        nBuckets = 16)
      Clustering.twoLevelTopK(index2, cbs2, Similarity.vectorOf(emb, 1L),
        k = 10, nprobe = 4)
    }),
    // the retrain-trigger SIGNAL under oracle: build-time per-cell
    // quantization error (the index's stored dist2) vs the appended
    // batch's frozen-assign dist2, decimal-sum pooled — the report
    // twoLevelRetrainNeeded decides over (rule + measured anchors in
    // ClusteringSpec)
    "q_two_level_drift" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val base = emb.where(col("vec_id") % 2 === 0)
      val delta = emb.where(col("vec_id") % 2 === 1)
      val (index, cbs) = Clustering.twoLevelIndex(base, k1 = 4, k2 = 4)
      Clustering.twoLevelDrift(index,
        Clustering.twoLevelAssignFrozen(delta, cbs))
    }),
    // the RETRAIN ARC end-to-end (the execution path the drift trigger
    // schedules, previously un-wired): publish v1 trained on the even
    // half, append the odd half 3×-SCALED (out-of-distribution — the
    // measured ≈9× anchor), REQUIRE the trigger fires, then
    // twoLevelRetrain rebuilds on the corpus read back from v1's own
    // table and atomically publishes v2 (v1 serves throughout; the
    // _latest flip is last); the probe runs through the re-opened v2
    // for an APPENDED scaled vector. The oracle replays
    // train-on-base ∪ scaled-delta + probe from scratch — the scale
    // factor rides double arithmetic cast back to REAL on both engines,
    // matching the float column the index stores.
    "q_two_level_retrain" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val base = emb.where(col("vec_id") % 2 === 0)
      val delta = emb.where(col("vec_id") % 2 === 1)
        .withColumn("embedding", transform(col("embedding"),
          x => (x.cast("double") * lit(3.0)).cast("float")))
      val root = tempDir("graft_tl_retrain")
      val pfx = "tl_retrain_" + java.lang.Long.toHexString(System.nanoTime())
      val (index, cbs) = Clustering.twoLevelIndex(base, k1 = 4, k2 = 4)
      Clustering.twoLevelPublishVersion(s, index, cbs, pfx, root, nBuckets = 16)
      val v1 = Clustering.twoLevelOpenVersion(s, pfx, root, nBuckets = 16)
      val appended = Clustering.twoLevelAppend(s, v1.table, v1.dir,
        nBuckets = 16, delta)
      val drift = Clustering.twoLevelDriftFromStats(
        Clustering.twoLevelReadStats(s, v1.dir), appended)
      require(Clustering.twoLevelRetrainNeeded(drift),
        "q_two_level_retrain: the 3x-scaled batch must trip the trigger")
      Clustering.twoLevelRetrain(s, pfx, root, nBuckets = 16, k1 = 4, k2 = 4)
      val v2 = Clustering.twoLevelOpenVersion(s, pfx, root, nBuckets = 16)
      Clustering.twoLevelTopK(v2.index, v2.codebooks,
        Similarity.vectorOf(delta, 1L), k = 10, nprobe = 4)
    }),
    // the COMPOSED lifecycle (round 15): streaming maintenance ON a
    // VERSIONED root — previously parallel tracks (the loop wrote an
    // unversioned layout twoLevelRetrain couldn't see, so its RETRAIN
    // NEEDED log was un-executable). Three deterministic micro-batches:
    // the bootstrap PUBLISHES v1 through the staged marker-flip-last
    // protocol, two appends insert into the serving generation (the
    // second scaled 3× — out-of-distribution), every decision lands in
    // the _signals TABLE (the scheduler contract — the require reads
    // the decision from DATA, not stdout), the retrain the signal
    // schedules is EXECUTED against the same root (v2 published from
    // v1's own table while v1 serves), and the probe reads v2 through
    // `_latest`. The oracle replays train-on-the-full-streamed-corpus
    // + probe from scratch.
    "q_stream_index_versioned" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val root = tempDir("graft_idx_stream_v")
      val schema = writeVersionedStreamBatches(s, emb, root)
      val pfx = "idx_streamv_" + java.lang.Long.toHexString(System.nanoTime())
      val q = graft.streaming.Sessions.streamIndexAppendVersioned(
        s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(s"$root/in/*"),
        pfx, s"$root/idx", s"$root/ckpt")
      q.awaitTermination(300000)
      val sig = graft.streaming.Sessions.readIndexSignals(s, s"$root/idx")
        .orderBy(col("seq")).collect()
      require(sig.length == 3 && sig(0).getString(1) == "bootstrap" &&
        !sig(1).getBoolean(5) && sig(2).getBoolean(5),
        "q_stream_index_versioned: the signals table must record " +
          "bootstrap, clean append, drifted append (retrain_needed)")
      Clustering.twoLevelRetrain(s, pfx, s"$root/idx", nBuckets = 16,
        k1 = 4, k2 = 4)
      val v2 = Clustering.twoLevelOpenVersion(s, pfx, s"$root/idx", nBuckets = 16)
      require(v2.version == 2L,
        "q_stream_index_versioned: the retrain must publish generation 2")
      Clustering.twoLevelTopK(v2.index, v2.codebooks, scaledQueryVec(emb, 2L),
        k = 10, nprobe = 4)
    }),
    // the PQ twin of the composed lifecycle — one structural
    // difference: PQ codes are LOSSY, so the executed retrain takes the
    // caller's CURRENT upstream (exactly what the stream delivered)
    // rather than reading the corpus back out of the index
    "q_stream_pq_versioned" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val root = tempDir("graft_pq_stream_v")
      val schema = writeVersionedStreamBatches(s, emb, root)
      val q = graft.streaming.Sessions.streamPqIndexAppendVersioned(
        s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(s"$root/in/*"),
        s"$root/idx", s"$root/ckpt")
      q.awaitTermination(300000)
      val sig = graft.streaming.Sessions.readIndexSignals(s, s"$root/idx")
        .orderBy(col("seq")).collect()
      require(sig.length == 3 && sig(0).getString(1) == "bootstrap" &&
        !sig(1).getBoolean(5) && sig(2).getBoolean(5),
        "q_stream_pq_versioned: the signals table must record " +
          "bootstrap, clean append, drifted append (retrain_needed)")
      Clustering.pqRetrain(s, s"$root/idx",
        s.read.schema(schema).parquet(s"$root/in/*"), m = 4, k = 8, dim = 64)
      val v2 = Clustering.pqOpenVersion(s, s"$root/idx")
      require(v2.version == 2L,
        "q_stream_pq_versioned: the retrain must publish generation 2")
      Clustering.pqTopK(v2.codes, v2.codebooks, scaledQueryVec(emb, 2L),
        m = 4, k = 10)
        .orderBy(col("adc_dist2"), col("vec_id"))
        .select(col("vec_id"), round(col("adc_dist2"), 6).as("adc_dist2"))
    }),
    // PQ COMPACTION under oracle (round 15 — compactTwoLevelIndex's
    // sibling for the codes dir ADC scans in FULL per probe): the
    // q_pq_append chain with a compactPqIndex rewrite between append
    // and probe; the oracle is q_pq_append's verbatim — file layout
    // must never reach the answer
    "q_pq_compact" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val base = emb.where(col("vec_id") % 2 === 0)
      val delta = emb.where(col("vec_id") % 2 === 1)
      val (codes, cbs) = Clustering.pqTrainEncode(base, m = 4, k = 8,
        iters = 2, dim = 64)
      val root = tempDir("graft_pq_compact")
      Clustering.pqWriteIndex(codes, cbs, root)
      Clustering.pqAppend(s, root, delta, m = 4, k = 8, dim = 64)
      val (before, after) = Clustering.compactPqIndex(s, root, targetFiles = 1)
      require(before >= 2 && after == 1,
        s"q_pq_compact: the rewrite must collapse the codes dir ($before -> $after)")
      val (codes2, cbs2) = Clustering.pqReadIndex(s, root)
      Clustering.pqTopK(codes2, cbs2, Similarity.vectorOf(emb, 1L), m = 4, k = 10)
        .orderBy(col("adc_dist2"), col("vec_id"))
        .select(col("vec_id"), round(col("adc_dist2"), 6).as("adc_dist2"))
    }),
    // Johnson-Lindenstrauss reduction: 64-dim floats -> 16 seeded-
    // Gaussian dot products, planes baked into the plan as literals.
    // Registered in posexploded scalar form (same reason as q_quantize).
    "q_random_projection" -> ((s, d) =>
      Similarity.randomProject(t(s, d, "embeddings"), outDim = 16, dim = 64)
        .select(col("vec_id"), posexplode(col("rvec")).as(Seq("pos", "component")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"), col("component"))
        .orderBy(col("vec_id"), col("pos"))),
    // PCA projection ([EXT]): learned planes from the exact covariance
    // — rows-only by design (iterative eigensolve; laws in
    // SimilaritySpec), like the other trained-model queries. Also
    // posexploded so the harness can count rows without choking on the
    // array column.
    "q_pca" -> ((s, d) =>
      Similarity.pcaProject(t(s, d, "embeddings"), k = 8, dim = 64)
        .select(col("vec_id"), posexplode(col("pvec")).as(Seq("pos", "component")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"), col("component"))
        .orderBy(col("vec_id"), col("pos"))),
    // the APPLY half of the PCA family under oracle: projectOnPlanes
    // (pcaProject's exact serving spelling — k codegen'd dots minus a
    // literal mean shift) with planes LEARNED by the real eigensolve
    // over a seed-fixed pure-JVM sample (Similarity.fixturePcaPlanes),
    // replayed in DuckDB as double literals like q_random_projection —
    // so the rows-only exemption stays confined to the training loop
    "q_pca_apply" -> ((s, d) => {
      val (comps, mean) = Similarity.fixturePcaPlanes()
      Similarity.projectOnPlanes(t(s, d, "embeddings"), comps, mean)
        .select(col("vec_id"), posexplode(col("pvec")).as(Seq("pos", "component")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"), col("component"))
        .orderBy(col("vec_id"), col("pos"))
    }),
    // ---- multimodal plumbing (SURVEY [EXT]) ----
    "q_payload_meta" -> ((s, d) =>
      Multimodal.payloadMeta(Multimodal.attachPayload(t(s, d, "documents")))),
    "q_decode_stub" -> ((s, d) =>
      Multimodal.decodeStub(Multimodal.attachPayload(t(s, d, "documents")))
        .toDF().orderBy(col("doc_id"))),
    "q_frame_sample" -> ((s, d) =>
      Multimodal.frameSampleStub(Multimodal.attachPayload(t(s, d, "documents")))
        .toDF().orderBy(col("doc_id"), col("frame_idx"))),
    // REAL image-header decode ([EXT]): PNG/GIF/BMP container bytes
    // synthesized from table fields, parsed back by the pure-JVM
    // header parser — builder ∘ parser == identity, oracle-certified
    "q_image_meta" -> ((s, d) =>
      Multimodal.imageMeta(Multimodal.synthesizeImages(t(s, d, "documents")))
        .toDF().orderBy(col("doc_id"))),
    // REAL audio header decode ([EXT]): RIFF/WAVE fmt+data chunks —
    // rate/channels/depth/duration without any codec
    "q_audio_meta" -> ((s, d) =>
      Multimodal.audioMeta(Multimodal.synthesizeAudio(t(s, d, "documents")))
        .toDF().orderBy(col("doc_id"))),
    // REAL video container decode ([EXT]): ISO-BMFF box walk —
    // brand/timescale/duration/dims/tracks, completing the
    // image/audio/video header-parsing trio without any codec
    "q_video_meta" -> ((s, d) =>
      Multimodal.videoMeta(Multimodal.synthesizeVideo(t(s, d, "documents")))
        .toDF().orderBy(col("doc_id"))))
}
