package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Clustering, CorpusStats, Dedup, Ngrams, Quality, Sampling, SetSimilarity, Similarity, Windows}
import graft.sources.Tables

/** Empirical scale check: replicate the sf0.1 documents/embeddings
  * tables Nx (ids offset per copy so replicas are near-duplicates of
  * each other) into /tmp and time the dedup + ANN paths. Verifies the
  * scaling story the operators claim — wall-clock should grow roughly
  * linearly for minhash/LSH and the candidate count must not explode.
  *
  * Usage: sbt "runMain graft.ScaleProbe [factor]"  (default 5)
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // graft buckets tables DELIBERATELY (pruned index probes, co-located
      // joins); the auto rule would silently drop SelectedBucketsCount
      // pruning on probe-only plans (filter on the bucket key, no join/agg)
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs0 = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val emb0 = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val nDocs0 = docs0.count()
    val nEmb0 = emb0.count()

    def replicate(df: DataFrame, idCol: String, n: Long): DataFrame =
      df.crossJoin(spark.range(factor).withColumnRenamed("id", "__copy"))
        .withColumn(idCol, col(idCol) + col("__copy") * n * 10)
        .drop("__copy")

    val docs = replicate(docs0, "doc_id", nDocs0).cache()
    val emb = replicate(emb0, "vec_id", nEmb0).cache()
    println(s"[scale] corpus: ${docs.count()} docs, ${emb.count()} vectors (factor $factor)")

    val cand = time(s"minhashCandidates x$factor")(Dedup.minhashCandidates(docs).count())
    println(s"[scale]   candidate pairs: $cand")
    // hot-bucket guard: replication inflates every bucket ~factor-x, so
    // uncapped candidates grow ~factor^2; with the cap the growth must
    // stay flat (bounded per bucket) — the 100 TB safety property.
    val candCap = time(s"minhashCandidates cap=8 x$factor")(
      Dedup.minhashCandidates(docs, maxBucket = 8).count())
    val droppedCap = Dedup.droppedBuckets(docs, maxBucket = 8).count()
    println(s"[scale]   capped candidate pairs: $candCap (dropped buckets: $droppedCap)")
    val nd = time(s"nearDupPairs x$factor")(Dedup.nearDupPairs(docs, threshold = 0.5).count())
    println(s"[scale]   near-dup pairs:  $nd")
    time(s"simhash x$factor")(Dedup.simhash32(docs).count())
    val lsh = time(s"lshKnnJoin x$factor")(Similarity.lshKnnJoin(emb, 5, dim = 64).count())
    println(s"[scale]   lsh-knn rows:    $lsh")
    val lshCap = time(s"lshKnnJoin cap=64 x$factor")(
      Similarity.lshKnnJoin(emb, 5, dim = 64, maxBucket = 64).count())
    println(s"[scale]   capped lsh-knn rows: $lshCap")
    val cc = time(s"dedupDocumentsCC x$factor")(
      Dedup.dedupDocumentsCC(docs, maxBucket = 8).count())
    println(s"[scale]   cc keeper rows:  $cc")
    val embDedup = time(s"dedupByEmbedding x$factor")(
      Similarity.dedupByEmbedding(emb, threshold = 0.3, dim = 64, maxBucket = 64).count())
    println(s"[scale]   embedding-dedup rows: $embDedup")
    time(s"topK x$factor")(
      Similarity.topK(emb, Similarity.vectorOf(emb, 1L), 10).collect())
    // corpus-hygiene ops: wall-clock should stay ~linear in corpus
    // size (decontaminate's benchmark side is fixed and broadcast;
    // tfIdf is one explode+agg+window)
    val decon = time(s"decontaminate x$factor")(
      Ngrams.decontaminate(
        docs.where(col("doc_id") % 41 =!= 0),
        docs0.where(col("doc_id") % 41 === 0)).count())
    println(s"[scale]   train docs checked: $decon")
    time(s"tfIdf x$factor")(CorpusStats.tfIdf(docs).count())
    // round-7 family: dupSpans carries one (fp, doc_id) shuffle —
    // linear; vocab/bpe collapse to vocab-sized tables before any
    // fan-out, so their cost is scan-dominated; quantize/kmeans
    // shuffle dim- and k·dim-bounded aggregates — flat in corpus size
    // sum a computed measure, not count(): a bare count of the
    // join-back-to-docs shape lets Catalyst prune the whole gram/code
    // pipeline (the aggregate side's keys are provably distinct, so
    // the outer join is eliminated) and the probe would time nothing
    val spans = time(s"dupSpans x$factor")(Ngrams.dupSpans(docs, n = 3)
      .agg(sum("n_dup_spans")).head().getLong(0))
    println(s"[scale]   dup spans: $spans")
    time(s"vocabCoverage x$factor")(CorpusStats.vocabCoverage(docs, vocabSize = 20)
      .agg(sum("n_in_vocab")).head().getLong(0))
    time(s"bpePairCounts x$factor")(CorpusStats.bpePairCounts(docs)
      .agg(sum("n_occurrences")).head().getLong(0))
    time(s"quantizeEmbeddings x$factor")(Similarity.quantizeEmbeddings(emb)
      .agg(sum("max_abs_err")).head().getDouble(0))
    time(s"kmeans k=8 iters=2 x$factor")(Clustering.kmeans(emb, k = 8, iters = 2)
      .agg(sum("dist2")).head().getDouble(0))
    // SemDeDup: replicas land in the SAME cell, so uncapped within-cell
    // pairs grow ~factor^2 — the maxCell guard must hold the pair stage
    // flat (same safety property as the LSH caps); keeper counts are
    // the forced measure
    val semUncapped = time(s"semanticDedup k=8 x$factor")(
      Clustering.semanticDedup(emb, k = 8, threshold = 0.35, maxCell = 0)
        .where(col("keep")).count())
    val semCapped = time(s"semanticDedup k=8 cap=256 x$factor")(
      Clustering.semanticDedup(emb, k = 8, threshold = 0.35, maxCell = 256)
        .where(col("keep")).count())
    println(s"[scale]   semantic keepers: $semUncapped uncapped, $semCapped capped")
    time(s"tokenEntropy x$factor")(CorpusStats.tokenEntropy(docs)
      .agg(sum("entropy")).head().getDouble(0))
    time(s"contaminationRate x$factor")(
      Ngrams.contaminationRate(
        docs.where(col("doc_id") % 41 =!= 0),
        docs0.where(col("doc_id") % 41 === 0))
        .agg(sum("n_shared")).head().getLong(0))
    time(s"randomProject outDim=16 x$factor")(
      Similarity.randomProject(emb, outDim = 16, dim = 64)
        .agg(sum(element_at(col("rvec"), 1))).head().getDouble(0))
    // third batch: bm25/pmi/boilerplate are scan-dominated (query-term
    // filter / vocab-bounded aggregates / per-row slice); covariance's
    // shuffle is d(d+1)/2 rows per task — flat in corpus size; pca adds
    // a bounded moment collect + a Project-over-Scan projection
    time(s"bm25 x$factor")(CorpusStats.bm25(docs, Seq("join", "hash", "window"))
      .agg(sum("bm25")).head().getDouble(0))
    time(s"pmiCollocations x$factor")(CorpusStats.pmiCollocations(docs)
      .agg(sum("c_ab")).head().getLong(0))
    time(s"boilerplatePrefixes x$factor")(CorpusStats.boilerplatePrefixes(docs, k = 3)
      .agg(sum("n_docs")).head().getLong(0))
    time(s"embeddingCovariance x$factor")(
      Similarity.embeddingCovariance(emb, dim = 64)
        .agg(sum("cov")).head().getDouble(0))
    time(s"pcaProject k=8 x$factor")(Similarity.pcaProject(emb, k = 8, dim = 64)
      .agg(sum(element_at(col("pvec"), 1))).head().getDouble(0))

    // incremental dedup: with the index/sketch/signatures built (the
    // one-off, amortized across every future batch), the PER-BATCH
    // probe cost must track the BATCH size — the history only enters
    // through the sketch probe (O(1)/row) and the candidate-sliver
    // joins. Batch is held fixed while history grows factor-x.
    val batch = docs0.where(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000000L)
    val index = time(s"fingerprintIndex build x$factor")(
      Dedup.fingerprintIndex(docs).cache())
    index.count()
    val bloom = time(s"fingerprintBloom build x$factor")(
      Dedup.fingerprintBloom(index, expectedItems = nDocs0 * factor))
    val newCnt = time(s"newDocs probe (fixed batch) x$factor")(
      Dedup.newDocs(batch, index, bloom).count())
    println(s"[scale]   new docs: $newCnt of ${batch.count()}")
    val hSigs = time(s"history signatures build x$factor")(
      Dedup.minhashSignatures(docs, "doc_id", "text").cache())
    hSigs.count()
    val nearNew = time(s"newNearDocs probe (fixed batch) x$factor")(
      Dedup.newNearDocs(batch, hSigs, maxBucket = 64).count())
    println(s"[scale]   near-new docs: $nearNew")
    // exact set-similarity: candidate mass is bounded by word-gram df
    // (grows ~factor x per gram), but the OUTPUT is quadratic in the
    // duplicate-cluster size by contract — replicas are true pairs.
    // The probe verifies wall-clock tracks the (quadratic) output,
    // not an all-pairs stage: base corpus has 256 exact pairs; x5
    // replication makes every doc a 5-clique plus cross-pair cliques.
    val jac = time(s"jaccardJoin t=0.5 x$factor")(
      SetSimilarity.jaccardJoin(docs).count())
    println(s"[scale]   exact jaccard pairs: $jac")
    val con = time(s"containmentJoin t=0.8 x$factor")(
      SetSimilarity.containmentJoin(docs).count())
    println(s"[scale]   containment pairs: $con")
    val recall = time(s"lshRecallAudit x$factor")(
      SetSimilarity.lshRecallAudit(docs).collect())
    recall.foreach(r => println(s"[scale]   recall: $r"))
    time(s"classBalance x$factor")(
      Sampling.classBalance(docs.select(col("doc_id"), col("lang")),
        "doc_id", "lang").count())
    time(s"dqRules x$factor")(
      Quality.report(docs, Seq(Quality.notNull("text"),
        Quality.inRange("n_chars", 0, 10000),
        Quality.matches("lang", "^[a-z]{2}$"))).count())
    // round-8 family: bigramLogprob is one explode + compact-tf
    // windows — linear in corpus tokens; ngramDiversity rolls up to
    // |sources| rows; dfShard output is vocab-sized whatever the
    // corpus; KMV sketches are ≤ k rows/group, so the OVERLAP join
    // cost is corpus-INDEPENDENT once the sketch is built — the probe
    // times the sketch build (linear) and the pairwise audit
    // (flat) separately to make that visible.
    time(s"bigramLogprob x$factor")(CorpusStats.bigramLogprob(docs)
      .agg(sum("logprob")).head().getDouble(0))
    time(s"ngramDiversity x$factor")(CorpusStats.ngramDiversity(docs)
      .agg(sum("n_distinct_bigrams")).head().getLong(0))
    time(s"dfShard+merge x$factor")(
      graft.operators.CorpusStats.dfMerge(CorpusStats.dfShard(docs))
        .agg(sum("df")).head().getLong(0))
    val kmvSketch = time(s"kmvSketch k=256 x$factor")(
      graft.operators.Profile.kmvSketch(docs, "source", "doc_id", k = 256).cache())
    println(s"[scale]   kmv sketch rows: ${kmvSketch.count()}")
    time(s"kmvOverlap (sketch only) x$factor")(
      graft.operators.Profile.kmvOverlap(kmvSketch, k = 256)
        .agg(sum("est_intersection")).head().getDouble(0))
    time(s"decontaminateNear x$factor")(
      Ngrams.decontaminateNear(
        docs.where(col("doc_id") % 41 =!= 0),
        docs0.where(col("doc_id") % 41 === 0))
        .where(col("contaminated")).count())
    // round-8b: winnowing stores ~2/(w+1) of the grams (its inverted
    // index shrinks vs dupSpans' every-gram index); the overlap pair
    // stage is bucket-local with the hot-fp cap bounding replication's
    // quadratic bucket growth — the same safety property as the LSH
    // caps. The sweep-line is the Pack prefix sum: linear, never a
    // single-task global sort. Replicated events keep their users, so
    // per-user window partitions grow factor-x — the realistic shape.
    time(s"winnowFingerprints x$factor")(
      Ngrams.winnowFingerprints(docs).count())
    val wo = time(s"winnowOverlap cap=64 x$factor")(
      Ngrams.winnowOverlap(docs, minShared = 5, maxDocsPerFp = 64).count())
    println(s"[scale]   winnow overlap pairs: $wo")
    val ev0 = Tables.load(spark, "/root/testdata/sf0.1", "events")
    val nEv0 = ev0.count()
    val ev = replicate(ev0, "event_id", nEv0).cache()
    ev.count()
    val peak = time(s"concurrencyProfile x$factor")(
      Windows.concurrencyProfile(ev)
        .agg(max("concurrency")).head().getLong(0))
    println(s"[scale]   peak concurrency: $peak")
    time(s"sessionizeBatch x$factor")(
      Windows.sessionizeBatch(ev, 1800000000L).count())
    time(s"scd2 x$factor")(
      Windows.scd2(ev, "user_id", "event_type", "event_id").count())
    // round-8c: heavyHitters shuffles ≤ k MG counters per map task —
    // linear in tokens and FLAT in distinct keys: the all-distinct
    // probe multiplies the key space to ~|corpus| without widening
    // the shuffle (the naive GROUP BY would shuffle every key).
    // exactMedian is ≤ 6 pushed-filter scans, zero shuffles.
    // intervalJoin pair output is bounded by interval density per
    // bucket. pqTrainEncode reads the corpus once per iteration for
    // ALL m subspaces (slices multiply rows ×m at 1/m width each).
    val toks = docs.select(
      explode(graft.functions.Text.tokens(lower(col("text")))).as("term"))
      .where(length(col("term")) > 0)
    val hh = time(s"heavyHitters k=32 x$factor")(
      graft.operators.Profile.heavyHitters(toks, "term", 32).count())
    println(s"[scale]   heavy hitters: $hh")
    val wide = docs.select(
      concat(col("doc_id"), lit(":"), col("source")).as("term"))
    val hhWide = time(s"heavyHitters k=32 all-distinct x$factor")(
      graft.operators.Profile.heavyHitters(wide, "term", 32).count())
    println(s"[scale]   heavy hitters on all-distinct keys: $hhWide")
    time(s"exactMedian n_chars x$factor")(
      graft.operators.Profile.exactMedianLong(
        docs.select(col("n_chars").as("v")), "v").count())
    val sess = Windows.sessionizeBatch(ev, 1800000000L)
      .select(col("user_id"), col("session_seq"),
        col("start_us"), col("end_us")).cache()
    println(s"[scale] sessions for interval join: ${sess.count()}")
    val aIv = sess.select(col("user_id").as("ua"), col("session_seq").as("sa"),
      col("start_us").as("s_a"), col("end_us").as("e_a"))
    val bIv = sess.select(col("user_id").as("ub"), col("session_seq").as("sb"),
      col("start_us").as("s_b"), col("end_us").as("e_b"))
    val ivp = time(s"intervalJoin 1h buckets x$factor")(
      graft.operators.AsOf.intervalJoin(aIv, bIv, Nil,
        "s_a", "e_a", "s_b", "e_b", bucketWidth = 3600000000L)
        .where(col("ua") < col("ub")).count())
    println(s"[scale]   overlap pairs: $ivp")
    time(s"pqTrainEncode m=4 k=8 x$factor")(
      Clustering.pqTrainEncode(emb, m = 4, k = 8, iters = 2, dim = 64)._1.count())
    // round-8d: triangle counting with DISJOINT replica components —
    // nodes offset per copy, so edges, wedges, and triangles all grow
    // exactly factor-x and wall-clock must track that (the degree-
    // ordered orientation keeps per-source wedge lists O(sqrt m)).
    // jaroWinklerPairs replicates names with a per-copy SUFFIX: every
    // copy lands in the SAME first-token block, so block sizes grow
    // factor-x and candidate pairs ~factor^2 — quadratic BY CONTRACT
    // (suffix-variants are true near-duplicates); the probe verifies
    // cost tracks the pair output, not a global cross product.
    val li0 = Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val liRep = li0.crossJoin(spark.range(factor).withColumnRenamed("id", "__copy"))
      .select((col("l_orderkey") + col("__copy") * 100000000L).as("l_orderkey"),
        (col("l_partkey") + col("__copy") * 100000000L).as("l_partkey"),
        col("l_quantity"))
    // the SAME edge definition the harness queries use — one source
    val triEdges = graft.operators.Graph.copurchaseEdges(liRep)
    val triRow = time(s"triangleCount x$factor")(
      graft.operators.Graph.triangleCount(triEdges).head())
    println(s"[scale]   triangles: ${triRow.getLong(2)} over ${triRow.getLong(1)} edges")
    val part0 = Tables.load(spark, "/root/testdata/sf0.1", "part")
    val namesRep = part0.crossJoin(
        spark.range(factor).withColumnRenamed("id", "__copy"))
      .select(concat(col("p_name"), lit(" v"), col("__copy")).as("p_name"))
    val jwp = time(s"jaroWinklerPairs t=0.85 x$factor")(
      graft.operators.Fuzzy.jaroWinklerPairs(namesRep, "p_name", 0.85).count())
    println(s"[scale]   jaro-winkler pairs: $jwp")
    // round-8d late ops: sparseCosine's pair mass is bounded by the
    // df cap exactly like jaccardJoin (replicas multiply each gram's
    // df by factor, so capped grams DROP OUT — candidate volume can
    // SHRINK under replication, the safety property itself);
    // NB scoring fans test terms only |classes| ways; hashFeatures
    // and keywords ride one aggregate each.
    val sc = time(s"sparseCosineJoin t=0.3 x$factor")(
      SetSimilarity.sparseCosineJoin(docs, threshold = 0.3).count())
    println(s"[scale]   sparse-cosine pairs: $sc")
    time(s"hashFeatures dim=32 x$factor")(
      CorpusStats.hashFeatures(docs).agg(sum(abs(col("value")))).head().getLong(0))
    time(s"nbConfusion x$factor")(
      graft.ml.NaiveBayes.confusion(docs).agg(sum("n")).head().getLong(0))
    time(s"keywords k=3 x$factor")(
      CorpusStats.keywords(docs).count())
    val cp = time(s"contrastivePairs x$factor")(
      Dedup.contrastivePairs(docs).count())
    println(s"[scale]   contrastive rows: $cp")
    // round-8e ops: fsWeights pairs within same-name blocks — replicas
    // (suffix-free, identical names) multiply block sizes by factor,
    // so pair volume grows ~factor^2 BY CONTRACT (identical records
    // ARE link candidates); the u-stat aggregates stay one tiny pass.
    // seasonalAnomalies and ddQuantiles must show FLAT output and
    // bounded state as rows grow: the day table and the sketch don't
    // scale with the fact.
    val partRep = part0.crossJoin(
        spark.range(factor).withColumnRenamed("id", "__copy"))
      .select((col("p_partkey") + col("__copy") * 100000000L).as("p_partkey"),
        col("p_name"), col("p_brand"), col("p_type"), col("p_size"))
    val fsw = time(s"fsWeights x$factor")(
      graft.operators.Fuzzy.fsWeights(partRep, "p_partkey", "p_name",
        Seq("p_brand" -> "0.95", "p_type" -> "0.90", "p_size" -> "0.85"),
        block = c => c).count())
    println(s"[scale]   fs scored pairs: $fsw")
    // round-9: the hot-block cap must make the same input's pair mass
    // FLAT in factor — replicas push every block past the cap, so the
    // capped run's cost collapses to the u-stat aggregates while
    // droppedBlocks surfaces exactly what the cap discarded. This is
    // the single-task-quadratic-bomb defense, measured.
    val fswCap = time(s"fsWeights capped x$factor")(
      graft.operators.Fuzzy.fsWeights(partRep, "p_partkey", "p_name",
        Seq("p_brand" -> "0.95", "p_type" -> "0.90", "p_size" -> "0.85"),
        block = c => c, maxBlock = 1).count())
    val fswDropped = graft.operators.Fuzzy.droppedBlocks(partRep, "p_name",
      maxBlock = 1, block = c => c, distinctFirst = false).count()
    println(s"[scale]   fs capped pairs (must be 0): $fswCap; dropped blocks: $fswDropped")
    val jwpCap = time(s"jaroWinklerPairs capped x$factor")(
      graft.operators.Fuzzy.jaroWinklerPairs(namesRep, "p_name", 0.85,
        maxBlock = 2 * factor).count())
    println(s"[scale]   jw capped pairs (bounded per block): $jwpCap")
    // round-9: positional tiles (the ntile replacement) must stay
    // distributed — wall-clock ~linear in rows, output fixed at
    // `buckets` rows regardless of input size (the single-task ntile
    // would show superlinear sort cost here)
    val gains = time(s"gainsTable tiles x$factor")(
      graft.operators.Reports.gainsTable(
        docs.withColumn("y", (col("doc_id") % 2 === 0).cast("long")),
        "n_chars", "y", "doc_id").count())
    println(s"[scale]   gains tiles (fixed at buckets): $gains")
    val evRep = Tables.load(spark, "/root/testdata/sf0.1", "events")
      .select(col("event_type"), col("ts"))
      .crossJoin(spark.range(factor)).drop("id")
    val tsa = time(s"seasonalAnomalies x$factor")(
      Windows.seasonalAnomalies(evRep).count())
    println(s"[scale]   anomaly rows (flat in factor): $tsa")
    val liQ = liRep.select(col("l_orderkey"),
      (col("l_quantity") % 5).cast("string").as("grp"),
      col("l_quantity").cast("double").as("v"))
    val ddq = time(s"ddQuantiles x$factor")(
      graft.operators.Profile.ddQuantiles(liQ, "grp", "v").count())
    println(s"[scale]   dd-quantile rows (flat in factor): $ddq")
    // the stateful monitor trio in batch mode over the replicated
    // events: output (and state) must stay FLAT — one bounded row per
    // key regardless of fact size; wall-clock linear in the scan
    val evFull = Tables.load(spark, "/root/testdata/sf0.1", "events")
      .crossJoin(spark.range(factor)).drop("id")
    val qm = time(s"quantileMonitor x$factor")(
      graft.streaming.Sessions.quantileMonitor(evFull).count())
    val dm = time(s"distinctMonitor x$factor")(
      graft.streaming.Sessions.distinctMonitor(evFull).count())
    val hm = time(s"heavyHittersMonitor x$factor")(
      graft.streaming.Sessions.heavyHittersMonitor(evFull).count())
    println(s"[scale]   monitor rows (all flat in factor): $qm / $dm / $hm")
    spark.stop()
  }
}
