package graft.operators

import graft.SparkSuite

class CorpusStatsSpec extends SparkSuite {
  import spark.implicits._

  test("tfIdf: tf/df exact; rare terms outweigh common ones") {
    val docs = Seq(
      (1L, "cat cat cat dog"),
      (2L, "dog dog bird bird"),
      (3L, "dog fish fish fish")).toDF("doc_id", "text")
    val rows = CorpusStats.tfIdf(docs, minTf = 2).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    // cat: tf 3 in doc 1, df 1; dog appears in all 3 docs -> df 3
    val (catTf, catDf, catW) = rows((1L, "cat"))
    assert(catTf === 3L && catDf === 1L)
    assert(math.abs(catW - 3 * math.log(4.0 / 2)) < 1e-6)
    val (_, birdDf, birdW) = rows((2L, "bird"))
    assert(birdDf === 1L)
    // dog never reaches minTf=2 in a single doc except doc 2
    val (dogTf, dogDf, dogW) = rows((2L, "dog"))
    assert(dogTf === 2L && dogDf === 3L)
    assert(math.abs(dogW - 2 * math.log(4.0 / 4)) < 1e-6) // ln(1) = 0
    assert(birdW > dogW, "rare term must outweigh ubiquitous term")
  }

  test("unigramLogprob: hand-computed on a 3-token vocabulary") {
    val docs = Seq((1L, "x x y"), (2L, "x z")).toDF("doc_id", "text")
    val rows = CorpusStats.unigramLogprob(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // N = 5; counts: x=3, y=1, z=1; per-term contribs rounded to 6dp
    def c(tf: Long, cnt: Long) =
      BigDecimal(tf * math.log(cnt / 5.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(rows(1L)._1 === 3L)
    assert(math.abs(rows(1L)._2 - (c(2, 3) + c(1, 1)).toDouble) < 1e-9)
    assert(rows(2L)._1 === 2L)
    assert(math.abs(rows(2L)._2 - (c(1, 3) + c(1, 1)).toDouble) < 1e-9)
    // gibberish (all-rare tokens) scores below common text per token
    assert(rows(1L)._2 / 3 > rows(2L)._2 / 2 - 1e-12,
      "doc of commoner tokens must have the higher per-token logprob")
  }

  test("repetitionSignals: degenerate text scores high, varied text low") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "the quick brown fox jumps high"),
      (3L, "solo")).toDF("doc_id", "text")
    val rows = CorpusStats.repetitionSignals(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    val (n1, d1, top1, dup1) = rows(1L)
    assert(n1 === 6L && d1 === 1L && top1 === 1.0)
    assert(dup1 === Some(0.8)) // 5 bigrams, 1 distinct -> 1 - 1/5
    val (n2, d2, top2, dup2) = rows(2L)
    assert(n2 === 6L && d2 === 6L)
    assert(math.abs(top2 - 1.0 / 6) < 1e-12)
    assert(dup2 === Some(0.0))
    // single-token doc: no bigrams -> null fraction, not a crash
    val (n3, _, top3, dup3) = rows(3L)
    assert(n3 === 1L && top3 === 1.0 && dup3 === None)
  }

  test("repetitionSignals: a degenerate 100k-token doc completes fast and exactly") {
    // half distinct tokens, half one repeated token: the O(v·n)
    // distinct×filter spelling needs ~2.5e9 comparisons here (minutes);
    // the sorted-run fold is one 100k sort (milliseconds)
    val n = 100000
    val text = ((0 until n / 2).map(i => s"tok$i") ++ Seq.fill(n / 2)("spam"))
      .mkString(" ")
    val t0 = System.nanoTime()
    val row = CorpusStats.repetitionSignals(Seq((1L, text)).toDF("doc_id", "text"))
      .head()
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    assert(row.getLong(1) === n.toLong)
    assert(row.getLong(2) === (n / 2 + 1).toLong)
    assert(math.abs(row.getDouble(3) - 0.5) < 1e-12) // spam is half the doc
    assert(elapsedSec < 30.0,
      s"degenerate doc must not hit a quadratic top-token scan ($elapsedSec s)")
  }

  test("corpusCard rolls up volumes, length spread, lang mix, quality share") {
    val docs = Seq(
      // web: one quality doc (7 tokens), one junk doc (digits), two langs
      ("web", "the quick brown fox jumps over dogs", "en"),
      ("web", "123 456 789 000 111 222", "de"),
      // books: one quality doc, one lang
      ("books", "a calm long evening of steady reading", "en"))
      .toDF("source", "text", "lang")
    val rows = CorpusStats.corpusCard(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    val (nDocs, nTok, minTok, maxTok, nLangs, nQ, qPct) = rows("web")
    assert(nDocs === 2L && nLangs === 2L)
    assert(nQ === 1L && qPct === 5000L, "digit-heavy doc fails the gate")
    assert(minTok === 6L && maxTok === 7L && nTok === 13L)
    val (bDocs, _, _, _, bLangs, bQ, bPct) = rows("books")
    assert(bDocs === 1L && bLangs === 1L && bQ === 1L && bPct === 10000L)
  }

  test("bpePairCounts: occurrence-weighted adjacent pairs, 1-char words skipped") {
    import spark.implicits._
    // "low" x2 and "lower": l-o and o-w ride all 3 words; w-e/e-r only
    // "lower"; the 1-char word "a" contributes nothing
    val docs = Seq("low low a", "lower").toDF("text")
    val out = CorpusStats.bpePairCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(out.toMap === Map("lo" -> 3L, "ow" -> 3L, "we" -> 1L, "er" -> 1L))
    // deterministic order: count desc, then pair — the merge pick is stable
    assert(out.map(_._1).toSeq === Seq("lo", "ow", "er", "we"))
  }

  test("vocabCoverage: covered occurrences counted, OOV fraction exact") {
    import spark.implicits._
    // vocab size 2 -> {"b","c"} win on count (b:3, c:2, a:1, d:1 —
    // ties at 1 broken alphabetically never reach the cut)
    val docs = Seq((1L, "b b c"), (2L, "b c a d"), (3L, null: String))
      .toDF("doc_id", "text")
    val out = CorpusStats.vocabCoverage(docs, vocabSize = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(out(1L) === ((3L, 3L, Some(0.0))))
    assert(out(2L) === ((4L, 2L, Some(0.5))))
    assert(out(3L) === ((0L, 0L, None)))  // null text: no tokens, NULL frac
  }

  test("tokenEntropy: degenerate, uniform, and hand-computed mixed docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam"), // one token: H = 0
      (2L, "a b c d"),             // uniform: H = ln(4)
      (3L, "x x y"))               // H = ln(3) - (2 ln 2)/3
      .toDF("doc_id", "text")
    val out = CorpusStats.tokenEntropy(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((4L, 1L, 0.0)))
    assert(math.abs(out(2L)._3 - math.log(4.0)) < 1e-5)
    assert(out(2L)._1 === 4L && out(2L)._2 === 4L)
    val h3 = math.log(3.0) - 2.0 * math.log(2.0) / 3.0
    assert(math.abs(out(3L)._3 - h3) < 1e-5)
  }

  test("tokenEntropy is partitioning-invariant (decimal contribution sums)") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val a = CorpusStats.tokenEntropy(docs).collect().toSeq
    val b = CorpusStats.tokenEntropy(docs.repartition(17)).collect().toSeq
    assert(a === b)
  }

  test("bm25: hand-computed scores; idf and length-normalization laws") {
    val docs = Seq(
      (1L, "cat dog"),            // short doc, one hit each term
      (2L, "cat cat cat cat"),    // higher tf, same length as doc 3
      (3L, "cat bird fish frog"), // one hit, longer doc
      (4L, "bird fish frog worm")).toDF("doc_id", "text")
    val out = CorpusStats.bm25(docs, Seq("cat", "dog"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // hand-compute doc 1: N=4, avgdl=(2+4+4+4)/4=3.5
    def idf(df: Double) = math.log((4.0 - df + 0.5) / (df + 0.5) + 1.0)
    def term(tf: Double, df: Double, dl: Double) = BigDecimal(
      idf(df) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / 3.5))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp1 = term(1, 3, 2) + term(1, 1, 2) // cat df=3, dog df=1
    assert(math.abs(out(1L) - exp1) < 1e-9, s"${out(1L)} vs $exp1")
    // doc 4 has no query terms: absent from the result
    assert(!out.contains(4L))
    // higher tf at equal length scores higher
    assert(out(2L) > out(3L))
    // rare term (dog, df=1) outweighs common (cat, df=3): doc 1's dog
    // contribution alone beats doc 3's cat contribution
    assert(term(1, 1, 2) > term(1, 3, 4))
  }

  test("pmiCollocations: perfect collocation scores high, independent pair near zero") {
    // "a b" always adjacent; "x" and "y" co-occur adjacently only
    // sometimes out of many occurrences
    val docs = Seq.tabulate(10)(i =>
      (i.toLong, if (i % 2 == 0) "a b x q y p" else "a b x y p q"))
      .toDF("doc_id", "text")
    val out = CorpusStats.pmiCollocations(docs, minCount = 5, topK = 100)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    val (cab, ca, cb, pmiAb) = out("a b")
    assert(cab === 10L && ca === 10L && cb === 10L)
    // T_uni=60, T_bi=50: pmi = ln((10/50)/((10/60)^2)) = ln 7.2
    assert(math.abs(pmiAb - math.log(7.2)) < 1e-6)
    val (_, _, _, pmiXy) = out("x y")
    assert(pmiAb > pmiXy, "perfect collocation must outrank partial")
    // pairs under minCount are pruned ("x q" occurs 5x: kept; "q y" 5x)
    assert(out.contains("x q") && !out.contains("b p"))
  }

  test("boilerplatePrefixes: shared headers flagged per source, unique intros not") {
    val docs = Seq(
      (1L, "terms of service apply here alpha", "siteA"),
      (2L, "terms of service apply here beta", "siteA"),
      (3L, "terms of service apply here gamma", "siteA"),
      (4L, "totally unique intro text one", "siteA"),
      (5L, "terms of service apply here delta", "siteB")) // 1 doc: not flagged
      .toDF("doc_id", "text", "source")
    val out = CorpusStats.boilerplatePrefixes(docs, k = 5, minShare = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5)))).toMap
    assert(out(("siteA", "terms of service apply here")) === ((3L, 4L, 0.75, true)))
    assert(out(("siteA", "totally unique intro text one")) === ((1L, 4L, 0.25, false)))
    // a single doc can never be "shared" boilerplate, whatever its share
    assert(out(("siteB", "terms of service apply here")) === ((1L, 1L, 1.0, false)))
  }

  test("bigramLogprob: hand-computed Laplace bigram scores; short docs absent") {
    // corpus: doc1 "a b a b", doc2 "a b", doc3 "x" (no bigrams).
    // c("a b")=3, c("b a")=1; history c(a·)=3, c(b·)=1; V=3 (a,b,x)
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val out = CorpusStats.bigramLogprob(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(!out.contains(3L), "a one-token doc has no bigrams")
    val exp1 = // round-then-sum, mirroring the dsum convention
      BigDecimal(2 * math.log(4.0 / 6.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP) +
        BigDecimal(math.log(2.0 / 4.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(out(1L)._1 === 3L)
    assert(math.abs(out(1L)._2 - exp1.toDouble) < 1e-9)
    val exp2 = BigDecimal(math.log(4.0 / 6.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(out(2L) === ((1L, exp2.toDouble)))
    // the context sensitivity the unigram score lacks: a doc made of
    // corpus-frequent words in a NEVER-SEEN order scores lower per
    // bigram than the natural-order doc
    val corpus = (1L to 20L).map(i => (i, "the cat sat on the mat")) :+
      (100L, "mat the on sat cat the")
    val scored = CorpusStats.bigramLogprob(corpus.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2) / r.getLong(1)).toMap
    assert(scored(100L) < scored(1L) - 1.0,
      s"shuffled word order must score clearly lower: ${scored(100L)} vs ${scored(1L)}")
  }

  test("dfShard/dfMerge: disjoint shards fold to exactly the direct corpus df") {
    val docs = Seq((1L, "a b b c"), (2L, "b c"), (3L, "c d"), (4L, "a"))
      .toDF("doc_id", "text")
    val direct = CorpusStats.dfMerge(CorpusStats.dfShard(docs))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(direct === Map("a" -> 2L, "b" -> 2L, "c" -> 3L, "d" -> 1L),
      "df counts docs containing the term, not occurrences")
    val merged = CorpusStats.dfMerge(
      CorpusStats.dfShard(docs.where($"doc_id" % 2 === 0)),
      CorpusStats.dfShard(docs.where($"doc_id" % 2 === 1)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === direct, "shard-merge must equal the one-pass recompute")
  }

  test("ngramDiversity: hand-computed type/token ratios; bigram-free source handled") {
    val docs = Seq(
      (1L, "a b a", "X"), (2L, "a", "X"), // X: 4 unigrams (2 distinct), 2 bigrams (2 distinct)
      (3L, "z", "Y")) // Y: no bigrams at all
      .toDF("doc_id", "text", "source")
    val out = CorpusStats.ngramDiversity(docs)
      .collect().map(r => r.getString(0) -> r).toMap
    val x = out("X")
    assert((x.getLong(1), x.getLong(2), x.getDouble(3)) === ((4L, 2L, 0.5)))
    assert((x.getLong(4), x.getLong(5), x.getDouble(6)) === ((2L, 2L, 1.0)))
    val y = out("Y")
    assert((y.getLong(4), y.getLong(5)) === ((0L, 0L)))
    assert(y.isNullAt(6), "a source with no bigrams has no bigram ttr, not a 0/0")
  }

  test("lmQualityFilter keeps natural-order docs, drops the scramble and shorts") {
    val corpus = (1L to 20L).map(i => (i, "the cat sat on the mat")) ++
      Seq((100L, "mat the on sat cat the"), (200L, "solo"))
    val scored = CorpusStats.bigramLogprob(corpus.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        BigDecimal(r.getDouble(2) / r.getLong(1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    // a threshold between the two scores separates them exactly
    val thr = (scored(1L) + scored(100L)) / 2
    val kept = CorpusStats.lmQualityFilter(corpus.toDF("doc_id", "text"), thr)
      .collect().map(_.getLong(0)).toSet
    assert(kept === (1L to 20L).toSet, s"got $kept")
    // avg, not sum: doubling a doc's length must not change its score
    val doubled = Seq((1L, "the cat sat on the mat the cat sat on the mat"))
    val corpus2 = (2L to 20L).map(i => (i, "the cat sat on the mat")) ++ doubled
    val s2 = CorpusStats.bigramLogprob(corpus2.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2) / r.getLong(1)).toMap
    assert(math.abs(s2(1L) - s2(2L)) < 0.2,
      "per-bigram average keeps long docs comparable to short ones")
  }

  test("keywords: doc-distinctive terms outrank corpus-common ones") {
    val docs = Seq(
      (1L, "shared shared zebra zebra zebra shared shared"),
      (2L, "shared shared shared common common shared"),
      (3L, "shared shared other other shared shared")).toDF("doc_id", "text")
    val out = CorpusStats.keywords(docs, k = 1).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    // 'shared' has df 3 (idf floor); each doc's rare term wins
    assert(out(1L) === "zebra")
    assert(out(2L) === "common")
    assert(out(3L) === "other")
  }

  test("logOddsTerms: side-exclusive terms get opposite z, shared terms near 0") {
    val docs = Seq(
      (1L, "alpha alpha alpha common common", "A"),
      (2L, "alpha alpha common common words", "A"),
      (3L, "omega omega omega common common", "B"),
      (4L, "omega omega common common words", "B"),
      (5L, "never seen here", "C")) // other sources excluded
      .toDF("doc_id", "text", "source")
    val out = CorpusStats.logOddsTerms(docs, "A", "B")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    assert(!out.contains("never"), "non-A/B sources must not leak in")
    val (ya, yb, zA) = out("alpha")
    assert(ya === 5L && yb === 0L && zA > 1.0)
    assert(out("omega")._3 < -1.0)
    // symmetric corpus: |z(alpha)| == |z(omega)|
    assert(math.abs(zA + out("omega")._3) < 1e-9)
    assert(math.abs(out("common")._3) < 0.01)
    // ordering: the distinguishing terms outrank the shared ones
    val order = CorpusStats.logOddsTerms(docs, "A", "B").collect().map(_.getString(0))
    assert(Set(order(0), order(1)) === Set("alpha", "omega"))
  }

  test("gopherQuality: each rule fires on its own failure mode") {
    val good = ("the quick brown fox jumps over the lazy dog and runs to the " * 5).trim
    val symbols = "the " + ("### ... ### " * 20).trim + (" word" * 50)
    val digits = ("12345 67890 " * 30).trim
    val short = "the tiny one"
    val docs = Seq((1L, good), (2L, symbols), (3L, digits), (4L, short))
      .toDF("doc_id", "text")
    val out = CorpusStats.gopherQuality(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("pass"))
    assert(!out(2L).getAs[Boolean]("ok_symbols") && !out(2L).getAs[Boolean]("pass"))
    assert(!out(3L).getAs[Boolean]("ok_alpha"))
    assert(!out(3L).getAs[Boolean]("ok_stopwords"))
    assert(!out(4L).getAs[Boolean]("ok_tokens") && !out(4L).getAs[Boolean]("pass"))
    // metrics are the rounded ratios the rules compare
    assert(out(4L).getAs[Long]("n_tokens") === 3L)
    assert(out(4L).getAs[Double]("mean_word_len") === 3.333333)
  }

  test("hashFeatures: exact signed-tf buckets, doubling tokens doubles values") {
    val one = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val two = Seq((1L, "alpha alpha beta beta gamma gamma")).toDF("doc_id", "text")
    val f1 = CorpusStats.hashFeatures(one, dim = 16).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    val f2 = CorpusStats.hashFeatures(two, dim = 16).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(f2 === f1.view.mapValues(_ * 2).toMap)
    // total signed mass is bounded by the token count
    assert(f1.values.map(math.abs).sum <= 3)
    assert(f1.keys.forall(p => p >= 0 && p < 16))
    // determinism across partitioning on a larger corpus
    val docs = (1L to 40L).map(i => (i, s"t${i % 9} t${i % 5} t${i % 4} t${i % 3}"))
      .toDF("doc_id", "text")
    val a = CorpusStats.hashFeatures(docs).collect().toSeq
    val b = CorpusStats.hashFeatures(docs.repartition(11)).collect().toSeq
    assert(a === b)
  }

  test("removeBlockedTokens strips exactly the blocklist, preserves order") {
    val docs = Seq((1L, "The cat AND the mat"), (2L, "no blocked words here"),
      (3L, "the the the")).toDF("doc_id", "text")
    val out = CorpusStats.removeBlockedTokens(docs, Seq("the", "and"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) === (("cat mat", 3L)))      // case-folded matching
    assert(out(2L) === (("no blocked words here", 0L)))
    assert(out(3L) === (("", 3L)))             // fully-blocked doc -> empty
  }
}
