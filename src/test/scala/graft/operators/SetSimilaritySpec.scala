package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.Text

class SetSimilaritySpec extends SparkSuite {
  import spark.implicits._

  // Synthetic corpus with designed similarity structure: a near-dup
  // pair (one trailing word differs), a quote-inclusion pair, and
  // unrelated / sub-n-gram-length docs.
  private val corpus = Seq(
    1L -> "the quick brown fox jumps over the lazy dog near the river bank today",
    2L -> "the quick brown fox jumps over the lazy dog near the river bank again",
    3L -> "completely unrelated text about spark query planning and shuffles",
    4L -> "the quick brown fox jumps over the lazy dog", // contained in 1 and 2
    5L -> "tiny doc", // shorter than one trigram: no grams, absent
    6L -> "zzz",
    7L -> "another independent document mentioning rivers and banks once only"
  ).toDF("doc_id", "text")

  /** Word-trigram fingerprint sets per doc — the independent oracle
    * basis for the prefix-filtered algorithms (ALL pairs verified,
    * no prefixes, no length/positional filters). */
  private def bruteSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select($"doc_id", Text.tokens(lower($"text")).as("__toks"))
      .select($"doc_id",
        explode(array_distinct(Ngrams.wordNgramsOfTokens($"__toks", 3))).as("ng"))
      .select($"doc_id",
        conv(substring(md5($"ng"), 1, 15), 16, 10).cast("long").as("fp"))
      .distinct()
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (d, hs) => d -> hs.map(_._2).toSet }

  test("jaccardJoin matches the all-pairs brute force exactly") {
    val sets = bruteSets(corpus)
    assert(!sets.contains(5L) && !sets.contains(6L), "sub-trigram docs have no sets")
    for (t <- Seq(0.3, 0.5, 0.7, 0.9)) {
      val expected = (for {
        a <- sets.keys; b <- sets.keys if a < b
        i = (sets(a) & sets(b)).size
        u = (sets(a) | sets(b)).size
        if u > 0 && i >= t * u
      } yield (a, b, i.toLong, i.toDouble / u)).toSet
      val got = SetSimilarity.jaccardJoin(corpus, threshold = t)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(got === expected, s"threshold $t")
    }
  }

  test("containmentJoin matches the all-ordered-pairs brute force exactly") {
    val sets = bruteSets(corpus)
    for (t <- Seq(0.5, 0.8, 1.0)) {
      val expected = (for {
        a <- sets.keys; b <- sets.keys if a != b
        i = (sets(a) & sets(b)).size
        if sets(a).nonEmpty && i >= t * sets(a).size
      } yield (a, b, i.toLong, i.toDouble / sets(a).size)).toSet
      val got = SetSimilarity.containmentJoin(corpus, threshold = t)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(got === expected, s"threshold $t")
    }
  }

  test("containment catches the quote-inclusion pair symmetric jaccard misses") {
    val jac = SetSimilarity.jaccardJoin(corpus, threshold = 0.8)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val con = SetSimilarity.containmentJoin(corpus, threshold = 0.8)
      .select($"doc_id", $"container_id").as[(Long, Long)].collect().toSet
    // doc 4 is a strict prefix of docs 1/2: containment 1.0, low jaccard
    assert(con.contains((4L, 1L)) && con.contains((4L, 2L)))
    assert(!jac.contains((1L, 4L)) && !jac.contains((4L, 1L)))
  }

  test("property: random token soups, prefix-filtered == brute force") {
    // Random docs over a tiny token alphabet force heavy set overlap
    // at every rank position — the adversarial regime for prefix /
    // positional filter off-by-ones.
    val rng = new scala.util.Random(42)
    val words = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val rows = (1L to 40L).map { id =>
      val len = 3 + rng.nextInt(10)
      id -> Seq.fill(len)(words(rng.nextInt(words.size))).mkString(" ")
    }
    val df = rows.toDF("doc_id", "text")
    val sets = bruteSets(df)
    for (t <- Seq(0.4, 0.6, 0.85)) {
      val expected = (for {
        a <- sets.keys; b <- sets.keys if a < b
        i = (sets(a) & sets(b)).size
        u = (sets(a) | sets(b)).size
        if u > 0 && i >= t * u
      } yield (a, b)).toSet
      val got = SetSimilarity.jaccardJoin(df, threshold = t)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      assert(got === expected, s"threshold $t")
      val expectedCon = (for {
        a <- sets.keys; b <- sets.keys if a != b
        i = (sets(a) & sets(b)).size
        if sets(a).nonEmpty && i >= t * sets(a).size
      } yield (a, b)).toSet
      val gotCon = SetSimilarity.containmentJoin(df, threshold = t)
        .select($"doc_id", $"container_id").as[(Long, Long)].collect().toSet
      assert(gotCon === expectedCon, s"containment threshold $t")
    }
  }

  test("lshRecallAudit: counts consistent, recall non-decreasing in band count") {
    val rows = (1L to 60L).map { i =>
      // 20 clusters of 3 near-dup docs (one word differs), so exact
      // pairs exist and banding has something to miss
      val base = s"alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima cluster${i / 3}"
      i -> (if (i % 3 == 0) base + " extra" else base)
    }
    val df = rows.toDF("doc_id", "text")
    val out = SetSimilarity.lshRecallAudit(df, threshold = 0.5, bandCounts = Seq(2, 4, 8))
      .as[(Int, Long, Long, Long, Double)].collect().toSeq
    assert(out.map(_._1) === Seq(2, 4, 8))
    val nTrue = SetSimilarity.jaccardJoin(df, threshold = 0.5).count()
    assert(nTrue > 0)
    for ((b, nCand, nt, nHit, recall) <- out) {
      assert(nt === nTrue, s"bands $b: true-pair count")
      assert(nHit <= nCand && nHit <= nt, s"bands $b: hit bounds")
      assert(recall === nHit.toDouble / nt, s"bands $b: recall arithmetic")
    }
    // shorter bands collide more: recall can only grow with band count
    assert(out.map(_._5) === out.map(_._5).sorted)
  }

  test("persisted ranked-set table gives identical results (the at-scale path)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sets").toString
    SetSimilarity.rankedGramSets(corpus).write.mode("overwrite").parquet(dir)
    val persisted = spark.read.parquet(dir)
    val inline = SetSimilarity.jaccardJoin(corpus, threshold = 0.5)
      .collect().map(_.toSeq).toSeq
    val ofSets = SetSimilarity.jaccardJoinOfSets(persisted, threshold = 0.5)
      .collect().map(_.toSeq).toSeq
    assert(ofSets === inline)
    val inlineCon = SetSimilarity.containmentJoin(corpus, threshold = 0.8)
      .collect().map(_.toSeq).toSeq
    val ofSetsCon = SetSimilarity.containmentJoinOfSets(persisted, threshold = 0.8)
      .collect().map(_.toSeq).toSeq
    assert(ofSetsCon === inlineCon)
    // and the persisted path's plan re-reads the small set table, not text
    val plan = SetSimilarity.jaccardJoinOfSets(persisted, threshold = 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("distinct_shingles") && !plan.contains("md5"),
      s"persisted path must not re-derive grams from text:\n$plan")
  }

  test("plan: verify join only touches candidates, aggregates combine map-side") {
    val plan = SetSimilarity.jaccardJoin(corpus, threshold = 0.5)
      .queryExecution.executedPlan.toString
    // intersection counts must partially aggregate before the shuffle
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"expected map-side partial aggregation in:\n$plan")
    // no cartesian anywhere — candidates come from an equi-join on fp
    assert(!plan.contains("CartesianProduct"), s"no cartesian product expected:\n$plan")
  }

  test("sparseCosineJoin: identical docs score exactly 1; disjoint docs never pair") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val out = SetSimilarity.sparseCosineJoin(docs, threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out === Map((1L, 2L) -> 1.0))
  }

  test("sparseCosineJoin: the df cap removes boilerplate grams from the score space") {
    // all four docs share the header trigram; with maxDf=2 it is
    // excluded, so the header-only pair disappears while the pair
    // with genuinely shared content survives
    val header = "terms of service apply"
    val docs = Seq(
      (1L, s"$header unique one body text here"),
      (2L, s"$header other words entirely different"),
      (3L, s"$header shared tail content words"),
      (4L, s"$header shared tail content words")).toDF("doc_id", "text")
    val out = SetSimilarity.sparseCosineJoin(docs, threshold = 0.1, maxDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((3L, 4L)))
  }

  test("sparseCosineJoin is invariant to partitioning") {
    val docs = (1L to 30L).map(i =>
      (i, s"tok${i % 5} tok${i % 7} tok${i % 3} tok${i % 11} tail${i % 2}"))
      .toDF("doc_id", "text")
    val a = SetSimilarity.sparseCosineJoin(docs, threshold = 0.2).collect().toSeq
    val b = SetSimilarity.sparseCosineJoin(docs.repartition(7), threshold = 0.2)
      .collect().toSeq
    assert(a === b)
  }
}
