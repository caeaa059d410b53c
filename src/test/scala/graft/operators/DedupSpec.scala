package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class DedupSpec extends SparkSuite {

  test("crossSourceDups rolls verified near-dup pairs up per order-normalized source pair") {
    import spark.implicits._
    def long(tag: String) =
      s"the quick brown fox jumps over the lazy dog $tag while seventeen " +
        "sailors watch from the harbor wall debating distributed deduplication"
    val docs = Seq(
      (1L, long("one"), "crawl_a"),
      (2L, long("one") + " x", "crawl_b"),  // near-dup of 1 across sources
      (3L, long("one") + " y", "crawl_a"),  // near-dup of 1 within crawl_a
      (4L, "completely different text about soup gardening and the weather today ok",
        "crawl_b"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.crossSourceDups(docs, threshold = 0.5).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // pairs (1,2): a-b, (1,3): a-a, (2,3): a-b (order-normalized)
    assert(out(("crawl_a", "crawl_b")) === 2L)
    assert(out(("crawl_a", "crawl_a")) === 1L)
  }

  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("exact dedup removes full-row duplicates") {
    val df = Seq(("a", 1), ("a", 1), ("b", 2)).toDF("k", "v")
    assert(Dedup.exact(df).count() === 2)
    assert(Dedup.exact(df, Seq("k")).count() === 2)
  }

  test("keyedDeterministic keeps the min-by-tiebreak row") {
    val df = Seq((1, 2, "keep?"), (1, 1, "keep"), (2, 5, "only")).toDF("k", "ord", "v")
    val out = Dedup.keyedDeterministic(df, Seq("k"), "ord").orderBy("k")
      .select("v").as[String].collect()
    assert(out.toSeq === Seq("keep", "only"))
  }

  test("keyedDeterministicAgg matches the window version and plans sort-free") {
    // duplicate keys, distinct tiebreaks, extra payload column
    val rows = for (k <- 1 to 50; i <- 1 to 5)
      yield (k, (k * 31 + i * 7) % 100, i.toDouble, s"payload-$k-$i")
    val df = rows.toDF("k", "ord", "v", "p")
    val win = Dedup.keyedDeterministic(df, Seq("k"), "ord", "v")
      .orderBy("k").collect().toSeq
    val agg = Dedup.keyedDeterministicAgg(df, Seq("k"), "ord", "v")
      .orderBy("k").collect().toSeq
    assert(agg === win)
    val plan = Dedup.keyedDeterministicAgg(df, Seq("k"), "ord", "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"agg version must not plan a window:\n$plan")
    assert(plan.contains("min_by"), s"expected a min_by aggregate in:\n$plan")
    assert(plan.contains("partial_min_by"), s"expected map-side partial aggregation in:\n$plan")
  }

  test("goldenRecord: per-FIELD fallback across priorities, aggregate-shaped plan") {
    val feed = Seq(
      // key 1: prio 1 misses b; prio 2 fills it — a stitched record
      (1L, 1, Some("a1"), None: Option[String], Some(10.0)),
      (1L, 2, Some("a2"), Some("b2"), Some(20.0)),
      // key 2: prio 1 all null, prio 2 partial, prio 3 fills the rest
      (2L, 1, None, None, None),
      (2L, 2, Some("a2"), None, None),
      (2L, 3, Some("a3"), Some("b3"), Some(30.0)),
      // key 3: nobody knows b -> stays null
      (3L, 1, Some("x"), None, Some(1.0))
    ).toDF("k", "prio", "a", "b", "v")
    val out = Dedup.goldenRecord(feed, Seq("k"), "prio", "prio", Seq("a", "b", "v"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(out.toSeq === Seq(
      (1L, "a1", "b2", 10.0),
      (2L, "a2", "b3", 30.0),
      (3L, "x", null, 1.0)))
    val plan = Dedup.goldenRecord(feed, Seq("k"), "prio", "prio", Seq("a", "b", "v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"must be aggregate-shaped, not a window:\n$plan")
    assert(plan.contains("partial_min"), s"expected map-side partials:\n$plan")
  }

  test("shingles produce n-length substrings, short text degrades to one") {
    val sh = docs(1L -> "abcdefg").select(Dedup.shingles($"text", 5).as("s"))
      .as[Seq[String]].head()
    assert(sh === Seq("abcde", "bcdef", "cdefg"))
    val short = docs(1L -> "ab").select(Dedup.shingles($"text", 5).as("s"))
      .as[Seq[String]].head()
    assert(short === Seq("ab"))
  }

  test("minhash signature: identical text -> identical signature; agreement tracks jaccard") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away home"
    val near = base.replace("dog", "cat") // high overlap
    val far = "completely different words entirely unrelated content zone xylophone quartz"
    val sig = Dedup.minhashSignatures(
      docs(1L -> base, 2L -> base, 3L -> near, 4L -> far), "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (0 until 16).map(i => r.getLong(i + 1)))
    assert(sig(0) === sig(1), "identical docs must have identical signatures")
    def agree(a: Seq[Long], b: Seq[Long]) = a.zip(b).count { case (x, y) => x == y }
    assert(agree(sig(0), sig(2)) > agree(sig(0), sig(3)),
      "near-duplicate must agree on more minhashes than unrelated text")
  }

  test("minhashCandidates surfaces duplicate pairs, skips unrelated") {
    val d = docs(
      1L -> "spark catalyst optimizer rewrites logical plans into physical plans",
      2L -> "spark catalyst optimizer rewrites logical plans into physical plan!",
      3L -> "zebra yak xylophone walrus vulture tapir snake rabbit quokka pig")
    val pairs = Dedup.minhashCandidates(d).as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("hot-bucket cap: adversarial all-identical corpus completes with zero pairs") {
    // 2000 byte-identical docs put ALL ids in one bucket per band —
    // the uncapped pair expansion would emit ~2M pairs from one task.
    // With the cap every bucket is dropped, the job stays bounded, and
    // droppedBuckets reports exactly what was discarded.
    val identical = (1L to 2000L).map(i =>
      i -> "the same boilerplate header appears on every single page of this corpus")
    val d = docs(identical: _*)
    assert(Dedup.minhashCandidates(d, maxBucket = 10).count() === 0)
    val dropped = Dedup.droppedBuckets(d, maxBucket = 10).collect()
    assert(dropped.length === 4, "one oversized bucket per band")
    assert(dropped.forall(_.getAs[Int]("n_docs") === 2000))
  }

  test("hot-bucket cap keeps small-bucket pairs and is a subset of uncapped") {
    val d = docs(
      1L -> "spark catalyst optimizer rewrites logical plans into physical plans",
      2L -> "spark catalyst optimizer rewrites logical plans into physical plan!",
      3L -> "zebra yak xylophone walrus vulture tapir snake rabbit quokka pig")
    val uncapped = Dedup.minhashCandidates(d).as[(Long, Long)].collect().toSet
    val capped = Dedup.minhashCandidates(d, maxBucket = 2).as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(uncapped))
    assert(capped.contains((1L, 2L)), "2-doc buckets survive a cap of 2")
  }

  test("nearDupPairs verifies candidates with exact jaccard") {
    val d = docs(
      1L -> "spark catalyst optimizer rewrites logical plans into physical plans",
      2L -> "spark catalyst optimizer rewrites logical plans into physical plan!",
      3L -> "zebra yak xylophone walrus vulture tapir snake rabbit quokka pig")
    val out = Dedup.nearDupPairs(d, threshold = 0.5).collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 1L && out.head.getLong(1) === 2L)
    assert(out.head.getDouble(2) > 0.8)
  }

  test("dedupDocuments: exact collapse first, near keepers one-hop, unique keeps itself") {
    val d = docs(
      1L -> "spark catalyst optimizer rewrites logical plans into physical plans",
      2L -> "spark catalyst optimizer rewrites logical plans into physical plans", // exact dup of 1
      3L -> "spark catalyst optimizer rewrites logical plans into physical plan!", // near dup of 1
      4L -> "zebra yak xylophone walrus vulture tapir snake rabbit quokka pig")
    val out = Dedup.dedupDocuments(d, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq === Seq(
      (1L, 1L, "unique"),
      (2L, 1L, "exact"),
      (3L, 1L, "near"),
      (4L, 4L, "unique")))
  }

  test("connectedKeepers resolves chains and separate components to min ids (both paths)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L)
    // driver union-find path (default threshold)
    val uf = Dedup.connectedKeepers(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(uf === expected)
    // distributed label-propagation path (threshold forced to 0)
    val dist = Dedup.connectedKeepers(pairs, driverMaxPairs = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === expected)
  }

  test("connectedKeepers rejects non-integral ids loudly (no silent null cast)") {
    val uuidPairs = Seq(("a-1", "b-2")).toDF("doc_a", "doc_b")
    val e = intercept[IllegalArgumentException](Dedup.connectedKeepers(uuidPairs))
    assert(e.getMessage.contains("integral"))
  }

  test("dedupDocumentsCC follows chains that the one-hop policy leaves dangling") {
    // A~B and B~C are near-dups (one distant edit each); A~C falls
    // below the threshold (two edits). One-hop maps C to B while B
    // maps to A; connected components map the whole chain to A.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val a = 1L -> base
    val b = 2L -> base.replace("beta", "bXta")
    val c = 3L -> base.replace("beta", "bXta").replace("lambda mu nu xi", "lQmbda mZ nW xY")
    val d = docs(a, b, c, 9L -> "totally unrelated content zone xylophone quartz marble")
    // shingle jaccards: j(A,B)=0.863, j(B,C)=0.700, j(A,C)=0.600 —
    // the threshold keeps the chain edges and cuts the A~C shortcut
    val thr = 0.65
    val pairs = Dedup.nearDupPairs(d, threshold = thr).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L), (2L, 3L)), s"chain premise broken: $pairs")
    val cc = Dedup.dedupDocumentsCC(d, threshold = thr).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(cc === Seq((1L, 1L, "unique"), (2L, 1L, "near"), (3L, 1L, "near"),
      (9L, 9L, "unique")))
    val oneHop = Dedup.dedupDocuments(d, threshold = thr).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(oneHop(3L) === 2L, "one-hop maps C to its min direct neighbor B")
  }

  test("simhash32: deterministic, near-dups have small hamming distance") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta iota",
      3L -> "one two three four five six seven eight")
    val fp = Dedup.simhash32(d).orderBy("doc_id").as[(Long, Long)].collect().map(_._2)
    val fp2 = Dedup.simhash32(d).orderBy("doc_id").as[(Long, Long)].collect().map(_._2)
    assert(fp.toSeq === fp2.toSeq, "simhash must be deterministic")
    val dNear = java.lang.Long.bitCount(fp(0) ^ fp(1))
    val dFar = java.lang.Long.bitCount(fp(0) ^ fp(2))
    assert(dNear < dFar, s"near hamming $dNear should be < far hamming $dFar")
  }

  test("hamming32 column matches JVM bitCount") {
    val df = Seq((0xFFL, 0x0FL)).toDF("a", "b")
      .select(Dedup.hamming32($"a", $"b").as("h"))
    assert(df.head().getAs[Number](0).longValue === 4L)
  }

  test("exactDocs groups identical normalized text") {
    val d = docs(1L -> "Hello  World", 2L -> "hello world", 3L -> "different")
    val out = Dedup.exactDocs(d).collect()
    assert(out.length === 2)
    assert(out.head.getLong(0) === 1L && out.head.getLong(1) === 2L)
  }

  // a paragraph long enough that a small edit leaves shingle-set
  // jaccard (and so the minhash signature) mostly intact
  private def para(tag: String) =
    s"the quick brown fox $tag jumps over the lazy dog while seventeen " +
      "sailors watch from the harbor wall and debate the merits of " +
      "distributed deduplication at considerable length"

  test("newNearDocs drops exact and lightly-edited re-crawls, keeps new docs") {
    val history = docs((0L until 10L).map(i => i -> para(s"h$i")): _*)
    val hSigs = Dedup.minhashSignatures(history, "doc_id", "text")
    val batch = docs(
      100L -> para("h3"),                    // exact re-crawl
      101L -> (para("h7") + " appended"),    // lightly edited re-crawl
      102L -> "a completely unrelated piece of writing about gardening and soup")
    val kept = Dedup.newNearDocs(batch, hSigs)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept === Seq(102L), s"got $kept")
  }

  test("newNearDocs: history-side hot-bucket cap trades recall, never correctness") {
    // 20 identical history docs = one hot bucket per band
    val history = docs((0L until 20L).map(i => i -> para("same")): _*)
    val hSigs = Dedup.minhashSignatures(history, "doc_id", "text")
    val batch = docs(100L -> para("same"))
    val uncapped = Dedup.newNearDocs(batch, hSigs).count()
    assert(uncapped === 0L, "the re-crawl is caught without a cap")
    val capped = Dedup.newNearDocs(batch, hSigs, maxBucket = 5).count()
    assert(capped === 1L,
      "capping the boilerplate bucket drops its candidates (monitored trade)")
  }

  test("newNearDocs: threshold is monotone, and 16/16 still drops identical text") {
    val history = docs((0L until 10L).map(i => i -> para(s"h$i")): _*)
    val hSigs = Dedup.minhashSignatures(history, "doc_id", "text")
    val batch = docs(
      100L -> para("h3"),
      101L -> (para("h7") + " appended"),
      102L -> "a completely unrelated piece of writing about gardening and soup")
    def kept(mm: Int) = Dedup.newNearDocs(batch, hSigs, minMatches = mm)
      .select("doc_id").as[Long].collect().toSet
    assert(!kept(16).contains(100L), "identical text has an identical signature")
    // a stricter threshold can only ADD survivors, never drop them
    assert(kept(8).subsetOf(kept(12)) && kept(12).subsetOf(kept(16)))
    assert(kept(8).contains(102L))
  }

  test("simhashNearDup: recall 1 vs brute-force hamming; caps trade recall for bounds") {
    val corpus = docs((0L until 40L).map { i =>
      // clusters of lightly-edited paragraphs -> small hamming dists
      i -> (para(s"v${i / 4}") + (if (i % 4 == 0) "" else s" tail ${i % 4}"))
    }: _*)
    val viaBlocks = Dedup.simhashNearDup(corpus, maxDist = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // brute force: every pair within hamming 3 of the same simhash32
    val sh = Dedup.simhash32(corpus).as[(Long, Long)].collect()
    val brute = (for {
      (a, ha) <- sh; (b, hb) <- sh if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(viaBlocks === brute,
      "pigeonhole block join must find EXACTLY the brute-force pairs")
    assert(brute.nonEmpty, "fixture must actually produce close pairs")
    // widening the radius past blocks-1 would break pigeonhole: rejected
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDup(corpus, maxDist = 4, blocks = 4)
    }
    // a tiny bucket cap drops candidates (bounded trade, like the
    // minhash caps) but can only ever REMOVE pairs, never invent them
    val capped = Dedup.simhashNearDup(corpus, maxDist = 3, maxBucket = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(brute))
  }

  test("keeperByQuality re-elects each cluster's best-scored member; ties take min id") {
    // clusters (by keeper_id): {1,2,3} with scores 5,9,9 → keeper 2
    // (max score 9, tie broken by min id); {7} singleton stays itself
    val assign = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L))
      .toDF("doc_id", "keeper_id")
    val scores = Seq((1L, 5L), (2L, 9L), (3L, 9L), (7L, 1L))
      .toDF("doc_id", "score")
    val out = Dedup.keeperByQuality(assign, scores)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 7L -> 7L))
    // cluster membership is the assignment's (one-hop groups as-is):
    // only the representative changes, never who belongs where
    assert(out.keySet === Set(1L, 2L, 3L, 7L))
  }

  test("contrastivePairs: near-dup positives, bounded clean negatives, reproducible") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = ((1L to 2L).map(i => (i, base + " v")) ++      // near-dup pair
      (3L to 12L).map(i =>                                     // mutually distinct
        (i, Seq.tabulate(10)(j => s"z${i}q${j}k${i * 7 + j}").mkString(" "))))
      .toSeq.toDF("doc_id", "text")
    val out = Dedup.contrastivePairs(docs, negativesPerAnchor = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val pos = out.filter(_._3 == "pos")
    val neg = out.filter(_._3 == "neg")
    assert(pos.map(p => (p._1, p._2)).toSeq === Seq((1L, 2L)))
    // anchor 1 drew at most 2 negatives; none is itself or its partner
    assert(neg.nonEmpty && neg.size <= 2)
    assert(neg.forall { case (a, o, _) => a == 1L && o != 1L && o != 2L })
    // deterministic across partitioning
    val again = Dedup.contrastivePairs(docs.repartition(5), negativesPerAnchor = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq === again.toSeq)
  }

  test("dedupKeepBest: clusters keep the best-scoring member, ties to min id") {
    // 1-3 near-dups of each other (3 longest), 4 unique, 5-6 exact dups
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today", 50L),
      (2L, "the quick brown fox jumps over the lazy dog todays", 51L),
      (3L, "the quick brown fox jumps over the lazy dog today!!!!", 54L),
      (4L, "completely different text about spark and scala here", 52L),
      (5L, "twin twin twin twin twin twin twin twin twin twin", 50L),
      (6L, "twin twin twin twin twin twin twin twin twin twin", 50L)
    ).toDF("doc_id", "text", "n_chars")
    val out = Dedup.dedupKeepBest(docs, scoreCol = "n_chars", threshold = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    // the near cluster {1,2,3} keeps 3 (longest), not min-id 1
    assert(out(1L)._2 === 3L && out(1L)._3 === 0)
    assert(out(2L)._2 === 3L && out(2L)._3 === 0)
    assert(out(3L)._2 === 3L && out(3L)._3 === 1)
    // the cluster id itself is still the CC min-id root
    assert(Set(out(1L)._1, out(2L)._1, out(3L)._1) === Set(1L))
    // unique doc keeps itself
    assert(out(4L) === ((4L, 4L, 1)))
    // exact twins: equal scores -> min id wins the tie
    assert(out(5L) === ((5L, 5L, 1)))
    assert(out(6L) === ((5L, 5L, 0)))
    // exactly one kept row per cluster
    assert(out.values.count(_._3 == 1) === 3)
  }

  test("clusterSizeProfile: histogram of exact+near cluster sizes") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),  // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy dog todays"), // near dup of 1
      (4L, "completely different text about spark and scala here"),
      (5L, "another unrelated document talking about databases")
    ).toDF("doc_id", "text")
    val out = Dedup.clusterSizeProfile(docs, threshold = 0.5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one cluster of 3 (1,2,3), two singletons
    assert(out === Map(1L -> 2L, 3L -> 1L))
  }
}
