package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class NgramsSpec extends SparkSuite {
  import spark.implicits._

  test("wordNgrams emits size-n windows; short docs yield empty (no phantom grams)") {
    val out = Seq("a b c d", "a b", "").toDF("t")
      .select(Ngrams.wordNgrams(col("t"), 3).as("g")).as[Seq[String]].collect()
    assert(out(0) === Seq("a b c", "b c d"))
    assert(out(1) === Seq.empty) // size 2 < n: the sequence() guard case
    assert(out(2) === Seq.empty)
  }

  test("decontaminate flags docs sharing an n-gram with the benchmark, counts distinct grams") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // contains benchmark gram
      (2L, "one two three four five six"),         // clean
      (3L, "alpha beta gamma delta epsilon zeta")) // duplicate of 1
      .toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta"))
      .toDF("doc_id", "text")
    val out = Ngrams.decontaminate(train, bench, n = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // bench 5-grams: {alpha..epsilon, beta..zeta, gamma..eta}; docs 1/3
    // share the first two
    assert(out.toSeq === Seq((1L, 2L, true), (2L, 0L, false), (3L, 2L, true)))
  }

  test("chunk cuts fixed token windows with a ragged tail") {
    val docs = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val out = Ngrams.chunk(docs, chunkSize = 4).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq === Seq(
      (0L, 4L, "w1 w2 w3 w4"),
      (1L, 4L, "w5 w6 w7 w8"),
      (2L, 2L, "w9 w10")))
    // chunks reassemble to the original text
    assert(out.map(_._3).mkString(" ") === (1 to 10).map(i => s"w$i").mkString(" "))
  }

  test("chunk: a doc at an exact multiple has no empty tail chunk") {
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val out = Ngrams.chunk(docs, chunkSize = 2).collect()
    assert(out.length === 2)
    assert(out.forall(_.getLong(2) === 2L))
  }

  test("sourceOverlap counts distinct shared grams per sorted source pair") {
    val docs = Seq(
      ("a", "one two three four"),   // grams: {one two, two three, three four}
      ("a", "one two three four"),   // exact repeat: distinct per source
      ("b", "zzz one two three"),    // shares {one two, two three} with a
      ("c", "totally different words here"))
      .toDF("source", "text")
    val out = Ngrams.sourceOverlap(docs, n = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(("a", "b") -> 2L), s"got $out")
    // a stop-gram present in every source is dropped by the cap
    val withStop = docs.unionByName(
      Seq(("b", "common tail"), ("c", "common tail"), ("a", "common tail"))
        .toDF("source", "text"))
    val capped = Ngrams.sourceOverlap(withStop, n = 2, maxSourcesPerGram = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(capped === Map(("a", "b") -> 2L),
      s"the all-source gram must be capped out: $capped")
  }

  test("dupSpans: cross-doc spans flagged, within-doc repeats and short docs don't count") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y z q"),        // shares "x y" and "y z" with doc 2
      (2L, "x y z"),          // both its spans shared
      (3L, "x y x y"),        // "x y" twice WITHIN the doc: distinct-per-row
      (4L, "solo"),           // shorter than n=2: zero spans
      (5L, null: String))     // null text: zero spans
      .toDF("doc_id", "text")
    val out = Ngrams.dupSpans(docs, n = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    // doc 1: spans {x y, y z, z q}; x y in docs 1,2,3 (df 3), y z in 1,2
    assert(out(1L) === ((3L, 2L, 3L, Some(2.0 / 3))))
    assert(out(2L) === ((2L, 2L, 3L, Some(1.0))))
    // doc 3: distinct spans {x y, y x}; only x y is cross-doc
    assert(out(3L) === ((2L, 1L, 3L, Some(0.5))))
    assert(out(4L) === ((0L, 0L, 0L, None)))
    assert(out(5L) === ((0L, 0L, 0L, None)))
  }

  test("contaminationRate grades leakage; short docs have NULL rate, never flagged") {
    import spark.implicits._
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon"),      // IS a benchmark line: rate 1.0
      (2L, "alpha beta gamma delta epsilon one two three four five six seven"),
      (3L, "one two three four five six seven eight"), // clean
      (4L, "too short"))                               // < n tokens: no grams
      .toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val out = Ngrams.contaminationRate(train, bench, n = 5, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4)))).toMap
    assert(out(1L) === ((1L, 1L, Some(1.0), true)))
    // doc 2: 8 distinct 5-grams, 1 shared -> rate 0.125, below 0.5
    assert(out(2L) === ((8L, 1L, Some(0.125), false)))
    assert(out(3L) === ((4L, 0L, Some(0.0), false)))
    assert(out(4L) === ((0L, 0L, None, false)))
    // consistency with the binary gate: contaminated == (n_shared > 0)
    val binary = Ngrams.decontaminate(train, bench, n = 5).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    out.foreach { case (id, (_, shared, _, _)) =>
      assert(binary(id) === (shared > 0L)) }
  }

  test("winnowFingerprints: short docs collapse to one fp, sub-gram docs are absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"),       // exactly n=3 tokens: 1 gram, 1 fp
      (2L, "a b c d e"),   // 3 grams < w=4: whole-doc min, 1 fp
      (3L, "a b"))         // < n tokens: no grams, absent
      .toDF("doc_id", "text")
    val out = Ngrams.winnowFingerprints(docs, n = 3, w = 4).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(out === Map(1L -> 1, 2L -> 1))
  }

  test("winnowing guarantee: a shared run of >= w+n-1 tokens yields a shared fingerprint") {
    import spark.implicits._
    val shared = "the five boxing wizards jump quickly tonight" // 7 tokens >= 4+3-1
    val docs = Seq(
      (1L, s"alpha bravo charlie $shared delta echo foxtrot"),
      (2L, s"uno dos tres cuatro $shared cinco seis"),
      (3L, "completely unrelated words about gardening soup and weather patterns"))
      .toDF("doc_id", "text")
    val pairs = Ngrams.winnowOverlap(docs, n = 3, w = 4, minShared = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)), s"guaranteed shared fp missing: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated doc must not pair: ${pairs.toSeq}")
  }

  test("winnowFingerprints selects a bounded subset of the doc's gram hashes") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 40).map(i => s"tok${i % 17}").mkString(" ")))
      .toDF("doc_id", "text")
    val (n, w) = (3, 4)
    val sel = Ngrams.winnowFingerprints(docs, n = n, w = w).collect()
      .map(_.getLong(1)).toSet
    val gramFps = docs
      .select(explode(Ngrams.wordNgrams(lower(col("text")), n)).as("ng"))
      .select(conv(substring(md5(col("ng")), 1, 15), 16, 10).cast("long"))
      .collect().map(_.getLong(0)).toSet
    val m = 40 - n + 1
    assert(sel.subsetOf(gramFps), "selected fps must come from the doc's grams")
    assert(sel.nonEmpty && sel.size <= m - w + 1)
  }

  test("winnowing guarantee holds over randomized corpora (property sweep)") {
    import spark.implicits._
    // 20 random doc pairs, each sharing a random >= w+n-1 token run at
    // random positions inside random noise — every pair must surface
    val rng = new scala.util.Random(13)
    def words(n: Int, tag: String) = (1 to n).map(_ => s"$tag${rng.nextInt(5000)}")
    val (n, w) = (3, 4)
    val docs = (0 until 20).flatMap { i =>
      val run = words(w + n - 1 + rng.nextInt(10), s"s${i}_").mkString(" ")
      Seq(
        (i * 2L, (words(rng.nextInt(30), s"a${i}_") :+ run :+
          words(rng.nextInt(30), s"b${i}_").mkString(" ")).mkString(" ")),
        (i * 2L + 1, (words(rng.nextInt(30), s"c${i}_") :+ run :+
          words(rng.nextInt(30), s"d${i}_").mkString(" ")).mkString(" ")))
    }.toDF("doc_id", "text")
    val pairs = Ngrams.winnowOverlap(docs, n = n, w = w, minShared = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 20).foreach { i =>
      assert(pairs.contains((i * 2L, i * 2L + 1)),
        s"pair $i with a guaranteed shared run not detected")
    }
  }

  test("decontaminateNear flags paraphrased benchmark leaks the exact screen misses") {
    import spark.implicits._
    def para(tag: String) =
      s"the quick brown fox $tag jumps over the lazy dog while seventeen " +
        "sailors watch from the harbor wall and debate the merits of " +
        "distributed deduplication at considerable length"
    val train = Seq(
      (1L, para("one") + " with a short suffix appended"), // light edit of bench item
      (2L, "a completely unrelated piece of writing about gardening and soup " +
        "that shares no shingles with the benchmark at all no indeed"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, para("one"))).toDF("doc_id", "text")
    val near = Ngrams.decontaminateNear(train, bench)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(near === Map(1L -> true, 2L -> false))
    // and the exact 8-gram screen DOES catch doc 1 here (word-level
    // overlap survives the edit) — the near screen's real value is on
    // edits inside gram windows, proven by the char-shingle threshold:
    // a mid-sentence token swap breaks every 8-gram containing it
    val swapped = para("one").replace("harbor wall", "harbour wall")
    val nearSwap = Ngrams.decontaminateNear(
      Seq((1L, swapped)).toDF("doc_id", "text"), bench)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(nearSwap(1L) === true,
      "a one-token respelling must still register as near-contamination")
  }
}
