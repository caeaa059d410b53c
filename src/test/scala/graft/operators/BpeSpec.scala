package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class BpeSpec extends SparkSuite {
  import spark.implicits._

  // the independent reference trainer lives in main since round 14
  // (it derives the q_bpe_segment fixture merges); it stays a SEPARATE
  // implementation from Bpe.train — plain Scala loops vs the Spark
  // dataflow — so the cross-check below keeps its teeth
  private def referenceTrain(words: Map[String, Long], nMerges: Int)
      : Seq[(String, String)] = Bpe.referenceTrain(words, nMerges)

  test("train matches the independent reference on the classic corpus") {
    // the Sennrich-style example: es/est dominate via newest+widest
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val docs = words.toSeq.flatMap { case (w, c) =>
      Seq.fill(c.toInt)(w)
    }.grouped(4).map(_.mkString(" ")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toSeq.toDF("doc_id", "text")
    val (merges, vocab) = Bpe.train(docs, nMerges = 8)
    val expected = referenceTrain(words, nMerges = 8)
    assert(merges === expected, s"spark=$merges reference=$expected")
    // the canonical first merges: (e,s) count 9, then (es,t) count 9
    assert(merges.take(2) === Seq(("e", "s"), ("es", "t")))
    // final segmentation is consistent: re-counting words from the
    // vocab table reproduces the corpus word counts
    val back = vocab.select(col("word"), col("cnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(back === words)
  }

  test("train is reproducible under repartitioning and agrees with the reference on real docs") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val (m1, _) = Bpe.train(docs, nMerges = 6)
    val (m2, _) = Bpe.train(docs.repartition(11), nMerges = 6)
    assert(m1 === m2)
    val words = Bpe.wordTable(docs).select("word", "cnt").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m1 === referenceTrain(words, nMerges = 6))
  }

  test("mergeFold is greedy left-to-right") {
    val df = Seq(
      Seq("a", "a", "a"),
      Seq("a", "a", "a", "a"),
      Seq("x", "a", "a"),
      Seq("a"),
      Seq.empty[String]).toDF("syms")
    val out = df.select(Bpe.mergeFold(col("syms"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0).toSeq)
    assert(out(0) === Seq("aa", "a"))
    assert(out(1) === Seq("aa", "aa"))
    assert(out(2) === Seq("x", "aa"))
    assert(out(3) === Seq("a"))
    assert(out(4) === Seq.empty)
  }

  test("fixtureMerges: the distributed trainer reproduces them; the list exercises multi-char chains") {
    // the q_bpe_segment fixture list is derived by the pure-JVM
    // reference trainer; the Spark trainer on the same literal
    // vocabulary must learn the identical list — so the certified
    // apply row's parameters are exactly what training would produce
    val merges = Bpe.fixtureMerges(12)
    assert(merges.size === 12)
    val docs = Bpe.FixtureWords.toSeq.sortBy(_._1).flatMap { case (w, c) =>
      Seq.fill(c.toInt)(w)
    }.grouped(5).map(_.mkString(" ")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toSeq.toDF("doc_id", "text")
    val (trained, _) = Bpe.train(docs, nMerges = 12)
    assert(trained === merges, s"spark=$trained fixture=$merges")
    // the list must exercise the apply path's hard branches: a merge
    // whose LEFT operand is itself a merged (multi-char) symbol
    val symbols = merges.map { case (a, b) => a + b }.toSet
    assert(merges.exists { case (a, _) => a.length > 1 && symbols.contains(a) },
      s"fixture merges too flat to certify chained merging: $merges")
  }

  test("segmentCounts with fixture merges matches a hand-run greedy segmentation") {
    // independent apply-path check on words hitting every branch:
    // chained multi-char merges and the greedy-overlap run (banana)
    val merges = Bpe.fixtureMerges(12)
    def segment(word: String): Int = {
      var syms = word.map(_.toString).toVector
      merges.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms.length
    }
    val docs = Seq((1L, "the banana thesis"), (2L, "Lowest Notions"),
      (3L, "  spaced   out  "), (4L, null: String)).toDF("doc_id", "text")
    val got = Bpe.segmentCounts(docs, merges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === Seq("the", "banana", "thesis").map(segment).sum.toLong)
    assert(got(2L) === Seq("lowest", "notions").map(segment).sum.toLong)
    assert(got(3L) === Seq("spaced", "out").map(segment).sum.toLong)
    assert(got(4L) === 0L)
  }

  test("segmentCounts: trained merges shrink token counts, never below word count") {
    val docs = Seq((1L, "newest newest widest"), (2L, "low lower"), (3L, null: String))
      .toDF("doc_id", "text")
    val (merges, _) = Bpe.train(docs, nMerges = 10)
    val chars = docs.select(col("doc_id"),
        explode(split(col("text"), "\\s+")).as("w"))
      .groupBy("doc_id").agg(sum(length(col("w"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = Bpe.segmentCounts(docs, merges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // post-BPE counts are below character counts (merges happened) and
    // at least the word count (a word never segments below 1 token)
    assert(out(1L) < chars(1L) && out(1L) >= 3L)
    assert(out(2L) < chars(2L) && out(2L) >= 2L)
    assert(out(3L) === 0L)
  }
}
