package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Text

/** Iterative BPE (byte-pair-encoding) trainer ([EXT]) — learns a merge
  * list from the corpus, completing the tokenizer-induction family:
  * [[CorpusStats.bpePairCounts]] is the statistic for ONE merge; this
  * is the full driver loop (like Lloyd's in [[Clustering]]: an
  * inherently sequential outer loop of distributed inner steps).
  *
  * Every step is deterministic: the merge pick is total-ordered
  * (count desc, then pair), and re-segmentation is the standard greedy
  * left-to-right merge, expressed as a per-word array fold. Training
  * is reproducible bit-exactly across partitionings.
  *
  * Scale shape: the corpus collapses ONCE to the distinct-word
  * frequency table (BPE's standard trick — all further work scales
  * with |vocab|, not corpus tokens; a 100 TB crawl has a vocab table
  * in the low millions of rows). Each merge iteration is one explode +
  * hash aggregate + TakeOrdered(1) over that table plus a per-row
  * fold; the table is localCheckpoint'ed per iteration so lineage
  * stays flat across hundreds of merges (the loop would otherwise
  * stack one fold PLAN per merge and re-fold from scratch each
  * iteration).
  */
object Bpe {

  /** Greedy left-to-right merge of adjacent (a, b) into one symbol —
    * one fold pass, the same semantics as the reference BPE
    * implementation: [a,a,a] under (a,a) becomes [aa,a], and the
    * freshly merged symbol does not re-merge with the next element
    * unless it equals `a` itself. O(len²) per word per merge (the
    * accumulator copies) — fine on words, not meant for documents. */
  private[operators] def mergeFold(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) =>
        // CaseWhen branches evaluate lazily, so element_at(acc, -1)
        // only runs on non-empty accumulators (ANSI-safe: out-of-range
        // element_at throws under Spark 4's default ANSI mode)
        when(size(acc) === 0, array(s))
          .when(element_at(acc, -1) === lit(a) && s === lit(b),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(s))))

  /** The word-frequency table seeded with character-level symbols —
    * training state. One map-side-combined aggregate over the corpus;
    * everything after is |vocab|-sized. */
  def wordTable(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(Text.tokens(lower(col(textCol)))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(col("word"), split(col("word"), "").as("syms"), col("cnt"))

  /** Weighted adjacent-pair counts over the CURRENT segmentation —
    * [[CorpusStats.bpePairCounts]] generalized from characters to
    * learned symbols. */
  private[operators] def pairCounts(vocab: DataFrame): DataFrame =
    vocab.where(size(col("syms")) >= 2)
      .select(col("cnt"),
        explode(transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("a"),
            element_at(col("syms"), i + lit(1)).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("cnt")).as("n"))

  /** Train `nMerges` merges. Returns (merge list in learned order,
    * final segmented word table). Stops early when no pair repeats.
    * Each iteration's driver action is ONE row (the argmax pair) —
    * a bounded query parameter for the next step, not a data
    * collect. */
  def train(docs: DataFrame, nMerges: Int, textCol: String = "text")
      : (Seq[(String, String)], DataFrame) = {
    require(nMerges > 0, s"nMerges must be positive: $nMerges")
    var vocab = wordTable(docs, textCol).localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    var continue = true
    var learned = 0
    while (continue && learned < nMerges) {
      val top = pairCounts(vocab)
        .orderBy(col("n").desc, col("a"), col("b")).limit(1).collect()
      top.headOption match {
        case Some(r) if r.getLong(2) >= 2 =>
          val (a, b) = (r.getString(0), r.getString(1))
          merges += ((a, b))
          learned += 1
          vocab = vocab
            .select(col("word"), mergeFold(col("syms"), a, b).as("syms"), col("cnt"))
            .localCheckpoint()
        case _ => continue = false  // no repeated pair left: vocab is saturated
      }
    }
    (merges.result(), vocab)
  }

  /** Training run as a harness query: one row per learned merge, in
    * order. No SQL oracle is possible for the iterative loop (like
    * the ML baseline); `BpeSpec` verifies the trainer against an
    * independent reference implementation instead. */
  def trainAsDataFrame(spark: SparkSession, docs: DataFrame, nMerges: Int): DataFrame = {
    val (merges, _) = train(docs, nMerges)
    val rows = merges.zipWithIndex.map { case ((a, b), i) =>
      Row(i.toLong, a, b, a + b)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("merge_rank", LongType, nullable = false),
        StructField("sym_a", StringType, nullable = false),
        StructField("sym_b", StringType, nullable = false),
        StructField("merged", StringType, nullable = false))))
      .orderBy(col("merge_rank"))
  }

  /** Pure-JVM reference trainer with the same contract as [[train]]
    * (merge pick = count desc then pair asc, greedy left-to-right
    * re-segmentation, stop when no pair repeats) — an INDEPENDENT
    * implementation (plain Scala maps and loops, no Spark), kept as
    * the cross-check BpeSpec pins [[train]] against and as the
    * deterministic trainer behind [[fixtureMerges]]. */
  def referenceTrain(words: Map[String, Long], nMerges: Int): Seq[(String, String)] = {
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, c) => w.map(_.toString).toVector -> c }
    val merges = Seq.newBuilder[(String, String)]
    var learned = 0
    var go = true
    while (go && learned < nMerges) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      val best = counts.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best match {
        case Some(((a, b), n)) if n >= 2 =>
          merges += ((a, b))
          learned += 1
          vocab = vocab.groupMapReduce { case (syms, _) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                out += (a + b); i += 2 // greedy left-to-right: consume both
              } else { out += syms(i); i += 1 }
            }
            out.result()
          }(_._2)(_ + _)
        case _ => go = false
      }
    }
    merges.result()
  }

  /** Fixture word-frequency table behind [[fixtureMerges]] — a literal
    * mini-corpus whose trained merges exercise every apply-path branch:
    * multi-char left operands ("th"+"e"), merged-symbol chaining, and
    * the greedy-overlap case (banana's a·n·a·n·a run). A LITERAL so
    * both the registered q_bpe_segment query and its DuckDB oracle
    * derive the identical merge list from the same trainer arithmetic —
    * the q_random_projection seeded-literal discipline for the BPE
    * family: the apply half (mergeFold) gets a hash certificate while
    * training on live data stays the rows-only q_bpe_train. */
  val FixtureWords: Map[String, Long] = Map(
    "the" -> 12L, "then" -> 5L, "these" -> 4L, "there" -> 6L,
    "low" -> 9L, "lower" -> 7L, "lowest" -> 3L,
    "newest" -> 8L, "widest" -> 6L, "winner" -> 5L, "inner" -> 4L,
    "banana" -> 7L, "and" -> 11L, "sand" -> 3L, "onion" -> 5L, "notion" -> 4L)

  /** The first `n` merges [[referenceTrain]] learns on
    * [[FixtureWords]] — deterministic pure-JVM arithmetic, so the
    * Scala query and the DuckDB oracle string share one derivation. */
  def fixtureMerges(n: Int): Seq[(String, String)] = referenceTrain(FixtureWords, n)

  /** Apply a learned merge list to a corpus: per-document token count
    * under the trained tokenizer (the cost estimate that decides
    * whether the vocab ships). Segmentation folds each merge in
    * learned order over each word — same greedy semantics as
    * training. */
  def segmentCounts(docs: DataFrame, merges: Seq[(String, String)],
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val seeded = docs
      .select(col(idCol).as("doc_id"),
        explode(Text.tokens(lower(col(textCol)))).as("word"))
      // empty tokens (empty text, or a leading \t/\n that survives
      // trim's space-only strip and splits to a "" head) are not words
      // — zero symbols, not one; the DuckDB replay filters identically.
      // U+0001 is the cross-engine replay's separator sentinel (the
      // oracle counts tokens by chr(1) arithmetic): a word carrying a
      // literal 0x01 would inflate the oracle's separator-derived count
      // while this side counts array symbols — so control-char words
      // are excluded from the token count on BOTH engines (they are
      // not tokens any trained vocab would ship anyway)
      .where(col("word") =!= "" && !col("word").contains("\u0001"))
      .select(col("doc_id"), split(col("word"), "").as("syms"))
    val segmented = merges.foldLeft(seeded) { case (df, (a, b)) =>
      df.select(col("doc_id"), mergeFold(col("syms"), a, b).as("syms"))
    }
    val perDoc = segmented.groupBy(col("doc_id"))
      .agg(sum(size(col("syms"))).cast("long").as("n_bpe_tokens"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
      .orderBy(col("doc_id"))
  }
}
