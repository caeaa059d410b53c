package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions
import graft.functions.Text

/** Deduplication family (reference: src/helpers/preprocessing_data.py:84-123
  * D1/D2 for exact; [EXT] near-dup for the LLM-pipeline surface).
  *
  * Scale notes:
  *  - exact dedup = shuffle on the dedup key (or its hash) — never a
  *    global sort, never a driver collect.
  *  - MinHash LSH turns the O(n^2) near-dup problem into a shuffle
  *    join on (band, band_hash): only documents sharing a band bucket
  *    are compared exactly. At 100 TB the candidate join is the only
  *    quadratic-risk step and its size is controlled by bands*rows.
  */
object Dedup {

  /** Full-row / projected-column exact dedup (D1). */
  def exact(df: DataFrame, cols: Seq[String] = Nil): DataFrame =
    if (cols.isEmpty) df.distinct()
    else df.select(cols.map(col): _*).distinct()

  /** Keyed dedup keeping a *deterministic* representative (the
    * reference's dropDuplicates keeps an arbitrary row — not
    * reproducible across runs; we keep the min-by-tiebreak row). The
    * tiebreak columns must uniquely order rows within a key group. */
  def keyedDeterministic(df: DataFrame, keys: Seq[String], tiebreaks: String*): DataFrame = {
    require(tiebreaks.nonEmpty, "keyedDeterministic needs at least one tiebreak column")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tiebreaks.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Same result contract as [[keyedDeterministic]], aggregate-shaped:
    * `min_by` over a struct of the tiebreaks (struct comparison is
    * lexicographic in field order = the tiebreaks' ORDER BY). The
    * window version shuffles and SORTS every fact row inside its key
    * partition; this one partial-aggregates map-side, so the shuffle
    * carries at most one candidate row per (input partition, key) and
    * no sort happens — the shape to prefer on a 100 TB fact. Caveats:
    * tiebreak columns must be NON-NULL (row_number sorts nulls first,
    * min_by ignores rows whose ordering key is null — semantics would
    * diverge) and, as with the window version, must uniquely order
    * rows within a key for the representative to be deterministic. */
  def keyedDeterministicAgg(df: DataFrame, keys: Seq[String], tiebreaks: String*): DataFrame = {
    require(tiebreaks.nonEmpty, "keyedDeterministicAgg needs at least one tiebreak column")
    val others = df.columns.toSeq.filterNot(keys.contains)
    val rep = min_by(struct(others.map(col): _*), struct(tiebreaks.map(col): _*)).as("__rep")
    df.groupBy(keys.map(col): _*)
      .agg(rep)
      .select(df.columns.toSeq.map(c =>
        if (keys.contains(c)) col(c) else col(s"__rep.`$c`").as(c)): _*)
  }

  /** Survivorship merge ("golden record", [EXT]): one output row per
    * key whose every value column is COLUMN-WISE the first non-null
    * value in (priority, tiebreak) order across the key's rows — the
    * record-linkage consolidation step after entity resolution, where
    * each source system fills the fields it knows and a per-source
    * priority arbitrates conflicts. [[keyedDeterministic]] keeps one
    * whole ROW; this stitches the best CELLS from different rows (a
    * high-priority source with a null field falls back per-field, not
    * per-record).
    *
    * Shape: pure aggregate — each column is
    * `min(when(col non-null, struct(prio, tie, col)))`, a struct min
    * that skips null values by construction (the `when` yields null,
    * aggregates ignore it), orders lexicographically by (prio, tie),
    * and partial-aggregates map-side; the shuffle carries one
    * candidate struct per (input partition, key, column). No window,
    * no sort, engine-portable (struct min is lexicographic in DuckDB
    * too, which is what makes the oracle possible). (prio, tie) must
    * uniquely order a key's rows for determinism, same contract as
    * [[keyedDeterministicAgg]]. */
  def goldenRecord(df: DataFrame, keys: Seq[String], prioCol: String,
                   tieCol: String, valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "goldenRecord needs at least one value column")
    val aggs = valueCols.map { c =>
      min(when(col(c).isNotNull,
        struct(col(prioCol).as("p"), col(tieCol).as("t"), col(c).as("v"))))
        .getField("v").as(c)
    }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Exact document dedup on normalized-text fingerprint: one group
    * per distinct content, keeping min doc id. */
  def exactDocs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), Text.fingerprint(col(textCol)).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))
      .select(col("keeper_id"), col("n_copies"), col("fingerprint"))
      .orderBy(col("keeper_id"))

  /** Character n-gram shingles of the raw text. */
  def shingles(c: Column, n: Int = 5): Column = {
    val starts = sequence(lit(1), greatest(length(c) - lit(n - 1), lit(1)))
    transform(starts, i => c.substr(i, lit(n)))
  }

  /** 32-bit shingle hash: first 8 md5 hex digits — reproducible in any
    * engine with md5, which is what makes the DuckDB oracle possible. */
  def shingleHash(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Universal-hash permutation h_i(x) = (a_i*x + b_i) mod P for the
    * k min-hash functions. Two properties are load-bearing:
    * the modulo (without it the map is monotone in x and every
    * "permutation" shares the same argmin, collapsing the signature
    * to one hash), and coefficient independence (linearly related
    * a_i make the permutations correlated, so LSH bands collide far
    * above the j^r rate — observed 1.1M candidate pairs instead of
    * ~80k on the sf0.1 corpus). Coefficients are drawn once from a
    * fixed-seed RNG, a_i < 2^30 so a*h (h < 2^32) stays below 2^62 —
    * no overflow under ANSI arithmetic. */
  val MinhashP: Long = 2147483647L // 2^31 - 1, prime
  private val perms: IndexedSeq[(Long, Long)] = {
    val rng = new scala.util.Random(0x5EED)
    IndexedSeq.fill(64)((rng.nextInt(1 << 30).toLong | 1L, rng.nextInt(Int.MaxValue).toLong))
  }
  def aCoef(i: Int): Long = perms(i)._1
  def bCoef(i: Int): Long = perms(i)._2

  /** One row per doc with k min-hash columns m0..m{k-1}.
    *
    * Shape matters for scale: explode distinct shingles, compute md5
    * ONCE per shingle, then fold the k permutations (cheap
    * multiply-adds) into k min() aggregates. Partial aggregation
    * combines map-side, so the shuffle carries one k-long row per doc
    * — not the shingle sets. The naive formulation (k md5 passes over
    * an array column duplicated per hash function) is 16x the hashing
    * and defeats codegen CSE. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 16, shingleLen: Int = 5): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val hashed = docs
      // fan-out stage: a document table often arrives in few (or one)
      // input splits; repartitioning the tiny pre-explode rows spreads
      // the ~300x shingle expansion and hashing across the cluster.
      // The partition count must be EXPLICIT: AQE sizes partitions by
      // shuffle bytes and would coalesce the small pre-explode rows
      // back onto one task (REPARTITION_BY_NUM is exempt).
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol).as("doc_id"),
        explode(GraftFunctions.distinctShingles(col(textCol), shingleLen)).as("sh"))
      .select(col("doc_id"), shingleHash(col("sh")).as("h"))
    val aggs = (0 until k).map(i =>
      min((col("h") * lit(aCoef(i)) + lit(bCoef(i))) % lit(MinhashP)).as(s"m$i"))
    hashed.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** (doc_id, band, band_hash) from an existing signature table
    * (m0..m{k-1} columns, e.g. [[minhashSignatures]] output or its
    * persisted copy). */
  def bandsOfSignatures(sig: DataFrame, k: Int = 16, bands: Int = 4): DataFrame = {
    val r = k / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws(",", (b * r until (b + 1) * r).map(i => col(s"m$i")): _*)).as("band_hash"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("e"))
      .select(col("doc_id"), col("e.band"), col("e.band_hash"))
  }

  /** (doc_id, band, band_hash) — LSH banding of the signature. */
  def lshBands(docs: DataFrame, idCol: String, textCol: String,
               k: Int = 16, bands: Int = 4, shingleLen: Int = 5): DataFrame =
    bandsOfSignatures(minhashSignatures(docs, idCol, textCol, k, shingleLen), k, bands)

  /** All unordered pairs of an array's elements, as structs. */
  private[operators] def pairsOf(arr: Column): Column =
    flatten(transform(arr, (x, i) =>
      transform(slice(arr, i + 2, size(arr)), y => struct(x.as("_1"), y.as("_2")))))

  /** Bucket membership lists (band, band_hash, ids), size >= 2 —
    * shared by the candidate generator and the dropped-bucket
    * monitor. */
  def lshBucketLists(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                     k: Int = 16, bands: Int = 4, shingleLen: Int = 5): DataFrame =
    lshBands(docs, idCol, textCol, k, bands, shingleLen)
      .groupBy(col("band"), col("band_hash"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .where(size(col("ids")) > 1)

  /** Candidate near-dup pairs: documents agreeing on any full band.
    *
    * Shape: group the band table by (band, band_hash) and expand each
    * bucket's doc list into pairs locally. A band-table SELF-JOIN
    * would compute the whole signature pipeline twice (the broadcast
    * side can't reuse the probe side's exchange) — this computes it
    * once and emits the same pair set.
    *
    * Hot-bucket guard: on a boilerplate-heavy real corpus (repeated
    * headers, templated pages) one (band, band_hash) bucket can hold
    * millions of documents — a single task would then hold the whole
    * membership list and emit O(n^2) pairs. `maxBucket > 0` drops
    * buckets larger than the cap BEFORE pair expansion, bounding
    * per-task output at C(maxBucket, 2) pairs per bucket. Oversized
    * buckets are near-worthless for dedup anyway (everything matches
    * everything — exact-dedup or a boilerplate filter should have
    * collapsed them); use [[droppedBuckets]] to monitor what a cap
    * discards. 0 (default) = uncapped. */
  def minhashCandidates(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                        k: Int = 16, bands: Int = 4, shingleLen: Int = 5,
                        maxBucket: Int = 0): DataFrame = {
    val buckets = lshBucketLists(docs, idCol, textCol, k, bands, shingleLen)
    val kept = if (maxBucket > 0) buckets.where(size(col("ids")) <= maxBucket) else buckets
    kept
      .select(explode(pairsOf(col("ids"))).as("p"))
      .select(
        least(col("p._1"), col("p._2")).as("doc_a"),
        greatest(col("p._1"), col("p._2")).as("doc_b"))
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** The buckets a cap of `maxBucket` discards, with their sizes —
    * the monitoring surface for [[minhashCandidates]]' hot-bucket
    * guard (log the count / route to a quarantine table). */
  def droppedBuckets(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                     k: Int = 16, bands: Int = 4, shingleLen: Int = 5,
                     maxBucket: Int = 0): DataFrame = {
    require(maxBucket > 0, "droppedBuckets needs a positive cap")
    lshBucketLists(docs, idCol, textCol, k, bands, shingleLen)
      .where(size(col("ids")) > maxBucket)
      .select(col("band"), col("band_hash"), size(col("ids")).as("n_docs"))
  }

  /** LSH candidates verified by exact n-gram Jaccard >= threshold —
    * the end-to-end near-duplicate detector.
    *
    * Shape note (measured, not guessed): the fully-declarative
    * spelling below beats a "materialize candidates, semi-join-filter
    * the docs, shingle only candidates" rewrite by ~1.5x end-to-end —
    * the localCheckpoint that rewrite needs breaks AQE's exchange
    * reuse and serializes eager jobs, costing more than the duplicate
    * shingle computation saves (the shingle pass is scan-local and
    * cheap; BENCH history r4). Keep the plan declarative and let AQE
    * broadcast the small candidate side of both joins. */
  def nearDupPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                   threshold: Double = 0.5, k: Int = 16, bands: Int = 4,
                   shingleLen: Int = 5, maxBucket: Int = 0): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val cand = minhashCandidates(docs, idCol, textCol, k, bands, shingleLen, maxBucket)
    val sets = docs.select(col(idCol).as("id"),
      GraftFunctions.distinctShingles(col(textCol), shingleLen).as("sh"))
    val withA = cand.join(sets.select(col("id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
    val withB = withA.join(sets.select(col("id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
    withB
      .withColumn("jaccard", GraftFunctions.jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Cross-source near-duplicate matrix ([EXT]) — [[nearDupPairs]]
    * rolled up to (source_a, source_b) counts: how many verified
    * near-dup doc pairs join each pair of sources (diagonal = within-
    * source duplication). [[Ngrams.sourceOverlap]] audits SHARED GRAM
    * mass — cheap but indirect; this counts actual verified
    * document-level near-dups, the number a curation run acts on
    * (which mirror/syndication source to drop wholesale). Source pair
    * is order-normalized so (a,b) and (b,a) accumulate together.
    *
    * Shape: the pair list is the (bounded, capped) LSH-verified
    * output; the doc→source map joins onto PAIRS (two broadcast-sized
    * probes of a 2-column projection), never doc×doc. */
  def crossSourceDups(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text", sourceCol: String = "source",
                      threshold: Double = 0.5, k: Int = 16, bands: Int = 4,
                      shingleLen: Int = 5, maxBucket: Int = 0): DataFrame = {
    val pairs = nearDupPairs(docs, idCol, textCol, threshold, k, bands,
      shingleLen, maxBucket)
    val src = docs.select(col(idCol).as("__id"), col(sourceCol).as("__src"))
    pairs
      .join(src.select(col("__id").as("doc_a"), col("__src").as("__sa")), Seq("doc_a"))
      .join(src.select(col("__id").as("doc_b"), col("__src").as("__sb")), Seq("doc_b"))
      .select(least(col("__sa"), col("__sb")).as("source_a"),
        greatest(col("__sa"), col("__sb")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_dup_pairs"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** End-to-end corpus dedup — the composite a training-data pipeline
    * actually runs (exact-collapse FIRST, so replica cliques never
    * reach the quadratic near-dup stage):
    *  1. exact: identical normalized text collapses to the min-id
    *     keeper (`reason = 'exact'`);
    *  2. near: MinHash-LSH + jaccard-verified pairs among the exact
    *     keepers; a doc whose id exceeds a similar keeper's is
    *     assigned the min such keeper (`reason = 'near'`, one hop —
    *     transitive chains are not followed, by design: full
    *     connected components need an iterative algorithm and change
    *     results subtly with threshold);
    *  3. everything else keeps itself (`reason = 'unique'`).
    * Returns (doc_id, keeper_id, reason). */
  def dedupDocuments(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                     threshold: Double = 0.5, k: Int = 16, bands: Int = 4,
                     shingleLen: Int = 5, maxBucket: Int = 0): DataFrame = {
    val fp = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"),
      Text.fingerprint(col(textCol)).as("f"))
    val groups = fp.groupBy(col("f")).agg(min(col("doc_id")).as("ek"))
    // stays declarative: measured ~15% FASTER than a localCheckpoint
    // here (unlike the CC flavor below, the one-hop assignment reuses
    // withKeeper only once more, and AQE's exchange reuse covers it)
    val withKeeper = fp.join(groups, Seq("f"))
    val keeperDocs = withKeeper.where(col("doc_id") === col("ek"))
      .select(col("doc_id"), col("text"))
    val nearAssign = nearDupPairs(keeperDocs, idCol = "doc_id", textCol = "text",
      threshold = threshold, k = k, bands = bands, shingleLen = shingleLen,
      maxBucket = maxBucket)
      .groupBy(col("doc_b")).agg(min(col("doc_a")).as("nk"))
    withKeeper.select(col("doc_id"), col("ek"))
      .join(nearAssign, col("doc_id") === col("doc_b"), "left")
      .select(
        col("doc_id"),
        when(col("ek") =!= col("doc_id"), col("ek"))
          .otherwise(coalesce(col("nk"), col("doc_id"))).as("keeper_id"),
        when(col("ek") =!= col("doc_id"), lit("exact"))
          .when(col("nk").isNotNull, lit("near"))
          .otherwise(lit("unique")).as("reason"))
      .orderBy(col("doc_id"))
  }

  /** Quality-aware keeper re-election ([EXT]) — replace a dedup
    * assignment's arbitrary min-id representatives with each
    * cluster's BEST member by a caller-supplied score (length,
    * quality gate output, source priority): real corpus dedup keeps
    * the cleanest copy of a duplicated page, not the one that
    * happened to crawl first. Clusters come from any
    * `(doc_id, keeper_id)` assignment ([[dedupDocuments]],
    * [[dedupDocumentsCC]]); membership is untouched — only the
    * representative changes. Ties break on min id, so the election
    * is total and engine-exact.
    *
    * Shape: one id equi-join to attach scores (broadcast when the
    * score table projects from a dim; same-cardinality shuffle join
    * otherwise) + one cluster-keyed window whose argmax rides a
    * struct max — clusters are near-dup groups, inherently small, so
    * the window partition is bounded. */
  def keeperByQuality(assign: DataFrame, scores: DataFrame,
                      idCol: String = "doc_id",
                      scoreCol: String = "score"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("keeper_id"))
    assign
      .join(scores.select(col(idCol).as("doc_id"), col(scoreCol).as("__q")),
        Seq("doc_id"))
      // argmax(score desc, id asc) as a struct max: max score wins;
      // equal scores maximize -id, i.e. take the smallest id
      .withColumn("__best",
        max(struct(col("__q").as("q"), (lit(0L) - col("doc_id")).as("nid")))
          .over(w))
      .select(col("doc_id"),
        (lit(0L) - col("__best.nid")).as("keeper_id"))
      .orderBy(col("doc_id"))
  }

  /** Connected components of an undirected pair graph; returns
    * (doc_id, root) with root = min id in the component, for every
    * node appearing in `pairs`.
    *
    * Adaptive execution, GraphFrames-style: verified near-dup pairs
    * are RARE by construction (LSH candidates already jaccard-filtered),
    * so when the pair count is within `driverMaxPairs` the components
    * come from a driver-side union-find — microseconds, zero extra
    * jobs. The 1M default costs a few hundred MB transiently on the
    * driver (boxed Rows + a boxed-Long parent map — ~100-150 bytes per
    * edge all-in); raise it only with a matching driver heap. Above
    * the threshold it falls back to
    * distributed min-label propagation: two hops per materialized
    * round (per-round cost is job overhead, not the shuffles),
    * `localCheckpoint` to truncate lineage, and a monotone label-total
    * as the fixpoint detector. Throws if not converged within
    * `maxIter` double-rounds — truncated labels would silently be
    * wrong. */
  def connectedKeepers(pairs: DataFrame, maxIter: Int = 20,
                       driverMaxPairs: Long = 1L << 20): DataFrame = {
    val spark = pairs.sparkSession
    // fail loudly on non-integral ids: the long cast below is non-ANSI
    // (string/UUID ids would silently become null and corrupt the
    // components); callers with string ids should hash them to long
    // (e.g. xxhash64) and keep a mapping table
    Seq("doc_a", "doc_b").foreach { c =>
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val dt = pairs.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"connectedKeepers needs integral ids; $c is $dt — hash non-numeric ids to long first")
    }
    val p = pairs.select(col("doc_a").cast("long").as("doc_a"),
      col("doc_b").cast("long").as("doc_b")).persist()
    try {
      if (p.count() <= driverMaxPairs) {
        val es = p.collect().map(r => (r.getLong(0), r.getLong(1)))
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
          r
        }
        // union keeps the SMALLER root as parent, so every tree root
        // is its component's min id — find() yields it directly
        es.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a)
          parent.getOrElseUpdate(b, b)
          val ra = find(a)
          val rb = find(b)
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        import spark.implicits._
        parent.keys.toSeq.sorted.map(k => (k, find(k))).toDF("doc_id", "root")
      } else {
        val edges = p.select(col("doc_a").as("s"), col("doc_b").as("d"))
          .union(p.select(col("doc_b").as("s"), col("doc_a").as("d")))
        var labels = edges.select(col("s").as("doc_id")).distinct()
          .withColumn("root", col("doc_id"))
          .localCheckpoint()
        def total(df: DataFrame): java.math.BigDecimal =
          df.agg(sum(col("root").cast("decimal(38,0)"))).head().getDecimal(0)
        def hop(l: DataFrame): DataFrame = {
          val prop = edges.join(l.withColumnRenamed("doc_id", "s"), Seq("s"))
            .select(col("d").as("doc_id"), col("root"))
          l.union(prop).groupBy(col("doc_id")).agg(min(col("root")).as("root"))
        }
        // free a SUPERSEDED label generation's executor blocks.
        // localCheckpoint persists its RDD (memory-and-disk) and only
        // the ContextCleaner reclaims it — lazily, at some later
        // driver GC — so at ×1000 every ~111 M-row generation stayed
        // resident and the per-round wall went spill-bound (16× at
        // the third decade, PLANS.md). Unpersisting a locally
        // checkpointed RDD destroys its data, so this is called ONLY
        // on the previous generation, strictly after the next one was
        // materialized eagerly (the old blocks feed no live plan).
        def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
          case lr: org.apache.spark.sql.execution.LogicalRDD =>
            lr.rdd.unpersist(blocking = false); ()
          case _ => ()
        }
        var prev = total(labels)
        var converged = false
        var i = 0
        val t0 = System.nanoTime()
        while (!converged && i < maxIter) {
          val next = hop(hop(labels)).localCheckpoint()
          val cur = total(next)
          converged = cur.compareTo(prev) == 0
          prev = cur
          release(labels)
          labels = next
          i += 1
          // probe observability (this path only runs past driverMaxPairs
          // — ProbeOp/ScaleProbe territory, never a gate-scale query):
          // rounds-to-converge and per-round wall are the two numbers
          // the 100 TB runbook needs
          println(f"[cc-fallback] double-round $i%d done, " +
            f"${(System.nanoTime() - t0) / 1e9}%.2f s cumulative, converged=$converged")
        }
        if (!converged)
          throw new IllegalStateException(s"connectedKeepers: not converged after $maxIter rounds")
        labels
      }
    } finally { p.unpersist(); () }
  }

  /** Transitive-closure flavor of [[dedupDocuments]]: where the
    * one-hop policy assigns each near-dup to the min direct neighbor
    * (so a chain A~B~C maps C to B while B maps to A), this follows
    * the verified near-dup graph to its connected components — every
    * member of a component keeps the component's min id. Exact dups
    * also inherit their exact-keeper's component root, so chains
    * through exact replicas resolve too. Same (doc_id, keeper_id,
    * reason) contract. */
  def dedupDocumentsCC(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                       threshold: Double = 0.5, k: Int = 16, bands: Int = 4,
                       shingleLen: Int = 5, maxBucket: Int = 0,
                       maxIter: Int = 20): DataFrame =
    assignCC(docs, idCol, textCol, threshold, k, bands, shingleLen,
      maxBucket, maxIter).orderBy(col("doc_id"))

  /** Unsorted core of [[dedupDocumentsCC]] — [[dedupKeepBest]] joins
    * on top (paying the terminal sort here would be pure waste, the
    * same split [[Fuzzy.resolveEntities]] uses). */
  private def assignCC(docs: DataFrame, idCol: String, textCol: String,
                       threshold: Double, k: Int, bands: Int,
                       shingleLen: Int, maxBucket: Int,
                       maxIter: Int): DataFrame = {
    val fp = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"),
      Text.fingerprint(col(textCol)).as("f"))
    val groups = fp.groupBy(col("f")).agg(min(col("doc_id")).as("ek"))
    // localCheckpoint: this subtree (scan + sha256 + keeper join)
    // feeds the pair pipeline (whose own persist triggers one eager
    // evaluation) AND the final assignment join; one checkpoint costs
    // about what the keeper join's shuffle already wrote and replaces
    // the recomputes (measured 3.3 -> 2.6 s at sf0.1, 4x cold). The
    // one-hop dedupDocuments stays declarative — same experiment
    // measured the checkpoint ~15% SLOWER there.
    val withKeeper = fp.join(groups, Seq("f"))
      .select(col("doc_id"), col("text"), col("ek")).localCheckpoint()
    val keeperDocs = withKeeper.where(col("doc_id") === col("ek"))
      .select(col("doc_id"), col("text"))
    val pairs = nearDupPairs(keeperDocs, idCol = "doc_id", textCol = "text",
      threshold = threshold, k = k, bands = bands, shingleLen = shingleLen,
      maxBucket = maxBucket).select(col("doc_a"), col("doc_b"))
    val roots = connectedKeepers(pairs, maxIter)
      .withColumnRenamed("doc_id", "ek")
    withKeeper.select(col("doc_id"), col("ek"))
      .join(roots, Seq("ek"), "left")
      .select(
        col("doc_id"),
        coalesce(col("root"), col("ek")).as("keeper_id"),
        when(col("doc_id") =!= col("ek"), lit("exact"))
          .when(col("root").isNotNull && col("root") =!= col("doc_id"), lit("near"))
          .otherwise(lit("unique")).as("reason"))
  }

  /** Quality-aware dedup policy ([EXT]): same exact+near clusters as
    * [[dedupDocumentsCC]], but each cluster keeps its BEST-scoring
    * member (ties to the smaller id) instead of the accidentally-
    * smallest id — the LLM-corpus standard, where dedup should retain
    * the longest/cleanest copy of a crawl near-duplicate, not
    * whichever shard happened to assign the low id. `scoreCol` is any
    * engine-exact per-doc score (length, a quality battery output, a
    * recency stamp). Output: (doc_id, cluster_id, best_id, kept).
    *
    * Scale shape: one extra bounded step over the CC assignment — the
    * argmax window partitions by cluster (cluster sizes are dedup
    * cluster sizes, never corpus-scale), and the score join touches
    * only (id, score) columns. */
  def dedupKeepBest(docs: DataFrame, scoreCol: String = "n_chars",
                    idCol: String = "doc_id", textCol: String = "text",
                    threshold: Double = 0.5, k: Int = 16, bands: Int = 4,
                    shingleLen: Int = 5, maxBucket: Int = 0,
                    maxIter: Int = 20): DataFrame = {
    val assign = assignCC(docs, idCol, textCol, threshold, k, bands,
      shingleLen, maxBucket, maxIter)
      .select(col("doc_id"), col("keeper_id").as("cluster_id"))
    val scored = assign.join(
      docs.select(col(idCol).as("doc_id"), col(scoreCol).as("__score")),
      Seq("doc_id"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("__score").desc, col("doc_id"))
    val best = scored.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("best_id"))
    scored.join(best, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("best_id"),
        when(col("doc_id") === col("best_id"), lit(1)).otherwise(lit(0))
          .cast("int").as("kept"))
      .orderBy(col("doc_id"))
  }

  /** Dedup cluster-size profile ([EXT]) — the corpus-duplication
    * fingerprint: how many clusters of each size the exact+near CC
    * assignment produces (size 1 = unique docs; a fat tail of large
    * clusters means template spam or a crawl loop). Two bounded
    * aggregates over the shared CC core; the histogram is bounded by
    * the largest cluster, never the corpus. */
  def clusterSizeProfile(docs: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text", threshold: Double = 0.5,
                         k: Int = 16, bands: Int = 4, shingleLen: Int = 5,
                         maxBucket: Int = 0, maxIter: Int = 20): DataFrame =
    assignCC(docs, idCol, textCol, threshold, k, bands, shingleLen,
      maxBucket, maxIter)
      .groupBy(col("keeper_id")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      .orderBy(col("cluster_size"))

  /** 32-bit SimHash over whitespace tokens (weighted by occurrence).
    * Distributed as explode + one groupBy(doc) shuffle. */
  def simhash32(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // spread the token fan-out; explicit count, see minhashSignatures
    val tok = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol).as("doc_id"),
      explode(Text.tokens(lower(col(textCol)))).as("tok"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
    val bitSums = (0 until 32).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"__b$j")
    }
    val fp = (0 until 32).map { j =>
      when(col(s"__b$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    tok.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), fp.as("simhash"))
      .orderBy(col("doc_id"))
  }

  /** Hamming distance between two simhash fingerprints. */
  def hamming32(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: every (doc_a < doc_b) whose 32-bit
    * simhashes are within `maxDist` bits — the third member of the
    * near-dup family, cheaper than minhash (one 8-byte fingerprint
    * per doc, no k-row signature) at the cost of a coarser similarity
    * notion (bit agreement of the token-hash profile).
    *
    * RECALL 1 within the radius, by pigeonhole: the fingerprint
    * splits into `blocks` equal bit-blocks; a pair differing in at
    * most `maxDist` < blocks bits must agree EXACTLY on some block,
    * so the block equi-join (never all-pairs) surfaces every true
    * pair and the `bit_count(xor)` verify is exact — the classic
    * Charikar/Manku-Jain-Sarma rotation-table scheme as one
    * explode + equi-join.
    *
    * `maxBucket > 0` caps pathological block-key buckets (the
    * all-zeros block of boilerplate-heavy corpora) exactly like the
    * minhash band caps: dropped buckets trade recall for a bound,
    * monitored the same way. The candidate pair set dedups on the id
    * pair BEFORE the verify so multi-block agreement never double-
    * counts. */
  def simhashNearDup(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", maxDist: Int = 3,
                     blocks: Int = 4, maxBucket: Int = 0): DataFrame = {
    require(blocks > 0 && 32 % blocks == 0, s"blocks must divide 32: $blocks")
    require(maxDist >= 0 && maxDist < blocks,
      s"pigeonhole needs maxDist < blocks for recall 1: $maxDist vs $blocks")
    val width = 32 / blocks
    val sh = simhash32(docs, idCol, textCol)
    val keyed = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until blocks).map(b => struct(lit(b).as("blk"),
        shiftright(col("simhash"), b * width)
          .bitwiseAND(lit((1L << width) - 1)).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.blk").as("blk"),
        col("bk.key").as("key"))
    val capped =
      if (maxBucket <= 0) keyed
      else {
        // bucket size as a window ON the keyed rows (the tfIdf
        // no-recompute discipline — a groupBy+join would rebuild the
        // simhash aggregate a second time)
        val byBucket = org.apache.spark.sql.expressions.Window
          .partitionBy(col("blk"), col("key"))
        keyed.withColumn("__n", count(lit(1)).over(byBucket))
          .where(col("__n") <= maxBucket).drop("__n")
      }
    val a = capped.select(col("blk"), col("key"),
      col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val b = capped.select(col("blk"), col("key"),
      col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("blk", "key"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b")).distinct()
      .select(col("doc_a"), col("doc_b"),
        hamming32(col("sh_a"), col("sh_b")).cast("int").as("hamming"))
      .where(col("hamming") <= maxDist)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ------------------------------------------------------------------
  // Bloom-guarded incremental dedup ([EXT]): "is this document already
  // in the corpus?" without touching the corpus per batch.
  //
  // The 100 TB shape: a crawler delivers batches continuously; joining
  // every batch against the full historical fingerprint set is a scan
  // of the whole index per batch. Instead the pipeline maintains two
  // artifacts: (1) a FINGERPRINT INDEX table (32 bytes/doc — the vault
  // pattern, ~1000x smaller than the text zone) and (2) a serialized
  // BLOOM SKETCH over it (megabytes, built once, updated per batch by
  // re-aggregating or OR-ing partial blooms — BloomFilterAggregate's
  // merge IS a bitwise OR, so per-shard blooms compose exactly like
  // the HLL sketch shards in Profile.sketchShards). A new batch is
  // probed against the broadcast sketch: bloom-NEGATIVE rows are
  // definitely new (no false negatives) and skip the join entirely;
  // only the bloom-positive sliver (true dups + fpp of the batch)
  // reaches the exact anti-join verify, so the result is EXACT no
  // matter how the sketch is sized — an oversmall bloom degrades to
  // the baseline anti-join plan, never to wrong answers.
  // ------------------------------------------------------------------

  /** The per-doc fingerprint index (persist this next to the corpus). */
  def fingerprintIndex(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"), Text.fingerprint(col(textCol)).as("fingerprint"))

  /** Serialized bloom over a fingerprint column: one distributed pass,
    * map-side partial sketches OR-merged. Returns null iff the index
    * is empty (Spark's convention for an empty sketch). */
  def fingerprintBloom(index: DataFrame, fpCol: String = "fingerprint",
                       expectedItems: Long = 1000000L,
                       numBits: Long = 1L << 23): Array[Byte] = {
    GraftFunctions.register(index.sparkSession)
    index.agg(GraftFunctions.bloomAgg(xxhash64(col(fpCol)), expectedItems, numBits)
        .as("bloom"))
      .head().getAs[Array[Byte]]("bloom")
  }

  /** Rows of `batch` whose text is NOT already in the corpus. `bloom`
    * is the sketch from [[fingerprintBloom]]; pass null to skip the
    * bloom FAST PATH only (sketch lost, first batch ever) — the exact
    * anti-join verify against `index` always runs, so a missing
    * sketch degrades to the baseline plan, never to re-ingested
    * duplicates. Output carries the fingerprint so the caller can
    * append it to the index for the next batch. */
  def newDocs(batch: DataFrame, index: DataFrame, bloom: Array[Byte],
              idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    newDocsByFingerprint(
      batch.select(col(idCol).as("doc_id"),
        Text.fingerprint(col(textCol)).as("fingerprint")),
      index, bloom)

  /** [[newDocs]] over an already-fingerprinted batch (doc_id,
    * fingerprint) — the entry point for callers that computed the
    * fingerprint anyway (e.g. the streaming ingest loop's intra-batch
    * collapse), so the normalize+sha256 pass isn't paid twice.
    *
    * Null fingerprints (null input text) are first-class: the verify
    * is a NULL-SAFE anti join (`<=>`, still an equi hash join), so
    * every null-text doc shares one "null content" identity and
    * dedups across batches like any other fingerprint — a plain
    * equality join would never match them and re-admit null docs
    * forever. The bloom fast path is consistent with this:
    * `xxhash64(null)` is the seed constant, so once a null doc is in
    * the index's sketch, later null probes hit and fall through to
    * the exact verify. */
  def newDocsByFingerprint(fpBatch: DataFrame, index: DataFrame,
                           bloom: Array[Byte]): DataFrame = {
    GraftFunctions.register(fpBatch.sparkSession)
    def antiVerify(batch: DataFrame): DataFrame =
      batch.join(index.select(col("fingerprint").as("__idx_fp")),
          col("fingerprint") <=> col("__idx_fp"), "left_anti")
        .select("doc_id", "fingerprint")
    val survivors =
      if (bloom == null) antiVerify(fpBatch)
      else {
        val hit = GraftFunctions.bloomContains(lit(bloom), xxhash64(col("fingerprint")))
        // definitely-new rows bypass the join; only bloom-positives
        // (true dups + false positives) pay the exact verify. The
        // batch is scanned twice, but the batch is the small side —
        // the index (the big side) is only read by the verify join,
        // whose probe set is the positive sliver.
        fpBatch.where(!hit).unionByName(antiVerify(fpBatch.where(hit)))
      }
    survivors.select(col("doc_id"), col("fingerprint")).orderBy(col("doc_id"))
  }

  /** Incremental NEAR-dup filter: batch docs with no near-duplicate
    * in a PERSISTED history signature table — the minhash analog of
    * [[newDocs]]'s exact fast path, for the same continuous-crawl
    * deployment.
    *
    * `historySigs` is [[minhashSignatures]] output stored next to the
    * corpus and appended per batch (k longs/doc, ~1000x smaller than
    * the text zone). The increment costs ONE shingle pass over the
    * batch; the history text is never re-read: candidates come from
    * banding both signature sets and equi-joining on (band,
    * band_hash) — never all-pairs — and verification uses the MinHash
    * Jaccard estimator (signature agreement count >= `minMatches` of
    * k), which needs only the two signature rows. Estimated-Jaccard
    * verification is the deliberate at-scale trade: exact re-shingling
    * of candidate history docs would re-open the text zone per batch.
    * Everything is deterministic (fixed permutations), so an oracle
    * can replay the identical math.
    *
    * `maxBucket > 0` caps HISTORY-side bucket sizes, same rationale
    * as [[minhashCandidates]]: a boilerplate bucket holding millions
    * of history docs would fan every colliding batch row out by its
    * size. */
  def newNearDocs(batch: DataFrame, historySigs: DataFrame,
                  idCol: String = "doc_id", textCol: String = "text",
                  k: Int = 16, bands: Int = 4, shingleLen: Int = 5,
                  minMatches: Int = 8, maxBucket: Int = 0,
                  materialize: Boolean = false): DataFrame = {
    val bSigs = minhashSignatures(batch, idCol, textCol, k, shingleLen)
    batch.select(col(idCol).as("doc_id"))
      .join(newNearBySignatures(bSigs, historySigs, k, bands, minMatches, maxBucket,
          materialize),
        Seq("doc_id"), "left_semi")
      .orderBy(col("doc_id"))
  }

  /** The signature-level core of [[newNearDocs]]: ids of `batchSigs`
    * rows with no near-match in `historySigs` — for callers that
    * computed (or will persist) the batch signatures anyway, e.g. the
    * streaming ingest loop.
    *
    * The batch-signature plan feeds THREE operators here (its band
    * rows, the verify join's probe side, and the final anti join) and
    * Spark does not reuse common subtrees across joins — an
    * expression-defined `batchSigs` (shingle explode + k min-aggs)
    * would be recomputed three times. `materialize = true` pins it
    * once via localCheckpoint before planning; skip it only when
    * `batchSigs` is already a table scan. */
  def newNearBySignatures(batchSigs: DataFrame, historySigs: DataFrame,
                          k: Int = 16, bands: Int = 4,
                          minMatches: Int = 8, maxBucket: Int = 0,
                          materialize: Boolean = false): DataFrame = {
    require(minMatches >= 1 && minMatches <= k, s"minMatches must be in [1,$k]")
    val bSigs = if (materialize) batchSigs.localCheckpoint() else batchSigs
    val bBands = bandsOfSignatures(bSigs, k, bands).withColumnRenamed("doc_id", "batch_id")
    val hBandsAll = bandsOfSignatures(historySigs, k, bands).withColumnRenamed("doc_id", "hist_id")
    val hBands =
      if (maxBucket <= 0) hBandsAll
      else {
        // bucket size as a window ON the band rows: a groupBy+join
        // spelling recomputes the whole history band subtree (incl.
        // the signature build when `historySigs` is an expression) a
        // second time — same reason tfIdf computes df as a window
        val byBucket = org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("band_hash"))
        hBandsAll.withColumn("__n", count(lit(1)).over(byBucket))
          .where(col("__n") <= maxBucket).drop("__n")
      }
    val cand = bBands.join(hBands, Seq("band", "band_hash"))
      .select(col("batch_id"), col("hist_id")).distinct()
    val bSide = bSigs.select(col("doc_id").as("batch_id") +:
      (0 until k).map(i => col(s"m$i").as(s"bm$i")): _*)
    val hSide = historySigs.select(col("doc_id").as("hist_id") +:
      (0 until k).map(i => col(s"m$i").as(s"hm$i")): _*)
    val agree = (0 until k)
      .map(i => when(col(s"bm$i") === col(s"hm$i"), 1).otherwise(0))
      .reduce(_ + _)
    val dupIds = cand.join(bSide, Seq("batch_id")).join(hSide, Seq("hist_id"))
      .where(agree >= lit(minMatches))
      .select(col("batch_id").as("doc_id")).distinct()
    bSigs.select(col("doc_id"))
      .join(dupIds, Seq("doc_id"), "left_anti")
  }

  /** Contrastive training-pair mining ([EXT]) — turn the dedup
    * machinery into embedding-model training data: verified near-dup
    * pairs become POSITIVES, and each anchor draws
    * `negativesPerAnchor` deterministic pseudo-random NEGATIVES from
    * the corpus (the random-negatives baseline every contrastive
    * recipe starts from; hard negatives are [[Similarity.hardNegatives]]).
    *
    * Negative sampling is portable-hash arithmetic, not RNG: a dense
    * id↔ordinal index ([[Pack.globalOrdinals]] — distributed prefix
    * sum, no global window) lets `fp60(anchor ':' j) mod N` address a
    * uniform corpus position, reproducible across engines and runs.
    * Accidental collisions with the anchor itself or with a true
    * near-dup partner are filtered (anti-join against the pair set in
    * both orders) rather than re-drawn — a filtered draw leaves at
    * most `negativesPerAnchor` negatives, deterministically.
    *
    * Shape: positives are the capped LSH-verified pair list; the
    * negative draw joins |anchors|·k probe rows against the ordinal
    * index — linear, never doc×doc. */
  def contrastivePairs(docs: DataFrame, negativesPerAnchor: Int = 2,
                       threshold: Double = 0.5,
                       idCol: String = "doc_id",
                       textCol: String = "text",
                       maxBucket: Int = 0): DataFrame = {
    require(negativesPerAnchor >= 1,
      s"contrastivePairs needs negativesPerAnchor >= 1: $negativesPerAnchor")
    // The ×10 decade probe caught this operator at 126× wall growth:
    // the positive subtree (shingle explode + LSH bands + exact
    // Jaccard verify) fed THREE consumers (pos, posBoth, the negative
    // anti-join) and Spark does not share subtrees across joins, so
    // the most expensive stage ran three times — checkpoint once,
    // reuse thrice (the semanticDedup/streamIngest discipline).
    // `maxBucket` additionally plumbs the standard hot-bucket cap into
    // the candidate stage for boilerplate-heavy corpora; the remaining
    // growth under duplicate-dense input is OUTPUT (true positives),
    // not plan fan-out.
    // eager = false: the pin still severs the triple-consumer replay,
    // but CONSTRUCTING the frame (registry plans-cleanly pass, callers
    // that build and never run) stays free — the LSH+verify stage runs
    // on first action, not at graph-build time
    val pos = nearDupPairs(docs, idCol, textCol, threshold,
        maxBucket = maxBucket)
      .select(col("doc_a").as("anchor"), col("doc_b").as("other"))
      .localCheckpoint(eager = false)
    val posBoth = pos.unionAll(
      pos.select(col("other").as("anchor"), col("anchor").as("other")))
    val ord = Pack.globalOrdinals(
      docs.select(col(idCol).cast("long").as("did")), Seq("did"))
    val nDocs = docs.agg(count(lit(1)).as("__n"))
    val negs = pos.select(col("anchor")).distinct()
      .select(col("anchor"),
        explode(sequence(lit(1), lit(negativesPerAnchor))).as("__j"))
      .crossJoin(broadcast(nDocs))
      .select(col("anchor"),
        (graft.functions.Portable.fp60(concat(col("anchor").cast("string"),
          lit(":"), col("__j").cast("string"))) % col("__n")).as("ordinal"))
      .join(ord.select(col("ordinal"), col("did").as("other")), Seq("ordinal"))
      .where(col("other") =!= col("anchor"))
      .join(posBoth, Seq("anchor", "other"), "left_anti")
      .select(col("anchor"), col("other")).distinct()
    pos.withColumn("label", lit("pos"))
      .unionAll(negs.withColumn("label", lit("neg")))
      .orderBy(col("anchor"), col("label"), col("other"))
  }
}
